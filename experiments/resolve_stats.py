"""Resolver fragment statistics: old full-chase vs capped-split.

Host-only; measures device-decode eligibility (nfrag <= FCAP,
rounds <= RMAX) across (split_max, round_limit) settings on the bench
corpus.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from zig_lz4_tpu.native import (  # noqa: E402
    native_compress_blocks, native_resolve_blocks,
    native_decompress_blocks)
from bench import make_corpus  # noqa: E402

BLK = 65536
MB = int(sys.argv[1]) if len(sys.argv) > 1 else 24
corpus = make_corpus(MB)
n = len(corpus) - len(corpus) % BLK
nb = n // BLK
blocks = np.frombuffer(corpus[:n], np.uint8).reshape(nb, BLK)
dst, outl = native_compress_blocks(blocks, np.full(nb, BLK, np.int64))
offs = np.zeros(nb, np.int64)
offs[1:] = np.cumsum(outl)[:-1]
payl = b"".join(dst[i, :outl[i]].tobytes() for i in range(nb))
print(f"{nb} blocks, {len(payl)/1e6:.1f} MB compressed")

for split_max, round_limit, fcap in [
        (1 << 30, 0, 8192),      # old behavior (never cap; rounds<=2 nat)
        (8, 4, 8192), (8, 6, 8192), (4, 6, 8192), (4, 8, 4096),
        (2, 8, 4096), (8, 4, 4096), (16, 4, 8192)]:
    t0 = time.perf_counter()
    fdst, flen, fsrc, fper, fph, nfrag, rounds, olens = \
        native_resolve_blocks(payl, offs, outl, fcap, BLK, 0,
                              split_max, round_limit)
    dt = time.perf_counter() - t0
    ok = nfrag >= 0
    rmax_eff = rounds[ok].max() if ok.any() else -1
    print(f"split_max={split_max:>10} rlim={round_limit} fcap={fcap}: "
          f"eligible {int(ok.sum())}/{nb} "
          f"({100*ok.sum()/nb:.0f}%), frags med "
          f"{int(np.median(nfrag[ok])) if ok.any() else -1} "
          f"p90 {int(np.percentile(nfrag[ok], 90)) if ok.any() else -1} "
          f"max {int(nfrag[ok].max()) if ok.any() else -1}, rounds "
          f"max {rmax_eff} "
          f"hist {np.bincount(rounds[ok], minlength=1).tolist()[:10]} "
          f"({dt:.2f}s)")

# correctness spot-check vs host decode with a quick numpy replay
ref, rlen = native_decompress_blocks(payl, offs, outl, BLK)
fdst, flen, fsrc, fper, fph, nfrag, rounds, olens = \
    native_resolve_blocks(payl, offs, outl, 8192, BLK, 0, 8, 6)
bad = 0
for bi in range(nb):
    if nfrag[bi] < 0:
        continue
    out = np.zeros(BLK, np.uint8)
    comp = np.frombuffer(payl[offs[bi]:offs[bi] + outl[bi]], np.uint8)
    for k in range(nfrag[bi]):
        d, L, s, p, h = (fdst[bi, k], flen[bi, k], fsrc[bi, k],
                         fper[bi, k], fph[bi, k])
        if p == 0:
            out[d:d + L] = comp[s:s + L]
        else:
            idx = s + (h + np.arange(L)) % p
            out[d:d + L] = out[idx]
    if not np.array_equal(out[:olens[bi]],
                          np.asarray(ref[bi][:olens[bi]])):
        bad += 1
        if bad < 4:
            print(f"MISMATCH block {bi}")
print(f"replay check: {bad} mismatching blocks of {nb}")
