"""Round/fragment distributions of the (round-5) FLATTENED resolver.

Host-only study for the deep-decode-tier lever (VERDICT r4 item 2):
the tail of a self-overlapping match now reads the pre-existing
window [s, s+off) instead of the head's output, cutting one round
per copy-head nesting level.  This sweeps split_max and reports, per
config: the resolver round histogram, nfrag quantiles, the blocks
fitting each production tier, and resolve time -- so the tier table
(parallel.sharded._FRAG_TIERS) can be re-cut on data, then A/B'd on
chip.

Streams: native HC9 output (proxy for the device L9 streams the
bench decodes; same algorithm class).  Usage:
    python experiments/resolve_flatten_study.py [MB] [sm1,sm2,...]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import make_corpus  # noqa: E402
from zig_lz4_tpu.native import (native_compress_hc_blocks,  # noqa: E402
                                native_resolve_blocks)

BLK = 65536
MB = int(sys.argv[1]) if len(sys.argv) > 1 else 12
SMS = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2
                        else (8, 16, 32, 64))]

corpus = make_corpus(MB + 2)[:MB << 20]
nb = len(corpus) // BLK
blocks = np.frombuffer(corpus[:nb * BLK], np.uint8).reshape(nb, BLK)
lens = np.full(nb, BLK, np.int64)
print(f"encoding {nb} blocks with native HC9...", flush=True)
dst, outl = native_compress_hc_blocks(blocks, lens, 9)
payl = b"".join(dst[i, :outl[i]].tobytes() for i in range(nb))
offs = np.zeros(nb, np.int64)
offs[1:] = np.cumsum(outl)[:-1]

for sm in SMS:
    t0 = time.perf_counter()
    r = native_resolve_blocks(payl, offs, outl.astype(np.int64), BLK,
                              out_cap=BLK, split_max=sm,
                              round_limit=64, reuse_buffers=False)
    dt = time.perf_counter() - t0
    fdst, flen, fsrc, fper, fph, nfrag, rounds, olens = r
    ok = nfrag >= 0
    rr = rounds[ok]
    nf = nfrag[ok]
    hist = np.bincount(np.clip(rr, 0, 20), minlength=21)
    # production tier fits (fcap divisor, max rounds)
    tiers = ((8, 2), (4, 8), (2, 8), (1, 12), (1, 16))
    taken = np.zeros(len(rr), bool)
    fits = []
    for div, rmax in tiers:
        f = ~taken & (nf <= BLK // div) & (rr <= rmax)
        taken |= f
        fits.append(int(f.sum()))
    q = np.percentile(nf, [50, 90, 99, 100]).astype(int)
    print(f"sm={sm:3d}: resolve {dt:.3f}s  rounds p50/p90/max "
          f"{int(np.percentile(rr,50))}/{int(np.percentile(rr,90))}/"
          f"{rr.max()}  nfrag p50/p90/p99/max {q[0]}/{q[1]}/{q[2]}/"
          f"{q[3]}  tier fits {fits} (of {len(rr)}; overflow "
          f"{int((~ok).sum())})", flush=True)
    print(f"        round hist(0..20+): {hist.tolist()}", flush=True)
