"""Deep-rank level sweep on the real chip: speed, ratio, decode
eligibility per device level (round-3 feature: exact prefix-doubled
rank tiers for levels 10-12).

For each device level: encode a bench-corpus sample, time it, compute
ratio, then run the host fragment resolver over the streams and
classify every block against the production fragment tiers
(parallel.sharded._FRAG_TIERS) -- the decode side's eligibility is a
property of the ENCODED stream (longer matches -> fewer fragments).

Run: python experiments/enc_deep_sweep.py [mb] [cpu]
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import os
if "cpu" in sys.argv[1:]:
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402
if "cpu" in sys.argv[1:]:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

import zig_lz4_tpu.ops.jax_block as jb  # noqa: E402
from zig_lz4_tpu.ops.jax_block import level_params  # noqa: E402
from zig_lz4_tpu.parallel.sharded import (_FRAG_SPLIT_MAX,  # noqa: E402
                                          _FRAG_TIERS)
from zig_lz4_tpu.native import (native_resolve_blocks,  # noqa: E402
                                native_compress_hc_blocks)
from zig_lz4_tpu import decompress_safe  # noqa: E402
from bench import make_corpus  # noqa: E402

BLK = 65536
B = 64
mbs = [int(a) for a in sys.argv[1:] if a.isdigit()]
MB = mbs[0] if mbs else 12
corpus = make_corpus(MB)
nb = len(corpus) // BLK // B * B
blocks = np.frombuffer(corpus[:nb * BLK], np.uint8).reshape(nb, BLK)
print(f"{nb} blocks of 64KB; tiers {_FRAG_TIERS}", flush=True)

dl = jax.device_put(np.full(B, BLK, np.int32))
ds = jax.device_put(np.zeros(B, np.int32))
dbs = [jax.device_put(blocks[i:i + B]) for i in range(0, nb, B)]

for level in (0, 9, 10, 11, 12):
    hc, deep = level_params(level)
    fn = jax.jit(jax.vmap(functools.partial(jb._encode_block, blk=BLK,
                                            hc=hc, deep=deep)))
    o, l = fn(dbs[0], dl, ds)
    np.asarray(l)                     # compile
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        outs = []
        checks = []
        for db in dbs:
            o, l = fn(db, dl, ds)
            outs.append((o, l))
            checks.append(jnp.sum(l))
        total = int(np.asarray(sum(checks)))
        ts.append(time.perf_counter() - t0)
    t = min(ts)

    # fetch payloads, verify a few, resolve + tier-classify
    payloads = bytearray()
    offs = np.zeros(nb, np.int64)
    lens64 = np.zeros(nb, np.int64)
    pos = 0
    bi = 0
    for o, l in outs:
        on, ln = np.asarray(o), np.asarray(l)
        for k in range(B):
            offs[bi] = pos
            lens64[bi] = int(ln[k])
            payloads += on[k, :int(ln[k])].tobytes()
            pos += int(ln[k])
            bi += 1
    for check in (0, nb // 2, nb - 1):
        comp = bytes(payloads[offs[check]:offs[check] + lens64[check]])
        assert decompress_safe(comp, BLK) == blocks[check].tobytes(), check

    fcap_hi = BLK // _FRAG_TIERS[-1][0]
    r = native_resolve_blocks(bytes(payloads), offs, lens64, fcap_hi,
                              out_cap=BLK, split_max=_FRAG_SPLIT_MAX,
                              round_limit=_FRAG_TIERS[-1][1])
    fdst, flen, fsrc, fper, fph, nfrag, rounds, olens = r
    taken = np.zeros(nb, bool)
    fracs = []
    for div, rmax in _FRAG_TIERS:
        okt = (~taken & (nfrag >= 0) & (nfrag <= BLK // div)
               & (rounds <= rmax))
        taken |= okt
        fracs.append(float(okt.sum()) / nb)
    print(f"L{level:<2d} (hc={hc} deep={deep}): "
          f"{t / nb * 1e3:6.3f} ms/blk  {nb * BLK / t / 1e6:6.1f} MB/s  "
          f"ratio {nb * BLK / (offs[-1] + lens64[-1]):.4f}  "
          f"tier fracs {[round(f, 3) for f in fracs]} "
          f"cum {round(float(taken.sum()) / nb, 3)}", flush=True)

# native reference points on the same sample
hl = np.full(min(nb, 64), BLK, np.int64)
for lvl in (2, 9, 12):
    t0 = time.perf_counter()
    _, houtl = native_compress_hc_blocks(blocks[:len(hl)], hl, lvl)
    t_hc = time.perf_counter() - t0
    print(f"native HC{lvl}: {len(hl) * BLK / t_hc / 1e6:6.1f} MB/s "
          f"ratio {len(hl) * BLK / houtl.sum():.4f}", flush=True)
