"""A/B the post-parse extension knobs on the real chip.

Measures device encode throughput + corpus ratio for levels 9 and 12
with _EXT_ITERS in {0-off, 1, 2} (0 = _EXT_POOL disabled entirely, the
pre-extension baseline).  Decision rules (docs/CHIP_QUEUE.md 3b):
  - extension cost lands in the (iters=1 - off) delta; if > 0.3 ms/blk
    try _EXT_BYTES=32 / _EXT_POOL=512 (ratio effect CPU-measured small)
  - if L12 at iters=2 stays >= 0.03 GB/s, make iters=2 the deep-level
    default (CPU-measured ratio: code-type 1.18x -> 1.14x native HC9)

Run: python experiments/enc_ext_ab.py [MB] [cpu]
"""
import functools
import os
import sys
import time

if "cpu" in sys.argv[1:]:
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402

if "cpu" in sys.argv[1:]:
    jax.config.update("jax_platforms", "cpu")

import zig_lz4_tpu.ops.jax_block as jb  # noqa: E402
from bench import make_corpus  # noqa: E402

BLK = 65536
MB = int(next((a for a in sys.argv[1:] if a.isdigit()), "16"))
B = 64

corpus = make_corpus(max(MB, 2))
nblocks = min(len(corpus) // BLK, (MB << 20) // BLK)
B = min(B, nblocks)
nblocks -= nblocks % B
blocks = np.frombuffer(corpus[:nblocks * BLK], np.uint8) \
    .reshape(nblocks, BLK)
lens = np.full(B, BLK, np.int32)
starts = np.zeros(B, np.int32)
dev_batches = [jax.device_put(blocks[i:i + B])
               for i in range(0, nblocks, B)]
dl, ds = jax.device_put(lens), jax.device_put(starts)
print(f"devices: {jax.devices()}  corpus {nblocks} x 64KB", flush=True)

LVLS = (9,) if "quick" in sys.argv[1:] else (9, 12)
ITERS = (0, 1) if "quick" in sys.argv[1:] else (0, 1, 2)
for lvl in LVLS:
    hc, deep = jb.level_params(lvl)
    for iters in ITERS:
        pool_save = jb._EXT_POOL
        if iters == 0:
            jb._EXT_POOL = 0
        else:
            jb._EXT_ITERS = iters
        enc = jax.jit(jax.vmap(functools.partial(
            jb._encode_block, blk=BLK, hc=hc, deep=deep)))
        import jax.numpy as jnp
        out, olen = enc(dev_batches[0], dl, ds)
        np.asarray(olen)            # compile + warm
        t_best = float("inf")
        tot = 0
        for _ in range(2):
            t0 = time.perf_counter()
            checks = []
            for db in dev_batches:
                _o, ol = enc(db, dl, ds)
                checks.append(jnp.sum(ol))
            tot = int(np.asarray(sum(checks)))
            t_best = min(t_best, time.perf_counter() - t0)
        jb._EXT_POOL = pool_save
        gbs = nblocks * BLK / t_best / 1e9
        print(f"L{lvl:2d} iters={iters}: {gbs:.4f} GB/s "
              f"({t_best / nblocks * 1e3:.3f} ms/blk)  ratio "
              f"{nblocks * BLK / tot:.4f}", flush=True)
