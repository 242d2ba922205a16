"""On-chip A/B of the greedy-parse scan chunking knobs (round 5).

The parse scan's cost is op-DISPATCH on small [B] carries (round-2
cost model); total op count is fixed at ~3 ops/position regardless of
chunking, so raising _K (positions/step) or _UNROLL (steps fused per
scan iteration) only reduces dispatched iterations:
  (K=32, unroll=8)  -> 256 iterations/block (shipping default)
  (K=64, unroll=16) -> 64  iterations/block
Output bytes are IDENTICAL by construction (chunking does not change
selection semantics); this just measures wall + compile sanity at
L0 and L9.  Run: python experiments/enc_scan_chunk_ab.py [mb]
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import zig_lz4_tpu.ops.jax_block as jb  # noqa: E402
from bench import make_corpus  # noqa: E402

BLK = 65536
B = 64
MB = int(sys.argv[1]) if len(sys.argv) > 1 else 12
corpus = make_corpus(MB)
nb = len(corpus) // BLK // B * B
n = nb * BLK
blocks = np.frombuffer(corpus[:n], np.uint8).reshape(nb, BLK)
print(f"{nb} blocks ({n/1e6:.1f} MB), B={B}", flush=True)

dev_blocks = [jax.device_put(blocks[i:i + B]) for i in range(0, nb, B)]
dl = jax.device_put(np.full(B, BLK, np.int32))
ds = jax.device_put(np.zeros(B, np.int32))

for lvl in (9, 0):
    hc, deep = jb.level_params(lvl) if lvl else (0, 0)
    base = None
    for K, UR in ((32, 8), (32, 16), (64, 8), (64, 16)):
        jb._K, jb._UNROLL = K, UR
        enc = jax.jit(jax.vmap(functools.partial(
            jb._encode_block, blk=BLK, hc=hc, deep=deep)))
        _o, _l = enc(dev_blocks[0], dl, ds)
        np.asarray(_l)
        t_best = float("inf")
        clen = 0
        for _ in range(2):
            t0 = time.perf_counter()
            checks = []
            for db in dev_blocks:
                _out, olen = enc(db, dl, ds)
                checks.append(jnp.sum(olen))
            clen = int(np.asarray(sum(checks)))
            t_best = min(t_best, time.perf_counter() - t0)
        if base is None:
            base = clen
        tag = "BASE" if (K, UR) == (32, 8) else \
            ("SAME" if clen == base else f"DIFF({clen - base:+d}B!)")
        print(f"L{lvl} K={K} unroll={UR}: {n/t_best/1e9:.4f} GB/s "
              f"({t_best/nb*1e3:.2f} ms/blk)  clen {tag}", flush=True)
jb._K, jb._UNROLL = 32, 8
