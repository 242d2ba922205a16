"""On-chip A/B of the round-5 deep-level rank restructure (8-key
Manber-Myers doubling rounds, first rank straight off the byte
windows: 4 rank sorts at L12 instead of 6, 2 at L11 instead of 4).

Measures device encode rate + ratio for levels 10/11/12 on the bench
corpus (B=64, min-of-2, async dispatch + one sync) for comparison
against the round-4 record (BENCH_r04: device_l12_encode_gbs 0.0181,
ratio 3.317; CHIP_QUEUE round-4 L12 stage profile: group-sort+cand
38% of 5.69 ms/blk).  Run: python experiments/enc_rank8_chip.py [mb]
"""
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
dev_lens = jax.device_put(np.full(B, BLK, np.int32))
dev_starts = jax.device_put(np.zeros(B, np.int32))

for level in (10, 11, 12):
    hc, deep = jb.level_params(level)
    enc = jb._batched_encoder(BLK, hc, deep)
    _o, _l = enc(dev_blocks[0], dev_lens, dev_starts)
    np.asarray(_l)                       # compile
    t_best = float("inf")
    clen = 0
    for _ in range(2):
        t0 = time.perf_counter()
        checks = []
        for db in dev_blocks:
            _out, olen = enc(db, dev_lens, dev_starts)
            checks.append(jnp.sum(olen))
        clen = int(np.asarray(sum(checks)))
        t_best = min(t_best, time.perf_counter() - t0)
    print(f"L{level}: {n/t_best/1e9:.4f} GB/s  ratio {n/clen:.3f}  "
          f"({t_best/nb*1e3:.2f} ms/blk)", flush=True)
