"""A/B ratio probe: one-step vs two-step HC lazy deferral.

Ratio is platform-independent (the encoder is deterministic JAX), so
this probe runs fine on CPU; speed numbers only matter on-chip.

Run: python experiments/enc_lazy2_probe.py [mb] [cpu] [level]
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import os
if "cpu" in sys.argv[1:]:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import zig_lz4_tpu.ops.jax_block as jb  # noqa: E402
from zig_lz4_tpu.ops.jax_block import level_params  # noqa: E402
from zig_lz4_tpu import decompress_safe  # noqa: E402
from bench import make_corpus  # noqa: E402

BLK = 65536
B = 16
args = [a for a in sys.argv[1:] if a.isdigit()]
MB = int(args[0]) if args else 6
LEVEL = int(args[1]) if len(args) > 1 else 9
corpus = make_corpus(MB)
nb = len(corpus) // BLK // B * B
blocks = np.frombuffer(corpus[:nb * BLK], np.uint8).reshape(nb, BLK)
print(f"{nb} blocks of 64KB, level {LEVEL}", flush=True)

hc, deep = level_params(LEVEL)
dl = np.full(B, BLK, np.int32)
ds = np.zeros(B, np.int32)

for lazy2 in (False, True):
    jb._LAZY2 = lazy2
    fn = jax.jit(jax.vmap(functools.partial(jb._encode_block, blk=BLK,
                                            hc=hc, deep=deep)))
    total = 0
    t0 = time.perf_counter()
    for i in range(0, nb, B):
        o, l = fn(blocks[i:i + B], dl, ds)
        ln = np.asarray(l)
        total += int(ln.sum())
        if i == 0:      # verify one block per variant
            comp = np.asarray(o)[0, :int(ln[0])].tobytes()
            assert decompress_safe(comp, BLK) == blocks[i].tobytes()
    t = time.perf_counter() - t0
    print(f"lazy2={int(lazy2)}: ratio {nb * BLK / total:.4f} "
          f"({total} bytes, {t:.1f}s)", flush=True)
