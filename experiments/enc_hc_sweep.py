"""HC probe-depth sweep on the real chip: ratio + speed per level."""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import zig_lz4_tpu.ops.jax_block as jb  # noqa: E402
from bench import make_corpus  # noqa: E402

BLK = 65536
B = 64
corpus = make_corpus(12)
blocks = np.frombuffer(corpus[:B * BLK], np.uint8).reshape(B, BLK)
db = jax.device_put(blocks)
dl = jax.device_put(np.full(B, BLK, np.int32))
ds = jax.device_put(np.zeros(B, np.int32))

from zig_lz4_tpu import decompress_safe  # noqa: E402

for hc, W in ((0, 8), (2, 8), (8, 8)):
    fn = jax.jit(jax.vmap(functools.partial(jb._encode_block, blk=BLK,
                                            hc=hc, W=W)))
    out, olen = fn(db, dl, ds)
    total = float(np.asarray(jnp.sum(olen)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out, olen = fn(db, dl, ds)
        float(np.asarray(jnp.sum(olen)))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    o = np.asarray(out)
    ol = np.asarray(olen)
    for bi in (0, B // 2, B - 1):
        comp = bytes(o[bi][:int(ol[bi])])
        assert decompress_safe(comp, BLK) == blocks[bi].tobytes(), bi
    print(f"hc={hc} W={W}: {t/B*1e3:6.3f} ms/blk  {B*BLK/t/1e6:6.1f} "
          f"MB/s  ratio {B*BLK/total:.4f}  (roundtrip ok)", flush=True)
