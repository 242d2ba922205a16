"""Window-count (_W) sweep on the real chip: encode speed + ratio."""
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

for W in (2, 4, 8):
    fn = jax.jit(jax.vmap(functools.partial(jb._encode_block, blk=BLK,
                                            W=W)))
    out, olen = fn(db, dl, ds)
    total = float(np.asarray(jnp.sum(olen)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out, olen = fn(db, dl, ds)
        float(np.asarray(jnp.sum(olen)))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"W={W}: {t/B*1e3:6.3f} ms/blk  {B*BLK/t/1e6:6.1f} MB/s  "
          f"ratio {B*BLK/total:.4f}", flush=True)
    # spot round-trip
    from zig_lz4_tpu import decompress_safe
    o = np.asarray(out)
    ol = np.asarray(olen)
    for bi in (0, B // 2, B - 1):
        comp = bytes(o[bi][:int(ol[bi])])
        assert decompress_safe(comp, BLK) == blocks[bi].tobytes(), bi
    print("   roundtrip ok", flush=True)
