import time
import numpy as np
import jax, jax.numpy as jnp
import zig_lz4_tpu.ops.jax_block as jb
from zig_lz4_tpu.native import native_compress_blocks, native_resolve_blocks
from zig_lz4_tpu.constants import compress_bound
from bench import make_corpus

BLK = 65536
B = 64
corpus = make_corpus(12)
blocks = np.frombuffer(corpus[:B*BLK], np.uint8).reshape(B, BLK)
dst, outl = native_compress_blocks(blocks, np.full(B, BLK, np.int64))
offs = np.zeros(B, np.int64); offs[1:] = np.cumsum(outl)[:-1]
payl = b"".join(dst[i, :outl[i]].tobytes() for i in range(B))
ccap = compress_bound(BLK)
comp = np.zeros((B, ccap), np.uint8)
for i in range(B):
    comp[i, :outl[i]] = dst[i, :outl[i]]

for FCAP in (8192, 32768):
    r = native_resolve_blocks(payl, offs, outl, FCAP)
    fdst, flen, fsrc, fper, fph, nfrag, rounds, olens = r
    ok = (nfrag >= 0) & (rounds <= 2)
    idx = np.where(ok)[0]
    sel = np.resize(idx, B)   # pad by cycling eligible blocks
    args = tuple(jax.device_put(a[sel]) for a in
                 (comp, fdst, fsrc, fper, fph, nfrag)) + (
        jax.device_put(olens[sel].astype(np.int32)),)
    dec = jb._batched_frag_decoder(BLK, FCAP, 2)
    o = dec(*args); float(np.asarray(jnp.sum(o[:, ::997].astype(jnp.int32))))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        o = dec(*args)
        float(np.asarray(jnp.sum(o[:, ::997].astype(jnp.int32))))
        ts.append(time.perf_counter() - t0)
    print(f"FCAP={FCAP}: eligible {len(idx)}/{B}; batch64 decode "
          f"{min(ts)*1e3:.0f} ms = {min(ts)/B*1e3:.2f} ms/blk")
