import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import zig_lz4_tpu.ops.jax_block as jb
from zig_lz4_tpu.native import native_compress_blocks, native_parse_blocks
from zig_lz4_tpu.constants import compress_bound
from bench import make_corpus

BLK = 65536
B = 24
corpus = make_corpus(4)
blocks = np.frombuffer(corpus[:B*BLK], np.uint8).reshape(B, BLK)
dst, outl = native_compress_blocks(blocks, np.full(B, BLK, np.int64))
offs = np.zeros(B, np.int64); offs[1:] = np.cumsum(outl)[:-1]
payl = b"".join(dst[i, :outl[i]].tobytes() for i in range(B))
ncap = jb.MAX_SEQS(BLK)
lit, lsrc, ml, off, ns = native_parse_blocks(payl, offs, outl, ncap)
ccap = compress_bound(BLK)
comp = np.zeros((B, ccap), np.uint8)
for i in range(B):
    comp[i, :outl[i]] = dst[i, :outl[i]]
hists = np.zeros((B, 1), np.uint8)
dec = jb._batched_decoder(BLK, ncap)
o, ol = dec(comp, hists, lit, lsrc, ml, off, ns)
o = np.asarray(o)
bad = []
for i in range(B):
    if o[i].tobytes() != blocks[i].tobytes():
        d = next((t for t in range(BLK) if o[i, t] != blocks[i, t]), -1)
        bad.append((i, d))
print("pointer-jump mismatches:", bad if bad else "NONE (all 24 correct)")
