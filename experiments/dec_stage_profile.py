"""Per-stage timing of the fragment device decoder on the real chip.

Stages: 1 mergeA-fill  2 +extract  3 +mergeB-literals  0 full(+rounds).
Sweeps fcap and rounds to cost the capped-split resolver settings.
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import zig_lz4_tpu.ops.jax_block as jb  # noqa: E402
from zig_lz4_tpu.constants import compress_bound  # noqa: E402
from zig_lz4_tpu.native import (  # noqa: E402
    native_compress_blocks, native_resolve_blocks)
from bench import make_corpus  # noqa: E402

BLK = 65536
B = 64
corpus = make_corpus(24)
nb_all = len(corpus) // BLK
blocks = np.frombuffer(corpus[:nb_all * BLK], np.uint8).reshape(
    nb_all, BLK)
dst, outl = native_compress_blocks(blocks, np.full(nb_all, BLK,
                                                   np.int64))
offs = np.zeros(nb_all, np.int64)
offs[1:] = np.cumsum(outl)[:-1]
payl = b"".join(dst[i, :outl[i]].tobytes() for i in range(nb_all))
ccap = compress_bound(BLK)
comp = np.zeros((nb_all, ccap), np.uint8)
for i in range(nb_all):
    comp[i, :outl[i]] = dst[i, :outl[i]]

for FCAP, SM, RL in ((8192, 4, 2), (32768, 4, 8), (32768, 8, 4)):
    r = native_resolve_blocks(payl, offs, outl, FCAP, BLK, 0, SM, RL)
    fdst, flen, fsrc, fper, fph, nfrag, rounds, olens = r
    ok = (nfrag >= 0) & (rounds <= RL)
    idx = np.where(ok)[0]
    print(f"FCAP={FCAP} sm={SM} rl={RL}: eligible {len(idx)}/{nb_all} "
          f"rounds max {rounds[idx].max() if len(idx) else -1}",
          flush=True)
    sel = np.resize(idx, B)
    args = tuple(jax.device_put(a[sel]) for a in
                 (comp, fdst, fsrc, fper, fph, nfrag)) + (
        jax.device_put(olens[sel].astype(np.int32)),)
    prev = 0.0
    for stage in (1, 2, 3, 0):
        fn = jax.jit(jax.vmap(functools.partial(
            jb._decode_block_frags, blk=BLK, fcap=FCAP, rounds=RL,
            stage=stage)))
        o = fn(*args)
        np.asarray(o[:, ::997])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            o = fn(*args)
            float(np.asarray(jnp.sum(o[:, ::997].astype(jnp.int32))))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        name = {1: "mergeA", 2: "+extract", 3: "+mergeB-lit",
                0: f"FULL(+{RL} rounds)"}[stage]
        print(f"  stage {stage} ({name:16s}): {t/B*1e3:6.3f} ms/blk "
              f"delta {max(t-prev,0)/B*1e3:6.3f}", flush=True)
        if stage:
            prev = t
    # verify one
    o = np.asarray(jax.jit(jax.vmap(functools.partial(
        jb._decode_block_frags, blk=BLK, fcap=FCAP, rounds=RL)))(*args))
    bi = int(sel[0])
    assert o[0][:BLK].tobytes() == blocks[bi].tobytes(), "decode FAIL"
    print("  roundtrip ok", flush=True)
