"""Tier study for the CHASE decoder: fragment/round statistics of
device-encoded streams under a RELAXED resolver round budget.

The linear-round decoders cap chain depth at 8-12, so the resolver
splits fragments aggressively (split cost) and deep blocks fall to
the host (eligibility cost).  The chase decoder reaches depth
2^(dense+doublings) = 64 by default, letting the resolver keep
natural chains -- this probe measures, per compression level, how
nfrag/rounds distribute under round_limit=64 and which (fcap, depth)
single-tier configs would take which fraction of blocks.

Host-side study (resolver is native C++); the encode itself runs on
whatever backend is available.

Run: python experiments/chase_tier_study.py [mb] [cpu] [level]
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

import zig_lz4_tpu.ops.jax_block as jb  # noqa: E402
from zig_lz4_tpu.ops.jax_block import level_params  # noqa: E402
from zig_lz4_tpu.native import native_resolve_blocks  # noqa: E402
from zig_lz4_tpu.parallel.sharded import _FRAG_SPLIT_MAX  # noqa: E402
from bench import make_corpus  # noqa: E402

BLK = 65536
B = 16
args = [a for a in sys.argv[1:] if a.isdigit()]
MB = int(args[0]) if args else 12
LEVEL = int(args[1]) if len(args) > 1 else 9
corpus = make_corpus(MB)
nb = len(corpus) // BLK // B * B
blocks = np.frombuffer(corpus[:nb * BLK], np.uint8).reshape(nb, BLK)
print(f"{nb} blocks of 64KB, level {LEVEL}", flush=True)

hc, deep = level_params(LEVEL)
fn = jax.jit(jax.vmap(functools.partial(jb._encode_block, blk=BLK,
                                        hc=hc, deep=deep)))
dl = np.full(B, BLK, np.int32)
ds = np.zeros(B, np.int32)
payloads = bytearray()
offs = np.zeros(nb, np.int64)
lens64 = np.zeros(nb, np.int64)
pos = 0
t0 = time.perf_counter()
for i in range(0, nb, B):
    o, l = fn(blocks[i:i + B], dl, ds)
    on, ln = np.asarray(o), np.asarray(l)
    for k in range(B):
        offs[i + k] = pos
        lens64[i + k] = int(ln[k])
        payloads += on[k, :int(ln[k])].tobytes()
        pos += int(ln[k])
print(f"encoded in {time.perf_counter() - t0:.0f}s, "
      f"ratio {nb * BLK / pos:.3f}", flush=True)

for rl, sm in ((12, _FRAG_SPLIT_MAX), (64, _FRAG_SPLIT_MAX), (64, 24)):
    fcap_hi = BLK
    r = native_resolve_blocks(bytes(payloads), offs, lens64, fcap_hi,
                              out_cap=BLK, split_max=sm,
                              round_limit=rl)
    fdst, flen, fsrc, fper, fph, nfrag, rounds, olens = r
    okb = nfrag >= 0
    nf = nfrag[okb]
    rd = rounds[okb]
    print(f"\nround_limit={rl} split_max={sm}: resolved "
          f"{okb.sum()}/{nb}", flush=True)
    print(f"  nfrag p50/p90/p99/max: {np.percentile(nf, 50):.0f}/"
          f"{np.percentile(nf, 90):.0f}/{np.percentile(nf, 99):.0f}/"
          f"{nf.max()}", flush=True)
    print(f"  rounds p50/p90/p99/max: {np.percentile(rd, 50):.0f}/"
          f"{np.percentile(rd, 90):.0f}/{np.percentile(rd, 99):.0f}/"
          f"{rd.max()}", flush=True)
    for fcap_t in (BLK // 8, BLK // 4, BLK // 2, BLK):
        for depth in (16, 64):
            frac = float((okb & (nfrag <= fcap_t)
                          & (rounds <= depth)).sum()) / nb
            print(f"  fcap={fcap_t:6d} depth<={depth:3d}: "
                  f"{frac:.3f}", flush=True)
