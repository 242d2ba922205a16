"""Frontier-size simulation for the chase decoder's (dense, qcap) knobs.

The chase decoder runs `dense` full-width composition merges, then
compacts the still-unconverged bytes into a qcap-slot pool for the
remaining doublings.  The pool must hold EVERY unconverged byte of a
block or the block self-flags to the host -- so the config question
is: after d dense doublings, how many bytes are still unconverged
(per block, worst case)?

This is a pure numpy replay of the decoder's position iteration on
REAL resolver fragments of device-encoded streams -- no chip, no JAX
in the loop.  For each block it builds every byte's one-hop source T
(merge A semantics), then composes T with itself, recording the
unconverged count after each doubling.

Run: python experiments/chase_depth_sim.py [mb] [level] [cpu]
"""
import functools
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
if "cpu" in sys.argv[1:]:
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402
if "cpu" in sys.argv[1:]:
    jax.config.update("jax_platforms", "cpu")

import zig_lz4_tpu.ops.jax_block as jb  # noqa: E402
from zig_lz4_tpu.native import native_resolve_blocks  # noqa: E402
from zig_lz4_tpu.parallel.sharded import _FRAG_SPLIT_MAX  # noqa: E402
from bench import make_corpus  # noqa: E402

BLK = 65536
B = 16
args = [a for a in sys.argv[1:] if a.isdigit()]
MB = int(args[0]) if args else 8
LEVEL = int(args[1]) if len(args) > 1 else 9
corpus = make_corpus(MB)
nb = len(corpus) // BLK // B * B
blocks = np.frombuffer(corpus[:nb * BLK], np.uint8).reshape(nb, BLK)
print(f"{nb} blocks, level {LEVEL}", flush=True)

hc, deep = jb.level_params(LEVEL)
fn = jax.jit(jax.vmap(functools.partial(jb._encode_block, blk=BLK,
                                        hc=hc, deep=deep)))
dl = np.full(B, BLK, np.int32)
ds = np.zeros(B, np.int32)
payloads = bytearray()
offs = np.zeros(nb, np.int64)
lens64 = np.zeros(nb, np.int64)
pos = 0
for i in range(0, nb, B):
    o, l = fn(blocks[i:i + B], dl, ds)
    on, ln = np.asarray(o), np.asarray(l)
    for k in range(B):
        offs[i + k] = pos
        lens64[i + k] = int(ln[k])
        payloads += on[k, :int(ln[k])].tobytes()
        pos += int(ln[k])
print(f"encoded, ratio {nb * BLK / pos:.3f}", flush=True)

r = native_resolve_blocks(bytes(payloads), offs, lens64, BLK,
                          out_cap=BLK, split_max=_FRAG_SPLIT_MAX,
                          round_limit=64)
fdst, flen, fsrc, fper, fph, nfrag, rounds, olens = r
okb = np.where(nfrag >= 0)[0]
print(f"resolved {len(okb)}/{nb}", flush=True)

# frontier size per block after d in 0..6 doublings
D = 7
fronts = np.zeros((len(okb), D + 1), np.int64)
j = np.arange(BLK)
for row, bi in enumerate(okb):
    nf = int(nfrag[bi])
    # merge A replay: T per byte (output-space for PER, -1 = converged)
    T = np.full(BLK, -1, np.int64)
    for q in range(nf):
        d0, ln_, s0, p, h = (int(fdst[bi, q]), int(flen[bi, q]),
                             int(fsrc[bi, q]), int(fper[bi, q]),
                             int(fph[bi, q]))
        if p > 0:
            k = np.arange(ln_)
            T[d0:d0 + ln_] = s0 + (h + k) % p
    live = j < int(olens[bi])
    nx = np.where(live, T, -1)
    fronts[row, 0] = (nx >= 0).sum()
    for d in range(1, D + 1):
        unc = nx >= 0
        if not unc.any():
            break
        # POINTER DOUBLING: compose nx with the CURRENT nx (a
        # converged target's -1 plays the comp-space fixpoint: one
        # composition through it converges us too)
        prev = nx.copy()
        tgt = prev[unc]
        nx[unc] = prev[tgt]
        fronts[row, d] = (nx >= 0).sum()

hdr = "d:      " + "".join(f"{d:>9d}" for d in range(D + 1))
print(hdr)
for name, f in (("p50", np.percentile(fronts, 50, axis=0)),
                ("p90", np.percentile(fronts, 90, axis=0)),
                ("p99", np.percentile(fronts, 99, axis=0)),
                ("max", fronts.max(axis=0))):
    print(f"{name} :   " + "".join(f"{int(v):>9d}" for v in f),
          flush=True)
# blocks that fit a qcap pool after d dense rounds
for qcap in (4096, 8192, 16384):
    line = f"fit q={qcap:5d}: "
    for d in range(D + 1):
        line += f"{(fronts[:, d] <= qcap).mean():>9.3f}"
    print(line, flush=True)
