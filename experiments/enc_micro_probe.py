"""Decompose stage-1 (windows/sort/cand_at) and tune the greedy scan.

Run after sort_cost_probe; one chip, sequential.
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
from bench import make_corpus  # noqa: E402

B, BLK = 64, 65536
corpus = make_corpus(12)
blocks = np.frombuffer(corpus[:B * BLK], np.uint8).reshape(B, BLK)
db = jax.device_put(blocks)
dl = jax.device_put(np.full(B, BLK, np.int32))


def timeit(fn, *a):
    r = fn(*a)
    np.asarray(jax.tree_util.tree_leaves(r)[0][:, ::997])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(r)[0][:, ::997])
        ts.append(time.perf_counter() - t0)
    return min(ts) / B * 1e3


W = 8


def win_sort(data, n, ncand):
    i32 = jnp.int32
    blk = BLK
    idx = lax.broadcasted_iota(i32, (blk, 1), 0).squeeze(-1)
    b = jnp.where(idx < n, data.astype(jnp.int32), 0)
    ext = 4 * (W + 1)
    bp = jnp.pad(b.astype(jnp.uint32), (0, ext + 4))
    su = (bp[:blk + ext] | (bp[1:blk + ext + 1] << 8)
          | (bp[2:blk + ext + 2] << 16) | (bp[3:blk + ext + 3] << 24))
    s0 = jnp.where(idx > n - 4, jnp.uint32(0xFFFFFFFF), su[:blk])
    wins = [su[4 * k:4 * k + blk] for k in range(1, W + 1)]
    bb = jnp.pad(b.astype(jnp.uint32), (2, 2))
    wb16 = bb[:blk] | (bb[1:blk + 1] << 8)
    side = ((idx.astype(jnp.uint32) << 16) | wb16,)
    ops = lax.sort((s0,) + side + tuple(wins), num_keys=1,
                   is_stable=True)
    s0_s = ops[0]
    idx_s = (ops[1] >> 16).astype(i32)
    wb_s = ops[1] & 0xFFFF
    wins_s = ops[2:]
    if ncand == 0:
        return s0_s + idx_s.astype(jnp.uint32)
    t_pos = jnp.arange(blk, dtype=i32)
    acc = jnp.zeros((blk,), i32)
    for shift in range(1, ncand + 1):
        ok = ((t_pos >= shift) & (idx_s <= n - 4)
              & (jnp.roll(idx_s, shift) <= n - 4)
              & (s0_s == jnp.roll(s0_s, shift)))
        ck = jnp.roll(idx_s, shift)
        ok = ok & (idx_s - ck <= 65535)
        mlk = jnp.full((blk,), 4, i32)
        still = ok
        for wk in wins_s:
            prev = jnp.roll(wk, shift)
            x = wk ^ prev
            eq = x == 0
            pb = jnp.where((x & 0xFF) == 0,
                           jnp.where((x & 0xFFFF) == 0,
                                     jnp.where((x & 0xFFFFFF) == 0,
                                               3, 2), 1), 0)
            mlk = mlk + jnp.where(still & eq, 4, 0) \
                      + jnp.where(still & ~eq, pb.astype(i32), 0)
            still = still & eq
        bx = (wb_s ^ jnp.roll(wb_s, shift)).astype(jnp.int32)
        bk = jnp.where((bx & 0xFF00) != 0, 0, jnp.where(bx != 0, 1, 2))
        acc = acc + jnp.where(ok, ck + mlk + bk, 0)
    return acc


for ncand in (0, 1, 2):
    f = jax.jit(jax.vmap(functools.partial(win_sort, ncand=ncand)))
    print(f"windows+sort+{ncand} cand: {timeit(f, db, dl):.3f} ms/blk",
          flush=True)

# greedy scan tuning: synthetic E/is_match with realistic density
rng = np.random.default_rng(1)
E = np.minimum(np.arange(BLK) + rng.integers(4, 40, BLK), BLK)
M = rng.random(BLK) < 0.3
dE = jax.device_put(np.broadcast_to(E, (B, BLK)).astype(np.int32))
dM = jax.device_put(np.broadcast_to(M, (B, BLK)))


def greedy(Ev, Mv, K, UNROLL):
    steps = BLK // K
    Ec = Ev.reshape(steps, K)
    Mc = Mv.reshape(steps, K)
    base = jnp.arange(steps, dtype=jnp.int32) * K

    def gstep(endv, xs):
        e, m, b0 = xs
        sels = []
        for kk in range(K):
            s = m[kk] & (b0 + kk >= endv)
            endv = jnp.where(s, e[kk], endv)
            sels.append(s)
        return endv, jnp.stack(sels)

    _, selc = lax.scan(gstep, jnp.zeros((), jnp.int32), (Ec, Mc, base),
                       unroll=UNROLL)
    return selc.reshape(BLK)


for K, U in ((32, 8), (64, 8), (32, 16), (64, 16), (128, 8), (16, 32),
             (128, 16)):
    f = jax.jit(jax.vmap(functools.partial(greedy, K=K, UNROLL=U)))
    print(f"greedy K={K:3d} unroll={U:2d}: {timeit(f, dE, dM):.3f} "
          f"ms/blk", flush=True)
