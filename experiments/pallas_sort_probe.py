"""Feasibility probe: VMEM-resident bitonic sort as a Pallas kernel.

XLA's TPU sort is an HBM-bound bitonic network (~0.15 ms per operand
per 64K block at batch 64 -- the dominant cost of the whole codec).
A kernel that keeps the array in VMEM pays VPU cost only.  This probe
measures a key+payload bitonic sort of 64K int32 built from static
unrolled stages:

  * lane-dim butterflies (distance < 128): two static lane rolls +
    select per stage;
  * sublane-dim butterflies (distance >= 128): row-block swaps via
    static slicing.

Run on the TPU:  python experiments/pallas_sort_probe.py

MEASURED RESULT (v5e, 2026-08-16): correct; 2.08 ms/sort vs XLA's
3.44 ms/sort single-instance (1.65x) -- but the codec runs sorts
BATCHED, where XLA's bitonic amortizes to ~0.06 ms per 64K row at
batch 64, ~7x faster than this kernel per block.  A VMEM-resident
Pallas sort is therefore NOT the round-2 lever unless it can batch
multiple blocks per kernel instance; kept as a negative result.
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
ROWS = 512                  # 64K elements
N = ROWS * LANE


def _partner(x, d):
    """x's butterfly partner at XOR-distance d on the [ROWS, LANE]
    row-major layout, via static rolls/slices only."""
    if d < LANE:
        lane = lax.broadcasted_iota(jnp.int32, (ROWS, LANE), 1)
        left = pltpu.roll(x, LANE - d, 1)    # x[l + d]
        right = pltpu.roll(x, d, 1)          # x[l - d]
        return jnp.where((lane & d) == 0, left, right)
    dr = d // LANE
    up = jnp.concatenate([x[dr:], x[:dr]], axis=0)      # x[r + dr]
    down = jnp.concatenate([x[-dr:], x[:-dr]], axis=0)  # x[r - dr]
    row = lax.broadcasted_iota(jnp.int32, (ROWS, LANE), 0)
    return jnp.where((row & dr) == 0, up, down)


def _kernel(kin_ref, vin_ref, kout_ref, vout_ref):
    g = (lax.broadcasted_iota(jnp.int32, (ROWS, LANE), 0) * LANE
         + lax.broadcasted_iota(jnp.int32, (ROWS, LANE), 1))
    k = kin_ref[:, :]
    v = vin_ref[:, :]
    nbits = N.bit_length() - 1
    for kk in range(1, nbits + 1):
        for j in range(kk - 1, -1, -1):
            d = 1 << j
            pk = _partner(k, d)
            pv = _partner(v, d)
            asc = (g & (1 << kk)) == 0 if kk < nbits else \
                jnp.ones_like(g, dtype=bool)
            lower = (g & d) == 0
            want_min = lower == asc
            # Mosaic cannot select between i1 vectors; go through i32
            take_partner = jnp.where(
                want_min, (pk < k).astype(jnp.int32),
                (pk > k).astype(jnp.int32)) == 1
            k = jnp.where(take_partner, pk, k)
            v = jnp.where(take_partner, pv, v)
    kout_ref[:, :] = k
    vout_ref[:, :] = v


@functools.lru_cache(maxsize=None)
def pallas_sort2():
    return pl.pallas_call(
        _kernel,
        out_shape=(jax.ShapeDtypeStruct((ROWS, LANE), jnp.int32),
                   jax.ShapeDtypeStruct((ROWS, LANE), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
    )


def main():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 1 << 30, N).astype(np.int32)
    vals = np.arange(N, dtype=np.int32)
    k2 = keys.reshape(ROWS, LANE)
    v2 = vals.reshape(ROWS, LANE)

    f = jax.jit(lambda a, b: pallas_sort2()(a, b))
    t0 = time.perf_counter()
    ko, vo = f(k2, v2)
    ko_np = np.asarray(ko).reshape(-1)
    vo_np = np.asarray(vo).reshape(-1)
    print(f"compile+run: {time.perf_counter() - t0:.1f}s")

    ref_order = np.argsort(keys, kind="stable")
    assert (ko_np == keys[ref_order]).all(), "keys not sorted"
    # payload correctness: keys[vo] must equal sorted keys
    assert (keys[vo_np] == ko_np).all(), "payload permutation wrong"
    print("correct")

    # timed: 20-sort dependency chain inside one jit amortizes the
    # ~50ms tunnel round-trip latency out of the measurement
    REPS = 20
    srt = pallas_sort2()

    @jax.jit
    def g(a, b):
        def body(i, st):
            ka, va = srt(st[0] ^ i, st[1])
            return (ka, va)
        return lax.fori_loop(0, REPS, body, (a, b))
    np.asarray(g(k2, v2)[0])
    best = 9e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = g(k2, v2)
        np.asarray(r[0][::97])
        best = min(best, time.perf_counter() - t0)
    print(f"pallas bitonic 64K key+payload: {best/REPS*1e3:.3f} ms/sort")

    @jax.jit
    def h(a, b):
        a = a.reshape(-1)
        b = b.reshape(-1)
        def body(i, st):
            ka, va = lax.sort((st[0] ^ i, st[1]), num_keys=1)
            return (ka, va)
        return lax.fori_loop(0, REPS, body, (a, b))
    np.asarray(h(k2, v2)[0])
    best_x = 9e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = h(k2, v2)
        np.asarray(r[0][::97])
        best_x = min(best_x, time.perf_counter() - t0)
    print(f"XLA sort 64K key+payload:      {best_x/REPS*1e3:.3f} ms/sort")
    print(f"speedup: {best_x / best:.2f}x")


if __name__ == "__main__":
    main()
