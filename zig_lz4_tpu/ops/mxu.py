"""MXU-routed data-movement primitives.

TPUs execute XLA's generic gather at ~100M elements/s (measured on
v5e: ~19 ms for 2M int32 elements), which would dominate every phase
of the codec.  The systolic array, however, is idle -- so arbitrary
gathers are reformulated as one-hot bf16 matmuls:

    y[q] = table[idx[q]]
         = sum_r onehot(idx[q] div C == r) * table_rows[r]   (MXU)
           then a lane select over C columns                 (VPU)

bf16 represents integers 0..256 exactly and f32 accumulation of <= R
one-hot terms is exact, so gathering byte planes and recombining gives
bit-exact int32 gathers at MXU speed: measured ~0.3 ms per 2M-element
byte-plane -- a ~20-60x speedup over the native gather.  FLOP cost is
Q x N per plane, so this wins whenever Q*N*planes / MXU_flops beats
Q * 9ns; for the codec's table sizes (16K-128K) it always does on TPU.

On CPU (tests) the same code runs through XLA's dot -- slower than a
native gather but correct; `fast_gather` switches to jnp.take there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["fast_gather", "use_mxu_gather"]

_LANES = 128


@functools.lru_cache(maxsize=None)
def use_mxu_gather() -> bool:
    """MXU routing on TPU-like backends; plain gather elsewhere."""
    try:
        plat = jax.default_backend()
    except Exception:
        return False
    return plat not in ("cpu",)


def _mxu_gather(table, idx, nbytes: int):
    n = table.shape[0]
    q = idx.shape[0]
    c = _LANES
    r = -(-n // c)
    t = jnp.pad(table.astype(jnp.int32), (0, r * c - n))
    # byte planes interleaved along the lane axis: [R, C*nbytes]
    planes = [(t >> (8 * k)) & 0xFF for k in range(nbytes)]
    mat = jnp.stack([p.reshape(r, c) for p in planes], axis=-1)
    mat = mat.reshape(r, c * nbytes).astype(jnp.bfloat16)

    grow = idx // c
    gcol = idx % c
    onehot = (grow[:, None]
              == jnp.arange(r, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
    rows = jax.lax.dot_general(
        onehot, mat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # [Q, C*nbytes]
    rows = rows.reshape(q, c, nbytes)
    colsel = gcol[:, None] == jnp.arange(c, dtype=jnp.int32)[None, :]
    picked = jnp.sum(jnp.where(colsel[:, :, None], rows, 0.0),
                     axis=1).astype(jnp.int32)     # [Q, nbytes]
    y = picked[:, 0]
    for k in range(1, nbytes):
        y = y | (picked[:, k] << (8 * k))
    return y


def fast_gather(table, idx, nbytes: int = 4):
    """Exact y[q] = table[clip(idx[q])] for non-negative int32 values
    representable in ``nbytes`` bytes.  1-D table and indices; vmap
    for batching.  Uses the MXU one-hot path on TPU, jnp.take on CPU.
    """
    idx = jnp.clip(idx, 0, table.shape[0] - 1)
    if not use_mxu_gather():
        return jnp.take(table.astype(jnp.int32), idx)
    return _mxu_gather(table, idx, nbytes)
