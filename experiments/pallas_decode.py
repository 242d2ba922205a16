"""Pallas TPU decode kernel -- sequential per-block LZ4 reconstruction.

The XLA sort-based decoder (ops/jax_block.py) pays ~20 HBM-bound merge
passes per pointer-jumping round; this kernel instead runs the decode
the way the memory system likes it: the whole block lives in VMEM and
every sequence is a pair of rotated 128-byte-chunk copies:

  * literal run:  comp[lsrc : lsrc+lit]  -> out[op : op+lit]
  * match run:    out[op-off : ...]      -> out[op : op+ml]
    with the classic offset-doubling loop for self-overlapping matches
    (RLE: copy o bytes, then 2o, 4o, ... -- log rounds).

Unaligned byte addressing on the (8,128) vector layout is done with
dynamic lane rotations (pltpu.roll) + sublane dynamic slices -- the
only TPU-native way to move byte runs at arbitrary offsets.

One grid step per block; sequences come from the host/native token
parse (ops/jax_block.parse_sequences / native parse_blocks).  History
(dictionary / linked-mode) windows are not handled here -- the frame
layer falls back to the XLA or host decoder for those.

reference semantics: src/lz4.zig:89-251 (decompressGeneric).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zig_lz4_tpu.constants import compress_bound

__all__ = ["decode_blocks_pallas", "make_pallas_decoder",
           "pallas_available"]

_LANE = 128


@functools.lru_cache(maxsize=None)
def pallas_available() -> bool:
    """True when the TPU Mosaic compiler is usable (not CPU tests)."""
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def _kernel(nseq_ref, seq_ref, comp_ref, out_ref, *,
            crows: int, orows: int):
    """Decode one block.  comp_ref [crows+1, 128] i32 (bytes), out_ref
    [orows+1, 128] i32; seq_ref [ncap, 4] i32 in SMEM holding
    (lit_len, lit_src, match_len, offset) per sequence."""
    i32 = jnp.int32
    lane = lax.broadcasted_iota(i32, (1, _LANE), 1)
    lane2 = lax.broadcasted_iota(i32, (2, _LANE), 1)

    out_ref[:, :] = jnp.zeros((orows + 1, _LANE), i32)

    def read128(ref, s):
        """128 bytes starting at byte offset s -> [1, 128]."""
        r = s // _LANE
        c = s % _LANE
        two = ref[pl.ds(r, 2), :]
        rot = pltpu.roll(two, (_LANE - c) % _LANE, 1)
        return jnp.where(lane < _LANE - c, rot[0:1, :], rot[1:2, :])

    def write128(ref, d, vec, nv):
        """First nv bytes of vec [1,128] -> ref at byte offset d."""
        r = d // _LANE
        c = d % _LANE
        v = pltpu.roll(vec, c % _LANE, 1)
        v2 = jnp.concatenate([v, v], axis=0)
        row = lax.broadcasted_iota(i32, (2, _LANE), 0)
        # byte index within vec for each (row, lane); out-of-range
        # (negative or >= nv <= 128) slots keep the old value
        kk = row * _LANE + lane2 - c
        mask = (kk >= 0) & (kk < nv)
        two = ref[pl.ds(r, 2), :]
        ref[pl.ds(r, 2), :] = jnp.where(mask, v2, two)

    def copy_run(src_ref, s, d, length):
        """length bytes src_ref[s:] -> out_ref[d:] (no overlap within
        any 128-byte chunk; caller guarantees)."""
        nch = (length + _LANE - 1) // _LANE

        def body(i, _):
            chunk = read128(src_ref, s + i * _LANE)
            write128(out_ref, d + i * _LANE, chunk,
                     jnp.minimum(_LANE, length - i * _LANE))
            return 0

        lax.fori_loop(0, nch, body, 0)

    def seq_body(q, op):
        litl = seq_ref[q, 0]
        lsrc = seq_ref[q, 1]
        mlen = seq_ref[q, 2]
        off = seq_ref[q, 3]

        copy_run(comp_ref, lsrc, op, litl)       # no-op when litl == 0
        op = op + litl

        # match copy with offset doubling for self-overlap
        def mcond(st):
            return st[1] > 0

        def mbody(st):
            mop, rem, avail = st
            c = jnp.minimum(rem, avail)
            copy_run(out_ref, mop - avail, mop, c)
            return mop + c, rem - c, avail + c

        mop, _, _ = lax.while_loop(
            mcond, mbody, (op, jnp.maximum(mlen, 0), jnp.maximum(off, 1)))
        return mop

    nseq = nseq_ref[0, 0]
    lax.fori_loop(0, nseq, seq_body, jnp.int32(0))


@functools.lru_cache(maxsize=None)
def make_pallas_decoder(blk: int, ncap: int, interpret: bool = False):
    """Batched Pallas decoder: fn(comp u8[B, ccap], lit/lsrc/ml/off
    i32[B, ncap], nseq i32[B]) -> out u8[B, blk].

    Output length = sum(lit) + sum(ml) per block -- computed by the
    caller from the parse; bytes past it are zero."""
    ccap = compress_bound(blk)
    crows = -(-ccap // _LANE)
    orows = -(-blk // _LANE)

    kern = functools.partial(_kernel, crows=crows, orows=orows)

    def call(comp, lit, lsrc, ml, off, nseq):
        B = comp.shape[0]
        comp_i = jnp.zeros((B, crows + 1, _LANE), jnp.int32)
        comp_i = comp_i.at[:, :crows, :].set(
            jnp.pad(comp.astype(jnp.int32),
                    ((0, 0), (0, crows * _LANE - ccap))).reshape(
                B, crows, _LANE))
        nseq2 = nseq.reshape(B, 1, 1).astype(jnp.int32)
        seqs = jnp.stack([lit, lsrc, ml, off], axis=-1)  # [B, ncap, 4]

        out = pl.pallas_call(
            kern,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((None, 1, 1), lambda b: (b, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((None, ncap, 4), lambda b: (b, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((None, crows + 1, _LANE),
                             lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((None, orows + 1, _LANE),
                                   lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, orows + 1, _LANE),
                                           jnp.int32),
            interpret=interpret,
        )(nseq2, seqs, comp_i)
        return out[:, :orows, :].reshape(B, orows * _LANE)[:, :blk] \
            .astype(jnp.uint8)

    return jax.jit(call)


#: blocks per pallas_call -- keeps XLA's scoped VMEM stack within the
#: 16MB v5e budget (all call operands are stack-allocated)
_BCHUNK = 4


def decode_blocks_pallas(comp_blocks, lit, lsrc, ml, off, nseq,
                         blk: int, interpret: bool | None = None):
    """Decode a batch of independent blocks with the Pallas kernel.

    Returns (out uint8[B, blk], out_len int64[B]).  out_len comes from
    the parse (sum of literal+match lengths)."""
    if interpret is None:
        interpret = not pallas_available()
    lit = np.asarray(lit)
    nseq = np.asarray(nseq)
    B, ncap_full = lit.shape
    # right-size the sequence axis to the batch's real maximum: cuts
    # VMEM footprint and host->device bytes by ~3-4x on typical data
    used = max(int(nseq.max()) if B else 1, 1)
    ncap = min(-(-used // 512) * 512, ncap_full)
    fn = make_pallas_decoder(blk, ncap, interpret)
    outs = []
    for b0 in range(0, B, _BCHUNK):
        b1 = min(b0 + _BCHUNK, B)
        outs.append(fn(comp_blocks[b0:b1], lit[b0:b1, :ncap],
                       np.asarray(lsrc)[b0:b1, :ncap],
                       np.asarray(ml)[b0:b1, :ncap],
                       np.asarray(off)[b0:b1, :ncap], nseq[b0:b1]))
    out = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    qs = np.arange(ncap_full)[None, :] < nseq[:, None]
    out_len = (np.where(qs, lit, 0).sum(1)
               + np.where(qs, np.asarray(ml), 0).sum(1)).astype(np.int64)
    return out, out_len
