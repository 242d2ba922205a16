"""TPU-native LZ4 block codec -- vectorized JAX/XLA implementation.

This is NOT a port of the reference's serial loops.  LZ4 coding is
re-cast onto the primitives this TPU actually executes fast, chosen
from on-chip measurements (v5e, forced-transfer timing):

  * lax.sort        ~1.1 Gelem/s at batch 128 and nearly independent
                    of operand count -> the workhorse.
  * cumsum/cummax   ~3.7 Gelem/s    -> forward/backward fills.
  * elementwise/roll  fast          -> everything else.
  * gather/scatter  ~0.1 Gelem/s in EVERY formulation (XLA native and
                    one-hot-MXU alike) -> banned from the hot path.

The codec is therefore built **gather-free**: every data-dependent
data movement is a sort (grouping, compaction, merging) or a packed
cummax forward-fill (broadcasting per-sequence fields to bytes).

ENCODE (``make_block_encoder``), per block, vmapped over blocks:
  1. ONE stable sort by the 4-byte string groups every position with
     its nearest previous occurrences (collision-free hash table).
     Extra u32 windows at i+4..i+4W and a backward window at i-4 ride
     along as sort operands, so forward match length (to 4+4W+3) and
     backward extension (to 4) come from CONTIGUOUS compares in
     sorted order.  reference behavior: src/lz4.zig:292-447 (greedy
     fast compressor); the sort replaces its 4096-entry hash probe
     with an exact nearest-match finder.
  2. Unbounded lengths for capped chains (RLE / periodic data) via a
     reverse packed-cummax over same-offset runs.
  3. Candidate compaction (shadow-pruned) to an mcap-sized domain,
     then an EXACT greedy parse: a lax.scan over K-wide candidate
     chunks with an unrolled in-chunk select -- sequential semantics,
     vector execution across the vmapped block batch.
  4. Emission: per-sequence byte budgets -> prefix sums; three merge
     sorts (source-domain fill, grand out-domain fill, extraction)
     place tokens / lengths / offsets / literals with packed cummax
     fills.  No scatter, no gather.

DECODE (``make_block_decoder`` + host ``parse_sequences``):
  The byte-serial token parse runs on host (C++ native); device
  reconstruction resolves every output byte to its ultimate literal
  source.  See ops/pallas_decode.py for the TPU kernel path.

Wire format identical to the oracle in ops/block.py; tests
cross-decode all backends.  reference wire behavior: src/lz4.zig
(format constants :12-44, decoder :89-251).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import compress_bound

__all__ = [
    "make_block_encoder", "make_block_decoder",
    "encode_blocks_jax", "decode_blocks_jax", "parse_sequences",
    "seqs_to_arrays", "MAX_SEQS",
]

#: carried u32 windows -> exact match lengths up to 4 + 4*_W + 3.
_W = 8
_MAX_SORT_ML = 4 + 4 * _W + 3


def MAX_SEQS(blk: int) -> int:
    """Worst-case sequence count for decoding a blk-byte block."""
    return blk // 4 + 2


def _mcap(blk: int) -> int:
    """Match-candidate domain for the parallel parse.  16K candidates
    for a 64KB block covers the full post-shadow-prune candidate set
    of real data (match-dense inputs shed shadowed candidates first,
    so the parse stays exactly greedy in practice)."""
    return min(max(blk, 32), 16384)


def _bits(v: int) -> int:
    return max(int(v).bit_length(), 1)


# =====================================================================
# ENCODE
# =====================================================================

def _encode_block(data, n, start, *, blk: int):
    """Compress one block with optional history prefix.

    data: uint8[blk] window = [history/dictionary bytes | new data]
    n:    int32 total valid length of the window
    start:int32 index where emission begins; positions below ``start``
          are history (dictionary or previous blocks in linked mode):
          matched against but never re-emitted.

    Returns (out uint8[cap], out_len int32).
    """
    cap = compress_bound(blk)
    mcap = _mcap(blk)
    ncap = mcap + 2                    # match slots + tail literal seq

    # packing geometry for cummax fills: uint32 ((q+1) << PB) | field
    # with field < 2^PB; 0 is the neutral (no anchor yet) element.
    PB = _bits(cap)                    # holds positions/lengths <= cap
    assert _bits(ncap + 1) + PB <= 32, "block too large for packed fills"
    PM = (1 << PB) - 1
    BIG = jnp.int32(1 << 28)

    i32 = jnp.int32
    n = jnp.asarray(n, i32)
    start = jnp.asarray(start, i32)
    idx = lax.broadcasted_iota(i32, (blk, 1), 0).squeeze(-1)

    # zero bytes past n so padded reads are deterministic
    b = jnp.where(idx < n, data.astype(jnp.int32), 0)

    # u32 little-endian windows at i, i+4, ..., i+4W (contiguous)
    ext = 4 * (_W + 1)
    bp = jnp.pad(b.astype(jnp.uint32), (0, ext + 4))
    su = (bp[:blk + ext] | (bp[1:blk + ext + 1] << 8)
          | (bp[2:blk + ext + 2] << 16) | (bp[3:blk + ext + 3] << 24))
    s0 = su[:blk]
    wins = [su[4 * k:4 * k + blk] for k in range(1, _W + 1)]
    # backward window: bytes b[i-4..i-1] as LE u32 (high byte = b[i-1])
    bb = jnp.pad(b.astype(jnp.uint32), (4, 4))
    wb = (bb[:blk] | (bb[1:blk + 1] << 8)
          | (bb[2:blk + 2] << 16) | (bb[3:blk + 3] << 24))

    # --- ONE sort groups equal 4-byte strings; windows ride along ---
    invalid = (idx > n - 4).astype(i32)
    ops = lax.sort((invalid, s0, idx, wb) + tuple(wins), num_keys=2,
                   is_stable=True)
    inv_s, s0_s, idx_s, wb_s = ops[0], ops[1], ops[2], ops[3]
    wins_s = ops[4:]

    t_pos = jnp.arange(blk, dtype=i32)

    def cand_at(shift):
        """Candidate + exact LCP + backward-extension count vs the
        shift-th previous occurrence of the same 4-byte string --
        contiguous compares in sorted order, no gathers."""
        ok = ((t_pos >= shift) & (inv_s == 0)
              & (jnp.roll(inv_s, shift) == 0)
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
        # backward bytes in common (suffix of the 4 bytes before i)
        bx = wb_s ^ jnp.roll(wb_s, shift)
        bk = jnp.where(
            (bx & jnp.uint32(0xFF000000)) != 0, 0,
            jnp.where((bx & jnp.uint32(0x00FF0000)) != 0, 1,
                      jnp.where((bx & jnp.uint32(0x0000FF00)) != 0, 2,
                                jnp.where(bx != 0, 3, 4)))).astype(i32)
        return (jnp.where(ok, ck, -1), jnp.where(ok, mlk, 0),
                jnp.where(ok, bk, 0))

    # nearest and second-nearest previous occurrence: the second often
    # carries the longer (periodic) offset when a nearer duplicate
    # 4-gram interrupts a long-match chain
    c1, m1, k1 = cand_at(1)
    c2, m2, k2 = cand_at(2)
    use2 = m2 > m1
    cand_s = jnp.where(use2, c2, c1)
    ml_s = jnp.where(use2, m2, m1)
    bk_s = jnp.where(use2, k2, k1)

    # --- unsort: back to position order ---
    _, cand, ml, back = lax.sort((idx_s, cand_s, ml_s, bk_s), num_keys=1)

    valid = (cand >= 0) & (idx <= n - 13)
    ml = jnp.where(valid, ml, 0)
    off = jnp.where(valid, idx - cand, 1 << 20)

    # --- exact unbounded extension of capped match chains ---
    # If position i's match is capped at the sort-carried window and
    # position i+1 matches at the same offset, then exactly
    # ml_true[i] = 1 + ml_true[i+1].  Same-offset runs collapse via a
    # reverse packed cummax carrying (position, boundary ml): long
    # matches (RLE, periodic data, big repeats) get exact lengths with
    # one scan.  Boundary ml < _MAX_SORT_ML always fits 6 bits.
    capped = valid & (ml >= _MAX_SORT_ML - 3)
    off_next = jnp.concatenate([off[1:], jnp.full((1,), 1 << 21, i32)])
    valid_next = jnp.concatenate([valid[1:], jnp.zeros((1,), bool)])
    link = capped & valid_next & (off_next == off)
    bnd = ~link
    pk = jnp.where(bnd, ((blk - 1 - idx) << 6) | jnp.minimum(ml, 63), -1)
    f = lax.cummax(pk, reverse=True)
    e = (blk - 1) - (f >> 6)
    bml = f & 63
    ml = jnp.where(capped, (e - idx) + bml, ml)

    ml = jnp.minimum(ml, jnp.maximum(n - 5 - idx, 0))
    is_match = valid & (ml >= 4) & (idx >= start)

    # --- capacity-aware compaction to the mcap parse domain ---
    # Shadowed candidates (the previous position's own match already
    # covers this one with a byte to spare -- the greedy chain rarely
    # lands exactly on them) go first under pressure, then the highest
    # positions.  Blocks whose candidate set fits keep everything: the
    # parse is exactly greedy over the full set.
    prev_m = jnp.concatenate([jnp.zeros((1,), bool), is_match[:-1]])
    prev_ml = jnp.concatenate([jnp.zeros((1,), i32), ml[:-1]])
    shadowed = is_match & prev_m & (prev_ml >= ml + 1)
    prio = jnp.where(is_match,
                     jnp.where(shadowed, blk + idx, idx),
                     3 * blk)
    idx_m = jnp.where(is_match, idx, BIG)
    _, idx_k, ml_k, off_k, bk_k = lax.sort(
        (prio, idx_m, ml, off, back), num_keys=1)
    P, ML, OFF, BK = lax.sort(
        (idx_k[:mcap], ml_k[:mcap], off_k[:mcap], bk_k[:mcap]),
        num_keys=1)
    alive = P < blk

    # --- EXACT greedy parse: chunked sequential scan ---
    # Semantics of the serial encoder's main loop (take the candidate
    # at the lowest position not covered by the previous match), run
    # as a scan over K-wide chunks: ~mcap/K cheap vector steps across
    # the whole vmapped batch.
    E = jnp.where(alive, P + ML, BIG)
    K = 32 if mcap >= 32 else mcap
    steps = mcap // K
    Pc = P.reshape(steps, K)
    Ec = E.reshape(steps, K)

    def gstep(endv, xs):
        p, e = xs
        sels = []
        for kk in range(K):
            s = (p[kk] < blk) & (p[kk] >= endv)
            endv = jnp.where(s, e[kk], endv)
            sels.append(s)
        return endv, jnp.stack(sels)

    _, selc = lax.scan(gstep, jnp.zeros_like(n), (Pc, Ec))
    chosen = selc.reshape(mcap) & alive

    # --- compact selected matches (position order) ---
    key2 = jnp.where(chosen, P, BIG)
    p2, ml2, off2, bk2 = lax.sort((key2, ML, OFF, BK), num_keys=1)
    nsel = jnp.sum(chosen.astype(i32))

    # --- coalesce back-to-back same-offset matches ---
    # The sort-carried LCP caps lengths at 4+4W+3; a long true match
    # is selected as a chain of adjacent equal-offset sequences with
    # zero literals between.  Coalescing restores single long
    # sequences (parity with the serial encoder's unbounded match).
    qm = jnp.arange(mcap, dtype=i32)
    act = qm < nsel
    contig = (act & (qm > 0) & (off2 == jnp.roll(off2, 1))
              & (p2 == jnp.roll(p2, 1) + jnp.roll(ml2, 1)))
    head = act & ~contig
    contig_next = jnp.concatenate([contig[1:], jnp.zeros((1,), bool)])
    is_end = act & ~contig_next
    cum = jnp.cumsum(jnp.where(act, ml2, 0))
    CB = _bits(blk)                      # cum <= blk fits CB bits
    pkc = jnp.where(is_end, ((mcap - 1 - qm) << CB) | cum, -1)
    fc = lax.cummax(pkc, reverse=True)
    cum_end = fc & ((1 << CB) - 1)
    merged = jnp.where(head, ml2 + cum_end - cum, 0)
    key3 = jnp.where(head, p2, BIG)
    mpos, mml, moff, mbk = lax.sort((key3, merged, off2, bk2),
                                    num_keys=1)
    nmatch = jnp.sum(head.astype(i32))

    # --- sequence arrays on the ncap domain ---
    padq = ncap - mcap
    mpos = jnp.concatenate([mpos, jnp.zeros((padq,), i32)])
    mml = jnp.concatenate([mml, jnp.zeros((padq,), i32)])
    moff = jnp.concatenate([moff, jnp.ones((padq,), i32)])
    mbk = jnp.concatenate([mbk, jnp.zeros((padq,), i32)])
    q_idx = jnp.arange(ncap, dtype=i32)
    active = q_idx < nmatch
    mpos = jnp.where(active, mpos, 0)
    mml = jnp.where(active, mml, 0)
    moff = jnp.where(active, moff, 1)
    mbk = jnp.where(active, mbk, 0)

    prev_end = jnp.where(q_idx == 0, start, jnp.roll(mpos + mml, 1))
    lit_start = jnp.where(active, prev_end, 0)
    lit_len = jnp.where(active, mpos - lit_start, 0)

    # --- backward extension (emission-level: shrink the literal run,
    # grow the match; offset unchanged; count carried from the sort)
    backq = jnp.minimum(jnp.minimum(mbk, lit_len), mpos - moff)
    backq = jnp.where(active, jnp.maximum(backq, 0), 0)
    mpos = mpos - backq
    mml = mml + backq
    lit_len = lit_len - backq

    # --- tail literal sequence ---
    lastq = jnp.maximum(nmatch - 1, 0)
    tail_start = jnp.where(nmatch > 0, mpos[lastq] + mml[lastq], start)
    lit_start = lit_start.at[nmatch].set(tail_start, mode="drop")
    lit_len = lit_len.at[nmatch].set(n - tail_start, mode="drop")
    live = q_idx <= nmatch
    has_match = active

    # --- per-sequence byte budgets ---
    lv = jnp.maximum(lit_len - 15, 0)
    lit_ext = jnp.where(lit_len >= 15, 1 + lv // 255, 0)
    mv = jnp.maximum(mml - 19, 0)
    ml_ext = jnp.where(has_match & (mml - 4 >= 15), 1 + mv // 255, 0)
    seq_len = jnp.where(
        live,
        1 + lit_ext + lit_len + jnp.where(has_match, 2 + ml_ext, 0), 0)
    out_start = jnp.cumsum(seq_len) - seq_len
    out_len = jnp.sum(seq_len)

    token = (jnp.minimum(lit_len, 15) << 4) | jnp.where(
        has_match, jnp.minimum(mml - 4, 15), 0)
    lit_rem = jnp.maximum(lit_len - 15 - 255 * (lit_ext - 1), 0)
    ml_rem = jnp.maximum(mml - 19 - 255 * (ml_ext - 1), 0)

    # ================= EMISSION (three merge sorts) =================
    u32 = jnp.uint32
    qp = (q_idx + 1).astype(u32) << PB
    zsrc = jnp.zeros((blk,), u32)

    # --- sort 7: source-domain fill -> literal byte destinations ---
    # Anchor rows (one per sequence, keyed by lit_start) broadcast
    # (dest0, lit_start, lit_end) to the source bytes of their literal
    # run via packed cummax; every literal source byte learns its
    # absolute output position dest.
    dest0 = out_start + 1 + lit_ext            # first literal out pos
    k7 = jnp.concatenate([jnp.where(live, lit_start, BIG), idx])
    a7 = jnp.concatenate([jnp.where(live, qp | dest0.astype(u32), 0),
                          zsrc])
    b7 = jnp.concatenate([jnp.where(live, qp | lit_start.astype(u32), 0),
                          zsrc])
    c7 = jnp.concatenate(
        [jnp.where(live, qp | (lit_start + lit_len).astype(u32), 0),
         zsrc])
    v7 = jnp.concatenate([jnp.zeros((ncap,), i32), b])
    s7 = jnp.concatenate([jnp.zeros((ncap,), i32), jnp.ones((blk,), i32)])
    k7s, a7s, b7s, c7s, v7s, s7s = lax.sort(
        (k7, a7, b7, c7, v7, s7), num_keys=1, is_stable=True)
    fa = lax.cummax(a7s)
    fb = lax.cummax(b7s)
    fcc = lax.cummax(c7s)
    is_lit_src = ((s7s == 1) & (fa > 0)
                  & (k7s < (fcc & PM).astype(i32)))
    dest = jnp.where(is_lit_src,
                     (fa & PM).astype(i32)
                     + (k7s - (fb & PM).astype(i32)), BIG)

    # --- sort 8: grand out-domain fill ---
    # Rows: sequence anchors (keyed out_start), literal source bytes
    # (keyed dest, from sort 7's layout), output byte slots (keyed j).
    # After the sort, packed cummax fills give every output byte its
    # sequence fields and -- for literal positions -- its source byte.
    j_iota = lax.broadcasted_iota(i32, (cap, 1), 0).squeeze(-1)
    r7 = ncap + blk
    zr7 = jnp.zeros((r7,), u32)
    zout = jnp.zeros((cap,), u32)
    kseq = jnp.where(live, out_start, BIG)

    # offsets < blk <= 2^(PB-1), so the match flag rides bit PB-1
    g1 = jnp.where(live, qp | out_start.astype(u32), 0)
    g2 = jnp.where(live, qp | lit_len.astype(u32), 0)
    g3 = jnp.where(live, qp | ((lit_ext << 8) | token).astype(u32), 0)
    g4 = jnp.where(live, qp | ((has_match.astype(i32) << (PB - 1))
                               | moff).astype(u32), 0)
    g5 = jnp.where(live, qp | ((ml_ext << 8) | lit_rem).astype(u32), 0)
    g6 = jnp.where(live, qp | ml_rem.astype(u32), 0)
    g7src = jnp.where(is_lit_src,
                      ((dest << 8) | v7s).astype(u32), 0)

    k8 = jnp.concatenate([kseq, dest, j_iota])
    h1 = jnp.concatenate([g1, zr7, zout])
    h2 = jnp.concatenate([g2, zr7, zout])
    h3 = jnp.concatenate([g3, zr7, zout])
    h4 = jnp.concatenate([g4, zr7, zout])
    h5 = jnp.concatenate([g5, zr7, zout])
    h6 = jnp.concatenate([g6, zr7, zout])
    h7 = jnp.concatenate([jnp.zeros((ncap,), u32), g7src, zout])
    tag = jnp.concatenate([jnp.zeros((ncap,), i32),
                           jnp.zeros((r7,), i32), jnp.ones((cap,), i32)])
    srt = lax.sort((k8, tag, h1, h2, h3, h4, h5, h6, h7),
                   num_keys=2, is_stable=True)
    k8s, tag_s = srt[0], srt[1]
    f1, f2, f3, f4, f5, f6, f7 = [lax.cummax(x) for x in srt[2:9]]
    f1, f2, f3 = [(x & PM).astype(i32) for x in (f1, f2, f3)]
    f4, f5, f6 = [(x & PM).astype(i32) for x in (f4, f5, f6)]
    f7 = f7.astype(i32)

    jj = k8s
    S = f1
    rel = jj - S
    L = f2
    Ex = (f3 >> 8) & (PM >> 8)
    TK = f3 & 0xFF
    HM = ((f4 >> (PB - 1)) & 1).astype(bool)
    O = f4 & ((1 << (PB - 1)) - 1)
    ME = (f5 >> 8) & (PM >> 8)
    LREM = f5 & 0xFF
    MREM = f6 & 0xFF
    litb = jnp.where((f7 >> 8) == jj, f7 & 0xFF, 0)

    pos_off = 1 + Ex + L
    pos_mlext = pos_off + 2
    val = jnp.zeros_like(jj)
    val = jnp.where(rel == 0, TK, val)
    val = jnp.where((rel >= 1) & (rel < Ex), 255, val)
    val = jnp.where((Ex > 0) & (rel == Ex), LREM, val)
    val = jnp.where((rel > Ex) & (rel < pos_off), litb, val)
    val = jnp.where(HM & (rel == pos_off), O & 0xFF, val)
    val = jnp.where(HM & (rel == pos_off + 1), O >> 8, val)
    val = jnp.where(HM & (ME > 0) & (rel >= pos_mlext)
                    & (rel < pos_mlext + ME - 1), 255, val)
    val = jnp.where(HM & (ME > 0) & (rel == pos_mlext + ME - 1),
                    MREM, val)
    val = jnp.where((tag_s == 1) & (jj < out_len), val, 0)

    # --- sort 9: extraction -- dense output bytes ---
    # Output slots carry unique keys 0..cap-1; everything else is BIG,
    # so the first cap sorted rows ARE the output, in order.
    kx = jnp.where(tag_s == 1, k8s, BIG)
    _, vx = lax.sort((kx, val), num_keys=1, is_stable=True)
    out = vx[:cap].astype(jnp.uint8)

    out_len = jnp.where(n == start, 0, out_len)
    return out, out_len


@functools.lru_cache(maxsize=None)
def make_block_encoder(blk: int):
    """Build a jitted encoder for windows of capacity ``blk`` bytes.

    Returns fn(data uint8[blk], n int32, start int32=0)
            -> (out uint8[bound], len).
    vmap over a leading axis for batched multi-block encode; pass a
    nonzero ``start`` for dictionary / linked-history encoding.
    """
    fn = functools.partial(_encode_block, blk=blk)
    jfn = jax.jit(fn)

    def call(data, n, start=0):
        return jfn(data, n, jnp.asarray(start, jnp.int32))
    return call


@functools.lru_cache(maxsize=None)
def _batched_encoder(blk: int):
    fn = functools.partial(_encode_block, blk=blk)
    return jax.jit(jax.vmap(fn))


def encode_blocks_jax(blocks, lengths, blk: int, starts=None):
    """Batched block encode: blocks uint8[B, blk], lengths int32[B],
    optional starts int32[B] (history/dictionary prefix lengths)."""
    import numpy as np
    if starts is None:
        starts = np.zeros(blocks.shape[0], np.int32)
    return _batched_encoder(blk)(blocks, lengths, starts)


# =====================================================================
# DECODE
# =====================================================================

def parse_sequences(comp: bytes, history_len: int = 0):
    """Host-side token parse: compressed block -> sequence arrays.

    Returns list of (lit_len, lit_comp_start, match_len, offset); the
    tail sequence has match_len == 0.  Validates structure and raises
    the block error taxonomy on corruption.  ``history_len`` extends
    the reachable window behind the block (streaming prefix or
    dictionary).  This is the cheap serial part of decode; the
    bandwidth-heavy reconstruction runs on device.
    """
    from ..errors import CorruptedData
    seqs = []
    ip, iend = 0, len(comp)
    op = 0
    while ip < iend:
        token = comp[ip]
        ip += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if ip >= iend:
                    raise CorruptedData("truncated literal length")
                x = comp[ip]
                ip += 1
                lit += x
                if x != 255:
                    break
        if ip + lit > iend:
            raise CorruptedData("literal run overruns input")
        lit_start = ip
        ip += lit
        op += lit
        if ip >= iend:
            seqs.append((lit, lit_start, 0, 0))
            break
        if ip + 2 > iend:
            raise CorruptedData("truncated offset")
        off = comp[ip] | (comp[ip + 1] << 8)
        ip += 2
        if off == 0 or off > op + history_len:
            raise CorruptedData(f"bad offset {off} at output pos {op}")
        ml = token & 15
        if ml == 15:
            while True:
                if ip >= iend:
                    raise CorruptedData("truncated match length")
                x = comp[ip]
                ip += 1
                ml += x
                if x != 255:
                    break
        ml += 4
        op += ml
        seqs.append((lit, lit_start, ml, off))
    return seqs


def seqs_to_arrays(seqs, nseq_cap: int):
    """Pack parsed sequences into fixed-shape arrays for the device."""
    import numpy as np
    ns = len(seqs)
    if ns > nseq_cap:
        raise ValueError(f"{ns} sequences exceed capacity {nseq_cap}")
    lit = np.zeros(nseq_cap, np.int32)
    lsrc = np.zeros(nseq_cap, np.int32)
    ml = np.zeros(nseq_cap, np.int32)
    off = np.ones(nseq_cap, np.int32)
    for k, (a, b_, c, d) in enumerate(seqs):
        lit[k], lsrc[k], ml[k], off[k] = a, b_, c, max(d, 1)
    return lit, lsrc, ml, off, np.int32(ns)


def _decode_block(comp, hist, lit_len, lit_src, mlen, off, nseq, *,
                  blk: int, nseq_cap: int, hcap: int):
    """Device reconstruction from parsed sequences -- gather-free.

    comp: uint8[ccap] compressed payload; hist: uint8[hcap] history /
    dictionary window logically preceding the output (offsets may
    reach into it); sequence arrays int32[nseq_cap].
    Returns (out uint8[blk], out_len int32).

    Strategy (all sorts + packed-cummax fills, no gathers):
      1. Merge-fill per-sequence fields onto output bytes.
      2. Literal bytes land via one monotone merge against comp.
      3. Self-overlapping matches (offset < length, e.g. RLE) resolve
         elementwise: ultimate in-sequence source = modular position
         before the match start.  No iteration.
      4. Remaining match bytes point strictly before their sequence;
         a while_loop of merge rounds resolves them with POINTER
         JUMPING (unresolved bytes adopt their target's pointer), so
         rounds <= log2(chain depth) + 1.  History bytes participate
         as pre-resolved rows at negative keys (linked/dict decode).
    reference decode semantics: src/lz4.zig:89-251.
    """
    i32 = jnp.int32
    q_idx = jnp.arange(nseq_cap, dtype=i32)
    live = q_idx < nseq
    lit_len = jnp.where(live, lit_len, 0)
    mlen = jnp.where(live, mlen, 0)
    off = jnp.where(live, off.astype(i32), 1)

    seg = lit_len + mlen
    seg_start = jnp.cumsum(seg) - seg          # output offset of seq
    out_len = jnp.sum(seg)

    PB = _bits(max(blk, comp.shape[0]) + hcap)
    PM = (1 << PB) - 1
    assert _bits(nseq_cap + 1) + PB <= 32, "block too large for fills"
    assert PB <= 17, "device decode supports blocks <= 64KB + history"
    BIG = jnp.int32(1 << 28)
    u32 = jnp.uint32
    qp = (q_idx + 1).astype(u32) << PB

    j = lax.broadcasted_iota(i32, (blk, 1), 0).squeeze(-1)

    # --- 1. merge-fill sequence fields onto output bytes ---
    kseq = jnp.where(live & (seg > 0), seg_start, BIG)
    a1 = jnp.where(live, qp | seg_start.astype(u32), 0)
    a2 = jnp.where(live, qp | lit_len.astype(u32), 0)
    a3 = jnp.where(live, qp | lit_src.astype(u32), 0)
    a4 = jnp.where(live, qp | off.astype(u32), 0)
    kk = jnp.concatenate([kseq, j])
    z = jnp.zeros((blk,), u32)
    tg = jnp.concatenate([jnp.zeros((nseq_cap,), i32),
                          jnp.ones((blk,), i32)])
    ks, tgs, f1, f2, f3, f4 = lax.sort(
        (kk, tg,
         jnp.concatenate([a1, z]), jnp.concatenate([a2, z]),
         jnp.concatenate([a3, z]), jnp.concatenate([a4, z])),
        num_keys=2, is_stable=True)
    f1, f2, f3, f4 = (lax.cummax(f1), lax.cummax(f2),
                      lax.cummax(f3), lax.cummax(f4))
    # dense extraction by output position
    kx = jnp.where(tgs == 1, ks, BIG)
    _, S, L, LS, O = lax.sort(
        (kx,
         (f1 & PM).astype(i32), (f2 & PM).astype(i32),
         (f3 & PM).astype(i32), (f4 & PM).astype(i32)), num_keys=1)
    S, L, LS, O = S[:blk], L[:blk], LS[:blk], O[:blk]
    rel = j - S
    is_lit = rel < L

    # --- 2. literal bytes via monotone merge against comp ---
    ccap = comp.shape[0]
    csrc = jnp.arange(ccap, dtype=i32)
    lq = jnp.where(is_lit, LS + rel, BIG)
    kms, tms, vms, pms = lax.sort(
        (jnp.concatenate([csrc, lq]),
         jnp.concatenate([jnp.zeros((ccap,), i32),
                          jnp.ones((blk,), i32)]),
         jnp.concatenate([(csrc << 8) | comp.astype(i32),
                          jnp.full((blk,), -1, i32)]),
         jnp.concatenate([jnp.zeros((ccap,), i32), j])),
        num_keys=2, is_stable=True)
    fv = lax.cummax(vms)
    lit_val = jnp.where((fv >> 8) == kms, fv & 0xFF, 0)
    kx2 = jnp.where(tms == 1, pms, BIG)
    _, litv = lax.sort((kx2, lit_val), num_keys=1)
    litv = litv[:blk]

    known = is_lit | (j >= out_len)
    value = jnp.where(is_lit & (j < out_len), litv, 0)

    # --- 3. self-overlap resolution (elementwise) ---
    # match starts at mstart = S + L; byte j copies from j - O; while
    # that lands inside the same match, fold modularly to before it.
    mstart = S + L
    srcp = j - O
    fold = (~known) & (srcp >= mstart)
    srcp = jnp.where(fold, mstart - O + ((j - mstart) % O), srcp)

    # --- 4. merge rounds with pointer jumping ---
    # Publishers: history rows (keys -hcap..-1, pre-resolved) + all
    # output rows (resolved -> value; unresolved -> their srcp, for
    # jumping).  srcp spans [-hcap, blk): publish shifted by hcap,
    # split hi/lo to fit packs.
    hk = jnp.arange(-hcap, 0, dtype=i32)
    hval = hist.astype(i32)

    def resolve_round(state):
        value, known, srcp, it = state
        pubv = jnp.where(known, (j << 8) | value, -1)
        su_ = srcp + hcap                    # [0, blk + hcap)
        pub_hi = jnp.where(~known, (j << 9) | (su_ >> 8), -1)
        pub_lo = jnp.where(~known, (j << 8) | (su_ & 0xFF), -1)
        qk = jnp.where(known, BIG, srcp)

        kr = jnp.concatenate([hk, j, qk])
        tr = jnp.concatenate([jnp.zeros((hcap,), i32),
                              jnp.zeros((blk,), i32),
                              jnp.ones((blk,), i32)])
        hi = jnp.concatenate([jnp.full((hcap,), -1, i32), pub_hi,
                              jnp.full((blk,), -1, i32)])
        lo = jnp.concatenate([jnp.full((hcap,), -1, i32), pub_lo,
                              jnp.full((blk,), -1, i32)])
        pr = jnp.concatenate([jnp.zeros((hcap,), i32), j, j])
        # value publication: packed with key+hcap so the leading field
        # stays non-negative and monotone over the history+out rows
        hv = jnp.concatenate([((hk + hcap) << 8) | hval,
                              jnp.where(known, ((j + hcap) << 8) | value,
                                        -1),
                              jnp.full((blk,), -1, i32)])

        krs, trs, hvs, his, los, prs = lax.sort(
            (kr, tr, hv, hi, lo, pr), num_keys=2, is_stable=True)
        fhv = lax.cummax(hvs)
        fhi = lax.cummax(his)
        flo = lax.cummax(los)

        isq = trs == 1
        hit_val = isq & ((fhv >> 8) == krs + hcap)
        got_val = fhv & 0xFF
        # target unresolved: adopt its srcp (pointer jump); hi/lo must
        # come from the same publisher row -- both packs lead with the
        # publisher's j, and fills pick the latest row <= query, which
        # is the same row for both (same anchor set).
        hit_jmp = (isq & ~hit_val & ((fhi >> 9) == krs)
                   & ((flo >> 8) == krs))
        jmp_su = ((fhi & 0x1FF) << 8) | (flo & 0xFF)

        kx3 = jnp.where(isq, prs, BIG)
        _, gv, gkv, gj, gjv = lax.sort(
            (kx3, got_val, hit_val.astype(i32), jmp_su,
             hit_jmp.astype(i32)), num_keys=1)
        gv, gkv = gv[:blk], gkv[:blk]
        gj, gjv = gj[:blk], gjv[:blk]

        newly = (~known) & (gkv == 1)
        value = jnp.where(newly, gv, value)
        known2 = known | newly
        srcp = jnp.where(known2, srcp,
                         jnp.where(gjv == 1, gj - hcap, srcp))
        return value, known2, srcp, it + 1

    def cond(state):
        _, known, _, it = state
        return (~jnp.all(known)) & (it < 20)

    value, known, _, _ = lax.while_loop(
        cond, resolve_round, (value, known, srcp, jnp.int32(0)))
    out = jnp.where(j < out_len, value, 0)
    return out.astype(jnp.uint8), out_len


@functools.lru_cache(maxsize=None)
def make_block_decoder(blk: int, ccap: int | None = None,
                       nseq_cap: int | None = None, hcap: int = 1):
    """Build a jitted device decoder for ``blk``-byte output blocks.

    Returned fn(comp, lit, lsrc, ml, off, ns[, hist]) -- ``hist`` is
    the dictionary/prefix window (uint8[hcap]); omitted -> zeros.
    """
    import numpy as np
    ccap = ccap or compress_bound(blk)
    nseq_cap = nseq_cap or MAX_SEQS(blk)
    fn = functools.partial(_decode_block, blk=blk, nseq_cap=nseq_cap,
                           hcap=hcap)
    jfn = jax.jit(fn)
    dummy = np.zeros(hcap, np.uint8)

    def call(comp, lit, lsrc, ml, off, ns, hist=None):
        return jfn(comp, dummy if hist is None else hist,
                   lit, lsrc, ml, off, ns)
    return call


@functools.lru_cache(maxsize=None)
def _batched_decoder(blk: int, nseq_cap: int, hcap: int = 1):
    fn = functools.partial(_decode_block, blk=blk, nseq_cap=nseq_cap,
                           hcap=hcap)
    return jax.jit(jax.vmap(fn))


def decode_blocks_jax(comp_blocks, lit_len, lit_src, mlen, off, nseq,
                      blk: int, hists=None):
    """Batched device decode from pre-parsed sequence arrays."""
    import numpy as np
    nseq_cap = lit_len.shape[-1]
    if hists is None:
        hists = np.zeros((comp_blocks.shape[0], 1), np.uint8)
    return _batched_decoder(blk, nseq_cap, hists.shape[-1])(
        comp_blocks, hists, lit_len, lit_src, mlen, off, nseq)
