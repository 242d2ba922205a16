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
data movement is a sort (grouping, merging) or a packed cummax
forward/reverse fill (broadcasting per-sequence fields to bytes).

ENCODE (``make_block_encoder``), per block, vmapped over blocks:
  1. ONE stable sort groups positions by their 4-byte string (fast
     mode) or orders them 8-byte-lexicographically (HC mode, hc > 0).
     u32 windows at i+4..i+4W and a backward window ride along, so
     exact match lengths (to 4+4W+3) and backward extension come from
     CONTIGUOUS compares against sorted-order neighbors -- an exact
     nearest-match finder (fast) or a suffix-array-class longest
     -match finder (HC), vs the reference's lossy 4096-entry hash
     probe (src/lz4.zig:292-447) / hash-chain walk (lz4hc.zig:514).
  2. Unbounded lengths for capped chains (RLE / periodic data) via a
     reverse packed-cummax over same-offset runs; HC mode adds
     one-step lazy deferral.
  3. Parse: levels <= 9 run an EXACT greedy parse over the full
     position domain (a lax.scan over K-wide position chunks with an
     unrolled in-chunk select -- sequential semantics, vector
     execution across the vmapped batch); the deep levels 10-12 run
     a PRICE-AWARE backward DP over the same candidates first (see
     _PRICE_DP / run_dp) and the greedy scan then reconstructs the
     DP's chosen path.
  4. Emission entirely in the position domain: sequence boundaries,
     output offsets, and literal destinations come from packed
     cummax fills + cumsums; each match's covered bytes publish its
     five header bytes and ml-escape middles; ONE 2-operand grand
     sort IS the dense output (lit-escape middles + the tail header
     ride a ~blk/255-row pool).  No scatter, no gather, no ncap
     compaction sorts.

DECODE (``decode_blocks_frags`` + host fragment resolver):
  The byte-serial parse + LZ77 chain resolution runs on host (C++
  native, capped-split fragments); the device reconstructs with
  parity-keyed merges and round-bounded periodic passes, tiered by
  fragment count / round depth.  A per-sequence pointer-jumping
  decoder (``_decode_block``) covers dictionary/history cases the
  fragment tiers skip.  A Pallas kernel path was measured and
  retired (experiments/pallas_decode.py).

Wire format identical to the oracle in ops/block.py; tests
cross-decode all backends.  reference wire behavior: src/lz4.zig
(format constants :12-44, decoder :89-251).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import compress_bound

# Persistent compilation cache: the device codec compiles one program
# per (blk, hc, deep, batch) configuration at ~20-40s each on this
# platform; caching them on disk makes every process after the first
# (tests, experiments, bench, the driver's bench run) start warm.
# Opt out with ZIG_LZ4_TPU_NO_CACHE=1; a user-set cache dir wins.
if not os.environ.get("ZIG_LZ4_TPU_NO_CACHE"):
    try:
        if jax.config.jax_compilation_cache_dir is None:
            # user-cache path: a package-relative dir would land in
            # site-packages for installed copies (read-only / shared)
            jax.config.update(
                "jax_compilation_cache_dir",
                os.path.join(os.path.expanduser(
                    os.environ.get("XDG_CACHE_HOME", "~/.cache")),
                    "zig_lz4_tpu", "jax"))
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:          # pragma: no cover - older jax configs
        pass

__all__ = [
    "make_block_encoder", "make_block_decoder",
    "encode_blocks_jax", "decode_blocks_jax", "parse_sequences",
    "seqs_to_arrays", "MAX_SEQS",
]

#: carried u32 windows -> exact match lengths up to 4 + 4*_W + 3.
#: Measured on-chip (experiments/enc_w_sweep.py): ride-along operands
#: are nearly free (W=2 -> 8 costs only ~5% encode time) while each
#: halving of W loses ~1.7% ratio -- so keep the full window set.
_W = 8
#: greedy-parse chunk width (positions per scan step)
_K = 32
#: HC lazy deferral depth: True = two-step (emit up to 2 literals to
#: reach a strictly-more-profitable match), False = one-step.
#: A/B-measured in experiments/enc_lazy2_probe.py.
_LAZY2 = True
#: HC positional fallback probes (one extra stable 4-byte grouping
#: sort recovering short gap matches the lex orders miss); module
#: flag for on-chip A/B timing, ratio effect measured in
#: experiments/hc_ratio_gap.py.
_FALLBACK = True
#: scan unroll factor for the greedy parse
_UNROLL = 8
#: post-parse same-offset extension: pool rows / byte budget (HC mode;
#: 0 disables).  See the `_EXT_POOL` block in _encode_block.
_EXT_POOL = 1024
_EXT_BYTES = 64
#: price-aware parse (deep levels 10-12): replace greedy selection +
#: lazy deferral with a backward byte-cost DP over the exact candidate
#: set (the device analog of the reference's optimal parser,
#: lz4hc.zig:1068-1391 with the price model :466-486).  Suffix costs
#: are non-increasing (any parse of suffix i restricted to i+1 stays
#: valid: drop a literal, or shorten the leading match by one -- a
#: 4-byte match degrades to >= as-cheap literals), so pricing ONLY the
#: full length of each position's best candidate is optimal over the
#: candidate set; truncation never needs separate prices.
_PRICE_DP = True
#: DP literal cost (x256 scale).  On-chip A/B (typed 4x64KB blocks):
#: 256 (exact for runs < 15) beats 257 (amortized-escape biased) by
#: 11B on 'code' with everything else within +-2B -- the escape bias
#: pushed the DP into marginal matches -- so the exact value wins.
_DP_LITC = 256
#: DP cost ring size: match jumps longer than _DP_R are priced at
#: their truncated length (reconstruction still takes the full
#: length -- only the price of rare > _DP_R-byte matches is
#: approximated, and emission merges same-offset continuations).
_DP_R = 512
#: extension/parse iterations.  None = auto by level: OFF for levels
#: <= 9 (deep == 0) and 1 for the deep levels 10-12.  On-chip A/B
#: (experiments/enc_ext_ab.py, 192x64KB bench-mix corpus): the pass
#: costs 0.55-0.56 ms/blk for +0.12% corpus ratio at L9 (38.9 ->
#: 29.2 MB/s) -- not worth it on the throughput levels -- while the
#: deep levels keep it for the per-type win (code-content truncation
#: 62-65% -> 0.2%, dev L12 1.22x -> 1.14-1.18x native HC9 output).
#: iters=2 measured 0.0162 GB/s at L12 (< the 0.03 decision bar,
#: docs/CHIP_QUEUE.md 3b) so deep stays at 1.  Set an int to force a
#: count at every level (probe hook).
_EXT_ITERS = None


def MAX_SEQS(blk: int) -> int:
    """Worst-case sequence count for decoding a blk-byte block."""
    return blk // 4 + 2


def _bits(v: int) -> int:
    return max(int(v).bit_length(), 1)


def device_encoder_supports(blk: int) -> bool:
    """True when ``blk``-byte windows fit the emission pack geometry:
    PB-prefixed hi/lo fills need _bits(cap)+_bits(blk) <= 40 and the
    lit-middle pool packs need _bits(blk/255)+_bits(cap) <= 31 --
    holds through 256KB windows (the pool-pack bound trips first, at
    512KB); 512KB-4MB frame blocks route to the host codec."""
    cap_bits = _bits(compress_bound(blk) + 2)
    return (cap_bits + 9 <= 31
            and cap_bits - 9 <= 31 - _bits(blk)
            and _bits(max(blk // 255 + 8, 8) + 2) + cap_bits <= 31)


# (device_frag_decoder_supports lives with the decoder, below)


# =====================================================================
# ENCODE
# =====================================================================

def fast_params(accel: int) -> tuple[int, int]:
    """Map the fast-mode acceleration knob to (W, probes).

    The reference's acceleration skips match-finder probes
    (src/lz4.zig:292, :332 -- ``step = searchMatchNb >> 6``); the
    device encoder has no serial probe loop, so the speed/ratio trade
    lives in the sort operands instead: the LCP window count W (each
    halving loses ~1.7% ratio for ~5% speed,
    experiments/enc_w_sweep.py) and the probe count (second
    sorted-order neighbor).  accel=1 -> (8, 2) full quality;
    2 -> (4, 2); 4 -> (2, 1); >= 8 -> (1, 1)."""
    accel = max(int(accel), 1)
    if accel <= 1:
        return _W, 2
    if accel == 2:
        return 4, 2
    if accel <= 4:
        return 2, 1
    return 1, 1


def _encode_block(data, n, start, *, blk: int, stage: int = 0,
                  W: int = _W, hc: int = 0, deep: int = 0,
                  fast_probes: int = 2):
    """Compress one block with optional history prefix.

    data: uint8[blk] window = [history/dictionary bytes | new data]
    n:    int32 total valid length of the window
    start:int32 index where emission begins; positions below ``start``
          are history (dictionary or previous blocks in linked mode):
          matched against but never re-emitted.
    hc:   0 = fast mode: single-key grouping sort, nearest-2
          candidates (greedy, reference src/lz4.zig:292-447 class).
          >= 1 = HC mode: TWO-key (8-byte lexicographic) sort turns
          the finder into a suffix-array-class matcher -- the hc
          nearest sorted-order neighbors in EACH direction are probed
          with exact LCPs and the longest match wins, plus one-step
          lazy deferral.  Reference semantics target: lz4hc.zig
          hash-chain search (:514-681) quality at vector cost.
    deep: 0 = off.  1..3 = optimal-class long-match discovery
          (levels 10-12): EXACT prefix-doubled ranks (suffix-array
          construction, Manber-Myers) extend the lexicographic order
          to 64 / 256 / 1024 bytes and provide exact long-match
          length TIERS -- rank_d[i] == rank_d[j] if and only if the
          d-byte prefixes are byte-identical, so (unlike hashing) a
          tier can never claim a false match.  This closes the
          measured ratio gap on long-match data, where the fine
          windows cap LCP measurement at 39 bytes and all long
          candidates look alike (experiments/hc_ratio_gap.py: the
          'code' content type was 2.7x native HC9 without it).
          Reference semantics target: the optimal parser's long-match
          quality, lz4hc.zig:1068-1391.

    Returns (out uint8[cap], out_len int32).
    """
    cap = compress_bound(blk)
    # selected matches are disjoint and >= 4 bytes -> at most blk//4;
    # +2 slots for the tail literal sequence and padding
    ncap = blk // 4 + 2

    # emission packs are ((pos+1) << 9) | byte -- positions <= cap
    assert _bits(cap + 2) + 9 <= 31, "block too large for packed fills"
    BIG = jnp.int32(1 << 28)

    i32 = jnp.int32
    n = jnp.asarray(n, i32)
    start = jnp.asarray(start, i32)
    idx = lax.broadcasted_iota(i32, (blk, 1), 0).squeeze(-1)

    # zero bytes past n so padded reads are deterministic
    b = jnp.where(idx < n, data.astype(jnp.int32), 0)

    max_sort_ml = 4 + 4 * W + 3

    # u32 little-endian windows at i, i+4, ..., i+4W (contiguous)
    ext = 4 * (W + 1)
    bp = jnp.pad(b.astype(jnp.uint32), (0, ext + 4))
    su = (bp[:blk + ext] | (bp[1:blk + ext + 1] << 8)
          | (bp[2:blk + ext + 2] << 16) | (bp[3:blk + ext + 3] << 24))
    # positions without 4 valid bytes are poisoned to the max key so
    # they sort last; validity is re-checked on idx_s below, which
    # also rejects genuine 0xFFFFFFFF strings colliding with poison
    s0 = jnp.where(idx > n - 4, jnp.uint32(0xFFFFFFFF), su[:blk])
    wins = [su[4 * k:4 * k + blk] for k in range(1, W + 1)]
    # backward window: bytes b[i-2..i-1] as LE u16 (high byte = b[i-1];
    # a 4-byte window was measured: ~0 ratio gain, ~4% slower)
    bb = jnp.pad(b.astype(jnp.uint32), (2, 2))
    wb16 = bb[:blk] | (bb[1:blk + 1] << 8)
    pack_iw = blk <= 65536
    if pack_iw:
        side = ((idx.astype(jnp.uint32) << 16) | wb16,)
    else:
        side = (idx, wb16.astype(jnp.uint16))

    # --- deep mode: exact prefix-doubled ranks (see docstring) ---
    tier_list = []                  # [(L, position-domain op)] nested
    if deep:
        def shl(x, k):
            """x[i+k] with -1 fill past the end (shorter-suffix rows;
            any false tier equality among tail rows is voided by the
            ml <= n - 5 - idx clamp below)."""
            if k >= blk:
                return jnp.full((blk,), -1, i32)
            return jnp.concatenate([x[k:], jnp.full((k,), -1, i32)])

        def ranks4(keys):
            """Exact rank (equivalence class id) of each position
            under the 4-key order: one sort + rank cumsum + unsort."""
            ops_ = lax.sort(keys + (idx,), num_keys=len(keys))
            srt, idxs = ops_[:-1], ops_[-1]
            newg = jnp.zeros((blk,), bool)
            for k_ in srt:
                newg = newg | (k_ != jnp.concatenate([k_[:1], k_[:-1]]))
            newg = jnp.where(idx == 0, True, newg)
            r_s = jnp.cumsum(newg.astype(i32))
            _, r_ = lax.sort((idxs, r_s), num_keys=1)
            return r_

        r = ranks4((s0, wins[0], wins[1], wins[2]))     # 16-byte rank
        depth = 16
        tier_list = [(16, r), (32, shl(r, 16)), (48, shl(r, 32))]
        for _ in range(deep - 1):
            r = ranks4((r, shl(r, depth), shl(r, 2 * depth),
                        shl(r, 3 * depth)))
            depth *= 4
            tier_list += [(depth, r), (2 * depth, shl(r, depth)),
                          (3 * depth, shl(r, 2 * depth))]
        tier_list.append((4 * depth, shl(r, 3 * depth)))
        group_keys = tuple(op for _L, op in tier_list[-4:])

    # fast: group by the 4-byte string, stable -> sorted-order
    # neighbors are the NEAREST previous occurrences.  HC: add the
    # next 4 bytes as a second key -> 8-byte lexicographic order, so
    # sorted-order neighbors (both directions) carry the LONGEST
    # common prefixes (suffix-array property).
    # hc >= 1: 8-byte lex order; deeper key prefixes were measured on
    # -chip -- a third key (12-byte order) costs nothing extra (the
    # operand already rides) and sharpens long-match discovery.
    # deep >= 1: the grouping keys are the deepest rank + its shifts
    # (4 * depth bytes of exact lexicographic order); the fine
    # windows and the shallower rank tiers ride as operands.
    if deep:
        ops = lax.sort(group_keys + (s0,) + side + tuple(wins)
                       + tuple(op for _L, op in tier_list[:-4]),
                       num_keys=4, is_stable=True)
        s0_s = ops[4]
        base = 5
    else:
        nkeys = 3 if hc else 1
        ops = lax.sort((s0,) + ((wins[0], wins[1]) if hc else ()) + side
                       + tuple(wins), num_keys=nkeys, is_stable=True)
        s0_s = ops[0]
        base = nkeys
    if pack_iw:
        idx_s = (ops[base] >> 16).astype(i32)
        wb_s = ops[base] & 0xFFFF
        base += 1
    else:
        idx_s = ops[base]
        wb_s = ops[base + 1].astype(jnp.uint32)
        base += 2
    wins_s = ops[base:base + W]
    tier_sorted = []                # [(L, sorted-domain op)] nested
    if deep:
        tier_sorted = list(zip(
            [L for L, _ in tier_list],
            list(ops[base + W:]) + list(ops[0:4])))

    t_pos = jnp.arange(blk, dtype=i32)

    def cand_at(shift, env):
        """Candidate + exact LCP + backward-extension count vs the
        shift-th sorted-order neighbor sharing the 4-byte string --
        contiguous compares in sorted order, no gathers.  Negative
        shifts probe the other lexicographic direction (HC mode);
        candidates at LATER positions are rejected explicitly.
        ``env`` = (idx_s, s0_s, wins_s, wb_s, tier_sorted) of the
        grouping sort being probed (primary lex order, or the
        fallback 4-byte grouping below).
        Returns (cand, total ml, fine ml, tier index, back count);
        in deep mode the tier chain measures EXACT long-match lower
        bounds (rank equality at nested depths) past the fine
        windows' 39-byte ceiling."""
        idx_s, s0_s, wins_s, wb_s, tier_sorted = env
        edge = (t_pos >= shift) if shift > 0 else (t_pos < blk + shift)
        ok = (edge & (idx_s <= n - 4)
              & (jnp.roll(idx_s, shift) <= n - 4)
              & (s0_s == jnp.roll(s0_s, shift)))
        ck = jnp.roll(idx_s, shift)
        ok = ok & (ck < idx_s) & (idx_s - ck <= 65535)
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
        tier = jnp.zeros((blk,), i32)
        dml = jnp.zeros((blk,), i32)
        still_t = ok
        for tk, (L, op_s) in enumerate(tier_sorted):
            takes = still_t & (op_s == jnp.roll(op_s, shift))
            tier = jnp.where(takes, tk + 1, tier)
            dml = jnp.where(takes, L, dml)
            still_t = takes
        # backward bytes in common (suffix of the 2 bytes before i)
        bx = (wb_s ^ jnp.roll(wb_s, shift)).astype(jnp.int32)
        bk = jnp.where((bx & 0xFF00) != 0, 0,
                       jnp.where(bx != 0, 1, 2))
        return (jnp.where(ok, ck, -1),
                jnp.where(ok, jnp.maximum(mlk, dml), 0),
                jnp.where(ok, mlk, 0), tier, jnp.where(ok, bk, 0))

    env = (idx_s, s0_s, wins_s, wb_s, tier_sorted)
    if hc:
        # longest match among the hc nearest lex neighbors each way;
        # ties prefer the nearest (smallest-offset) candidate
        shifts = [s_ for k_ in range(1, hc + 1) for s_ in (k_, -k_)]
    else:
        # nearest and second-nearest previous occurrence: the second
        # often carries the longer (periodic) offset when a nearer
        # duplicate 4-gram interrupts a long-match chain (probes=1
        # drops it -- the acceleration trade, fast_params)
        shifts = list(range(1, max(fast_probes, 1) + 1))
    cand_s, ml_s, mlf_s, tier_s, bk_s = cand_at(shifts[0], env)
    for s_ in shifts[1:]:
        ck, mk, mf, tk_, kk_ = cand_at(s_, env)
        if hc:
            better = (mk > ml_s) | ((mk == ml_s) & (ck > cand_s))
        else:
            better = mk > ml_s
        cand_s = jnp.where(better, ck, cand_s)
        ml_s = jnp.where(better, mk, ml_s)
        mlf_s = jnp.where(better, mf, mlf_s)
        tier_s = jnp.where(better, tk_, tier_s)
        bk_s = jnp.where(better, kk_, bk_s)
    if stage == 1:
        return (jnp.zeros((cap,), jnp.uint8),
                jnp.sum(cand_s + ml_s + bk_s).astype(jnp.int32))

    # --- unsort: back to position order (ONE packed operand --
    # every extra sort operand costs a full permutation pass) ---
    # pack: cand+1 (19b) | fine ml (6b, <= 39) | tier (4b) | back (2b)
    assert _bits(blk) + 12 <= 31, "block too large for candidate pack"
    pk_s = jnp.where(cand_s >= 0,
                     (((cand_s + 1) << 12) | (mlf_s << 6)
                      | (tier_s << 2) | bk_s), 0)
    _, pk_u = lax.sort((idx_s, pk_s), num_keys=1)
    cand = (pk_u >> 12) - 1
    mlf = (pk_u >> 6) & 63
    tier = (pk_u >> 2) & 15
    back = pk_u & 3
    ml = mlf
    for tk, (L, _op) in enumerate(tier_sorted):
        ml = jnp.where(tier == tk + 1, jnp.maximum(mlf, L), ml)

    if hc and _FALLBACK:
        # --- FALLBACK probes: nearest-previous by 4-byte group ------
        # The lexicographic orders above sort equal-prefix groups by
        # SUFFIX CONTENT, so the +-hc probes can see only later
        # positions (or out-of-window ones) and miss the short
        # gap-filling matches a positional hash chain finds trivially
        # -- measured as 10-30x more literal bytes than native HC9
        # (experiments/hc_ratio_gap.py at L12: text 3690 vs 273
        # lit/blk, code 1810 vs 210).  One extra STABLE single-key
        # grouping sort (the fast finder's order: equal 4-byte groups
        # are index-ordered, so roll(1/2) IS the nearest previous
        # occurrence) recovers them; its candidate wins only when
        # strictly longer.  reference analog: every hash-chain probe
        # starts from the positionally nearest occurrence,
        # lz4hc.zig:571-622.
        ops2 = lax.sort((s0,) + side + tuple(wins), num_keys=1,
                        is_stable=True)
        s0_s2 = ops2[0]
        if pack_iw:
            idx_s2 = (ops2[1] >> 16).astype(i32)
            wb_s2 = ops2[1] & 0xFFFF
            b2 = 2
        else:
            idx_s2 = ops2[1]
            wb_s2 = ops2[2].astype(jnp.uint32)
            b2 = 3
        env2 = (idx_s2, s0_s2, ops2[b2:b2 + W], wb_s2, [])
        c2, m2, mf2, _t2, k2 = cand_at(1, env2)
        c2b, m2b, mf2b, _t2b, k2b = cand_at(2, env2)
        b2x = m2b > m2
        c2 = jnp.where(b2x, c2b, c2)
        m2 = jnp.where(b2x, m2b, m2)
        mf2 = jnp.where(b2x, mf2b, mf2)
        k2 = jnp.where(b2x, k2b, k2)
        pk2 = jnp.where(c2 >= 0,
                        (((c2 + 1) << 12) | (mf2 << 6) | k2), 0)
        _, pk2_u = lax.sort((idx_s2, pk2), num_keys=1)
        cand2 = (pk2_u >> 12) - 1
        mlf2 = (pk2_u >> 6) & 63
        back2 = pk2_u & 3
        fb_better = mlf2 > ml
        cand = jnp.where(fb_better, cand2, cand)
        mlf = jnp.where(fb_better, mlf2, mlf)
        tier = jnp.where(fb_better, 0, tier)
        back = jnp.where(fb_better, back2, back)
        ml = jnp.where(fb_better, mlf2, ml)

    if stage == 2:
        return (jnp.zeros((cap,), jnp.uint8),
                jnp.sum(cand + ml + back).astype(jnp.int32))

    valid = (cand >= 0) & (idx <= n - 13)
    mlf = jnp.where(valid, mlf, 0)
    ml = jnp.where(valid, ml, 0)
    off = jnp.where(valid, idx - cand, 1 << 20)

    # --- exact unbounded extension of capped match chains ---
    # If position i's match is capped at the sort-carried window and
    # position i+1 matches at the same offset, then exactly
    # ml_true[i] = 1 + ml_true[i+1].  Same-offset runs collapse via a
    # reverse packed cummax carrying (position, boundary ml): long
    # matches (RLE, periodic data, big repeats) get exact lengths with
    # one scan.  A match is "capped" (possibly underestimated) when
    # the fine windows saturated OR its length came from a rank tier
    # (true lcp is in [tier, next tier)).
    capped = valid & ((mlf >= max_sort_ml - 3) | (ml > mlf))
    off_next = jnp.concatenate([off[1:], jnp.full((1,), 1 << 21, i32)])
    valid_next = jnp.concatenate([valid[1:], jnp.zeros((1,), bool)])
    link = capped & valid_next & (off_next == off)
    bnd = ~link
    # boundary pack also carries the boundary row's OWN capped bit:
    # a row whose chain ends at a capped boundary may still be
    # underestimated (the post-parse extension below needs to know)
    assert _bits(blk) + 12 <= 31, "block too large for boundary pack"
    pk = jnp.where(bnd, ((blk - 1 - idx) << 12)
                   | (capped.astype(i32) << 11) | jnp.minimum(ml, 2047),
                   -1)
    f = lax.cummax(pk, reverse=True)
    e = (blk - 1) - (f >> 12)
    bml = f & 2047
    cap_end = valid & (f >= 0) & (((f >> 11) & 1) == 1)
    ml = jnp.where(capped, jnp.maximum((e - idx) + bml, ml), ml)

    ml = jnp.minimum(ml, jnp.maximum(n - 5 - idx, 0))
    is_match = valid & (ml >= 4) & (idx >= start)
    use_dp = bool(deep) and _PRICE_DP
    if use_dp:
        # --- price-aware parse: backward byte-cost DP ---------------
        # Shortest path over the position DAG with edges i -> i+1
        # (one literal, LITC) and i -> i+ml[i] (the full best match,
        # 3 header bytes + ml-escape bytes).  Computed as a REVERSE
        # scan over KD-position chunks: within a chunk the literal
        # chain collapses to one suffix-cummin over A[k] = price[k] +
        # cost[k + jmp[k]] + k*LITC, and within-chunk match edges
        # (jump >= 4 -> chain depth <= KD/4) settle in KD/4 + 1
        # monotone relaxation rounds of one (KD,)-gather + cummin
        # each.  The carry is a _DP_R-entry ring of exact suffix
        # costs; bytes past n ride every path identically (matches
        # are clamped to end before n - 4), so the phantom-literal
        # constant cancels out of all comparisons.  Reconstruction =
        # the greedy scan below with is_match := take (follow literal
        # edges to the first position whose DP choice is its match).
        # reference semantics: lz4hc.zig:1068-1391 (compressOptimal),
        # price model :466-486; divergence: literal-run escape bytes
        # (every 255 past 14) are not priced -- runs < 15 are priced
        # exactly and longer runs under-price by ~1/255.
        SCD = 256                       # cost scale (sub-byte pricing)
        LITC = _DP_LITC                 # 1 byte + amortized escape
        KD = _K if blk >= _K else blk
        RD = min(_DP_R, blk)
        stepsD = blk // KD
        INF_D = jnp.int32(1 << 28)
        karr = jnp.arange(KD, dtype=i32)
        nround = KD // 4 + 1

        def run_dp(ml_c, im_c):
            """(take[], trunc18[]) of the backward DP over candidates
            (ml_c, im_c); re-run after the extension pass updates
            lengths.  Matches longer than the ring are priced at
            their TRUNCATED length (the full-length escape bytes
            against a ring-bounded jump would make a 64KB RLE match
            look worse than literals; the overcharge is one +3 header
            per RD bytes, and reconstruction takes the full length
            regardless).

            Besides the full length, each match also prices ONE
            truncated option: exactly 18 bytes (the longest
            escape-free match -- ml >= 19 pays a 4th header byte).
            Suffix costs are non-increasing, so longer truncations
            are dominated by the full length at equal header cost;
            the 18-cut is the single point where a shorter jump is
            strictly CHEAPER, and it wins precisely when the trimmed
            bytes are absorbed downstream for free (cost[i+18] ==
            cost[i+ml]) -- the reference optimal parser gets this
            from pricing every length (lz4hc.zig:1149-1311).  Its
            read is a static shift, so it costs no extra one-hot."""
            jmp_d = jnp.minimum(ml_c, RD)
            mlesc_d = jnp.where(jmp_d - 4 >= 15,
                                1 + jnp.maximum(jmp_d - 19, 0) // 255,
                                0)
            price_d = SCD * (3 + mlesc_d)
            kcol = jnp.arange(KD, dtype=i32)[None, :]
            rcol = jnp.arange(RD, dtype=i32)[None, :]

            tr_ok = RD >= 18        # 18-cut needs an 18-deep ring

            def dstep(ring, xs):
                # All data-dependent reads are small one-hot
                # select-reduces, NOT gathers (dynamic gather measured
                # ~0.1 Gelem/s on this chip -- a jnp.take here cost
                # 7.6 ms/blk).  The index matrices are round-invariant
                # (jumps don't change), so they build once per step;
                # ring reads (jumps past the chunk) reduce once per
                # step, in-chunk reads ((KD, KD) one-hot) per round.
                pr, jm, im = xs
                tgt = karr + jm
                oh_ring = (tgt[:, None] - KD) == rcol       # (KD, RD)
                rd_ring = jnp.sum(jnp.where(oh_ring, ring[None, :], 0),
                                  axis=1)
                oh_in = tgt[:, None] == kcol                # (KD, KD)
                in_chunk = tgt < KD
                im_tr = im & (jm > 18) if tr_ok else \
                    jnp.zeros_like(im)
                pr_tr = 3 * SCD
                T = KD * LITC + ring[0]     # all-literals-to-carry
                est = T - karr * LITC

                def rd_of(est):
                    rd_in = jnp.sum(jnp.where(oh_in, est[None, :], 0),
                                    axis=1)
                    return jnp.where(in_chunk, rd_in, rd_ring)

                def rd18_of(est):
                    return jnp.concatenate([est, ring])[18:18 + KD]

                for _r in range(nround):
                    A = jnp.where(im, pr + rd_of(est) + karr * LITC,
                                  INF_D)
                    if tr_ok:
                        A = jnp.minimum(A, jnp.where(
                            im_tr, pr_tr + rd18_of(est) + karr * LITC,
                            INF_D))
                    sfx = lax.cummin(A, reverse=True)
                    est = jnp.minimum(sfx, T) - karr * LITC
                nxt = jnp.concatenate([est[1:], ring[:1]])
                a_full = pr + rd_of(est)
                if tr_ok:
                    a_tr = jnp.where(im_tr, pr_tr + rd18_of(est),
                                     INF_D)
                    tr_k = im_tr & (a_tr < a_full)
                    best = jnp.minimum(a_full, a_tr)
                else:
                    tr_k = jnp.zeros_like(im)
                    best = a_full
                take_k = im & (best <= LITC + nxt)
                ring = jnp.concatenate([est, ring[:RD - KD]])
                return ring, (take_k, tr_k)

            # carry derives from an input so its varying-axes type
            # matches the scan body's outputs under shard_map
            ring0 = jnp.zeros((RD,), i32) + ml_c[0] * 0
            _, (takes, trs) = lax.scan(
                dstep, ring0,
                (price_d.reshape(stepsD, KD), jmp_d.reshape(stepsD, KD),
                 im_c.reshape(stepsD, KD)), reverse=True)
            return takes.reshape(blk), trs.reshape(blk)

        is_match, _tr18 = run_dp(ml, is_match)
        # apply the DP's 18-cut: the trimmed match drops its escape
        # byte; trimmed rows leave the capped-chain extension alone
        # (re-extending would just re-pay the escape)
        ml = jnp.where(_tr18, jnp.minimum(ml, 18), ml)
        cap_end = cap_end & ~_tr18
    if hc and not use_dp:
        # two-step lazy deferral (post chain-extension, exact
        # lengths): emit 1-2 literals instead of matching here when a
        # strictly-more-profitable match starts at i+1 or i+2
        # (reference analog: the HC lazy/lazy2 retries,
        # lz4hc.zig:744-829).  Cascades are suppressed in one
        # fixpoint-style pass: a position whose TARGET also intends
        # to defer keeps its own match; the 2-step defer additionally
        # requires i+1 not to compete (no match there, or it defers
        # to the same longer match via its own 1-step test).
        def sh(x, k, fill):
            z = jnp.full((k,), fill, x.dtype)
            return jnp.concatenate([x[k:], z])

        ml1, im1 = sh(ml, 1, 0), sh(is_match, 1, False)
        g1 = im1 & (ml1 > ml + 1)
        if _LAZY2:
            ml2, im2 = sh(ml, 2, 0), sh(is_match, 2, False)
            g2 = im2 & (ml2 > ml + 2)
            d0 = g1 | g2              # optimistic defer intent
            d0_1, d0_2 = sh(d0, 1, False), sh(d0, 2, False)
            defer = is_match & ((g1 & ~d0_1)
                                | (g2 & ~d0_2 & (d0_1 | ~im1)))
        else:
            g1_1 = sh(g1, 1, False)
            defer = is_match & g1 & ~g1_1
        is_match = is_match & ~defer
    if stage == 3:
        return (jnp.zeros((cap,), jnp.uint8),
                jnp.sum(jnp.where(is_match, ml + back, 0))
                .astype(jnp.int32))

    # --- EXACT greedy parse over the FULL position domain ---
    # Semantics of the serial encoder's main loop (take the candidate
    # at the lowest position not covered by the previous match), run
    # as a scan over K-wide position chunks with an unrolled in-chunk
    # select.  No candidate pruning at all: positions are already in
    # order, so no compaction sorts are needed either.
    E = idx + ml
    K = _K if blk >= _K else blk
    steps = blk // K
    base = jnp.arange(steps, dtype=i32) * K

    def gstep(endv, xs):
        e, m, b0 = xs
        sels = []
        for kk in range(K):
            s = m[kk] & (b0 + kk >= endv)
            endv = jnp.where(s, e[kk], endv)
            sels.append(s)
        return endv, jnp.stack(sels)

    def run_greedy(Ev):
        _, selc = lax.scan(gstep, jnp.zeros_like(n),
                           (Ev.reshape(steps, K),
                            is_match.reshape(steps, K), base),
                           unroll=_UNROLL)
        return selc.reshape(blk)

    chosen = run_greedy(idx + ml)
    if stage == 4:
        return (jnp.zeros((cap,), jnp.uint8),
                jnp.sum(jnp.where(chosen, idx, 0)).astype(jnp.int32))

    ext_iters = _EXT_ITERS if _EXT_ITERS is not None else (1 if deep
                                                           else 0)
    if hc and _EXT_POOL and ext_iters:
        # --- post-parse exact extension + one-pass absorb -----------
        # The chain-extension above fires only when position i+1
        # SELECTED the same offset; inside long repeats the
        # suffix-order probes often pick a different, equally capped
        # candidate, so the chain breaks and the capped match stays
        # underestimated -- measured on 'code' content as 62-65% of
        # emitted matches truncated, ~10% of the block in lost
        # extension bytes, ~ALL of it running PAST the next chosen
        # match's start (experiments/code_split_diag.py).  Recover
        # serial-parser semantics in two steps: (1) pool the chosen
        # matches whose effective end is capped and measure each TRUE
        # end with gathered 4-byte compares at its own offset; (2)
        # repair coverage in ONE pass -- the running end of the
        # repaired parse is simply the exclusive running max of the
        # extended ends over chosen rows (independent of keep/drop
        # decisions), so each overlapped match is either dropped
        # (fully covered) or MOVED to its trimmed start, where its
        # tail -- at the same offset, already end-exact -- remains a
        # valid match.  Pool overflow or budget exhaustion only costs
        # ratio, never correctness.  Reference analog: serial parsers
        # measure ends exactly before advancing (lz4hc.zig:514-681).
        # pool scales with window size (a 256KB window carries ~4x the
        # chosen matches of the 64KB tuning point)
        P = min(_EXT_POOL * max(blk // 65536, 1), blk)
        offs4 = jnp.arange(0, 16, 4, dtype=i32)
        exted = jnp.zeros((blk,), bool)

        def extend_chosen(chosen, ml, exted):
            """Pool the capped, not-yet-extended chosen ends and
            measure their exact extensions; returns updated (ml,
            exted).  16 bytes per round: one (P, 4)-shaped u32 gather
            per side (fewer, larger gathers -- dispatch dominates at
            this P)."""
            elig = chosen & cap_end & ~exted
            keyx = jnp.where(elig, idx, BIG)
            capv = jnp.clip(n - 5 - (idx + ml), 0, _EXT_BYTES)
            kx, Ep, offp, capp = lax.sort((keyx, idx + ml, off, capv),
                                          num_keys=1)
            i_p, Ep, offp, capp = kx[:P], Ep[:P], offp[:P], capp[:P]
            pool_ok = i_p < BIG
            e_p = jnp.zeros((P,), i32)
            alive = pool_ok & (capp > 0)
            for _ in range(max(_EXT_BYTES // 16, 1)):
                base_p = Ep + e_p
                ia = jnp.clip(base_p[:, None] + offs4, 0, blk - 1)
                ib = jnp.clip((base_p - offp)[:, None] + offs4, 0,
                              blk - 1)
                xw = jnp.take(su, ia) ^ jnp.take(su, ib)     # (P, 4)
                eqw = xw == 0
                pbw = jnp.where(
                    (xw & 0xFF) == 0,
                    jnp.where((xw & 0xFFFF) == 0,
                              jnp.where((xw & 0xFFFFFF) == 0,
                                        3, 2), 1), 0).astype(i32)
                adv = jnp.zeros((P,), i32)
                still = jnp.ones((P,), bool)
                for w in range(4):
                    adv = adv + jnp.where(
                        still, jnp.where(eqw[:, w], 4, pbw[:, w]), 0)
                    still = still & eqw[:, w]
                adv = jnp.minimum(adv, capp - e_p)
                adv = jnp.where(alive, adv, 0)
                e_p = e_p + adv
                alive = alive & still & (e_p < capp)
            tgtp = jnp.where(pool_ok, i_p, blk)
            ml = ml.at[tgtp].add(jnp.where(pool_ok, e_p, 0),
                                 mode='drop')
            exted = exted.at[tgtp].set(True, mode='drop')
            return ml, exted

        # ext_iters > 1: re-run the parse between extension passes so
        # freshly exposed positions select their own full-length
        # candidates (serial-parser reselection) instead of keeping
        # trimmed tails; in DP mode the price DP itself re-runs on
        # the EXTENDED lengths (capped matches were under-priced on
        # the first pass).  The final pass still goes through the
        # absorb below.
        for it in range(ext_iters):
            ml, exted = extend_chosen(chosen, ml, exted)
            if it < ext_iters - 1:
                if use_dp:
                    is_match, t18 = run_dp(ml, valid & (ml >= 4)
                                           & (idx >= start))
                    ml = jnp.where(t18, jnp.minimum(ml, 18), ml)
                    cap_end = cap_end & ~t18
                chosen = run_greedy(idx + ml)

        # one-pass absorb: prevcov = exclusive running max of extended
        # ends over chosen rows.  keep/drop decisions cannot change it
        # (a dropped match's end never exceeds the running max), so a
        # single fill settles all cascades.
        Ev = idx + ml
        fC = lax.cummax(jnp.where(chosen, Ev, 0))
        prevcov = jnp.concatenate([jnp.zeros((1,), i32), fC[:-1]])
        s_new = jnp.maximum(idx, prevcov)
        keep = chosen & (Ev - s_new >= 4)
        movedv = keep & (prevcov > idx)
        chosen = keep & ~movedv
        # moved matches: scatter (chosen, ml, off, back) to the
        # trimmed start rows.  Targets are the ends of the previous
        # kept matches -> strictly increasing -> collision-free, and
        # never equal to a surviving stationary row (that row would
        # itself have been moved).
        keym = jnp.where(movedv, idx, BIG)
        km, pcm, Em, offm = lax.sort((keym, prevcov, Ev, off),
                                     num_keys=1)
        km, pcm, Em, offm = km[:P], pcm[:P], Em[:P], offm[:P]
        okm = km < BIG
        tgt = jnp.where(okm, pcm, blk)
        chosen = chosen.at[tgt].set(True, mode='drop')
        ml = ml.at[tgt].set(jnp.where(okm, Em - pcm, 0), mode='drop')
        off = off.at[tgt].set(jnp.where(okm, offm, 0), mode='drop')
        back = back.at[tgt].set(0, mode='drop')
    if stage == 9:   # post-extension/absorb profiling hook (valid at
        #              every level: ext_iters == 0 returns the
        #              pre-extension parse checksum)
        return (jnp.zeros((cap,), jnp.uint8),
                jnp.sum(jnp.where(chosen, idx + ml, 0))
                .astype(jnp.int32))

    # ========== EMISSION: position-domain fills + ONE grand sort ====
    # Every output byte is published by exactly one row: literal bytes
    # by their own source position, all five header bytes of a
    # sequence (token / lit-escape remainder / offset lo+hi / ml
    # remainder) and the ml-escape middles by the >=4 positions its
    # match COVERS, and the (rare) lit-escape middles plus the tail
    # header by a ~blk/255-row pool.  Sequence boundaries, output
    # offsets and per-byte roles all come from packed cummax fills and
    # cumsums over the position domain -- the ncap compaction sorts
    # and the literal-destination merge of the round-1 design are
    # gone.  (Measured: sorts cost ~0.08 ms/blk each at B=64 while
    # fills are ~10 us, so trading 5 sorts for ~14 fills wins.)
    PB = _bits(blk)                  # idx+1, E+1, blk-idx fit PB bits
    S2 = 31 - PB                     # payload width for PB-prefixed packs
    # hi chunks (field >> 9) of cap-bounded fields must fit S2 bits
    assert _bits(cap + 2) - 9 <= S2, "block too large for emission fills"
    M2 = (1 << S2) - 1

    def shiftr(x, fill):
        """x shifted one position right (exclusive forward fill)."""
        return jnp.concatenate([jnp.full((1,), fill, x.dtype), x[:-1]])

    def shiftl(x, fill):
        """x shifted one position left (exclusive reverse fill)."""
        return jnp.concatenate([x[1:], jnp.full((1,), fill, x.dtype)])

    E = idx + ml
    ch = chosen

    # (E, off) of the last chosen match at <= i: both packs lead with
    # E+1 (strictly increasing over chosen rows) so they agree on rows
    fEh = lax.cummax(jnp.where(ch, ((E + 1) << 8) | (off >> 8), -1))
    fEl = lax.cummax(jnp.where(ch, ((E + 1) << 8) | (off & 0xFF), -1))
    lastE_in = jnp.where(fEh >= 0, (fEh >> 8) - 1, -1)
    lastOff_in = ((fEh & 0xFF) << 8) | (fEl & 0xFF)
    fEh_x, fEl_x = shiftr(fEh, -1), shiftr(fEl, -1)
    lastE_x = jnp.where(fEh_x >= 0, (fEh_x >> 8) - 1, -1)
    lastOff_x = ((fEh_x & 0xFF) << 8) | (fEl_x & 0xFF)

    # chain-link detection: previous chosen ends exactly here with the
    # same offset -> this selection continues a longer physical match
    link = ch & (lastE_x == idx) & (lastOff_x == off)
    head = ch & ~link

    # (start, off) of the next chosen match at >= i (reverse fills)
    fSh = lax.cummax(jnp.where(ch, ((blk - idx) << 8) | (off >> 8), -1),
                     reverse=True)
    fSl = lax.cummax(jnp.where(ch, ((blk - idx) << 8) | (off & 0xFF),
                               -1), reverse=True)
    fSh_n, fSl_n = shiftl(fSh, -1), shiftl(fSl, -1)
    nextStart = jnp.where(fSh_n >= 0, blk - (fSh_n >> 8), BIG)
    nextOff = ((fSh_n & 0xFF) << 8) | (fSl_n & 0xFF)
    is_end = ch & ~((nextStart == E) & (nextOff == off))

    # E of the nearest chain-run end at >= i -> merged match end
    fMh = lax.cummax(jnp.where(is_end,
                               ((blk - idx) << S2) | (E >> 9), -1),
                     reverse=True)
    fMl = lax.cummax(jnp.where(is_end,
                               ((blk - idx) << S2) | (E & 0x1FF), -1),
                     reverse=True)
    EM = ((fMh & M2) << 9) | (fMl & 0x1FF)

    # --- per-head sequence fields (meaningful at head rows) ---
    prevEnd = jnp.maximum(lastE_x, start)     # previous sequence end
    lit_raw = idx - prevEnd
    backq = jnp.clip(jnp.minimum(jnp.minimum(back, lit_raw), idx - off),
                     0, None)
    backq = jnp.where(head, backq, 0)
    mml_h = (EM - idx) + backq                # merged + back-extended
    lit_len_h = lit_raw - backq
    lit_ext_h = jnp.where(lit_len_h >= 15,
                          1 + (lit_len_h - 15) // 255, 0)
    ml_ext_h = jnp.where(mml_h - 4 >= 15, 1 + (mml_h - 19) // 255, 0)
    seqlen_h = 1 + lit_ext_h + lit_len_h + 2 + ml_ext_h
    seqcost = jnp.where(head, seqlen_h, 0)
    cum = jnp.cumsum(seqcost)     # at i: total output of seqs with
    #                               head <= i (inclusive)
    if stage == 5:
        return (jnp.zeros((cap,), jnp.uint8),
                jnp.sum(cum + backq + EM).astype(jnp.int32))

    # --- head -> covered-byte fills ---
    fH = lax.cummax(jnp.where(head, (idx << 2) | backq, -1))
    lastHead = fH >> 2
    lastBq = fH & 3
    fLh = lax.cummax(jnp.where(head,
                               ((idx + 1) << S2) | (seqlen_h >> 9), -1))
    fLl = lax.cummax(jnp.where(head,
                               ((idx + 1) << S2) | (seqlen_h & 0x1FF),
                               -1))
    seqlen_f = ((fLh & M2) << 9) | (fLl & 0x1FF)
    fGh = lax.cummax(jnp.where(head,
                               ((idx + 1) << S2) | (mml_h >> 9), -1))
    fGl = lax.cummax(jnp.where(head,
                               ((idx + 1) << S2) | (mml_h & 0x1FF), -1))
    mml_f = ((fGh & M2) << 9) | (fGl & 0x1FF)

    # next head at >= i with its back-extension (literal upper bound)
    fN = lax.cummax(jnp.where(head, ((blk - idx) << 2) | backq, -1),
                    reverse=True)
    nh = jnp.where(fN >= 0, blk - (fN >> 2), BIG)
    nbq = jnp.where(fN >= 0, fN & 3, 0)
    lit_end_lim = jnp.minimum(nh - nbq, n)

    # --- literal classification + destination (pure position math) --
    covered = lastE_in > idx
    is_lit = (idx >= start) & (idx < n) & ~covered & (idx < lit_end_lim)
    LS = jnp.maximum(lastE_in, start)         # own literal-run start
    lit_len_i = lit_end_lim - LS
    lit_ext_i = jnp.where(lit_len_i >= 15,
                          1 + (lit_len_i - 15) // 255, 0)
    dest = cum + 1 + lit_ext_i + (idx - LS)
    if stage == 6:
        return (jnp.zeros((cap,), jnp.uint8),
                jnp.sum(jnp.where(is_lit, dest, 0)).astype(jnp.int32))

    # --- covered-byte header roles ---
    # A merged match covers [lastHead, EM_own) = ml2 >= 4 rows; by
    # rel = i - lastHead they publish token / lit-rem / off lo / off
    # hi / ml-rem / ml-escape middles.  Sequence output coordinates
    # derive from cum: at a covered byte, cum includes the own head,
    # so cum == out_start + seqlen (the sequence's output end).
    rel = idx - lastHead
    own_len = seqlen_f
    out_end = cum
    out_start_o = out_end - own_len
    ml_ext_o = jnp.where(mml_f - 4 >= 15, 1 + (mml_f - 19) // 255, 0)
    pos_off = out_end - 2 - ml_ext_o
    # invert lit_len + lit_ext from S = seqlen - 3 - ml_ext (exact:
    # S = 16 + 256q + r for lit_len = 15 + 255q + r, r < 255)
    S = own_len - 3 - ml_ext_o
    lit_ext_o = jnp.where(S >= 16, 1 + (S - 16) // 256, 0)
    lit_len_o = S - lit_ext_o
    lit_rem_o = jnp.clip(lit_len_o - 15 - 255 * (lit_ext_o - 1), 0,
                         254)
    ml_rem_o = jnp.clip(mml_f - 19 - 255 * (ml_ext_o - 1), 0, 254)
    token_o = (jnp.minimum(lit_len_o, 15) << 4) | jnp.minimum(
        mml_f - 4, 15)
    off_o = lastOff_in
    cm_o = jnp.maximum(ml_ext_o - 1, 0)

    key_cov = jnp.where(
        rel == 0, out_start_o,
        jnp.where((rel == 1) & (lit_ext_o >= 1),
                  out_start_o + lit_ext_o,
                  jnp.where(rel == 2, pos_off,
                            jnp.where(rel == 3, pos_off + 1,
                                      jnp.where((rel == 4)
                                                & (ml_ext_o >= 1),
                                                pos_off + 1 + ml_ext_o,
                                                jnp.where(
                                                    (rel >= 5)
                                                    & (rel - 5 < cm_o),
                                                    pos_off + rel - 3,
                                                    BIG))))))
    val_cov = jnp.where(
        rel == 0, token_o,
        jnp.where(rel == 1, lit_rem_o,
                  jnp.where(rel == 2, off_o & 0xFF,
                            jnp.where(rel == 3, off_o >> 8,
                                      jnp.where(rel == 4, ml_rem_o,
                                                255)))))

    # --- tail literal-only sequence (scalars) ---
    tail_start = jnp.maximum(jnp.max(jnp.where(ch, E, -1)), start)
    tail_lit = n - tail_start
    tail_ext = jnp.where(tail_lit >= 15, 1 + (tail_lit - 15) // 255, 0)
    tail_token = jnp.minimum(tail_lit, 15) << 4
    tail_rem = jnp.clip(tail_lit - 15 - 255 * (tail_ext - 1), 0, 254)
    total_cum = cum[blk - 1]
    out_len = total_cum + 1 + tail_ext + tail_lit

    # --- lit-escape-middle pool (plus tail middles) ---
    # counts are tiny (sum lit_len <= blk -> <= blk/255 + 1 middles);
    # anchors (sequences with middles) are compacted by one 2-operand
    # sort, pool positions by one tiny merge
    GP = max(blk // 255 + 8, 8)
    cl_h = jnp.where(head, jnp.maximum(lit_ext_h - 1, 0), 0)
    cum_cl = jnp.cumsum(cl_h) - cl_h
    first_pos_h = (cum - seqcost) + 1         # out_start + 1 at heads
    cl_tail = jnp.maximum(tail_ext - 1, 0)
    total_cl = jnp.sum(cl_h) + cl_tail
    # anchor rows: (cum_cl, first_pos - cum_cl + 1) packed; + tail
    S4 = _bits(cap + 2)              # payload width for pool packs
    assert _bits(GP + 2) + S4 <= 31, "block too large for pool packs"
    ak_pos = jnp.where(head & (cl_h > 0), cum_cl, BIG)
    av_pos = jnp.where(head & (cl_h > 0),
                       ((cum_cl + 1) << S4)
                       | (first_pos_h - cum_cl + 1), -1)
    tk = jnp.where(cl_tail > 0, jnp.sum(cl_h), BIG)[None]
    tv = ((jnp.sum(cl_h) + 1) << S4)[None] | \
        (total_cum + 2 - jnp.sum(cl_h))[None]
    aks, avs = lax.sort(
        (jnp.concatenate([ak_pos, tk]), jnp.concatenate([av_pos, tv])),
        num_keys=1)
    aks, avs = aks[:GP], avs[:GP]             # <= blk/270+1 anchors
    gi = jnp.arange(GP, dtype=i32)
    kk = jnp.concatenate([aks * 2, gi * 2 + 1])
    vv = jnp.concatenate([avs, jnp.full((GP,), -1, i32)])
    kks, vvs = lax.sort((kk, vv), num_keys=1, is_stable=True)
    fP = lax.cummax(vvs)
    pool_pos = (fP & ((1 << S4) - 1)) - 1 + (kks >> 1)
    isq = (kks & 1) == 1
    pk_pool = jnp.where(isq & ((kks >> 1) < total_cl) & (fP >= 0),
                        pool_pos, BIG)
    _, mid_pos = lax.sort((jnp.where(isq, kks >> 1, BIG), pk_pool),
                          num_keys=1)
    mid_pos = mid_pos[:GP]

    # --- grand placement: ONE sort IS the dense output ---
    k_data = jnp.where(is_lit, dest,
                       jnp.where(covered & (idx >= start), key_cov,
                                 BIG))
    v_data = jnp.where(is_lit, b, val_cov)
    tail_keys = jnp.stack([total_cum,
                           jnp.where(tail_ext >= 1,
                                     total_cum + tail_ext, BIG)])
    tail_vals = jnp.stack([tail_token, tail_rem])
    k8 = jnp.concatenate([k_data, mid_pos, tail_keys])
    v8 = jnp.concatenate([v_data, jnp.full((GP,), 255, i32),
                          tail_vals])
    k8s, vx = lax.sort((k8, jnp.where(k8 < BIG, v8, 0)), num_keys=1)
    # row count (blk + GP + 2) can sit a few bytes under cap; pad so
    # the output buffer always has the compress_bound shape
    vx = jnp.pad(vx, (0, max(cap - vx.shape[0], 0)))
    if stage == 7:
        return (jnp.zeros((cap,), jnp.uint8),
                jnp.sum(vx[:cap]).astype(jnp.int32))
    out = vx[:cap].astype(jnp.uint8)

    out_len = jnp.where(n == start, 0, out_len)
    return out, out_len


def level_params(level: int) -> tuple[int, int]:
    """Map a compression level to (hc probes, deep rank rounds).

    Levels <= 1: the fast nearest-2 finder.  Levels 2..9: suffix-order
    probes = level over the 12-byte lexicographic sort (measured
    diminishing returns past ~8; level 9 pays one extra probe pair).
    Levels 10..12: 8 probes over progressively deeper EXACT-rank
    orders -- 64 / 256 / 1024-byte lexicographic depth with exact
    long-match tiers (the device analog of the reference's optimal
    strategy levels, lz4hc.zig:72-86).  Every level is a distinct
    configuration; no silent aliasing."""
    level = int(level)
    if level <= 1:
        return 0, 0
    if level <= 9:
        return level, 0
    return 8, min(level - 9, 3)


def hc_probes(level: int) -> int:
    """Back-compat shim: probe depth only (see level_params)."""
    return level_params(level)[0]


@functools.lru_cache(maxsize=None)
def make_block_encoder(blk: int, hc: int = 0, deep: int = 0,
                       accel: int = 1):
    """Build a jitted encoder for windows of capacity ``blk`` bytes.

    Returns fn(data uint8[blk], n int32, start int32=0)
            -> (out uint8[bound], len).
    vmap over a leading axis for batched multi-block encode; pass a
    nonzero ``start`` for dictionary / linked-history encoding,
    ``hc`` > 0 for the HC-class finder and ``deep`` > 0 for the
    optimal-class long-match tiers (see _encode_block).  ``accel``
    (fast mode only, reference src/lz4.zig:292 compressFast(accel))
    trades ratio for speed via fast_params.
    """
    W, probes = fast_params(accel) if not hc else (_W, 2)
    fn = functools.partial(_encode_block, blk=blk, hc=hc, deep=deep,
                           W=W, fast_probes=probes)
    jfn = jax.jit(fn)

    def call(data, n, start=0):
        return jfn(data, n, jnp.asarray(start, jnp.int32))
    return call


@functools.lru_cache(maxsize=None)
def _batched_encoder(blk: int, hc: int = 0, deep: int = 0,
                     accel: int = 1):
    W, probes = fast_params(accel) if not hc else (_W, 2)
    fn = functools.partial(_encode_block, blk=blk, hc=hc, deep=deep,
                           W=W, fast_probes=probes)
    return jax.jit(jax.vmap(fn))


def encode_blocks_jax(blocks, lengths, blk: int, starts=None,
                      hc: int = 0, deep: int = 0, accel: int = 1):
    """Batched block encode: blocks uint8[B, blk], lengths int32[B],
    optional starts int32[B] (history/dictionary prefix lengths)."""
    import numpy as np
    if starts is None:
        starts = np.zeros(blocks.shape[0], np.int32)
    return _batched_encoder(blk, hc, deep, accel)(blocks, lengths,
                                                  starts)


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


def _frag_geometry(blk: int, fcap: int, fetch_cap: int):
    """Chunk layout for the fragment decoder's rank-prefixed packs.

    Fields (fdst < blk, fsrc < fetch_cap, fper <= 65535,
    fphase < fper) ride the merge sort as CW-bit chunks prefixed by
    the fragment rank+1, plus one leftover chunk -- 5 value operands
    total.  Returns (CW, r1, r2, r3, r4) or None when the layout does
    not fit int32."""
    QB = _bits(fcap + 1)
    CW = 31 - QB
    r1 = max(_bits(blk) - CW, 0)
    r2 = max(_bits(fetch_cap) - CW, 0)
    r3 = max(16 - CW, 0)
    r4 = r3
    if CW < 1 or r1 + r2 + r3 + r4 > CW or _bits(fetch_cap) + 10 > 31:
        return None
    return CW, r1, r2, r3, r4


def device_frag_decoder_supports(blk: int, fcap: int | None = None,
                                 fetch_cap: int | None = None) -> bool:
    """True when the fragment decoder's pack geometry covers
    ``blk``-byte outputs fetching from ``fetch_cap`` source bytes
    (compressed payload + optional dictionary/history prefix)."""
    fcap = fcap or blk // 2
    fetch_cap = fetch_cap or compress_bound(blk)
    return (_frag_geometry(blk, fcap, fetch_cap) is not None
            and _bits(blk) + 10 <= 31)


def device_win_decoder_supports(blk: int, fcap: int | None = None,
                                fetch_cap: int | None = None) -> bool:
    """True when the WINDOWED fragment decoder's chunk packs cover
    this geometry (64KB blocks; 256KB outgrows the 16-bit chunk +
    publisher-rank int32 budget and stays on the byte-granular
    decoder)."""
    fcap = fcap or blk // 2
    fetch_cap = fetch_cap or compress_bound(blk)
    return (blk % 64 == 0
            and _frag_geometry(blk, fcap, fetch_cap) is not None
            and _bits(blk // 8 + 1) + 16 <= 31
            and _bits(fetch_cap + 1) + 9 <= 31)


def _decode_block_frags(comp, fdst, fsrc, fper, fphase, nfrag,
                        out_len, *, blk: int, fcap: int, rounds: int,
                        stage: int = 0):
    """Round-bounded device reconstruction from host-resolved
    fragments (see native lz4tpu_resolve_blocks).

    Every fragment maps output bytes to a source:
      LIT (fper == 0): out[fdst+k] = comp[fsrc+k]
      PER (fper > 0):  out[fdst+k] = out[fsrc + (fphase+k) % fper]
    ``comp`` is the fetch buffer -- the compressed payload, optionally
    with the dictionary/history window prepended (fsrc pre-shifted by
    the resolver's hist_len).

    All merges use PARITY-PACKED keys (publishers at 2k, queries at
    2k+1 -- unique keys, so no second sort key and no stable-sort
    cost) and rank-prefixed chunk packs, measured ~2x faster per merge
    than the round-1 field-per-operand layout.  reference decode
    semantics: src/lz4.zig:89-251.
    """
    i32 = jnp.int32
    BIG = jnp.int32(1 << 28)
    geo = _frag_geometry(blk, fcap, comp.shape[0])
    assert geo is not None, "fragment pack geometry does not fit"
    CW, r1, r2, r3, r4 = geo
    CM = (1 << CW) - 1
    fq = jnp.arange(fcap, dtype=i32)
    fl = fq < nfrag
    j = lax.broadcasted_iota(i32, (blk, 1), 0).squeeze(-1)

    # --- merge A: fill per-byte fragment params ---
    lefts = ((fdst >> CW) | ((fsrc >> CW) << r1)
             | ((fper >> CW) << (r1 + r2))
             | ((fphase >> CW) << (r1 + r2 + r3)))
    rank = (fq + 1) << CW

    def pk(part):
        return jnp.where(fl, rank | (part & CM), -1)

    kk = jnp.concatenate([jnp.where(fl, fdst * 2, BIG), j * 2 + 1])
    za = jnp.full((blk,), -1, i32)
    kks, pAs, pBs, pCs, pEs, pDs = lax.sort(
        (kk,
         jnp.concatenate([pk(fdst), za]),
         jnp.concatenate([pk(fsrc), za]),
         jnp.concatenate([pk(fper), za]),
         jnp.concatenate([pk(fphase), za]),
         jnp.concatenate([pk(lefts), za])),
        num_keys=1)
    fA, fB, fC, fE, fD = (lax.cummax(pAs), lax.cummax(pBs),
                          lax.cummax(pCs), lax.cummax(pEs),
                          lax.cummax(pDs))
    lf = fD & CM
    FD = (fA & CM) | ((lf & ((1 << r1) - 1)) << CW)
    FS = (fB & CM) | (((lf >> r1) & ((1 << r2) - 1)) << CW)
    FP = (fC & CM) | (((lf >> (r1 + r2)) & ((1 << r3) - 1)) << CW)
    FH = (fE & CM) | (((lf >> (r1 + r2 + r3))
                       & ((1 << r4) - 1)) << CW)
    ok = fA >= 0
    rel = (kks >> 1) - FD
    is_per = FP > 0
    t = jnp.where(is_per, FS + (FH + rel) % jnp.maximum(FP, 1),
                  FS + rel)
    t = jnp.where(ok, t, 0)
    if stage == 1:
        return (t + kks).astype(jnp.uint8)
    # extract byte rows back to output order
    isb = (kks & 1) == 1
    _, tp = lax.sort((jnp.where(isb, kks >> 1, BIG),
                      (t << 1) | is_per.astype(i32)), num_keys=1)
    T = tp[:blk] >> 1
    PERB = (tp[:blk] & 1) == 1
    live = j < out_len
    if stage == 2:
        return (T + PERB).astype(jnp.uint8)

    # --- merge B: literal bytes from the fetch buffer ---
    ccap = comp.shape[0]
    cs = jnp.arange(ccap, dtype=i32)
    qk = jnp.where(live & ~PERB, T * 2 + 1, BIG)
    # pb carries j+1 on EVERY byte row (dead queries included) so the
    # extraction below returns a dense j-ordered column
    kb, vb, pb = lax.sort(
        (jnp.concatenate([cs * 2, qk]),
         jnp.concatenate([((cs + 1) << 9) | comp.astype(i32),
                          jnp.full((blk,), -1, i32)]),
         jnp.concatenate([jnp.zeros((ccap,), i32), j + 1])),
        num_keys=1)
    fv = lax.cummax(vb)
    isq = (kb & 1) == 1
    hit = isq & ((fv >> 9) - 1 == (kb >> 1))
    _, litv = lax.sort((jnp.where(pb > 0, pb - 1, BIG),
                        jnp.where(hit, fv & 0xFF, 0)), num_keys=1)
    value = jnp.where(live & ~PERB, litv[:blk], 0)
    known = (~live) | ~PERB
    if stage == 3:
        return value.astype(jnp.uint8)

    # --- periodic rounds: known bytes publish, unresolved query T ---
    for _ in range(max(rounds, 0)):
        pubv = jnp.where(known, ((j + 1) << 9) | value, -1)
        qk2 = jnp.where(known, BIG, T * 2 + 1)
        kr, vr, pr = lax.sort(
            (jnp.concatenate([j * 2, qk2]),
             jnp.concatenate([pubv, jnp.full((blk,), -1, i32)]),
             jnp.concatenate([jnp.zeros((blk,), i32), j + 1])),
            num_keys=1)
        fvr = lax.cummax(vr)
        isq2 = (kr & 1) == 1
        got = isq2 & ((fvr >> 9) - 1 == (kr >> 1))
        _, rv = lax.sort((jnp.where(pr > 0, pr - 1, BIG),
                          jnp.where(got, fvr & 0xFF, -1)), num_keys=1)
        newly = (~known) & (rv[:blk] >= 0)
        value = jnp.where(newly, rv[:blk], value)
        known = known | newly

    out = jnp.where(live, value, 0)
    return out.astype(jnp.uint8)


def _decode_block_frags_win(comp, fdst, fsrc, fper, fphase, nfrag,
                            out_len, *, blk: int, fcap: int,
                            rounds: int, wins: int = 2,
                            pool: int = 512, lit_wins: int = 3,
                            lit_pool: int = 1024, g: int = 8):
    """WINDOWED fragment decoder -- the round-3 fast path.

    Same contract as _decode_block_frags, but each periodic round
    sorts ~blk/2.7 rows instead of 4*blk:

      * PUBLISHERS sit at every 8th position and carry an aligned
        16-byte window of the value state as rank-prefixed 16-bit
        chunk operands -- sort cost is nearly independent of operand
        count, so wide windows ride free.  Known-ness is a SENTINEL
        (-1 = unknown), so no separate flag state exists.
      * QUERIES are per 8-byte output GROUP: ``wins`` aligned windows
        cover the first source run, the last, and (wins >= 3) the
        first byte those two miss -- a group touching <= wins source
        runs resolves from window fetches alone.
      * Leftover bytes (tiny fragments / mid-group period wraps) ride
        a POOL of per-byte queries, applied back to the dense state
        with ONE pool-sized scatter per round (measured fine at this
        size; the round-1 gather/scatter ban is about blk-sized
        operands).  Measured uncovered-byte budgets (HC-class
        streams, experiments/README.md): periodic side p90 < 120
        bytes at wins=2; literal side needs wins=3..4 on fast tiers
        and stays byte-granular (lit_wins=0) on the deep tier.

    SELF-VALIDATING: returns (out, ok).  ok=False when a pool
    overflowed or any live byte stayed unresolved; the caller
    re-routes those blocks to the byte-granular decoder or the host
    codec, so correctness never depends on the pool bounds.
    reference decode semantics: src/lz4.zig:89-251.

    ``g`` is the group/publisher stride: publishers sit at every
    g-th position carrying an aligned 2g-byte window (g 16-bit chunk
    operands + ceil(2g/16) validity-mask operands); queries are per
    g-byte output group.  g=16 halves the per-round sort rows
    (queries dominate) at the cost of wider (free-ish) operand rows
    and more pool pressure -- the wide-group lever from the round-4
    chip queue.
    """
    i32 = jnp.int32
    BIG = jnp.int32(1 << 28)
    G = g
    assert G in (8, 16), "windowed decoder supports g in (8, 16)"
    gsh = G.bit_length() - 1
    W = 2 * G                       # window bytes per publisher
    nmask = W // 16                 # 16-bit validity operands
    assert blk % 64 == 0, "windowed decoder needs blk % 64 == 0"
    NG = blk // G                   # output groups == publishers
    NP = NG
    ccap = comp.shape[0]
    P = pool
    assert _bits(NP + 1) + 16 <= 31, "chunk pack overflow (blk too large)"
    assert _bits(ccap + 1) + 9 <= 31, "fetch buffer too large"

    geo = _frag_geometry(blk, fcap, ccap)
    assert geo is not None, "fragment pack geometry does not fit"
    CW, r1, r2, r3, r4 = geo
    CM = (1 << CW) - 1
    fq = jnp.arange(fcap, dtype=i32)
    fl = fq < nfrag
    j = lax.broadcasted_iota(i32, (blk, 1), 0).squeeze(-1)

    # ---- merge A: per-byte fragment params (as the byte decoder) ---
    lefts = ((fdst >> CW) | ((fsrc >> CW) << r1)
             | ((fper >> CW) << (r1 + r2))
             | ((fphase >> CW) << (r1 + r2 + r3)))
    rank = (fq + 1) << CW

    def pk(part):
        return jnp.where(fl, rank | (part & CM), -1)

    kk = jnp.concatenate([jnp.where(fl, fdst * 2, BIG), j * 2 + 1])
    za = jnp.full((blk,), -1, i32)
    kks, pAs, pBs, pCs, pEs, pDs = lax.sort(
        (kk,
         jnp.concatenate([pk(fdst), za]),
         jnp.concatenate([pk(fsrc), za]),
         jnp.concatenate([pk(fper), za]),
         jnp.concatenate([pk(fphase), za]),
         jnp.concatenate([pk(lefts), za])),
        num_keys=1)
    fA, fB, fC, fE, fD = (lax.cummax(pAs), lax.cummax(pBs),
                          lax.cummax(pCs), lax.cummax(pEs),
                          lax.cummax(pDs))
    lf = fD & CM
    FD = (fA & CM) | ((lf & ((1 << r1) - 1)) << CW)
    FS = (fB & CM) | (((lf >> r1) & ((1 << r2) - 1)) << CW)
    FP = (fC & CM) | (((lf >> (r1 + r2)) & ((1 << r3) - 1)) << CW)
    FH = (fE & CM) | (((lf >> (r1 + r2 + r3))
                       & ((1 << r4) - 1)) << CW)
    ok_row = fA >= 0
    rel = (kks >> 1) - FD
    is_per = FP > 0
    t = jnp.where(is_per, FS + (FH + rel) % jnp.maximum(FP, 1),
                  FS + rel)
    t = jnp.where(ok_row, t, 0)
    isb = (kks & 1) == 1
    _, tp = lax.sort((jnp.where(isb, kks >> 1, BIG),
                      (t << 1) | is_per.astype(i32)), num_keys=1)
    T = tp[:blk] >> 1
    PERB = (tp[:blk] & 1) == 1
    live = j < out_len

    TB = _bits(max(blk, ccap) + 16)
    kidx = lax.broadcasted_iota(i32, (NG, G), 1)
    Tg_all = T.reshape(NG, G)

    def win_first(unres_g):
        """Aligned publisher index of the first not-yet-covered byte
        per group + per-byte (offset, coverage)."""
        m1 = jnp.min(jnp.where(unres_g, (kidx << TB) | Tg_all, BIG),
                     axis=1)
        A = jnp.where(m1 < BIG, (m1 & ((1 << TB) - 1)) >> gsh, BIG)
        Ab = jnp.broadcast_to(A[:, None], (NG, G)).reshape(blk)
        d = T - Ab * G
        c = (d >= 0) & (d < W)
        return A, d, c

    def win_last(unres_g):
        m2 = jnp.max(jnp.where(unres_g, (kidx << TB) | Tg_all, -1),
                     axis=1)
        Tlast = m2 & ((1 << TB) - 1)
        A = jnp.where(m2 >= 0,
                      jnp.maximum(Tlast - (G - 1), 0) >> gsh, BIG)
        Ab = jnp.broadcast_to(A[:, None], (NG, G)).reshape(blk)
        d = T - Ab * G
        c = (d >= 0) & (d < W)
        return A, d, c

    def windows_and_pool(unres, nwins, npool):
        """``nwins`` per-group windows + a pool of the leftovers.
        Returns ([(A, d, cov)], pool_j, pool_T, pool_alive)."""
        ug = unres.reshape(NG, G)
        A1, d1, c1 = win_first(ug)
        out = [(A1, d1, unres & c1)]
        cov = c1
        if nwins >= 2:
            A2, d2, c2 = win_last(ug)
            out.append((A2, d2, unres & c2))
            cov = cov | c2
        for _ in range(nwins - 2):
            Aw, dw, cw = win_first(ug & ~cov.reshape(NG, G))
            out.append((Aw, dw, unres & cw))
            cov = cov | cw
        uncovered = unres & ~cov
        pkx, pj_, pT_ = lax.sort(
            (jnp.where(uncovered, j, BIG), j, T), num_keys=1)
        alive = pkx[:npool] < BIG
        return (out, jnp.where(alive, pj_[:npool], blk),
                jnp.where(alive, pT_[:npool], 0), alive)

    def windowed_fetch(pub_ops, npubs, winset, pT, palive, npool):
        """One windowed merge: dense publishers + per-window group
        queries + pool queries -> per-slot chunk rows."""
        BK = jnp.int32(1 << 29)
        nw = len(winset)
        kq = jnp.concatenate(
            [jnp.arange(npubs, dtype=i32) * 2]
            + [jnp.where(A < BIG, A * 2 + 1, BK) for A, _d, _c in winset]
            + [jnp.where(palive, (pT >> gsh) * 2 + 1, BK)])
        slot = jnp.concatenate(
            [jnp.full((npubs,), BIG, i32)]
            + [jnp.arange(NG, dtype=i32) + w * NG for w in range(nw)]
            + [jnp.arange(npool, dtype=i32) + nw * NG])
        NQ = nw * NG + npool
        qz = jnp.full((NQ,), -1, i32)
        rows = [jnp.concatenate([op, qz]) for op in pub_ops]
        srt = lax.sort((kq, slot) + tuple(rows), num_keys=1)
        fills = [lax.cummax(x) for x in srt[2:]]
        es = lax.sort((srt[1],) + tuple(fills), num_keys=1)
        return [x[:NQ] & 0xFFFF for x in es[1:1 + len(pub_ops)]]

    def chunk_select(rows_, d):
        """Byte ``d`` (0..W-1) of a W-byte chunk row set."""
        ci = jnp.clip(d, 0, W - 1) >> 1
        ch = rows_[0]
        for c in range(1, W // 2):
            ch = jnp.where(ci == c, rows_[c], ch)
        return (ch >> ((d & 1) * 8)) & 0xFF

    def apply_windows(value, chunks, winset):
        """Resolve group bytes from their window fetches (literal
        path: the fetch buffer is static data, every byte known)."""
        for w, (A, d, cov) in enumerate(winset):
            rows_ = [jnp.broadcast_to(
                c[w * NG:(w + 1) * NG][:, None], (NG, G)).reshape(blk)
                for c in chunks]
            byte = chunk_select(rows_, d)
            newly = cov & (value < 0)
            value = jnp.where(newly, byte, value)
        return value

    # ---- literal fill ---------------------------------------------
    lit_unres = live & ~PERB
    if lit_wins:
        # windowed: comp publishers are static data, always known
        NPC = -(-ccap // G)
        assert _bits(NPC + 1) + 16 <= 31, "fetch chunk pack overflow"
        winL, pjL, pTL, palL = windows_and_pool(lit_unres, lit_wins,
                                                lit_pool)
        cpad = jnp.concatenate(
            [comp.astype(i32),
             jnp.zeros(((NPC + 2) * G - ccap,), i32)])
        Rc = cpad.reshape(NPC + 2, G)
        W16c = jnp.concatenate([Rc[:NPC], Rc[1:NPC + 1]], axis=1)
        cidx = jnp.arange(NPC, dtype=i32)
        ops_c = []
        for c in range(W // 2):
            ch = W16c[:, 2 * c] | (W16c[:, 2 * c + 1] << 8)
            ops_c.append(((cidx + 1) << 16) | ch)
        chL = windowed_fetch(ops_c, NPC, winL, pTL, palL, lit_pool)
        value = jnp.where(live, -1, 0)
        value = apply_windows(value, chL, winL)
        nwL = len(winL)
        prL = [c[nwL * NG:] for c in chL]
        pbyteL = chunk_select(prL, pTL & (G - 1))
        idxL = jnp.where(palL, pjL, blk)
        value = value.at[idxL].set(pbyteL, mode='drop')
    else:
        # byte-granular merge (always exact, no pool)
        cs = jnp.arange(ccap, dtype=i32)
        lit_q = jnp.where(lit_unres, T * 2 + 1, BIG)
        kb, vb, pb = lax.sort(
            (jnp.concatenate([cs * 2, lit_q]),
             jnp.concatenate([((cs + 1) << 9) | comp.astype(i32),
                              jnp.full((blk,), -1, i32)]),
             jnp.concatenate([jnp.zeros((ccap,), i32), j + 1])),
            num_keys=1)
        fv = lax.cummax(vb)
        isq = (kb & 1) == 1
        hit = isq & ((fv >> 9) - 1 == (kb >> 1))
        _, litv = lax.sort((jnp.where(pb > 0, pb - 1, BIG),
                            jnp.where(hit, fv & 0xFF, -1)), num_keys=1)
        value = jnp.where(live, -1, 0)
        value = jnp.where(lit_unres, litv[:blk], value)

    # ---- periodic rounds: windowed merges over output state -------
    # value >= 0 IS the known flag (sentinel -1 = unresolved); the
    # publisher chunks carry value & 0xFF plus a per-window KNOWN
    # MASK operand folded into the 9th chunk slot... the mask rides
    # as chunk operand 8 is NOT available (8 chunks carry 16 bytes),
    # so known-ness rides IN-BAND: unknown bytes publish 0 and a
    # 16-bit validity mask is packed as a ninth operand.
    per_unres = live & PERB
    winR, pjR, pTR, palR = windows_and_pool(per_unres, wins, P)
    pdR = pTR & (G - 1)
    pool_live = palR
    nwR = len(winR)

    pidx = jnp.arange(NP, dtype=i32)
    BK = jnp.int32(1 << 29)
    kq_static = jnp.concatenate(
        [pidx * 2]
        + [jnp.where(A < BIG, A * 2 + 1, BK) for A, _d, _c in winR]
        + [jnp.where(palR, (pTR >> gsh) * 2 + 1, BK)])
    slot_static = jnp.concatenate(
        [jnp.full((NP,), BIG, i32)]
        + [jnp.arange(NG, dtype=i32) + w * NG for w in range(nwR)]
        + [jnp.arange(P, dtype=i32) + nwR * NG])
    NQR = nwR * NG + P
    qzR = jnp.full((NQR,), -1, i32)

    for _ in range(max(rounds, 0)):
        vpad = jnp.concatenate([value, jnp.full((W,), -1, i32)])
        Rv = vpad.reshape(NP + 2, G)
        W16v = jnp.concatenate([Rv[:NP], Rv[1:NP + 1]], axis=1)
        pub_ops = []
        for c in range(W // 2):
            b0 = jnp.maximum(W16v[:, 2 * c], 0)
            b1 = jnp.maximum(W16v[:, 2 * c + 1], 0)
            pub_ops.append(((pidx + 1) << 16) | b0 | (b1 << 8))
        for m in range(nmask):
            maskp = jnp.zeros((NP,), i32)
            for d in range(16):
                maskp = maskp | ((W16v[:, 16 * m + d] >= 0)
                                 .astype(i32) << d)
            pub_ops.append(((pidx + 1) << 16) | maskp)

        rows = [jnp.concatenate([op, qzR]) for op in pub_ops]
        srt = lax.sort((kq_static, slot_static) + tuple(rows),
                       num_keys=1)
        fills = [lax.cummax(x) for x in srt[2:]]
        es = lax.sort((srt[1],) + tuple(fills), num_keys=1)
        nch = W // 2
        chunks = [x[:NQR] & 0xFFFF for x in es[1:1 + nch]]
        masks = [es[1 + nch + m][:NQR] & 0xFFFF for m in range(nmask)]

        def mask_bit(mrows, d):
            """Validity bit for window byte ``d`` (0..W-1)."""
            sel = mrows[0]
            for m in range(1, nmask):
                sel = jnp.where((d >> 4) == m, mrows[m], sel)
            return (sel >> (d & 15)) & 1

        for w, (A, d, cov) in enumerate(winR):
            rows_ = [jnp.broadcast_to(
                c[w * NG:(w + 1) * NG][:, None], (NG, G)).reshape(blk)
                for c in chunks]
            mrows = [jnp.broadcast_to(
                mk[w * NG:(w + 1) * NG][:, None],
                (NG, G)).reshape(blk) for mk in masks]
            byte = chunk_select(rows_, d)
            bit = mask_bit(mrows, jnp.clip(d, 0, W - 1))
            newly = cov & (value < 0) & (bit == 1)
            value = jnp.where(newly, byte, value)
        # pool: per-byte fetch + ONE dense scatter (sentinel known)
        prow = [c[nwR * NG:] for c in chunks]
        pmrows = [mk[nwR * NG:] for mk in masks]
        pbyte = chunk_select(prow, pdR)
        pbit = mask_bit(pmrows, pdR)
        pnew = pool_live & (pbit == 1)
        idx = jnp.where(pnew, pjR, blk)
        value = value.at[idx].set(pbyte, mode='drop')
        pool_live = pool_live & ~pnew

    ok = jnp.all(value >= 0)
    out = jnp.where(live & (value >= 0), value, 0)
    return out.astype(jnp.uint8), ok


def device_chase_decoder_supports(blk: int, fcap: int | None = None,
                                  fetch_cap: int | None = None) -> bool:
    """True when the CHASE decoder's packs cover this geometry.

    Needs the merge-A fragment pack (same as the byte decoder), a
    rank-chunk pack for tagged positions ((j+1) << CW | chunk with at
    least 1 chunk bit), and the 9-bit comp-fetch pack."""
    fcap = fcap or blk // 2
    fetch_cap = fetch_cap or compress_bound(blk)
    return (_frag_geometry(blk, fcap, fetch_cap) is not None
            and 31 - _bits(blk + 1) >= 4
            and _bits(fetch_cap + 1) + 9 <= 31)


def _decode_block_frags_chase(comp, fdst, fsrc, fper, fphase, nfrag,
                              out_len, *, blk: int, fcap: int,
                              dense: int = 2, doublings: int = 4,
                              qcap: int = 0):
    """POINTER-DOUBLING fragment decoder (round-3, v2 fast path).

    The windowed/byte decoders iterate over the VALUE state: one
    dependency level per round, so chain depth is bounded by a static
    round count and deep blocks fall to the host.  This decoder
    iterates over the POSITION state, which is fully known after
    merge A: every output byte's one-hop source ``T`` is a pure
    function of its covering fragment, so the final literal source of
    every byte is ``T`` composed with itself -- and composition
    doubles reachable depth per merge instead of adding 1.

      * merge A (unchanged): per-byte (T, PERB).  The chase state is
        a TAGGED position nx: output-space [0, blk) while the byte
        still points at another copy byte, comp-space [blk, blk+ccap)
        once it has resolved to a literal source (comp positions are
        fixpoints, so convergence is monotone and needs no flags).
      * ``dense`` doubling merges: publishers at EVERY position carry
        nx as rank-prefixed chunks; queries are the not-yet-converged
        bytes.  nx' [i] = nx[nx[i]] -- depth 2^k after k merges.
        2*blk rows, ~4 operands, no masks, no per-byte selects.
      * frontier compaction: bytes still unconverged (chains deeper
        than 2^dense -- measured rare) compact into a qcap-slot pool;
        ``doublings`` more merges run blk+qcap rows each, scattering
        pool progress back so composition keeps doubling.  Total
        reachable depth: 2^(dense + doublings).
      * final merge: every live byte fetches comp[nx - blk] exactly
        (per-byte rows, no pool to overflow).

    SELF-VALIDATING: returns (out, ok); ok=False iff any live byte
    failed to converge (frontier overflow or chain deeper than
    2^(dense+doublings)) -- stale positions can never produce wrong
    bytes, only unconverged ones, and those are detected exactly.
    reference decode semantics: src/lz4.zig:89-251.
    """
    i32 = jnp.int32
    BIG = jnp.int32(1 << 28)
    ccap = comp.shape[0]
    CB = blk                        # comp-space tag base
    Q = qcap or max(blk // 8, 1024)
    assert _bits(ccap + 1) + 9 <= 31, "fetch buffer too large"

    geo = _frag_geometry(blk, fcap, ccap)
    assert geo is not None, "fragment pack geometry does not fit"
    CW, r1, r2, r3, r4 = geo
    CM = (1 << CW) - 1
    fq = jnp.arange(fcap, dtype=i32)
    fl = fq < nfrag
    j = lax.broadcasted_iota(i32, (blk, 1), 0).squeeze(-1)

    # ---- merge A: per-byte fragment params (as the byte decoder) ---
    lefts = ((fdst >> CW) | ((fsrc >> CW) << r1)
             | ((fper >> CW) << (r1 + r2))
             | ((fphase >> CW) << (r1 + r2 + r3)))
    rank = (fq + 1) << CW

    def pk(part):
        return jnp.where(fl, rank | (part & CM), -1)

    kk = jnp.concatenate([jnp.where(fl, fdst * 2, BIG), j * 2 + 1])
    za = jnp.full((blk,), -1, i32)
    kks, pAs, pBs, pCs, pEs, pDs = lax.sort(
        (kk,
         jnp.concatenate([pk(fdst), za]),
         jnp.concatenate([pk(fsrc), za]),
         jnp.concatenate([pk(fper), za]),
         jnp.concatenate([pk(fphase), za]),
         jnp.concatenate([pk(lefts), za])),
        num_keys=1)
    fA, fB, fC, fE, fD = (lax.cummax(pAs), lax.cummax(pBs),
                          lax.cummax(pCs), lax.cummax(pEs),
                          lax.cummax(pDs))
    lf = fD & CM
    FD = (fA & CM) | ((lf & ((1 << r1) - 1)) << CW)
    FS = (fB & CM) | (((lf >> r1) & ((1 << r2) - 1)) << CW)
    FP = (fC & CM) | (((lf >> (r1 + r2)) & ((1 << r3) - 1)) << CW)
    FH = (fE & CM) | (((lf >> (r1 + r2 + r3))
                       & ((1 << r4) - 1)) << CW)
    ok_row = fA >= 0
    rel = (kks >> 1) - FD
    is_per = FP > 0
    t = jnp.where(is_per, FS + (FH + rel) % jnp.maximum(FP, 1),
                  FS + rel)
    t = jnp.where(ok_row, t, 0)
    isb = (kks & 1) == 1
    _, tp = lax.sort((jnp.where(isb, kks >> 1, BIG),
                      (t << 1) | is_per.astype(i32)), num_keys=1)
    T = tp[:blk] >> 1
    PERB = (tp[:blk] & 1) == 1
    live = j < out_len

    # ---- tagged position state --------------------------------------
    nx = jnp.where(live,
                   jnp.where(PERB, jnp.clip(T, 0, blk - 1),
                             jnp.clip(T, 0, ccap - 1) + CB),
                   CB)

    # rank-chunk pack for tagged positions: ((j+1) << CWn) | chunk
    VB = _bits(blk + ccap)          # tagged-position value bits
    CWn = 31 - _bits(blk + 1)
    NCH = -(-VB // CWn)
    CMn = (1 << CWn) - 1
    rankn = (j + 1) << CWn

    def _fetch_nx(nx, kq, pb_q, nq):
        """One doubling merge: dense nx publishers + nq query rows
        (keys kq = target*2+1 or BIG, passengers pb_q) -> fetched
        tagged positions in passenger order."""
        keys = jnp.concatenate([j * 2, kq])
        pb = jnp.concatenate([jnp.zeros((blk,), i32), pb_q])
        zq = jnp.full((nq,), -1, i32)
        ops = tuple(
            jnp.concatenate([rankn | ((nx >> (c * CWn)) & CMn), zq])
            for c in range(NCH))
        srt = lax.sort((keys, pb) + ops, num_keys=1)
        fills = [lax.cummax(x) for x in srt[2:]]
        es = lax.sort((srt[1],) + tuple(fills), num_keys=1)
        v = es[1][blk:] & CMn
        for c in range(1, NCH):
            v = v | ((es[1 + c][blk:] & CMn) << (c * CWn))
        return v

    # ---- dense doubling rounds (depth 2^dense) ----------------------
    for _ in range(max(dense, 0)):
        unc = nx < CB
        kq = jnp.where(unc, nx * 2 + 1, BIG)
        v = _fetch_nx(nx, kq, j + 1, blk)
        nx = jnp.where(unc, v, nx)

    # ---- frontier compaction + pool doubling rounds -----------------
    if doublings > 0:
        unc = nx < CB
        sk, pj_, pv_ = lax.sort((jnp.where(unc, j, BIG), j, nx),
                                num_keys=1)
        pal = sk[:Q] < BIG
        pj = jnp.where(pal, pj_[:Q], blk)
        pnx = jnp.where(pal, pv_[:Q], CB)
        for _ in range(doublings):
            punc = pal & (pnx < CB)
            kq = jnp.where(punc, pnx * 2 + 1, BIG)
            v = _fetch_nx(nx, kq, jnp.arange(Q, dtype=i32) + 1, Q)
            pnx = jnp.where(punc, v, pnx)
            nx = nx.at[pj].set(pnx, mode='drop')

    conv = ~live | (nx >= CB)

    # ---- final exact comp fetch (per-byte rows, no pool) ------------
    cp = jnp.clip(nx - CB, 0, ccap - 1)
    cs = jnp.arange(ccap, dtype=i32)
    qk = jnp.where(live, cp * 2 + 1, BIG)
    kb, vb, pb2 = lax.sort(
        (jnp.concatenate([cs * 2, qk]),
         jnp.concatenate([((cs + 1) << 9) | comp.astype(i32),
                          jnp.full((blk,), -1, i32)]),
         jnp.concatenate([jnp.zeros((ccap,), i32), j + 1])),
        num_keys=1)
    fv = lax.cummax(vb)
    isq = (kb & 1) == 1
    hit = isq & ((fv >> 9) - 1 == (kb >> 1))
    _, litv = lax.sort((jnp.where(pb2 > 0, pb2 - 1, BIG),
                        jnp.where(hit, fv & 0xFF, -1)), num_keys=1)
    value = jnp.where(live & conv, litv[:blk], -1)
    ok = jnp.all(conv) & jnp.all(jnp.where(live, value >= 0, True))
    out = jnp.where(live & (value >= 0), value, 0)
    return out.astype(jnp.uint8), ok


@functools.lru_cache(maxsize=None)
def _batched_frag_decoder_chase(blk: int, fcap: int, dense: int = 2,
                                doublings: int = 4, qcap: int = 0):
    fn = functools.partial(_decode_block_frags_chase, blk=blk,
                           fcap=fcap, dense=dense,
                           doublings=doublings, qcap=qcap)
    return jax.jit(jax.vmap(fn))


def win_tier_config(blk: int, fcap: int, rounds: int) -> dict:
    """Measured per-tier windowed-decoder configuration (uncovered
    -byte budgets on HC-class streams, experiments/README.md):
    periodic side needs only 2 windows + a few hundred pool slots;
    the literal side needs 3-4 windows on fast tiers and stays
    byte-granular on the match-dense deep tier."""
    if rounds <= 2:
        return dict(wins=2, pool=256, lit_wins=3, lit_pool=1024)
    if fcap < blk:
        return dict(wins=2, pool=512, lit_wins=4, lit_pool=2048)
    return dict(wins=2, pool=512, lit_wins=0, lit_pool=0)


@functools.lru_cache(maxsize=None)
def _batched_frag_decoder_win(blk: int, fcap: int, rounds: int,
                              wins: int | None = None,
                              pool: int | None = None,
                              lit_wins: int | None = None,
                              lit_pool: int | None = None,
                              g: int = 8):
    cfg = win_tier_config(blk, fcap, rounds)
    if wins is not None:
        cfg["wins"] = wins
    if pool is not None:
        cfg["pool"] = pool
    if lit_wins is not None:
        cfg["lit_wins"] = lit_wins
    if lit_pool is not None:
        cfg["lit_pool"] = lit_pool
    fn = functools.partial(_decode_block_frags_win, blk=blk, fcap=fcap,
                           rounds=rounds, g=g, **cfg)
    return jax.jit(jax.vmap(fn))


@functools.lru_cache(maxsize=None)
def _batched_frag_decoder(blk: int, fcap: int, rounds: int):
    fn = functools.partial(_decode_block_frags, blk=blk, fcap=fcap,
                           rounds=rounds)
    return jax.jit(jax.vmap(fn))


def decode_blocks_frags(comp_blocks, fdst, fsrc, fper, fphase, nfrag,
                        out_lens, rounds: int, blk: int):
    """Batched round-bounded decode from host-resolved fragments.
    ``comp_blocks`` rows are fetch buffers ([history | payload] when
    the resolver ran with hist_len > 0)."""
    fcap = fdst.shape[-1]
    return _batched_frag_decoder(blk, fcap, int(rounds))(
        comp_blocks, fdst, fsrc, fper, fphase, nfrag,
        jnp.asarray(out_lens, jnp.int32))


def resolve_fragments_py(comp: bytes, fcap: int = 1 << 30,
                         out_cap: int = 4 << 20, hist_len: int = 0,
                         split_max: int = 8, round_limit: int = 4):
    """Pure-Python mirror of the native fragment resolver (tests and
    no-native fallback).  Matches lz4tpu_resolve_blocks: per-match
    splitting capped at ``split_max`` segments, over-fragmenting
    matches become one PER copy-fragment with round = 1 + max round
    of the bytes it reads (up to ``round_limit``); LIT sources are
    shifted by ``hist_len`` for a [history | comp] fetch buffer.
    Returns (fdst, flen, fsrc, fper, fphase lists, rounds, out_len)
    or None on fragment-budget / out_cap overflow."""
    frags = []          # (dst, len, src, per, phase, round)
    ip, n = 0, len(comp)
    op = 0
    max_round = 0
    round_limit = min(round_limit, 250)
    from ..errors import CorruptedData
    import bisect

    dsts = []
    byte_round = bytearray(out_cap + 1)

    def walk(s, take, count_only, d=0):
        """Split [s, s+take) over covering fragments; returns segment
        count (count_only) or emits fragments (-1 = budget hit)."""
        nonlocal max_round
        cur, remaining = s, take
        nseg = 0
        while remaining > 0:
            if cur < 0:
                seg = min(-cur, remaining)
                if not count_only:
                    if len(frags) >= fcap:
                        return -1
                    frags.append((d, seg, hist_len + cur, 0, 0, 0))
                    dsts.append(d)
                    byte_round[d:d + seg] = bytes(seg)
                    d += seg
                nseg += 1
                cur += seg; remaining -= seg
                continue
            fi = bisect.bisect_right(dsts, cur) - 1
            fd, flen_, fs, fp, fh, fr = frags[fi]
            into = cur - fd
            seg = min(flen_ - into, remaining)
            if not count_only:
                if len(frags) >= fcap:
                    return -1
                if fp == 0:
                    frags.append((d, seg, fs + into, 0, 0, 0))
                    byte_round[d:d + seg] = bytes(seg)
                else:
                    frags.append((d, seg, fs, fp, (fh + into) % fp, fr))
                    byte_round[d:d + seg] = bytes([min(fr, 250)]) * seg
                    max_round = max(max_round, fr)
                dsts.append(d)
                d += seg
            nseg += 1
            if count_only and nseg > split_max:
                return nseg
            cur += seg; remaining -= seg
        return nseg

    while ip < n:
        token = comp[ip]; ip += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if ip >= n:
                    raise CorruptedData("truncated literal length")
                x = comp[ip]; ip += 1; lit += x
                if x != 255:
                    break
        if ip + lit > n:
            raise CorruptedData("literal overrun")
        if lit:
            if len(frags) >= fcap or op + lit > out_cap:
                return None
            frags.append((op, lit, hist_len + ip, 0, 0, 0))
            dsts.append(op)
            byte_round[op:op + lit] = bytes(lit)
            op += lit; ip += lit
        if ip >= n:
            break
        if ip + 2 > n:
            raise CorruptedData("truncated offset")
        off = comp[ip] | (comp[ip + 1] << 8); ip += 2
        if off == 0 or off > op + hist_len:
            raise CorruptedData(f"bad offset {off} at {op}")
        ml = token & 15
        if ml == 15:
            while True:
                if ip >= n:
                    raise CorruptedData("truncated match length")
                x = comp[ip]; ip += 1; ml += x
                if x != 255:
                    break
        ml += 4
        if op + ml > out_cap:
            return None
        take = min(ml, off)
        s = op - off

        def copy_frag():
            """One PER copy-fragment for the whole head (round
            permitting); None-able budget result."""
            nonlocal max_round
            r = 1 + max(byte_round[s:s + take])
            if r > round_limit or len(frags) >= fcap:
                return False
            frags.append((op, take, s, off, 0, r))
            dsts.append(op)
            byte_round[op:op + take] = bytes([r]) * take
            max_round = max(max_round, r)
            return True

        split_ok = walk(s, take, count_only=True) <= split_max
        if not split_ok and s >= 0:
            if not copy_frag():
                split_ok = True
        elif not split_ok:
            split_ok = True         # history-reaching head: must split
        if split_ok:
            nf0 = len(frags)
            mr0 = max_round
            if walk(s, take, count_only=False, d=op) < 0:
                # budget pressure mid-split: roll back and prefer the
                # single copy-fragment, like the native resolver
                del frags[nf0:]
                del dsts[nf0:]
                max_round = mr0
                if s < 0 or not copy_frag():
                    return None

        if ml > take:
            read_n = min(ml - take, off)
            r = 1 + max(byte_round[op:op + read_n])
            if len(frags) >= fcap:
                return None
            frags.append((op + take, ml - take, op, off, 0, r))
            dsts.append(op + take)
            byte_round[op + take:op + ml] = bytes([min(r, 250)]) * (ml - take)
            max_round = max(max_round, r)
        op += ml
    return frags, max_round, op


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
