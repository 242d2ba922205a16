"""Fragment-resolver tests: native vs Python mirror parity, capped
splitting (PER copy-fragments), history/dictionary sources, output-cap
marking, and device frag-decoder round-trips at higher round counts.

reference decode semantics: src/lz4.zig:89-251 (the resolver is a host
re-formulation of decompressGeneric's copy loop for the device).
"""

import numpy as np
import pytest

from zig_lz4_tpu import compress_fast
from zig_lz4_tpu.constants import compress_bound
from zig_lz4_tpu.native import is_available, native_resolve_blocks
from zig_lz4_tpu.ops.jax_block import resolve_fragments_py

pytestmark = pytest.mark.skipif(not is_available(),
                                reason="native library unavailable")


def _corpus_blocks():
    rng = np.random.default_rng(7)
    text = (b"the quick brown fox jumps over the lazy dog -- " * 300)
    out = [
        text[:8192],
        b"\x00" * 4096,                          # RLE, deep periodic
        b"ab" * 4000 + b"xyz" * 500,             # small periods
        rng.integers(0, 256, 4096, dtype=np.uint8).tobytes(),  # random
        (text[:997] + rng.integers(0, 256, 131, dtype=np.uint8)
         .tobytes()) * 20,                       # match-dense mixed
    ]
    return out


def _replay(frags, comp, out_len, hist=b""):
    """NumPy replay of the device fragment semantics."""
    fetch = np.frombuffer(hist + comp, np.uint8)
    out = np.zeros(out_len, np.uint8)
    for d, L, s, p, h, _r in frags:
        if p == 0:
            out[d:d + L] = fetch[s:s + L]
        else:
            idx = s + (h + np.arange(L)) % p
            out[d:d + L] = out[idx]
    return out.tobytes()


@pytest.mark.parametrize("split_max,round_limit", [(8, 4), (4, 8),
                                                   (2, 10), (1 << 20, 2)])
def test_python_native_parity(split_max, round_limit):
    blocks = _corpus_blocks()
    comp = [compress_fast(b) for b in blocks]
    concat = b"".join(comp)
    offs = np.zeros(len(comp), np.int64)
    lens = np.array([len(c) for c in comp], np.int64)
    offs[1:] = np.cumsum(lens)[:-1]
    fcap = 1 << 15
    fdst, flen, fsrc, fper, fph, nfrag, rounds, olens = \
        native_resolve_blocks(concat, offs, lens, fcap, 1 << 20, 0,
                              split_max, round_limit)
    for i, c in enumerate(comp):
        r = resolve_fragments_py(c, fcap, 1 << 20, 0, split_max,
                                 round_limit)
        assert r is not None
        frags, max_round, out_len = r
        assert nfrag[i] == len(frags), f"block {i}"
        assert rounds[i] == max_round, f"block {i}"
        assert olens[i] == out_len == len(blocks[i])
        got = [(fdst[i, k], flen[i, k], fsrc[i, k], fper[i, k],
                fph[i, k]) for k in range(nfrag[i])]
        want = [(d, L, s, p, h) for d, L, s, p, h, _ in frags]
        assert got == want, f"block {i}"
        # semantic replay must reproduce the original block
        assert _replay(frags, c, out_len) == blocks[i]


def test_copy_fragments_appear_and_replay():
    """Match-dense data must trigger PER copy-fragments (round > 1
    non-tail), and the replay must stay correct."""
    data = _corpus_blocks()[4]
    comp = compress_fast(data)
    full = resolve_fragments_py(comp, 1 << 20, 1 << 20, 0, 1 << 20, 0)
    capped = resolve_fragments_py(comp, 1 << 20, 1 << 20, 0, 2, 12)
    assert full is not None and capped is not None
    assert len(capped[0]) < len(full[0]), "capping must cut fragments"
    assert _replay(capped[0], comp, capped[2]) == data


def test_history_sources():
    """With hist_len, offsets may reach before the block; LIT sources
    index the [history | comp] fetch buffer."""
    hist = b"0123456789abcdefghijklmnopqrstuvwxyz" * 3
    from zig_lz4_tpu.stream import Stream
    st = Stream()
    st.load_dict(hist)
    comp = st.compress_fast_continue(b"abcdefghijklmnop" * 8 + b"NEW!")
    r = resolve_fragments_py(comp, 1 << 20, 1 << 20, len(hist), 8, 6)
    assert r is not None
    frags, _mr, out_len = r
    assert _replay(frags, comp, out_len, hist) == \
        b"abcdefghijklmnop" * 8 + b"NEW!"
    # native agrees
    offs = np.zeros(1, np.int64)
    lens = np.array([len(comp)], np.int64)
    fdst, flen, fsrc, fper, fph, nfrag, rounds, olens = \
        native_resolve_blocks(comp, offs, lens, 1 << 15, 1 << 20,
                              len(hist), 8, 6)
    got = [(fdst[0, k], flen[0, k], fsrc[0, k], fper[0, k], fph[0, k])
           for k in range(nfrag[0])]
    assert got == [(d, L, s, p, h) for d, L, s, p, h, _ in frags]


def test_out_cap_marks_block():
    """A block declaring more output than out_cap is marked -1 (host
    route), not an error for the whole batch."""
    big = compress_fast(b"x" * 10_000)
    small = compress_fast(b"hello world, hello world!")
    concat = big + small
    offs = np.array([0, len(big)], np.int64)
    lens = np.array([len(big), len(small)], np.int64)
    *_rest, nfrag, rounds, olens = native_resolve_blocks(
        concat, offs, lens, 1 << 15, 4096, 0, 8, 6)
    assert nfrag[0] == -1
    assert nfrag[1] > 0
    assert resolve_fragments_py(big, 1 << 20, 4096, 0, 8, 6) is None


def test_device_frag_decode_with_rounds():
    """Device frag decoder handles deeper round counts produced by the
    capped resolver."""
    from zig_lz4_tpu.ops.jax_block import decode_blocks_frags
    blk = 8192
    blocks = [b for b in _corpus_blocks() if len(b) <= blk]
    blocks = [b + b"\x00" * 0 for b in blocks]
    fcap = 2048
    rows = []
    for b in blocks:
        c = compress_fast(b)
        r = resolve_fragments_py(c, fcap, blk, 0, 2, 10)
        if r is None:
            continue
        rows.append((b, c, r))
    assert rows, "need at least one in-budget block"
    B = len(rows)
    ccap = compress_bound(blk)
    comp = np.zeros((B, ccap), np.uint8)
    fdst = np.zeros((B, fcap), np.int32)
    fsrc = np.zeros((B, fcap), np.int32)
    fper = np.zeros((B, fcap), np.int32)
    fph = np.zeros((B, fcap), np.int32)
    nfr = np.zeros(B, np.int32)
    ols = np.zeros(B, np.int32)
    rmax = 0
    for j, (b, c, (frags, mr, ol)) in enumerate(rows):
        comp[j, :len(c)] = np.frombuffer(c, np.uint8)
        for k, (d, L, s, p, h, _r) in enumerate(frags):
            fdst[j, k], fsrc[j, k], fper[j, k], fph[j, k] = d, s, p, h
        nfr[j] = len(frags)
        ols[j] = ol
        rmax = max(rmax, mr)
    outs = np.asarray(decode_blocks_frags(
        comp, fdst, fsrc, fper, fph, nfr, ols, rmax, blk))
    for j, (b, _c, _r) in enumerate(rows):
        assert outs[j, :len(b)].tobytes() == b, f"row {j}"


@pytest.mark.parametrize("fcap", [48, 64, 96, 128, 200, 400])
def test_budget_pressure_parity(fcap):
    """Native and Python resolvers must agree block-for-block near the
    fragment budget, including the rollback copy-fragment path and
    bail decisions (a mid-split budget hit prefers the copy-fragment
    when the round limit allows)."""
    blocks = _corpus_blocks()
    comp = [compress_fast(b) for b in blocks]
    concat = b"".join(comp)
    offs = np.zeros(len(comp), np.int64)
    lens = np.array([len(c) for c in comp], np.int64)
    offs[1:] = np.cumsum(lens)[:-1]
    fdst, flen, fsrc, fper, fph, nfrag, rounds, olens = \
        native_resolve_blocks(concat, offs, lens, fcap, 1 << 20, 0,
                              4, 8)
    for i, c in enumerate(comp):
        r = resolve_fragments_py(c, fcap, 1 << 20, 0, 4, 8)
        if r is None:
            assert nfrag[i] == -1, f"block {i}: native {nfrag[i]}"
            continue
        frags, max_round, out_len = r
        assert nfrag[i] == len(frags), f"block {i}"
        assert rounds[i] == max_round, f"block {i}"
        got = [(fdst[i, k], flen[i, k], fsrc[i, k], fper[i, k],
                fph[i, k]) for k in range(nfrag[i])]
        assert got == [(d, L, s, p, h) for d, L, s, p, h, _ in frags]
        if nfrag[i] >= 0:
            assert _replay(frags, c, out_len) == blocks[i]


def test_resolver_thread_pool_parity():
    """The native worker-pool path (n_threads > 1, per-thread scratch,
    atomic block cursor) must produce byte-identical fragment tables
    and host decodes to the serial path at every thread count."""
    from zig_lz4_tpu.native import native_decompress_blocks
    blocks = _corpus_blocks() * 5                 # 25 blocks
    comp = [compress_fast(b) for b in blocks]
    concat = b"".join(comp)
    offs = np.zeros(len(comp), np.int64)
    lens = np.array([len(c) for c in comp], np.int64)
    offs[1:] = np.cumsum(lens)[:-1]
    base = native_resolve_blocks(concat, offs, lens, 1 << 13, 1 << 20,
                                 0, 8, 12, reuse_buffers=False,
                                 n_threads=1)
    for nt in (2, 4, 7):
        got = native_resolve_blocks(concat, offs, lens, 1 << 13,
                                    1 << 20, 0, 8, 12,
                                    reuse_buffers=False, n_threads=nt)
        for a, b in zip(base[5:], got[5:]):       # nfrag/rounds/olens
            assert np.array_equal(a, b), nt
        for bi in range(len(comp)):
            nf = base[5][bi]
            if nf < 0:
                continue
            for a, b in zip(base[:5], got[:5]):
                assert np.array_equal(a[bi, :nf], b[bi, :nf]), (nt, bi)
    blk = max(len(b) for b in blocks)
    d1, o1 = native_decompress_blocks(concat, offs, lens, blk,
                                      n_threads=1)
    d4, o4 = native_decompress_blocks(concat, offs, lens, blk,
                                      n_threads=4)
    assert np.array_equal(d1, d4) and np.array_equal(o1, o4)
    for bi, b in enumerate(blocks):
        assert d1[bi, :o1[bi]].tobytes() == b
