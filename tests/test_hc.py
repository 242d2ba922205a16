"""HC codec tests.

Mirrors the reference suites: src/test_lz4hc.zig (all levels 2-12
round-trip, MID vs HC ratio, pattern detection, optimal-parser
monotonicity, HC-in-frame) and src/test_lz4hc_stream.zig (contiguous
blocks, dictionary save/load round-trip, reset, multi-block).
"""

import random

import pytest

from zig_lz4_tpu import compress_default, decompress_safe
from zig_lz4_tpu.ops.hc import (
    HCContext,
    LZ4HC_CLEVEL_DEFAULT,
    LZ4HC_CLEVEL_MAX,
    StreamHC,
    Strategy,
    compress_hc,
    compress_hc_ext_state,
    get_level_params,
    sizeof_state_hc,
)
from zig_lz4_tpu.stream import StreamDecode


def _text(n=20_000):
    words = (b"the quick brown fox jumps over the lazy dog "
             b"pack my box with five dozen liquor jugs ").split()
    rng = random.Random(99)
    out = bytearray()
    while len(out) < n:
        out += rng.choice(words) + b" "
    return bytes(out[:n])


TEXT = _text()


def hc_roundtrip(data, level):
    comp = compress_hc(data, level)
    out = decompress_safe(comp, len(data))
    assert out == data, f"level {level} roundtrip failed"
    return comp


def test_level_table():
    assert get_level_params(2)[0] == Strategy.lz4mid
    for lv in range(3, 10):
        assert get_level_params(lv)[0] == Strategy.lz4hc
    for lv in range(10, 13):
        assert get_level_params(lv)[0] == Strategy.lz4opt
    # clamping (reference: lz4hc.zig:88-97)
    assert get_level_params(0) == get_level_params(LZ4HC_CLEVEL_DEFAULT)
    assert get_level_params(99) == get_level_params(LZ4HC_CLEVEL_MAX)


def test_empty_and_small():
    assert compress_hc(b"", 9) == b""
    for lv in [2, 5, 9, 10, 12]:
        for data in [b"a", b"hello", b"0123456789ab"]:
            hc_roundtrip(data, lv)


@pytest.mark.parametrize("level", list(range(2, 13)))
def test_all_levels_roundtrip(level):
    """reference: src/test_lz4hc.zig:155-189."""
    hc_roundtrip(TEXT, level)
    hc_roundtrip(b"ABCDEFGH" * 125, level)
    rng = random.Random(level)
    hc_roundtrip(bytes(rng.randrange(256) for _ in range(3000)), level)


def test_hc_beats_fast_on_text():
    fast = compress_default(TEXT)
    hc9 = compress_hc(TEXT, 9)
    assert len(hc9) <= len(fast)


def test_mid_vs_hc_ratio():
    """reference: src/test_lz4hc.zig:230-268 (HC >= MID ratio)."""
    mid = compress_hc(TEXT, 2)
    hc9 = compress_hc(TEXT, 9)
    assert len(hc9) <= len(mid)


def test_optimal_monotonicity():
    """reference: src/test_lz4hc.zig:419-426
    (size12 <= size11 <= size10 <= size9).

    Our level 9 adds backward extension (ops/hc.py divergence 1),
    which the optimal parser does not model, so 10-vs-9 is allowed a
    small slack; within the optimal family monotonicity must hold.
    """
    sizes = {lv: len(compress_hc(TEXT, lv)) for lv in [9, 10, 11, 12]}
    assert sizes[12] <= sizes[11] <= sizes[10]
    assert sizes[12] <= sizes[9]
    assert sizes[10] <= sizes[9] * 1.01


@pytest.mark.parametrize("period", [1, 2, 4])
def test_pattern_runs(period):
    """reference: src/test_lz4hc.zig:271-325 (1/2/4-byte patterns)."""
    unit = bytes(range(65, 65 + period))
    data = unit * (8000 // period)
    for lv in [8, 9, 12]:
        comp = hc_roundtrip(data, lv)
        assert len(comp) < 100


def test_random_incompressible():
    """reference: src/test_lz4hc.zig:142-143."""
    rng = random.Random(5)
    data = bytes(rng.randrange(256) for _ in range(2000))
    for lv in [2, 9, 12]:
        comp = hc_roundtrip(data, lv)
        assert len(comp) >= len(data) - 16


def test_ext_state():
    ctx = HCContext()
    c1 = compress_hc_ext_state(ctx, TEXT, 9)
    c2 = compress_hc(TEXT, 9)
    assert c1 == c2
    assert sizeof_state_hc() == 32768 * 4 + 65536 * 2


def test_hc_in_frame():
    """reference: src/test_lz4hc.zig:328-373, src/test_lz4f_hc.zig."""
    import zig_lz4_tpu.frame as lz4f
    for lv in [2, 6, 9, 12]:
        prefs = lz4f.Preferences(compression_level=lv)
        comp = lz4f.compress_frame(TEXT, prefs)
        assert lz4f.decompress_frame(comp) == TEXT


def test_hc_frame_all_levels_small():
    """reference: src/test_lz4f_hc.zig:87-119 (all levels in frames)."""
    import zig_lz4_tpu.frame as lz4f
    data = TEXT[:3000]
    for lv in range(2, 13):
        prefs = lz4f.Preferences(compression_level=lv)
        assert lz4f.decompress_frame(lz4f.compress_frame(data, prefs)) == data


# --- streaming HC (reference: src/test_lz4hc_stream.zig) ---

def test_stream_hc_blocks():
    s = StreamHC(9)
    d = StreamDecode()
    for i in range(0, len(TEXT), 4096):
        block = TEXT[i:i + 4096]
        comp = s.compress_continue(block)
        assert d.decompress_continue(comp, len(block)) == block


def test_stream_hc_cross_block_matching():
    rng = random.Random(21)
    data = bytes(rng.randrange(256) for _ in range(4096))
    s = StreamHC(9)
    c1 = s.compress_continue(data)
    c2 = s.compress_continue(data)
    assert len(c1) >= len(data) - 16    # incompressible alone
    assert len(c2) < len(data) // 10    # history match

    d = StreamDecode()
    assert d.decompress_continue(c1, len(data)) == data
    assert d.decompress_continue(c2, len(data)) == data


@pytest.mark.parametrize("level", [2, 9, 12])
def test_stream_hc_all_strategies_cross_block(level):
    """Divergence 4: every strategy (incl. MID) is stream-aware."""
    rng = random.Random(31)
    data = bytes(rng.randrange(256) for _ in range(3000))
    s = StreamHC(level)
    s.compress_continue(data)
    c2 = s.compress_continue(data)
    assert len(c2) < len(data) // 4


def test_stream_hc_load_save_dict():
    """reference: src/test_lz4hc_stream.zig:230-305."""
    dict_ = TEXT[:8000]
    data = TEXT[2000:6000]

    s = StreamHC(9)
    s.load_dict(dict_)
    comp = s.compress_continue(data)
    assert len(comp) < len(data) // 4

    d = StreamDecode()
    d.set_dict(dict_)
    assert d.decompress_continue(comp, len(data)) == data

    # save_dict -> resume on a fresh stream gives a valid stream
    saved = s.save_dict()
    s2 = StreamHC(9)
    s2.load_dict(saved)
    c2 = s2.compress_continue(data)
    d2 = StreamDecode()
    d2.set_dict(saved)
    assert d2.decompress_continue(c2, len(data)) == data


def test_stream_hc_reset():
    """reference: src/test_lz4hc_stream.zig:308-349."""
    s = StreamHC(9)
    s.compress_continue(TEXT[:5000])
    s.reset()
    c = s.compress_continue(TEXT[:5000])
    assert c == compress_hc(TEXT[:5000], 9)


def test_stream_hc_level_change_between_blocks():
    s = StreamHC(3)
    d = StreamDecode()
    b1, b2 = TEXT[:4000], TEXT[4000:8000]
    c1 = s.compress_continue(b1)
    s.set_compression_level(12)
    c2 = s.compress_continue(b2)
    assert d.decompress_continue(c1, len(b1)) == b1
    assert d.decompress_continue(c2, len(b2)) == b2


def test_stream_hc_many_small_blocks():
    """reference: src/test_lz4hc_stream.zig:352-405 (scaled down)."""
    rng = random.Random(77)
    data = bytes(rng.randrange(16) for _ in range(128 * 1024))
    s = StreamHC(6)
    d = StreamDecode()
    total_comp = 0
    for i in range(0, len(data), 16384):
        block = data[i:i + 16384]
        comp = s.compress_continue(block)
        total_comp += len(comp)
        assert d.decompress_continue(comp, len(block)) == block
    assert total_comp < len(data)


def test_stream_hc_state_dict_roundtrip():
    s = StreamHC(9)
    s.compress_continue(TEXT[:3000])
    st = s.state_dict()
    s2 = StreamHC(9)
    s2.load_state_dict(st)
    assert (s.compress_continue(TEXT[3000:6000])
            == s2.compress_continue(TEXT[3000:6000]))


def test_linked_hc_frames_decode():
    """Linked-mode HC frames: real cross-block offsets decode fine."""
    import zig_lz4_tpu.frame as lz4f
    rng = random.Random(41)
    unit = bytes(rng.randrange(256) for _ in range(30_000))
    data = unit * 3
    prefs = lz4f.Preferences(
        frame_info=lz4f.FrameInfo(block_size_id=lz4f.BlockSizeID.max64KB),
        compression_level=9)
    comp = lz4f.compress_frame(data, prefs)
    assert lz4f.decompress_frame(comp) == data
    assert len(comp) < len(unit) * 2
