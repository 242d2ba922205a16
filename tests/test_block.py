"""Block codec round-trip and format tests.

Modeled on the reference's block test tiers (reference: src/test.zig
smoke suite, src/test_dictionary.zig, src/test_streaming.zig partial
decode) plus wire-format edge cases.
"""

import random

import pytest

from zig_lz4_tpu import (
    CorruptedData,
    HashTable,
    InputTooLarge,
    OutputTooSmall,
    compress_bound,
    compress_default,
    compress_dest_size,
    compress_fast,
    compress_fast_ext_state,
    decompress_safe,
    decompress_safe_partial,
    decompress_safe_using_dict,
)


def roundtrip(data: bytes, accel: int = 1) -> bytes:
    comp = compress_fast(data, accel)
    assert len(comp) <= compress_bound(len(data))
    out = decompress_safe(comp, len(data))
    assert out == data
    return comp


def test_empty():
    assert compress_default(b"") == b""
    assert decompress_safe(b"", 100) == b""


def test_tiny_inputs():
    for n in range(1, 14):
        data = bytes(range(n))
        comp = roundtrip(data)
        # <13 bytes must be a pure literal run (reference: lz4.zig:302-304)
        if n < 13:
            assert comp[0] >> 4 == min(n, 15)


def test_simple_string(corpus):
    roundtrip(corpus["hello"])


def test_repeated(corpus):
    comp = roundtrip(corpus["repeated"])
    assert len(comp) < len(corpus["repeated"]) // 4


def test_rle(corpus):
    comp = roundtrip(corpus["rle"])
    assert len(comp) < 64


def test_lorem(corpus):
    comp = roundtrip(corpus["lorem"])
    assert len(comp) < len(corpus["lorem"])


def test_random_incompressible(corpus):
    data = corpus["random256"]
    comp = roundtrip(data)
    assert len(comp) >= len(data)  # random data does not compress


def test_ramp(corpus):
    roundtrip(corpus["ramp"])


def test_patterned_10kb():
    data = (b"0123456789" * 1024 + b"tail")[:10240]
    comp = roundtrip(data)
    assert len(comp) < 1024


@pytest.mark.parametrize("accel", [1, 2, 8, 64, 100000])
def test_acceleration(accel, corpus):
    data = corpus["mixed"]
    comp = compress_fast(data, accel)
    assert decompress_safe(comp, len(data)) == data


def test_acceleration_monotone_speed_tradeoff(corpus):
    data = corpus["lorem"]
    c1 = compress_fast(data, 1)
    c9 = compress_fast(data, 64)
    assert len(c1) <= len(c9)  # higher accel may not compress better


def test_input_too_large_rejected(monkeypatch):
    # Lower the limit instead of allocating 2GB.
    import zig_lz4_tpu.ops.block as blk
    monkeypatch.setattr(blk, "LZ4_MAX_INPUT_SIZE", 100)
    with pytest.raises(InputTooLarge):
        compress_fast(b"x" * 101)
    assert compress_bound(0x7E000001) == 0


def test_max_output_budget(corpus):
    data = corpus["lorem"]
    full = compress_default(data)
    with pytest.raises(OutputTooSmall):
        compress_default(data, max_output=len(full) - 1)
    assert compress_default(data, max_output=len(full)) == full


def test_partial_decode(corpus):
    data = corpus["lorem"]
    comp = compress_default(data)
    for target in [0, 1, 5, 20, 100, len(data) - 1, len(data), len(data) + 50]:
        part = decompress_safe_partial(comp, target, len(data) + 64)
        assert len(part) == min(target, len(data))
        assert part == data[:len(part)]


def test_partial_decode_mid_match():
    data = b"abcdefgh" * 100  # long match bodies
    comp = compress_default(data)
    part = decompress_safe_partial(comp, 333, 1000)
    assert part == data[:333]


def test_decompress_output_too_small(corpus):
    data = corpus["lorem"]
    comp = compress_default(data)
    with pytest.raises(OutputTooSmall):
        decompress_safe(comp, len(data) - 1)


def test_corrupt_zero_offset():
    # token: 1 literal + match, offset 0x0000 -> corrupt
    bad = bytes([0x10, ord("x"), 0x00, 0x00])
    with pytest.raises(CorruptedData):
        decompress_safe(bad, 100)


def test_corrupt_offset_beyond_output():
    # 1 literal then match with offset 5 (> 1 byte decoded)
    bad = bytes([0x10, ord("x"), 0x05, 0x00])
    with pytest.raises(CorruptedData):
        decompress_safe(bad, 100)


def test_corrupt_truncated_literal_run():
    bad = bytes([0xF0, 0xFF])  # extended literal length, truncated
    with pytest.raises(CorruptedData):
        decompress_safe(bad, 100)


def test_corrupt_literal_overrun():
    bad = bytes([0x50, ord("a"), ord("b")])  # claims 5 literals, has 2
    with pytest.raises(CorruptedData):
        decompress_safe(bad, 100)


def test_dict_decode():
    # Compress with a prefix trick: data that references dict content
    # is produced by the streaming path; here test the decoder directly
    # with a hand-built sequence referencing the dictionary.
    dict_ = b"0123456789abcdef" * 4
    # literals "XY", then match of length 8 at offset len("XY")+8 back
    # into the dictionary tail.
    offset = 2 + 8  # 2 decoded bytes + 8 back into dict
    seq = bytes([0x24, ord("X"), ord("Y"), offset & 0xFF, offset >> 8])
    out = decompress_safe_using_dict(seq, 100, dict_)
    assert out == b"XY" + dict_[-8:]


def test_dict_spanning_match():
    dict_ = b"ABCDEFGH"
    # 2 literals then a match of length 6 starting 4 back into dict:
    # sources: dict[-4:] (EFGH) then output[0:2] (XY)
    offset = 2 + 4
    seq = bytes([0x22, ord("X"), ord("Y"), offset & 0xFF, offset >> 8])
    out = decompress_safe_using_dict(seq, 100, dict_)
    assert out == b"XY" + b"EFGH" + b"XY"


def test_dict_missing_raises():
    offset = 10
    seq = bytes([0x24, ord("X"), ord("Y"), offset & 0xFF, offset >> 8])
    with pytest.raises(CorruptedData):
        decompress_safe(seq, 100)


def test_ext_state(corpus):
    state = HashTable()
    data = corpus["mixed"]
    c1 = compress_fast_ext_state(state, data)
    c2 = compress_default(data)
    assert c1 == c2  # ext-state resets -> identical output
    # reuse state for different data
    c3 = compress_fast_ext_state(state, corpus["lorem"])
    assert decompress_safe(c3, len(corpus["lorem"])) == corpus["lorem"]


def test_dest_size(corpus):
    data = corpus["lorem"]
    full = compress_default(data)
    for budget in [8, 32, 100, len(full) - 1, len(full), len(full) + 10]:
        comp, consumed = compress_dest_size(data, budget)
        assert len(comp) <= budget
        if consumed:
            assert decompress_safe(comp, consumed) == data[:consumed]
        if budget >= len(full):
            assert consumed == len(data)


def test_dest_size_zero():
    assert compress_dest_size(b"hello world, longer than 13", 0) == (b"", 0)


def test_fuzz_roundtrip_random_sizes():
    rng = random.Random(42)
    for trial in range(60):
        n = rng.randrange(0, 3000)
        kind = trial % 4
        if kind == 0:
            data = bytes(rng.randrange(256) for _ in range(n))
        elif kind == 1:
            data = bytes(rng.randrange(4) for _ in range(n))
        elif kind == 2:
            unit = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 9)))
            data = (unit * (n // max(len(unit), 1) + 1))[:n]
        else:
            data = bytes((i * 7 + rng.randrange(3)) & 0xFF for i in range(n))
        roundtrip(data, accel=rng.choice([1, 1, 1, 7]))


def test_fuzz_decoder_never_crashes():
    """Corrupted input must raise LZ4Error, never crash or hang
    (safety property; reference decoder is safe-by-construction,
    SURVEY.md section 5 'race detection')."""
    from zig_lz4_tpu import LZ4Error
    rng = random.Random(1234)
    base = compress_default(b"The quick brown fox jumps over the lazy dog. " * 40)
    for _ in range(300):
        buf = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        try:
            decompress_safe(bytes(buf), 4096)
        except LZ4Error:
            pass
