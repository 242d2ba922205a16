"""C++ native backend: bit-exact equivalence with the Python oracle."""

import random

import pytest

from zig_lz4_tpu import compress_fast, decompress_safe
from zig_lz4_tpu.native import (
    NativeStreamTable,
    is_available,
    native_compress_fast,
    native_compress_window,
    native_decompress,
    native_parse_sequences,
    native_xxh32,
)
from zig_lz4_tpu.ops.jax_block import MAX_SEQS, parse_sequences, seqs_to_arrays
from zig_lz4_tpu.utils.xxhash32 import xxh32_python

pytestmark = pytest.mark.skipif(not is_available(),
                                reason="native backend unavailable")


def _cases():
    rng = random.Random(2024)
    lorem = (b"Lorem ipsum dolor sit amet, consectetur adipiscing elit, "
             b"sed do eiusmod tempor incididunt ut labore. ") * 50
    return [
        b"",
        b"a",
        b"hello world!",
        b"0123456789abc",
        b"ABCDEFGH" * 200,
        lorem,
        bytes(rng.randrange(256) for _ in range(5000)),
        bytes(rng.randrange(4) for _ in range(8000)),
        b"x" * 20000,
        bytes(i & 0xFF for i in range(30000)),
    ]


@pytest.mark.parametrize("seed", [0, 1, 2654435761])
def test_native_xxh32_matches_python(seed):
    for data in _cases():
        assert native_xxh32(data, seed) == xxh32_python(data, seed)


@pytest.mark.parametrize("accel", [1, 4, 64])
def test_native_compress_bit_identical(accel):
    for data in _cases():
        assert native_compress_fast(data, accel) == compress_fast(data, accel)


def test_native_decompress_matches():
    for data in _cases():
        comp = compress_fast(data)
        if not comp:
            continue
        assert native_decompress(comp, len(data)) == data
        # partial
        t = len(data) // 2
        assert native_decompress(comp, len(data), target=t) == data[:t]


def test_native_decompress_dict_prefix():
    dict_ = b"0123456789abcdef" * 16
    off = 2 + 8
    seq = bytes([0x24, ord("X"), ord("Y"), off & 0xFF, off >> 8])
    assert native_decompress(seq, 100, dict_=dict_) == b"XY" + dict_[-8:]
    assert native_decompress(seq, 100, prefix=dict_) == b"XY" + dict_[-8:]


def test_native_decompress_corrupt_raises():
    from zig_lz4_tpu.errors import LZ4Error
    with pytest.raises(LZ4Error):
        native_decompress(bytes([0x10, ord("x"), 0x00, 0x00]), 100)


def test_native_parse_sequences_matches_python():
    for data in _cases():
        comp = compress_fast(data)
        if not comp:
            continue
        cap = MAX_SEQS(max(len(data), 64))
        got = native_parse_sequences(comp, cap)
        lit, lsrc, ml, off, ns = seqs_to_arrays(parse_sequences(comp), cap)
        glit, glsrc, gml, goff, gns = got
        assert int(gns) == int(ns)
        assert (glit[:ns] == lit[:ns]).all()
        assert (glsrc[:ns] == lsrc[:ns]).all()
        assert (gml[:ns] == ml[:ns]).all()
        assert (goff[:ns] == off[:ns]).all()


def test_native_streaming_window_matches_python_stream():
    from zig_lz4_tpu.stream import Stream, StreamDecode
    rng = random.Random(5)
    blocks = [bytes(rng.randrange(64) for _ in range(3000)) for _ in range(4)]
    blocks.append(blocks[0])  # history match

    py = Stream()
    table = NativeStreamTable()
    hist = b""
    goff = 0
    d = StreamDecode()
    for blk in blocks:
        py_out = py.compress_fast_continue(blk)
        window = hist + blk
        nat_out = native_compress_window(window, len(hist), 1, table,
                                         goff - len(hist))
        assert nat_out == py_out
        assert d.decompress_continue(nat_out, len(blk)) == blk
        hist = window[-65536:]
        goff += len(blk)


def test_native_hc_parity_all_levels(corpus):
    """Native HC must be bit-identical to the Python HC oracle.
    reference behavior: src/lz4hc.zig levels 2-12."""
    import numpy as np
    from zig_lz4_tpu.native import is_available, native_compress_hc
    from zig_lz4_tpu.ops.hc import compress_hc_oracle
    if not is_available():
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(23)
    extra = {
        "low_entropy": bytes(rng.integers(0, 4, 9000, dtype=np.uint8)),
        "binary": bytes(rng.integers(0, 2, 12000, dtype=np.uint8)),
        "period5": b"fives" * 2500,
    }
    for name, data in {**corpus, **extra}.items():
        for level in (2, 3, 6, 9, 10, 12):
            assert native_compress_hc(data, level) == \
                compress_hc_oracle(data, level), (name, level)


def test_native_hc_blocks_batched():
    import numpy as np
    from zig_lz4_tpu.native import (is_available, native_compress_hc,
                                    native_compress_hc_blocks)
    if not is_available():
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(5)
    blk = 4096
    blocks = np.zeros((6, blk), np.uint8)
    blocks[0] = 65
    blocks[1] = rng.integers(0, 256, blk, dtype=np.uint8)
    blocks[2] = rng.integers(0, 4, blk, dtype=np.uint8)
    blocks[3, :2000] = np.frombuffer((b"ride the wave " * 143)[:2000], np.uint8)
    dst, outl = native_compress_hc_blocks(blocks,
                                          np.full(6, blk, np.int64), 9)
    for i in range(6):
        one = native_compress_hc(blocks[i].tobytes(), 9)
        assert dst[i, :outl[i]].tobytes() == one, i
