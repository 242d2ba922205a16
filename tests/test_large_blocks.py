"""Large-block device-codec regression tests (CPU backend).

The emission pack geometry ((pos+1) << 9 | byte hi/lo splits, escape
middle pools) only exercises its upper bit ranges at block sizes
> 64KB; this is the regression net for that arithmetic.  Two past
bugs lived exactly here: an int32 overflow in the coalesce pass
(commit 35d3f41) and an escape-middle pool capped at 1024 rows that
silently corrupted >= 256KB RLE blocks (advisor finding, round 1).

reference semantics: src/lz4.zig:292-447 (encode), :89-251 (decode).
"""

import numpy as np
import pytest

from zig_lz4_tpu import decompress_safe
from zig_lz4_tpu.ops.jax_block import (
    device_encoder_supports, encode_blocks_jax)


def _roundtrip(data: bytes, blk: int) -> None:
    assert device_encoder_supports(blk)
    buf = np.zeros((1, blk), np.uint8)
    buf[0, :len(data)] = np.frombuffer(data, np.uint8)
    out, olen = encode_blocks_jax(buf, np.array([len(data)], np.int32),
                                  blk)
    comp = bytes(np.asarray(out)[0][:int(olen[0])])
    assert decompress_safe(comp, len(data)) == data


def _mixed(n: int) -> bytes:
    rng = np.random.default_rng(1234)
    text = (b"the quick brown fox jumps over the lazy dog. " * 400)
    rle = b"\x00" * (n // 4) + b"ab" * (n // 8)
    rand = rng.integers(0, 256, n // 4, dtype=np.uint8).tobytes()
    return (text + rle + rand + text)[:n]


@pytest.mark.parametrize("blk", [65536, 262144])
def test_rle_zeros_roundtrip(blk):
    # >= 256KB all-zeros needs > 1024 ml-escape middles: the exact
    # case the round-1 pool cap corrupted.
    _roundtrip(b"\x00" * blk, blk)


@pytest.mark.parametrize("blk", [65536, 262144])
def test_long_literal_run_roundtrip(blk):
    # one giant incompressible literal run -> > 1024 lit-escape middles
    rng = np.random.default_rng(99)
    _roundtrip(rng.integers(0, 256, blk, dtype=np.uint8).tobytes(), blk)


@pytest.mark.parametrize("blk", [65536, 262144])
def test_mixed_roundtrip(blk):
    _roundtrip(_mixed(blk), blk)


def test_rle_partial_block_256k():
    # non-full block exercises the n < blk tail paths at large blk
    _roundtrip(b"z" * 200_001, 262144)
