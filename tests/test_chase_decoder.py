"""Pointer-doubling (chase) fragment decoder tests (round-3 v2 path).

Covers the tagged-position doubling merges, frontier compaction, the
depth contract (2^(dense+doublings)), and the self-validation
contract: non-convergence must flag ok=False, never produce wrong
bytes.  reference decode semantics: src/lz4.zig:89-251.
"""

import functools

import numpy as np
import pytest

import jax

from zig_lz4_tpu import compress_fast
from zig_lz4_tpu.constants import compress_bound
from zig_lz4_tpu.ops.hc import compress_hc
from zig_lz4_tpu.ops.jax_block import (_decode_block_frags_chase,
                                       device_chase_decoder_supports,
                                       resolve_fragments_py)

BLK = 4096
FCAP = BLK


def _decode_chase(comp: bytes, out_len: int, dense: int = 2,
                  doublings: int = 4, qcap: int = 512,
                  round_limit: int = 64):
    r = resolve_fragments_py(comp, FCAP, BLK, 0, 8, round_limit)
    assert r is not None
    frags, mr, ol = r
    assert ol == out_len
    ccap = compress_bound(BLK)
    cb = np.zeros(ccap, np.uint8)
    cb[:len(comp)] = np.frombuffer(comp, np.uint8)
    fd, fs, fp, fh = (np.zeros(FCAP, np.int32) for _ in range(4))
    for q, (d, _L, s, p, h, _r2) in enumerate(frags):
        fd[q], fs[q], fp[q], fh[q] = d, s, p, h
    dec = jax.jit(functools.partial(
        _decode_block_frags_chase, blk=BLK, fcap=FCAP, dense=dense,
        doublings=doublings, qcap=qcap))
    out, ok = dec(cb, fd, fs, fp, fh, np.int32(len(frags)),
                  np.int32(ol))
    return np.asarray(out)[:ol].tobytes(), bool(ok), mr


@pytest.mark.parametrize("per", [1, 2, 3, 5, 8, 13])
def test_period_classes(per):
    unit = bytes(range(65, 65 + per))
    data = (unit * (BLK // per + 1))[:BLK]
    got, ok, _ = _decode_chase(compress_fast(data), BLK)
    assert ok and got == data


def test_mixed_corpus_fast_and_hc():
    rng = np.random.default_rng(3)
    text = b"the quick brown fox jumps over the lazy dog -- " * 40
    data = (text + rng.integers(0, 256, 700, dtype=np.uint8).tobytes()
            + b"\x00" * 500 + text)[:BLK]
    for comp in (compress_fast(data), compress_hc(data, 9)):
        got, ok, _ = _decode_chase(comp, len(data))
        assert ok and got == data


def test_deep_chain_beyond_linear_rounds():
    """Chains deeper than any linear-round tier still converge: depth
    up to 2^(dense+doublings) = 64 with the default config, while the
    resolver is allowed to leave chains at round_limit=64."""
    rng = np.random.default_rng(7)
    piece = rng.integers(65, 91, 40, dtype=np.uint8).tobytes()
    data = bytearray(piece)
    while len(data) < BLK:           # each copy references the last
        data += data[-37:]           # copy -> chain depth grows
    data = bytes(data[:BLK])
    got, ok, mr = _decode_chase(compress_fast(data), BLK)
    assert ok and got == data


def test_nonconvergence_flags_not_corrupts():
    """With too-few doubling rounds a deep chain must FLAG, and the
    decoded prefix must never be wrong bytes."""
    piece = b"0123456789abcdefghijklmnopqrstuvwxyz!@#$"
    data = bytearray(piece)
    while len(data) < BLK:
        data += data[-37:]
    data = bytes(data[:BLK])
    comp = compress_fast(data)
    got, ok, mr = _decode_chase(comp, BLK, dense=0, doublings=1)
    if mr > 2:                       # chain really is deeper than 2
        assert not ok
    got, ok, _ = _decode_chase(comp, BLK)
    assert ok and got == data


def test_frontier_overflow_flags():
    """A tiny frontier pool with deep chains past the dense rounds
    must flag, and a big enough pool must decode exactly."""
    rng = np.random.default_rng(11)
    piece = rng.integers(65, 91, 50, dtype=np.uint8).tobytes()
    data = bytearray(piece)
    while len(data) < BLK:
        data += data[-47:]
    data = bytes(data[:BLK])
    comp = compress_fast(data)
    got, ok, mr = _decode_chase(comp, BLK, qcap=1024)
    assert ok and got == data
    if mr > 4:                       # frontier nonempty after dense
        _got, ok_small, _ = _decode_chase(comp, BLK, dense=0,
                                          doublings=2, qcap=8)
        assert not ok_small


def test_short_and_empty():
    for data in (b"", b"x", b"hello world, hello world, hello!"):
        got, ok, _ = _decode_chase(compress_fast(data) if data else b"",
                                   len(data))
        assert ok and got == data


def test_random_incompressible():
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, BLK, dtype=np.uint8).tobytes()
    got, ok, _ = _decode_chase(compress_fast(data), BLK)
    assert ok and got == data


def test_support_predicate():
    assert device_chase_decoder_supports(65536)
    # 256KB fits with a reduced fragment budget (merge-A pack), and
    # the chase packs themselves have no 64KB chunk ceiling
    assert device_chase_decoder_supports(262144, fcap=32768)
    assert not device_chase_decoder_supports(262144)   # merge-A pack
