"""Windowed fragment decoder tests (round-3 fast path).

Covers the aligned-window group queries (W1/W2), every small period
class (wrap-inside-group behavior), the straggler pool, and the
self-validation contract: pool overflow must flag ok=False, never
produce wrong bytes.  reference decode semantics: src/lz4.zig:89-251.
"""

import functools

import numpy as np
import pytest

import jax

from zig_lz4_tpu import compress_fast
from zig_lz4_tpu.constants import compress_bound
from zig_lz4_tpu.ops.hc import compress_hc
from zig_lz4_tpu.ops.jax_block import (_decode_block_frags_win,
                                       device_win_decoder_supports,
                                       resolve_fragments_py)

BLK = 4096
FCAP = BLK


def _decode_win(comp: bytes, out_len: int, pool: int = 1024,
                rounds: int = 12):
    r = resolve_fragments_py(comp, FCAP, BLK, 0, 8, rounds)
    assert r is not None
    frags, _mr, ol = r
    assert ol == out_len
    ccap = compress_bound(BLK)
    cb = np.zeros(ccap, np.uint8)
    cb[:len(comp)] = np.frombuffer(comp, np.uint8)
    fd, fs, fp, fh = (np.zeros(FCAP, np.int32) for _ in range(4))
    for q, (d, _L, s, p, h, _r2) in enumerate(frags):
        fd[q], fs[q], fp[q], fh[q] = d, s, p, h
    dec = jax.jit(functools.partial(_decode_block_frags_win, blk=BLK,
                                    fcap=FCAP, rounds=rounds,
                                    pool=pool))
    out, ok = dec(cb, fd, fs, fp, fh, np.int32(len(frags)),
                  np.int32(ol))
    return np.asarray(out)[:ol].tobytes(), bool(ok)


@pytest.mark.parametrize("per", [1, 2, 3, 4, 5, 7, 8, 9, 13])
def test_period_classes(per):
    """Period wraps inside an 8-byte output group exercise the W2
    window and the span<=7 coverage argument."""
    unit = bytes(range(65, 65 + per))
    data = (unit * (BLK // per + 1))[:BLK]
    got, ok = _decode_win(compress_fast(data), BLK)
    assert ok and got == data


def test_mixed_corpus():
    rng = np.random.default_rng(3)
    text = b"the quick brown fox jumps over the lazy dog -- " * 40
    data = (text + rng.integers(0, 256, 700, dtype=np.uint8).tobytes()
            + b"\x00" * 500 + text)[:BLK]
    for comp in (compress_fast(data), compress_hc(data, 9)):
        got, ok = _decode_win(comp, len(data))
        assert ok and got == data


def test_short_and_empty():
    for data in (b"", b"x", b"hello world, hello world, hello!"):
        got, ok = _decode_win(compress_fast(data) if data else b"",
                              len(data))
        assert ok and got == data


def test_pool_overflow_flags_not_corrupts():
    """Adversarial tiny fragments overflow a small pool: the decoder
    must FLAG (ok=False), and with a big enough pool decode exactly."""
    rng = np.random.default_rng(11)
    data = b"".join(bytes([rng.integers(65, 70)])
                    * int(rng.integers(1, 6))
                    for _ in range(1500))[:BLK]
    comp = compress_fast(data)
    got, ok = _decode_win(comp, len(data), pool=1024)
    assert ok and got == data
    _got, ok = _decode_win(comp, len(data), pool=4)
    assert not ok          # flagged, caller falls back


def test_support_predicate():
    assert device_win_decoder_supports(65536)
    assert not device_win_decoder_supports(262144)   # chunk-pack limit
