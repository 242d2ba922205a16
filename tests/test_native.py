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


def test_corrupt_stream_native_oracle_verdict_parity():
    """Adversarial robustness: on corrupted/truncated/random streams
    the native batched decoder must reach the SAME verdict as the
    Python oracle -- identical bytes when both accept, an LZ4 block
    error (never a crash or wild read) when the oracle rejects.  The
    native resolver must likewise complete cleanly on hostile input
    (it parses untrusted bytes before anything validates them).
    reference analog: the generic decoder's error set, lz4.zig:48-55."""
    import numpy as np
    from zig_lz4_tpu import compress_default, decompress_safe
    from zig_lz4_tpu.errors import LZ4Error
    from zig_lz4_tpu.native import (is_available, native_decompress_blocks,
                                    native_resolve_blocks)
    if not is_available():
        import pytest
        pytest.skip("native runtime unavailable")

    rng = np.random.default_rng(0xBAD)
    blk = 8192
    base_inputs = [
        (b"the quick brown fox " * 600)[:blk],
        bytes(rng.integers(0, 256, blk, dtype=np.uint8)),
        (b"ab" * 3000 + b"\x00" * 2000)[:blk],
    ]
    trials = 0
    for raw in base_inputs:
        good = compress_default(raw)
        for t in range(12):
            bad = bytearray(good)
            kind = t % 4
            if kind == 0:      # byte flips
                for _ in range(rng.integers(1, 5)):
                    bad[rng.integers(0, len(bad))] ^= \
                        int(rng.integers(1, 256))
            elif kind == 1:    # truncation
                bad = bad[:rng.integers(0, len(bad))]
            elif kind == 2:    # random insertion
                pos = int(rng.integers(0, len(bad)))
                bad[pos:pos] = bytes(rng.integers(0, 256, 7,
                                                  dtype=np.uint8))
            else:              # pure random blob
                bad = bytearray(rng.integers(
                    0, 256, int(rng.integers(1, 400)), dtype=np.uint8))
            bad = bytes(bad)
            if not bad:
                continue
            trials += 1
            try:
                want = decompress_safe(bad, blk)
                oracle_err = None
            except LZ4Error:
                want, oracle_err = None, True
            offs = np.zeros(1, np.int64)
            lens = np.array([len(bad)], np.int64)
            try:
                dst, outl = native_decompress_blocks(bad, offs, lens, blk)
                got = dst[0, :outl[0]].tobytes()
                native_err = None
            except LZ4Error:
                got, native_err = None, True
            assert oracle_err == native_err, \
                f"verdict mismatch (kind {kind}): oracle " \
                f"{'err' if oracle_err else 'ok'} native " \
                f"{'err' if native_err else 'ok'}"
            if oracle_err is None:
                assert got == want, f"byte mismatch on kind {kind}"
            # the resolver must complete cleanly either way (marked
            # block, empty result, or a clean LZ4 error)
            try:
                native_resolve_blocks(bad, offs, lens, blk // 2,
                                      out_cap=blk, reuse_buffers=False)
            except LZ4Error:
                pass
    assert trials >= 30


def test_native_hc_window_parity_and_streaming():
    """The windowed native HC entry (StreamHC fast path) must be
    bit-identical to the python oracle run the same way (fresh
    context, same window/start) for the chain/optimal strategies, and
    must actually reach history matches at every level including MID
    (whose tables the entry seeds eagerly -- reference analog:
    compressContinue, src/lz4hc.zig:1557-1660)."""
    import random
    import numpy as np
    from zig_lz4_tpu.native import is_available, native_compress_hc_window
    from zig_lz4_tpu.ops.block import _decompress_generic
    from zig_lz4_tpu.ops.hc import HCContext, _compress_hc_core
    if not is_available():
        import pytest
        pytest.skip("native runtime unavailable")

    rng = random.Random(0xD1C7)
    nprng = np.random.default_rng(0xD1C7)
    text = (b"streaming window parity case " * 300)
    for trial in range(12):
        hist_len = rng.choice([0, 37, 512, 4096])
        blk_len = rng.randrange(12, 3000)
        blob = (text + bytes(nprng.integers(0, 256, 4096,
                                            dtype=np.uint8)) + text)
        off = rng.randrange(0, len(blob) - hist_len - blk_len)
        window = blob[off:off + hist_len + blk_len]
        for level in (3, 5, 9, 10, 12):
            got = native_compress_hc_window(window, hist_len, level)
            out = bytearray()
            _compress_hc_core(HCContext(), window, hist_len, level,
                              out, None)
            assert got == bytes(out), \
                f"trial {trial} level {level} hist {hist_len}"
            dec = _decompress_generic(got, blk_len, None,
                                      window[:hist_len], b"")
            assert dec == window[hist_len:]

    # MID (level 2): eager history seeding -> a block that repeats the
    # history must compress to almost nothing
    hist = bytes(nprng.integers(0, 256, 4096, dtype=np.uint8))
    out2 = native_compress_hc_window(hist + hist[:2000], len(hist), 2)
    assert len(out2) < 2000 // 10, len(out2)
    assert _decompress_generic(out2, 2000, None, hist, b"") \
        == hist[:2000]


def test_native_hc_stream_persistent_tables():
    """Round-4 persistent StreamHC context: valid output with true
    cross-block matching, byte-exact checkpoint resume, and dirty
    self-healing after an output-budget failure."""
    from zig_lz4_tpu.native import NativeHCStream, is_available
    from zig_lz4_tpu.ops.block import decompress_safe_using_dict
    from zig_lz4_tpu import errors as E
    if not is_available():
        pytest.skip("native unavailable")
    import random
    rng = random.Random(17)
    blocks = [bytes(rng.randrange(48) for _ in range(4096))
              for _ in range(8)]

    s = NativeHCStream()
    hist = b""
    outs = []
    for b in blocks:
        window = hist + b
        comp = s.compress(window, len(hist), 9)
        assert decompress_safe_using_dict(comp, len(b), hist) == b
        outs.append(comp)
        hist = window[-65536:]
    # cross-block matching: identical later blocks compress far better
    s2 = NativeHCStream()
    c1 = s2.compress(blocks[0], 0, 9)
    c2 = s2.compress(blocks[0] + blocks[0], len(blocks[0]), 9)
    assert len(c2) < len(c1) // 4

    # byte-exact checkpoint resume mid-stream
    sA = NativeHCStream()
    hist = b""
    for b in blocks[:4]:
        sA.compress(hist + b, len(hist), 9)
        hist = (hist + b)[-65536:]
    blob = sA.export_state()
    sB = NativeHCStream()
    sB.import_state(blob)
    w = hist + blocks[4]
    assert sA.compress(w, len(hist), 9) == sB.compress(w, len(hist), 9)

    # corrupt state blob rejected
    with pytest.raises(ValueError):
        sB.import_state(b"garbage")

    # output-budget failure: state does not advance; next call heals
    sC = NativeHCStream()
    sC.compress(blocks[0], 0, 9)
    with pytest.raises(E.OutputTooSmall):
        sC.compress(blocks[0] + blocks[1], len(blocks[0]), 9,
                    max_output=4)
    comp = sC.compress(blocks[0] + blocks[1], len(blocks[0]), 9)
    assert decompress_safe_using_dict(comp, len(blocks[1]),
                                      blocks[0]) == blocks[1]
