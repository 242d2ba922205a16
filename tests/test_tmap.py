"""T-map decode engine tests (round 5).

The per-byte literal-source map fully path-compresses LZ77 chains on
the host (native lz4tpu_resolve_tmap / resolve_tmap_py mirror); the
device reconstructs with ONE parity-keyed merge
(ops/jax_decode._decode_block_tmap).  reference decode semantics:
src/lz4.zig:89-251.
"""

import numpy as np
import pytest

from zig_lz4_tpu import errors as E
from zig_lz4_tpu.native import native_resolve_tmap
from zig_lz4_tpu.ops.hc import compress_hc
from zig_lz4_tpu.ops.block import compress_fast
from zig_lz4_tpu.ops.jax_decode import (_batched_tmap_decoder,
                                        device_tmap_decoder_supports,
                                        resolve_tmap_py)

BLK = 4096     # small block: fast CPU compiles, same arithmetic


def _cases():
    rng = np.random.default_rng(21)
    text = (b"the quick brown fox jumps over the lazy dog " * 200)
    return [
        text[:BLK],                                  # matchy text
        b"ab" * (BLK // 2),                          # 2-periodic RLE
        b"\x00" * BLK,                               # 1-periodic RLE
        rng.integers(0, 256, BLK, dtype=np.uint8).tobytes(),  # random
        text[:1000] + b"\x07" * 2000 +
        rng.integers(0, 256, 1096, dtype=np.uint8).tobytes(),  # mixed
        b"xyz",                                      # tiny
    ]


@pytest.mark.parametrize("level", [0, 9])
def test_tmap_native_mirror_and_semantics(level):
    for data in _cases():
        comp = compress_hc(data, 9) if level else compress_fast(data)
        T, ol = native_resolve_tmap(
            comp, np.zeros(1, np.int64),
            np.array([len(comp)], np.int64), BLK)
        Tp, olp = resolve_tmap_py(comp, BLK)
        assert int(ol[0]) == olp == len(data)
        assert np.array_equal(T[0, :olp], Tp[:olp])
        fetch = np.frombuffer(comp, np.uint8)
        assert fetch[T[0, :olp]].tobytes() == data


def test_tmap_device_decode_batched():
    assert device_tmap_decoder_supports(BLK)
    cases = _cases()
    comps = [compress_hc(d, 9) for d in cases]
    fetch_cap = max(len(c) for c in comps)
    concat = b"".join(comps)
    offs = np.zeros(len(comps), np.int64)
    lens = np.zeros(len(comps), np.int64)
    p = 0
    for i, c in enumerate(comps):
        offs[i] = p
        lens[i] = len(c)
        p += len(c)
    T, ol = native_resolve_tmap(concat, offs, lens, BLK)
    bufs = np.zeros((len(comps), fetch_cap), np.uint8)
    for i, c in enumerate(comps):
        bufs[i, :len(c)] = np.frombuffer(c, np.uint8)
    out = np.asarray(_batched_tmap_decoder(BLK)(
        bufs, T[:, :BLK], ol.astype(np.int32)))
    for i, d in enumerate(cases):
        assert out[i, :len(d)].tobytes() == d


def test_tmap_dictionary_history():
    from zig_lz4_tpu.ops.hc import StreamHC
    data = _cases()[0]
    dict_ = data[:1024]
    s = StreamHC(9)
    s.load_dict(dict_)
    tail = data[1500:3500]
    comp = s.compress_continue(tail)
    T, ol = native_resolve_tmap(
        comp, np.zeros(1, np.int64), np.array([len(comp)], np.int64),
        BLK, hist_len=len(dict_))
    Tp, olp = resolve_tmap_py(comp, BLK, hist_len=len(dict_))
    assert int(ol[0]) == olp == len(tail)
    assert np.array_equal(T[0, :olp], Tp[:olp])
    fetch = np.frombuffer(dict_ + comp, np.uint8)
    assert fetch[T[0, :olp]].tobytes() == tail


def test_tmap_corruption_raises():
    # hand-crafted: 1 literal 'A', then offset 0xFFFF with only one
    # byte of preceding output -> bad offset; plus a truncated stream
    bad_off = bytes([0x10, ord("A"), 0xFF, 0xFF, 0x00])
    truncated = bytes([0xF0, 0xFF])  # literal-length escape runs out
    for comp in (bad_off, truncated):
        with pytest.raises(E.CorruptedData):
            resolve_tmap_py(comp, BLK)
        with pytest.raises(E.CorruptedData):
            native_resolve_tmap(comp, np.zeros(1, np.int64),
                                np.array([len(comp)], np.int64), BLK)


def test_tmap_overcap_marked():
    # a block decoding past out_cap is MARKED (-1), not an error
    data = b"ab" * BLK               # decodes to 2*BLK
    comp = compress_fast(data)
    T, ol = native_resolve_tmap(
        comp, np.zeros(1, np.int64), np.array([len(comp)], np.int64),
        BLK)
    assert int(ol[0]) == -1
    assert resolve_tmap_py(comp, BLK) is None


def test_frag_pack_far_src_small_payload_regression():
    """Round-5 geometry regression: PER fsrc is OUT-space (< blk) and
    must fit the pack even when the quantized fetch buffer is smaller
    than the block.  Pre-fix, fcap=16384 at a bs/4 fetch sized r2=0
    and matches with source >= 32768 corrupted the pack (caught by a
    content-checksum mismatch on the 4MB tier)."""
    import jax
    from zig_lz4_tpu.native import native_resolve_blocks
    from zig_lz4_tpu.ops.jax_decode import (_batched_frag_decoder_win,
                                            device_win_decoder_supports)
    bs = 65536
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, 1000, dtype=np.uint8).tobytes()
    data = (b"\x00" * 35000 + a + b"\x00" * 20000 + a)
    data = data + b"\x00" * (bs - len(data))
    comp = compress_hc(data, 9)
    fetch_t = bs // 4
    assert len(comp) <= fetch_t      # tiny payload -> bs/4 quantum
    fcap = 16384
    assert device_win_decoder_supports(bs, fcap, fetch_t)
    r = native_resolve_blocks(comp, np.zeros(1, np.int64),
                              np.array([len(comp)], np.int64), fcap,
                              out_cap=bs, split_max=8, round_limit=12,
                              reuse_buffers=False)
    fdst, _fl, fsrc, fper, fph, nfrag, rounds, olens = r
    assert int(nfrag[0]) >= 0 and int(nfrag[0]) <= fcap
    assert int(fsrc.max()) >= 32768  # the regression precondition
    rmax = max(int(rounds[0]), 1)
    rmax = min(rmax, 2)
    if int(rounds[0]) > 2:
        pytest.skip("stream resolved deeper than the windowed tier")
    buf = np.zeros((1, fetch_t), np.uint8)
    buf[0, :len(comp)] = np.frombuffer(comp, np.uint8)
    dec = _batched_frag_decoder_win(bs, fcap, 2)
    o, ok = dec(buf, fdst[:, :fcap], fsrc[:, :fcap], fper[:, :fcap],
                fph[:, :fcap], nfrag, olens.astype(np.int32))
    assert bool(np.asarray(ok)[0])
    assert np.asarray(o)[0, :bs].tobytes() == data


def test_linked_tmap_multi_window_with_dictionary():
    """Multi-window linked decode: >2MB of output forces the windowed
    T-map engine through >= 2 windows, exercising the device-side
    history carry (dlen accumulation, right-aligned hist operand) and
    cross-window path compression.  Raw (store-uncompressed) records
    are interleaved via random segments.  reference streaming prefix
    semantics: src/lz4.zig:870-957."""
    from zig_lz4_tpu import frame as lz4f
    from zig_lz4_tpu.parallel.sharded import ShardedFrameCodec
    rng = np.random.default_rng(17)
    unit = b"linked history reaches back across block bounds " * 400
    parts = []
    for i in range(160):
        parts.append(unit)
        if i % 11 == 0:      # incompressible: store-uncompressed
            parts.append(rng.integers(0, 256, 66_000,
                                      dtype=np.uint8).tobytes())
    data = b"".join(parts)[:4_500_000 + 321]
    assert len(data) > 1 << 21       # > one window of output
    d = data[50_000:50_000 + 40_000]
    prefs = lz4f.Preferences(frame_info=lz4f.FrameInfo(
        block_size_id=lz4f.BlockSizeID.max64KB,
        block_mode=lz4f.BlockMode.linked,
        content_checksum=True, block_checksum=True))
    fr = lz4f.compress_frame(data, prefs, dictionary=d)
    codec = ShardedFrameCodec(dictionary=d)
    info, pos = lz4f.parse_frame_header(fr)
    res = codec._decompress_linked_device(fr, info, pos)
    assert res is not None, "windowed T-map path unexpectedly unsupported"
    assert res == data
