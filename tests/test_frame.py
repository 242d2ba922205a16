"""Frame format tests.

Modeled on the reference suites: inline frame tests
(reference: src/lz4f.zig:642-759) and test-lz4f
(reference: src/test_lz4f.zig: basic/empty/multi-block, content
checksum with corruption negative test, block checksums, all 4 block
sizes, linked vs independent).
"""

import dataclasses
import random

import pytest

import zig_lz4_tpu.frame as lz4f
from zig_lz4_tpu import errors as E


def rt(data, prefs=None, **kw):
    comp = lz4f.compress_frame(data, prefs, **kw)
    assert len(comp) <= lz4f.compress_frame_bound(len(data), prefs)
    out = lz4f.decompress_frame(comp, **{k: v for k, v in kw.items()
                                         if k == "dictionary"})
    assert out == data
    return comp


def test_header_roundtrip():
    info = lz4f.FrameInfo(block_size_id=lz4f.BlockSizeID.max256KB,
                          block_mode=lz4f.BlockMode.independent,
                          content_checksum=True, content_size=12345,
                          dict_id=77, block_checksum=True)
    hdr = lz4f.write_frame_header(info)
    assert lz4f.header_size(hdr) == len(hdr)
    parsed, consumed = lz4f.parse_frame_header(hdr)
    assert consumed == len(hdr)
    assert parsed == info


def test_header_checksum_detects_corruption():
    hdr = bytearray(lz4f.write_frame_header(lz4f.FrameInfo()))
    hdr[-1] ^= 0xFF
    with pytest.raises(E.HeaderChecksumInvalid):
        lz4f.parse_frame_header(bytes(hdr))


def test_bad_magic():
    with pytest.raises(E.FrameTypeUnknown):
        lz4f.header_size(b"\x00\x01\x02\x03\x04")


def test_reserved_flg_bit():
    hdr = bytearray(lz4f.write_frame_header(lz4f.FrameInfo()))
    hdr[4] |= 0x02
    with pytest.raises(E.ReservedFlagSet):
        lz4f.parse_frame_header(bytes(hdr))


def test_version_bits():
    hdr = bytearray(lz4f.write_frame_header(lz4f.FrameInfo()))
    hdr[4] = (hdr[4] & 0x3F) | 0x80  # version 10
    with pytest.raises(E.HeaderVersionWrong):
        lz4f.parse_frame_header(bytes(hdr))


def test_frame_basic(corpus):
    rt(corpus["lorem"])


def test_frame_empty():
    comp = lz4f.compress_frame(b"")
    assert lz4f.decompress_frame(comp) == b""


def test_frame_empty_with_checksum():
    prefs = lz4f.Preferences(
        frame_info=lz4f.FrameInfo(content_checksum=True))
    comp = lz4f.compress_frame(b"", prefs)
    assert lz4f.decompress_frame(comp) == b""


def test_frame_multiblock_1mb():
    rng = random.Random(5)
    data = bytes(rng.randrange(4) for _ in range(1 << 20))
    prefs = lz4f.Preferences(
        frame_info=lz4f.FrameInfo(block_size_id=lz4f.BlockSizeID.max64KB))
    comp = rt(data, prefs)
    assert len(comp) < len(data)


@pytest.mark.parametrize("bsid", [lz4f.BlockSizeID.max64KB,
                                  lz4f.BlockSizeID.max256KB,
                                  lz4f.BlockSizeID.max1MB,
                                  lz4f.BlockSizeID.max4MB])
def test_all_block_sizes(bsid, corpus):
    data = corpus["mixed"] * 3
    prefs = lz4f.Preferences(frame_info=lz4f.FrameInfo(block_size_id=bsid))
    rt(data, prefs)


def test_content_checksum_roundtrip(corpus):
    prefs = lz4f.Preferences(
        frame_info=lz4f.FrameInfo(content_checksum=True))
    rt(corpus["lorem"], prefs)


def test_content_checksum_detects_corruption(corpus):
    """reference: src/test_lz4f.zig:168-179 (flip final byte)."""
    prefs = lz4f.Preferences(
        frame_info=lz4f.FrameInfo(content_checksum=True))
    comp = bytearray(lz4f.compress_frame(corpus["lorem"], prefs))
    comp[-1] ^= 0x01
    with pytest.raises(E.ContentChecksumInvalid):
        lz4f.decompress_frame(bytes(comp))


def test_block_checksum_roundtrip_and_corruption(corpus):
    prefs = lz4f.Preferences(
        frame_info=lz4f.FrameInfo(block_checksum=True))
    comp = rt(corpus["lorem"], prefs)
    bad = bytearray(comp)
    # corrupt a payload byte inside the first block
    hdr = lz4f.header_size(comp)
    bad[hdr + 4 + 3] ^= 0xFF
    with pytest.raises((E.BlockChecksumInvalid, E.LZ4Error)):
        lz4f.decompress_frame(bytes(bad))


def test_skip_checksums_option(corpus):
    prefs = lz4f.Preferences(
        frame_info=lz4f.FrameInfo(content_checksum=True))
    comp = bytearray(lz4f.compress_frame(corpus["lorem"], prefs))
    comp[-1] ^= 0x01
    out = lz4f.decompress_frame(
        bytes(comp), options=lz4f.DecompressOptions(skip_checksums=True))
    assert out == corpus["lorem"]


def test_linked_vs_independent():
    """Linked mode must beat independent on cross-block redundancy.

    reference: src/test_lz4f.zig:257-308 tests both modes; but the
    reference cannot produce real linked output -- we can, so also
    assert the ratio advantage."""
    rng = random.Random(6)
    unit = bytes(rng.randrange(256) for _ in range(60_000))
    data = unit * 4  # repeats with period < 64KB spanning block bounds
    p_linked = lz4f.Preferences(frame_info=lz4f.FrameInfo(
        block_size_id=lz4f.BlockSizeID.max64KB,
        block_mode=lz4f.BlockMode.linked))
    p_indep = lz4f.Preferences(frame_info=lz4f.FrameInfo(
        block_size_id=lz4f.BlockSizeID.max64KB,
        block_mode=lz4f.BlockMode.independent))
    c_linked = rt(data, p_linked)
    c_indep = rt(data, p_indep)
    assert len(c_linked) < len(c_indep) // 2


def test_store_uncompressed_fallback():
    rng = random.Random(7)
    data = bytes(rng.randrange(256) for _ in range(200_000))
    comp = rt(data)
    # incompressible: stored blocks -> total near raw size + framing
    assert len(comp) < len(data) + 1000
    # verify high bit set on first block header
    hdr = lz4f.header_size(comp)
    word = int.from_bytes(comp[hdr:hdr + 4], "little")
    assert word & 0x80000000


def test_content_size_declared_and_verified(corpus):
    data = corpus["lorem"]
    prefs = lz4f.Preferences(
        frame_info=lz4f.FrameInfo(content_size=len(data)))
    comp = rt(data, prefs)
    info = lz4f.get_frame_info(comp)
    assert info.content_size == len(data)

    # declared size wrong -> compressor refuses at end()
    bad_prefs = lz4f.Preferences(
        frame_info=lz4f.FrameInfo(content_size=len(data) + 1))
    fc = lz4f.FrameCompressor(bad_prefs)
    fc.begin()
    fc.update(data)
    with pytest.raises(E.FrameSizeWrong):
        fc.end()


def test_content_size_streamed_roundtrip_and_mismatch(corpus):
    """A STREAMED frame carrying a declared content size must verify
    it on decode (reference Preferences semantics, lz4f.zig:106-122;
    the reference itself never verifies -- SURVEY.md section 2.3)."""
    data = corpus["mixed"]
    prefs = lz4f.Preferences(frame_info=lz4f.FrameInfo(
        content_size=len(data), content_checksum=False))
    fc = lz4f.FrameCompressor(prefs)
    frame = fc.begin() + fc.update(data) + fc.end()
    fd = lz4f.FrameDecompressor()
    assert fd.feed(frame) == data and fd.finished

    # patch the declared u64 content size (header offset 6) and fix
    # the HC byte so ONLY the size verification can catch the lie
    bad = bytearray(frame)
    bad[6:14] = (len(data) + 7).to_bytes(8, "little")
    bad[14] = lz4f._header_checksum_byte(bytes(bad[4:14]))
    with pytest.raises(E.FrameSizeWrong):
        lz4f.decompress_frame(bytes(bad))


def test_skippable_frame_roundtrip(corpus):
    sk = lz4f.write_skippable_frame(b"user metadata here", 3)
    comp = lz4f.compress_frame(corpus["hello"])
    out = lz4f.decompress_frame(sk + comp)
    assert out == corpus["hello"]
    # skippable after the frame too
    out = lz4f.decompress_frame(comp + sk)
    assert out == corpus["hello"]


def test_concatenated_frames(corpus):
    c1 = lz4f.compress_frame(corpus["hello"])
    c2 = lz4f.compress_frame(corpus["lorem"])
    assert lz4f.decompress_frame(c1 + c2) == corpus["hello"] + corpus["lorem"]


def test_streaming_compressor_matches_oneshot(corpus):
    data = corpus["mixed"] * 2
    prefs = lz4f.Preferences(frame_info=lz4f.FrameInfo(
        block_size_id=lz4f.BlockSizeID.max64KB, content_checksum=True))
    fc = lz4f.FrameCompressor(prefs)
    parts = [fc.begin()]
    rng = random.Random(8)
    i = 0
    while i < len(data):
        n = rng.randrange(1, 50_000)
        parts.append(fc.update(data[i:i + n]))
        i += n
    parts.append(fc.end())
    streamed = b"".join(parts)
    oneshot = lz4f.compress_frame(data, prefs)
    assert streamed == oneshot  # same chunking into blocks -> identical


def test_streaming_decompressor_byte_at_a_time(corpus):
    data = corpus["lorem"]
    comp = lz4f.compress_frame(data, lz4f.Preferences(
        frame_info=lz4f.FrameInfo(content_checksum=True)))
    fd = lz4f.FrameDecompressor()
    out = bytearray()
    for b in comp:
        out += fd.feed(bytes([b]))
    assert bytes(out) == data
    assert fd.finished


def test_frame_dictionary(corpus):
    dict_ = corpus["lorem"][:4000]
    data = corpus["lorem"][:2000]  # fully covered by dict
    prefs = lz4f.Preferences(frame_info=lz4f.FrameInfo(dict_id=42))
    comp = lz4f.compress_frame(data, prefs, dictionary=dict_)
    assert lz4f.get_frame_info(comp).dict_id == 42
    assert len(comp) < len(data) // 4
    out = lz4f.decompress_frame(comp, dictionary=dict_)
    assert out == data


def test_frame_dictionary_independent_blocks():
    dict_ = b"0123456789abcdefghij" * 300
    data = dict_[:3000] + dict_[1000:4000]
    prefs = lz4f.Preferences(frame_info=lz4f.FrameInfo(
        block_size_id=lz4f.BlockSizeID.max64KB,
        block_mode=lz4f.BlockMode.independent, dict_id=7))
    comp = lz4f.compress_frame(data, prefs, dictionary=dict_)
    out = lz4f.decompress_frame(comp, dictionary=dict_)
    assert out == data


def test_truncated_frame_raises(corpus):
    comp = lz4f.compress_frame(corpus["lorem"])
    with pytest.raises(E.LZ4Error):
        lz4f.decompress_frame(comp[:-3])


def test_auto_flush():
    prefs = lz4f.Preferences(auto_flush=True)
    fc = lz4f.FrameCompressor(prefs)
    out = bytearray(fc.begin())
    out += fc.update(b"hello ")
    mid = len(out)
    out += fc.update(b"world")
    out += fc.end()
    # auto_flush -> each update produced a block immediately
    assert mid > len(lz4f.write_frame_header(prefs.frame_info))
    assert lz4f.decompress_frame(bytes(out)) == b"hello world"


def test_frame_bound_is_sufficient_for_worst_case():
    rng = random.Random(10)
    for n in [0, 1, 100, 70_000, 300_000]:
        data = bytes(rng.randrange(256) for _ in range(n))
        prefs = lz4f.Preferences(frame_info=lz4f.FrameInfo(
            content_checksum=True, block_checksum=True))
        comp = lz4f.compress_frame(data, prefs)
        assert len(comp) <= lz4f.compress_frame_bound(n, prefs)


def test_fuzz_frame_corruption_never_misdecodes():
    """Safety fuzz (SURVEY section 5): randomly corrupt checksummed
    frames -- bit flips, truncations, byte insertions -- and assert
    the decoder either raises the frame error taxonomy or returns the
    EXACT original content (a flip may land in bytes that do not
    affect output).  It must never hang, crash with a non-taxonomy
    error, or return wrong bytes.  reference negative-test pattern:
    src/test_lz4f.zig:168-179, generalized."""
    import random
    rng = random.Random(0xF00D)
    content = (b"corruption fuzz target " * 400
               + bytes(rng.randrange(256) for _ in range(2000)))
    prefs = lz4f.Preferences(frame_info=lz4f.FrameInfo(
        content_checksum=True, block_checksum=True,
        content_size=len(content)), compression_level=1)
    frame = lz4f.compress_frame(content, prefs)
    for trial in range(120):
        bad = bytearray(frame)
        kind = trial % 3
        if kind == 0:                       # bit flip
            pos = rng.randrange(len(bad))
            bad[pos] ^= 1 << rng.randrange(8)
        elif kind == 1:                     # truncation
            bad = bad[:rng.randrange(len(bad))]
        else:                               # byte insertion
            pos = rng.randrange(len(bad))
            bad[pos:pos] = bytes([rng.randrange(256)])
        try:
            out = lz4f.decompress_frame(bytes(bad))
            assert out == content, f"misdecode at trial {trial}"
        except (E.FrameError, E.BlockError):
            pass


def test_fuzz_frame_corruption_sharded_codec():
    """The device-pipeline codec upholds the same property."""
    import random
    from zig_lz4_tpu.parallel import ShardedFrameCodec
    rng = random.Random(0xBEEF)
    content = (b"sharded corruption fuzz " * 3000)[:70_000]
    codec = ShardedFrameCodec(content_checksum=True,
                              block_checksum=True)
    frame = codec.compress_frame(content)
    for trial in range(40):
        bad = bytearray(frame)
        if trial % 2:
            bad = bad[:rng.randrange(len(bad))]
        else:
            bad[rng.randrange(len(bad))] ^= 1 << rng.randrange(8)
        try:
            out = codec.decompress_frame(bytes(bad))
            assert out == content, f"misdecode at trial {trial}"
        except (E.FrameError, E.BlockError):
            pass
