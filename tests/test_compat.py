"""Cross-implementation compatibility vs the reference `lz4` CLI.

Mirrors the reference's Tier-3 oracle pattern
(reference: src/test_compat.zig:66-254):
  Group 1: our compress_frame -> file -> `lz4 -d` -> byte compare
  Group 2: `lz4` CLI compress -> our decompress_frame -> byte compare
  Group 3: HC levels 2-12 through Group 1's pipeline

The CLI is not present in this offline image, so these tests skip
(the reference treats CLI-missing as skip in src/test_lz4f.zig:350-363);
they run wherever an `lz4` binary exists.  In-image interchange is
covered instead by three independent implementations (Python oracle,
C++ native, JAX vectorized) cross-decoding each other's output.
"""

import shutil
import subprocess
import tempfile
import os

import pytest

import zig_lz4_tpu.frame as lz4f

LZ4_CLI = shutil.which("lz4")

#: the CLI groups skip without an `lz4` binary; the GOLDEN-FIXTURE
#: group below always runs (the in-image wire-compat oracle)
needs_cli = pytest.mark.skipif(LZ4_CLI is None,
                               reason="lz4 CLI not installed")


def _fixture_corpus():
    """reference: src/test_compat.zig:25-57 (TestData.init)."""
    import random
    rng = random.Random(12345)
    lorem = (b"Lorem ipsum dolor sit amet, consectetur adipiscing elit, "
             b"sed do eiusmod tempor incididunt ut labore et dolore magna "
             b"aliqua. ") * 20
    return {
        "hello": b"Hello World!",
        "repeated": b"ABCDEFGH" * 125,
        "lorem": lorem,
        "random": bytes(rng.randrange(256) for _ in range(256)),
        "empty": b"",
        "ramp": bytes(i & 0xFF for i in range(100_000)),
    }


def _cli_decompress(comp: bytes) -> bytes:
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "in.lz4")
        dst = os.path.join(d, "out.bin")
        with open(src, "wb") as f:
            f.write(comp)
        subprocess.run([LZ4_CLI, "-d", "-f", src, dst], check=True,
                       capture_output=True)
        with open(dst, "rb") as f:
            return f.read()


def _cli_compress(data: bytes, level: int = 1) -> bytes:
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "in.bin")
        dst = os.path.join(d, "out.lz4")
        with open(src, "wb") as f:
            f.write(data)
        subprocess.run([LZ4_CLI, f"-{level}", "-f", src, dst], check=True,
                       capture_output=True)
        with open(dst, "rb") as f:
            return f.read()


@needs_cli
@pytest.mark.parametrize("name", ["hello", "repeated", "lorem", "random",
                                  "empty", "ramp"])
def test_ours_to_cli(name):
    """Group 1 (reference: src/test_compat.zig:141-201)."""
    data = _fixture_corpus()[name]
    comp = lz4f.compress_frame(data, lz4f.Preferences(
        frame_info=lz4f.FrameInfo(content_checksum=True)))
    assert _cli_decompress(comp) == data


@needs_cli
@pytest.mark.parametrize("name", ["hello", "repeated", "lorem", "random",
                                  "empty", "ramp"])
@pytest.mark.parametrize("level", [1, 9])
def test_cli_to_ours(name, level):
    """Group 2 (reference: src/test_compat.zig:203-254)."""
    data = _fixture_corpus()[name]
    comp = _cli_compress(data, level)
    assert lz4f.decompress_frame(comp) == data


@needs_cli
@pytest.mark.parametrize("level", list(range(2, 13)))
def test_hc_levels_to_cli(level):
    """Group 3 (reference: src/test_compat.zig:109-124)."""
    data = _fixture_corpus()["lorem"]
    comp = lz4f.compress_frame(data, lz4f.Preferences(
        compression_level=level))
    assert _cli_decompress(comp) == data


@needs_cli
def test_sharded_frames_to_cli():
    """Device-compressed frames must decode with the upstream CLI."""
    from zig_lz4_tpu.parallel import ShardedFrameCodec, blocks_mesh
    data = _fixture_corpus()["ramp"]
    codec = ShardedFrameCodec(mesh=blocks_mesh())
    comp = codec.compress_frame(data)
    assert _cli_decompress(comp) == data


# ---------------------------------------------------------------------
# Golden-fixture group: executable wire compatibility IN-IMAGE.
#
# tests/fixtures/*.lz4 are hand-built byte-by-byte from the public LZ4
# frame/block specification documents by tests/fixtures/make_goldens.py
# (which imports NOTHING from this package and anchors its xxh32 to
# the published xxHash test vectors).  Decoding them exactly -- and
# having the generator's independent from-spec decoder accept OUR
# compressed frames -- is the in-image stand-in for the reference's
# `lz4` CLI interchange suite (src/test_compat.zig:66-254).
# ---------------------------------------------------------------------

import sys as _sys

_FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")
_sys.path.insert(0, _FIXDIR)
import make_goldens  # noqa: E402  (the independent spec oracle)

_GOLDENS = make_goldens.build()


@pytest.mark.parametrize("name", sorted(_GOLDENS))
def test_golden_fixture_bytes_stable(name):
    """The checked-in binary equals the spec-derived construction."""
    with open(os.path.join(_FIXDIR, name), "rb") as f:
        assert f.read() == _GOLDENS[name][0]


@pytest.mark.parametrize("name", sorted(n for n in _GOLDENS
                                        if n != "dict_frame.lz4"))
def test_goldens_decode_host(name):
    blob, content = _GOLDENS[name]
    assert lz4f.decompress_frame(blob) == content


def test_golden_dict_frame():
    dictionary = b"0123456789abcdefghijklmnopqrstuvwxyz" * 4
    blob, content = _GOLDENS["dict_frame.lz4"]
    info, _pos = lz4f.parse_frame_header(blob)
    assert info.dict_id == 0x1234
    assert lz4f.decompress_frame(blob, dictionary=dictionary) == content


@pytest.mark.parametrize("name", sorted(n for n in _GOLDENS
                                        if n not in ("dict_frame.lz4",
                                                     "linked_blocks.lz4")))
def test_goldens_decode_sharded(name):
    from zig_lz4_tpu.parallel import ShardedFrameCodec
    blob, content = _GOLDENS[name]
    assert ShardedFrameCodec().decompress_frame(blob) == content


def test_golden_linked_decodes_sharded_via_host_route():
    from zig_lz4_tpu.parallel import ShardedFrameCodec
    blob, content = _GOLDENS["linked_blocks.lz4"]
    assert ShardedFrameCodec().decompress_frame(blob) == content


@pytest.mark.parametrize("level", [0, 1, 9, 12])
def test_our_frames_parse_with_spec_decoder(level):
    """Our encoder output decodes with the generator's independent
    from-spec decoder (both directions of interchange in-image)."""
    data = _fixture_corpus()["lorem"] + _fixture_corpus()["ramp"][:30000]
    comp = lz4f.compress_frame(data, lz4f.Preferences(
        frame_info=lz4f.FrameInfo(content_checksum=True),
        compression_level=level))
    # minimal from-spec frame walk using only make_goldens helpers
    import struct
    assert struct.unpack_from("<I", comp, 0)[0] == 0x184D2204
    flg, bd = comp[4], comp[5]
    assert flg >> 6 == 1
    pos = 6
    if flg & 8:
        pos += 8
    if flg & 1:
        pos += 4
    hc = comp[pos]
    assert hc == (make_goldens.xxh32(comp[4:pos]) >> 8) & 0xFF
    pos += 1
    out = bytearray()
    while True:
        word = struct.unpack_from("<I", comp, pos)[0]
        pos += 4
        if word == 0:
            break
        size = word & 0x7FFFFFFF
        payload = comp[pos:pos + size]
        pos += size
        if word & 0x80000000:
            out += payload
        else:
            out += make_goldens.decode_block(bytes(payload), bytes(out))
        if flg & 16:
            assert struct.unpack_from("<I", comp, pos)[0] == \
                make_goldens.xxh32(bytes(payload))
            pos += 4
    assert bytes(out) == data
    if flg & 4:
        assert struct.unpack_from("<I", comp, pos)[0] == \
            make_goldens.xxh32(data)


def test_device_frames_parse_with_spec_decoder():
    from zig_lz4_tpu.parallel import ShardedFrameCodec
    data = _fixture_corpus()["ramp"]
    comp = ShardedFrameCodec(content_checksum=True).compress_frame(data)
    import struct
    flg = comp[4]
    # header length from FLG per the frame spec: magic+FLG+BD+HC plus
    # optional u64 content size (bit 3) and u32 dict id (bit 0)
    pos = 7 + (8 if flg & 0x08 else 0) + (4 if flg & 0x01 else 0)
    if flg & 0x08:
        assert struct.unpack_from("<Q", comp, 6)[0] == len(data)
    out = bytearray()
    while True:
        word = struct.unpack_from("<I", comp, pos)[0]
        pos += 4
        if word == 0:
            break
        size = word & 0x7FFFFFFF
        payload = comp[pos:pos + size]
        pos += size
        if word & 0x80000000:
            out += payload
        else:
            out += make_goldens.decode_block(bytes(payload), bytes(out))
    assert bytes(out) == data
    assert struct.unpack_from("<I", comp, pos)[0] == \
        make_goldens.xxh32(data)


# ---------------------------------------------------------------------
# Corruption-negative goldens: checked-in corrupt frames that every
# decoder must REJECT with the frame error taxonomy (the negative side
# of the interchange oracle; reference pattern src/test_lz4f.zig:168-179)
# ---------------------------------------------------------------------

_NEGATIVES = make_goldens.build_negatives()


@pytest.mark.parametrize("name", sorted(_NEGATIVES))
def test_negative_fixture_bytes_stable(name):
    with open(os.path.join(_FIXDIR, name), "rb") as f:
        assert f.read() == _NEGATIVES[name][0]


@pytest.mark.parametrize("name", sorted(_NEGATIVES))
def test_negative_goldens_rejected_host(name):
    from zig_lz4_tpu import errors as E
    blob, why = _NEGATIVES[name]
    with pytest.raises(E.FrameError):
        lz4f.decompress_frame(blob)


@pytest.mark.parametrize("name", sorted(_NEGATIVES))
def test_negative_goldens_rejected_device(name):
    from zig_lz4_tpu import errors as E
    from zig_lz4_tpu.parallel import ShardedFrameCodec
    blob, why = _NEGATIVES[name]
    with pytest.raises(E.FrameError):
        ShardedFrameCodec().decompress_frame(blob)


def test_golden_linked_decodes_via_device_engine():
    """The linked golden through the DEVICE linked decoder (sequential
    64KB-history fragment decode), not the host fallback."""
    from zig_lz4_tpu.parallel import ShardedFrameCodec
    blob, content = _GOLDENS["linked_blocks.lz4"]
    codec = ShardedFrameCodec()
    info, pos = lz4f.parse_frame_header(blob)
    res = codec._decompress_linked_device(blob, info, pos)
    assert res is not None, "device linked path unexpectedly unsupported"
    assert res == content
