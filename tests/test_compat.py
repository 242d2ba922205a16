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

pytestmark = pytest.mark.skipif(LZ4_CLI is None,
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


@pytest.mark.parametrize("name", ["hello", "repeated", "lorem", "random",
                                  "empty", "ramp"])
def test_ours_to_cli(name):
    """Group 1 (reference: src/test_compat.zig:141-201)."""
    data = _fixture_corpus()[name]
    comp = lz4f.compress_frame(data, lz4f.Preferences(
        frame_info=lz4f.FrameInfo(content_checksum=True)))
    assert _cli_decompress(comp) == data


@pytest.mark.parametrize("name", ["hello", "repeated", "lorem", "random",
                                  "empty", "ramp"])
@pytest.mark.parametrize("level", [1, 9])
def test_cli_to_ours(name, level):
    """Group 2 (reference: src/test_compat.zig:203-254)."""
    data = _fixture_corpus()[name]
    comp = _cli_compress(data, level)
    assert lz4f.decompress_frame(comp) == data


@pytest.mark.parametrize("level", list(range(2, 13)))
def test_hc_levels_to_cli(level):
    """Group 3 (reference: src/test_compat.zig:109-124)."""
    data = _fixture_corpus()["lorem"]
    comp = lz4f.compress_frame(data, lz4f.Preferences(
        compression_level=level))
    assert _cli_decompress(comp) == data


def test_sharded_frames_to_cli():
    """Device-compressed frames must decode with the upstream CLI."""
    from zig_lz4_tpu.parallel import ShardedFrameCodec, blocks_mesh
    data = _fixture_corpus()["ramp"]
    codec = ShardedFrameCodec(mesh=blocks_mesh())
    comp = codec.compress_frame(data)
    assert _cli_decompress(comp) == data
