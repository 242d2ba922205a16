"""xxHash32 correctness vs published test vectors and streaming parity.

The reference relies on Zig's std XxHash32 (reference:
src/lz4f.zig:139,375,424,560); we validate our from-scratch
implementation against the xxHash reference vectors.
"""

import pytest

from zig_lz4_tpu.utils.xxhash32 import XXH32, xxh32_python

PRIME_SEED = 2654435761

# Known-good (data, seed, expected) vectors from public sources:
# the xxHash spec ("" -> 0x02CC5D05), the python-xxhash documentation
# ("Nobody inspects the spammish repetition" -> 0xE2293B2F), and other
# widely published digests.
VECTORS = [
    (b"", 0, 0x02CC5D05),
    (b"", PRIME_SEED, 0x36B78AE7),
    (b"a", 0, 0x550D7456),
    (b"abc", 0, 0x32D153FF),
    (b"Nobody inspects the spammish repetition", 0, 0xE2293B2F),
]


@pytest.mark.parametrize("data,seed,expected", VECTORS)
def test_vectors(data, seed, expected):
    assert xxh32_python(data, seed) == expected


@pytest.mark.parametrize("chunking", [1, 3, 7, 16, 64, 1000])
def test_streaming_matches_oneshot(chunking):
    import random
    data = bytes(random.Random(7).randrange(256) for _ in range(2222))
    h = XXH32(seed=12345)
    for i in range(0, len(data), chunking):
        h.update(data[i:i + chunking])
    assert h.digest() == xxh32_python(data, 12345)


def test_streaming_reset():
    h = XXH32()
    h.update(b"garbage")
    h.reset()
    h.update(b"abc")
    assert h.digest() == xxh32_python(b"abc")


def test_digest_idempotent():
    h = XXH32()
    h.update(b"hello world, this is a test of xxhash32 streaming")
    d1 = h.digest()
    d2 = h.digest()
    assert d1 == d2
