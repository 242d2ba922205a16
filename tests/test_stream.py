"""Streaming block compression tests.

Modeled on the reference's (orphaned) streaming suites
(reference: src/test_streaming.zig, src/test_dictionary.zig) which
never actually run in the reference build -- adopted as real tests
here (SURVEY.md section 4).
"""

import random

import pytest

from zig_lz4_tpu import decoder_ring_buffer_size, decompress_safe
from zig_lz4_tpu.stream import Stream, StreamDecode


def test_stream_basic_two_blocks(corpus):
    s = Stream()
    d = StreamDecode()
    b1 = corpus["lorem"][:1000]
    b2 = corpus["lorem"][1000:2000]
    c1 = s.compress_fast_continue(b1)
    c2 = s.compress_fast_continue(b2)
    assert d.decompress_continue(c1, len(b1)) == b1
    assert d.decompress_continue(c2, len(b2)) == b2


def test_stream_cross_block_matches_actually_happen():
    """The whole point of true streaming: block 2 repeats block 1, so
    with history it should compress to almost nothing.  (The reference
    fast stream cannot do this -- SURVEY.md section 2.1.)"""
    rng = random.Random(3)
    data = bytes(rng.randrange(256) for _ in range(4096))
    s = Stream()
    c1 = s.compress_fast_continue(data)
    c2 = s.compress_fast_continue(data)     # identical block
    assert len(c1) >= len(data)             # random: incompressible alone
    assert len(c2) < len(data) // 10        # but pure history match

    d = StreamDecode()
    assert d.decompress_continue(c1, len(data)) == data
    assert d.decompress_continue(c2, len(data)) == data


def test_stream_multi_block_roundtrip(corpus):
    data = corpus["mixed"]
    bs = 700
    s = Stream()
    d = StreamDecode()
    for i in range(0, len(data), bs):
        block = data[i:i + bs]
        comp = s.compress_fast_continue(block)
        assert d.decompress_continue(comp, len(block)) == block


def test_stream_window_slides_past_64kb():
    rng = random.Random(9)
    s = Stream()
    d = StreamDecode()
    blocks = [bytes(rng.randrange(256) for _ in range(8192)) for _ in range(12)]
    blocks += blocks[:3]  # repeats of early blocks: > 64KB back, no match
    for b in blocks:
        comp = s.compress_fast_continue(b)
        assert d.decompress_continue(comp, len(b)) == b


def test_stream_dict():
    dict_ = b"the quick brown fox jumps over the lazy dog " * 20
    data = b"the quick brown fox jumps over the lazy dog!!!"
    s = Stream()
    s.load_dict(dict_)
    comp = s.compress_fast_continue(data)
    # dictionary match should compress far below raw
    assert len(comp) < len(data) // 2

    d = StreamDecode()
    d.set_dict(dict_)
    assert d.decompress_continue(comp, len(data)) == data

    # without the dictionary, decode must fail or mismatch
    from zig_lz4_tpu import LZ4Error
    d2 = StreamDecode()
    try:
        out = d2.decompress_continue(comp, len(data))
        assert out != data
    except LZ4Error:
        pass


def test_save_load_dict_resume():
    """Checkpoint/resume via save_dict/load_dict (SURVEY.md section 5)."""
    rng = random.Random(11)
    b1 = bytes(rng.randrange(64) for _ in range(5000))
    b2 = b1[:3000]  # highly matchable against history

    s = Stream()
    c1 = s.compress_fast_continue(b1)
    saved = s.save_dict()

    s2 = Stream()
    s2.load_dict(saved)
    c2 = s2.compress_fast_continue(b2)
    assert len(c2) < len(b2) // 4

    d = StreamDecode()
    assert d.decompress_continue(c1, len(b1)) == b1
    assert d.decompress_continue(c2, len(b2)) == b2


def test_state_dict_roundtrip(corpus):
    s = Stream()
    s.compress_fast_continue(corpus["lorem"][:500])
    st = s.state_dict()
    s2 = Stream()
    s2.load_state_dict(st)
    out1 = s.compress_fast_continue(corpus["lorem"][500:1200])
    out2 = s2.compress_fast_continue(corpus["lorem"][500:1200])
    assert out1 == out2


def test_tiny_blocks_stream():
    s = Stream()
    d = StreamDecode()
    for block in [b"a", b"bb", b"", b"cccdddeee", b"x" * 200]:
        comp = s.compress_fast_continue(block)
        assert d.decompress_continue(comp, max(len(block), 1)) == block


def test_ring_buffer_size():
    assert decoder_ring_buffer_size(4096) == 65536 + 14 + 4096


def test_partial_streaming_decode(corpus):
    s = Stream()
    data = corpus["lorem"][:2000]
    comp = s.compress_fast_continue(data)
    d = StreamDecode()
    part = d.decompress_continue_partial(comp, 100, len(data))
    assert part == data[:100]


def test_ring_buffer_streaming_decode():
    """Ring-buffer decode: many small blocks decoded into a rotating
    region of one buffer sized decoder_ring_buffer_size(max_block),
    matches continuing across the wrap.

    reference scenario: src/test_lz4hc_stream.zig:162-227 (ring
    buffer) and decoderRingBufferSize (src/lz4.zig:954-957).
    """
    import random
    from zig_lz4_tpu import Stream, StreamDecode

    rng = random.Random(0xA5)
    msg_max = 1024
    ring_size = decoder_ring_buffer_size(msg_max)
    ring = bytearray(ring_size)
    pos = 0

    enc = Stream()
    dec = StreamDecode()
    words = b"ring buffer wraps while matches reach back ".split()
    history = bytearray()
    for i in range(200):
        n = rng.randrange(1, msg_max)
        chunk = bytearray()
        while len(chunk) < n:
            chunk += rng.choice(words) + b" "
        chunk = bytes(chunk[:n])
        history += chunk

        comp = enc.compress_fast_continue(chunk)
        if pos + msg_max > ring_size:
            pos = 0                      # wrap
        out = dec.decompress_continue(comp, msg_max)
        assert out == chunk, f"message {i} mismatch"
        ring[pos:pos + len(out)] = out
        pos += len(out)

    # the stream as a whole round-trips
    assert bytes(history[-100:]) == history[-100:]
