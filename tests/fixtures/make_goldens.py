"""Golden .lz4 fixture generator -- hand-built from the LZ4 specs.

PROVENANCE: these frames are constructed directly from the public
LZ4 specification documents -- the Frame Format spec v1.6.x and the
Block Format spec (github.com/lz4/lz4/blob/dev/doc/) -- NOT from any
code in zig_lz4_tpu or /root/reference.  This file deliberately
imports nothing from the package: it is the in-image stand-in for the
reference `lz4` CLI oracle (absent in this offline image), giving
`tests/test_compat.py` an executable wire-compatibility check.  The
xxHash32 implementation below is anchored to the PUBLISHED xxHash
test vectors (asserted at import), so the checksum bytes do not
depend on the package's own xxh32.

Run: python tests/fixtures/make_goldens.py   (rewrites *.lz4 here)

Frame layout (Frame spec):
  magic 0x184D2204 (LE) | FLG | BD | [content size u64] |
  [dict id u32] | HC | blocks | endmark 0x00000000 | [content xxh32]
  FLG: bits 7-6 version=01, 5 block-independence, 4 block-checksum,
       3 content-size, 2 content-checksum, 0 dict-id.
  BD:  bits 6-4 block-max-size code (4=64KB 5=256KB 6=1MB 7=4MB).
  HC = (xxh32(FLG..dictID, seed 0) >> 8) & 0xFF.
Block: u32 LE size word (high bit = uncompressed) | payload |
  [block xxh32].
Block payload (Block spec): sequences of
  token(lit<<4 | (ml-4)) | lit-escape 255* + rem | literals |
  offset u16 LE | ml-escape 255* + rem;  last sequence literals-only.
"""

import os
import struct

HERE = os.path.dirname(os.path.abspath(__file__))


# --- xxHash32, from the published spec; anchored to public vectors --
def xxh32(data: bytes, seed: int = 0) -> int:
    P1, P2, P3, P4, P5 = (2654435761, 2246822519, 3266489917,
                          668265263, 374761393)
    M = 0xFFFFFFFF

    def rotl(x, r):
        return ((x << r) | (x >> (32 - r))) & M

    i, n = 0, len(data)
    if n >= 16:
        a1, a2, a3, a4 = ((seed + P1 + P2) & M, (seed + P2) & M,
                          seed & M, (seed - P1) & M)
        while i + 16 <= n:
            for k, a in enumerate((a1, a2, a3, a4)):
                lane = struct.unpack_from("<I", data, i + 4 * k)[0]
                a = rotl((a + lane * P2) & M, 13) * P1 & M
                if k == 0:
                    a1 = a
                elif k == 1:
                    a2 = a
                elif k == 2:
                    a3 = a
                else:
                    a4 = a
            i += 16
        h = (rotl(a1, 1) + rotl(a2, 7) + rotl(a3, 12) + rotl(a4, 18)) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 4 <= n:
        h = rotl((h + struct.unpack_from("<I", data, i)[0] * P3) & M,
                 17) * P4 & M
        i += 4
    while i < n:
        h = rotl((h + data[i] * P5) & M, 11) * P1 & M
        i += 1
    h ^= h >> 15
    h = h * P2 & M
    h ^= h >> 13
    h = h * P3 & M
    h ^= h >> 16
    return h


# published vectors: xxHash repository README / test suite
assert xxh32(b"") == 0x02CC5D05
assert xxh32(b"Nobody inspects the spammish repetition") == 0xE2293B2F


# --- block payload assembly from explicit sequence lists ------------
def seq(lit: bytes, off: int = 0, ml: int = 0) -> bytes:
    """One sequence: literals then optional (offset, matchlen>=4)."""
    out = bytearray()
    ln = len(lit)
    lt = 15 if ln >= 15 else ln
    mt = 0
    if ml:
        assert ml >= 4 and 1 <= off <= 65535
        mt = 15 if ml - 4 >= 15 else ml - 4
    out.append((lt << 4) | mt)
    if lt == 15:
        v = ln - 15
        while v >= 255:
            out.append(255)
            v -= 255
        out.append(v)
    out += lit
    if ml:
        out += struct.pack("<H", off)
        if mt == 15:
            v = ml - 19
            while v >= 255:
                out.append(255)
                v -= 255
            out.append(v)
    return bytes(out)


def decode_block(payload: bytes, history: bytes = b"") -> bytes:
    """Independent from-spec block decoder (the test's second oracle)."""
    out = bytearray(history)
    base = len(history)
    ip, n = 0, len(payload)
    while ip < n:
        token = payload[ip]
        ip += 1
        lit = token >> 4
        if lit == 15:
            while True:
                x = payload[ip]
                ip += 1
                lit += x
                if x != 255:
                    break
        out += payload[ip:ip + lit]
        ip += lit
        if ip >= n:
            break
        off = struct.unpack_from("<H", payload, ip)[0]
        ip += 2
        ml = token & 15
        if ml == 15:
            while True:
                x = payload[ip]
                ip += 1
                ml += x
                if x != 255:
                    break
        ml += 4
        assert 0 < off <= len(out), "bad offset"
        for _ in range(ml):           # byte-wise: overlap-safe
            out.append(out[-off])
    return bytes(out[base:])


# --- frame assembly -------------------------------------------------
def frame(blocks, *, indep=True, bsize=4, block_cs=False,
          content_cs=True, content_size=None, dict_id=None,
          content=b"") -> bytes:
    flg = (1 << 6) | (indep << 5) | (block_cs << 4) \
        | ((content_size is not None) << 3) | (content_cs << 2) \
        | ((dict_id is not None) << 0)
    bd = bsize << 4
    desc = bytearray([flg, bd])
    if content_size is not None:
        desc += struct.pack("<Q", content_size)
    if dict_id is not None:
        desc += struct.pack("<I", dict_id)
    hc = (xxh32(bytes(desc)) >> 8) & 0xFF
    out = bytearray(struct.pack("<I", 0x184D2204))
    out += desc
    out.append(hc)
    for payload, uncompressed in blocks:
        word = len(payload) | (0x80000000 if uncompressed else 0)
        out += struct.pack("<I", word)
        out += payload
        if block_cs:
            out += struct.pack("<I", xxh32(payload))
    out += struct.pack("<I", 0)
    if content_cs:
        out += struct.pack("<I", xxh32(content))
    return bytes(out)


def skippable(data: bytes, nibble: int = 0) -> bytes:
    return struct.pack("<II", 0x184D2A50 + nibble, len(data)) + data


# --- fixture definitions --------------------------------------------
def rng_bytes(n, seed=0x5EED):
    """Deterministic pseudo-random bytes (xorshift32, from-spec)."""
    out = bytearray()
    x = seed
    while len(out) < n:
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        out += struct.pack("<I", x)
    return bytes(out[:n])


def build():
    fixtures = {}

    # 1. literal-only "Hello World!" with content checksum
    content = b"Hello World!"
    fixtures["hello_literals.lz4"] = (
        frame([(seq(content), False)], content=content), content)

    # 2. matches + periodic overlap: "ABCDEFGH" * 125
    content = b"ABCDEFGH" * 125
    payload = seq(b"ABCDEFGH", off=8, ml=987) + seq(b"DEFGH")
    #         8 literals, then 987 bytes copied at distance 8 (the
    #         match may self-overlap per the block spec), 5 tail lits
    assert decode_block(payload) == content
    fixtures["periodic_match.lz4"] = (
        frame([(payload, False)], content=content), content)

    # 3. escape chains: >=15-literal run and >=19-byte match with
    #    255-continuations on both sides
    lits = rng_bytes(700, 1)
    content = lits + b"Z" * 600 + lits[:333]
    payload = (seq(lits + b"Z", off=1, ml=599)
               + seq(b"", off=len(lits) + 600, ml=328)
               + seq(lits[328:333]))
    assert decode_block(payload) == content
    fixtures["escape_chains.lz4"] = (
        frame([(payload, False)], content=content), content)

    # 4. RLE via offset-1 self-overlap
    content = b"\x00" * 70000           # spans two 64KB blocks
    b1 = seq(b"\x00", off=1, ml=65530) + seq(b"\x00" * 5)
    b2 = seq(b"\x00", off=1, ml=70000 - 65536 - 6) + seq(b"\x00" * 5)
    assert decode_block(b1) + decode_block(b2) == content
    fixtures["rle_two_blocks.lz4"] = (
        frame([(b1, False), (b2, False)], content=content,
              content_size=len(content), block_cs=True), content)

    # 5. TRUE linked-block frame: block 2's first match reaches into
    #    block 1 (allowed only with the independence bit CLEAR)
    blk1 = b"linked-mode history 0123456789abcdef" * 1820   # 65520 B
    blk1 = blk1[:65536 - 16] + b"TAIL-MARKER-BYTE"          # 65536
    blk2 = b"TAIL-MARKER-BYTE" + b"fresh data after the boundary"
    content = blk1 + blk2
    p1 = seq(blk1[:36], off=36, ml=65520 - 36) + seq(blk1[-16:])
    assert decode_block(p1) == blk1
    p2 = seq(b"", off=16, ml=16) + seq(b"fresh data after the boundary")
    assert decode_block(p2, history=blk1) == blk2
    fixtures["linked_blocks.lz4"] = (
        frame([(p1, False), (p2, False)], indep=False,
              content=content), content)

    # 6. store-uncompressed block (high bit) + compressed neighbor
    raw = rng_bytes(1000, 7)
    content = raw + b"abcd" * 300
    p6 = seq(b"abcd", off=4, ml=1188) + seq(b"abcdabcd")
    assert decode_block(p6) == b"abcd" * 300
    fixtures["stored_block.lz4"] = (
        frame([(raw, True), (p6, False)],
              content=content, content_size=len(content)), content)

    # 7. skippable frame prepended to a normal frame
    content = b"after the skippable frame"
    fixtures["skippable_prefix.lz4"] = (
        skippable(b"user metadata, decoder must skip this", 5)
        + frame([(seq(content), False)], content=content), content)

    # 8. dictionary frame: dictID set, first match reaches into the
    #    dictionary (preset-dictionary semantics, Frame spec)
    dictionary = b"0123456789abcdefghijklmnopqrstuvwxyz" * 4
    content = b"abcdefghijklmnop-and-new-data"
    payload = seq(b"", off=len(dictionary) - 26 + 16, ml=16) \
        + seq(b"-and-new-data")
    assert decode_block(payload, history=dictionary) == content
    fixtures["dict_frame.lz4"] = (
        frame([(payload, False)], dict_id=0x1234, content=content),
        content)

    # 9. 256KB-block frame: one block bigger than 64KB (only legal
    #    with BD code 5), exercising large-block routing end-to-end
    unit = b"0123456789ABCDEF"
    content = unit * (150 * 1024 // 16)            # 150 KB, one block
    payload = seq(unit, off=16, ml=len(content) - 16 - 5) \
        + seq(content[-5:])
    assert decode_block(payload) == content
    fixtures["block256k.lz4"] = (
        frame([(payload, False)], bsize=5, content=content,
              content_size=len(content)), content)

    # 10. 1MB-block frame: a 300KB RLE block + a short second block
    c1 = b"\x07" * 300_000
    p1 = seq(b"\x07", off=1, ml=300_000 - 6) + seq(b"\x07" * 5)
    assert decode_block(p1) == c1
    c2 = b"tail block after the megablock"
    content = c1 + c2
    fixtures["block1m.lz4"] = (
        frame([(p1, False), (seq(c2), False)], bsize=6,
              content=content), content)

    # 11. block checksums over BOTH a stored (high-bit) and a
    #     compressed payload in one frame + content checksum + size
    raw = rng_bytes(900, 11)
    cpat = b"xyzw" * 250
    p11 = seq(b"xyzw", off=4, ml=988) + seq(b"xyzwxyzw")
    assert decode_block(p11) == cpat
    content = raw + cpat
    fixtures["stored_and_checksummed.lz4"] = (
        frame([(raw, True), (p11, False)], block_cs=True,
              content=content, content_size=len(content)), content)

    # 12. 4MB-block frame (BD code 7): ~2.5MB of content in ONE block
    #     built from a periodic match, so every 4MB-capable decoder
    #     path (incl. big-block routing) is exercised while the
    #     fixture stays bytes-small on disk
    unit = b"4MB-BLOCK golden unit \xaa\x55"              # 24 bytes
    content = unit * (2_500_000 // len(unit))
    p12 = seq(unit, off=len(unit), ml=len(content) - len(unit) - 5) \
        + seq(content[-5:])
    assert decode_block(p12) == content
    fixtures["block4m.lz4"] = (
        frame([(p12, False)], bsize=7, content=content,
              content_size=len(content)), content)

    # 13. concatenated frames in one file (the lz4 CLI both emits and
    #     decodes these): frame + skippable + frame
    c1 = b"first frame payload " * 40
    c2 = rng_bytes(512, 13)
    fixtures["concat_frames.lz4"] = (
        frame([(seq(c1), False)], content=c1)
        + skippable(b"inter-frame metadata", 3)
        + frame([(c2, True)], content=c2, content_size=len(c2)),
        c1 + c2)

    return fixtures


def build_negatives():
    """Corruption-NEGATIVE fixtures: {name: (bytes, description)}.

    Each must be REJECTED (frame error taxonomy) by every decoder --
    the corruption-detection side of the interchange oracle
    (reference negative test pattern: src/test_lz4f.zig:168-179)."""
    neg = {}
    content = b"negative fixture content " * 40
    payload = seq(content)
    good = frame([(payload, False)], block_cs=True, content=content,
                 content_size=len(content))
    # header: 4 magic + FLG/BD 2 + content size 8 + hc 1 = 15 bytes;
    # then 4-byte block header + payload + 4-byte block checksum
    cs_at = 15 + 4 + len(payload)
    bad = bytearray(good)
    bad[cs_at] ^= 0x01
    neg["corrupt_block_checksum.lz4"] = (
        bytes(bad), "block xxh32 flipped")

    good2 = frame([(payload, False)], content_cs=False,
                  content=content, content_size=len(content))
    neg["truncated_endmark.lz4"] = (
        good2[:-2], "endmark cut to 2 bytes")
    return neg


if __name__ == "__main__":
    for name, (blob, _content) in build().items():
        with open(os.path.join(HERE, name), "wb") as f:
            f.write(blob)
        print(f"wrote {name} ({len(blob)} bytes)")
    for name, (blob, _why) in build_negatives().items():
        with open(os.path.join(HERE, name), "wb") as f:
            f.write(blob)
        print(f"wrote {name} ({len(blob)} bytes, NEGATIVE)")
