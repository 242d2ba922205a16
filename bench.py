#!/usr/bin/env python
"""Benchmark: encode+decode throughput per chip on a silesia-like corpus.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}

value        -- device encode+decode GB/s on one chip: total bytes
                processed (corpus in + corpus out) / wall time, over
                64KB independent frame blocks (the BASELINE.json
                headline configuration).
vs_baseline  -- ratio vs the single-thread C++ native host codec
                measured in the same run (the reference is a
                single-threaded CPU implementation with no published
                numbers -- BASELINE.md -- so our own native runtime,
                which implements the identical canonical algorithm,
                stands in as the reference-class CPU baseline).

Timing note: on this platform jax.block_until_ready can return before
device execution completes (remote-tunneled PJRT), so every timed
region ends with a host transfer (np.asarray) of the results, which
is also what a real pipeline needs.

Supplementary numbers (ratio, per-direction throughput, parse cost)
go to stderr.

No silesia.tar exists in this offline image; the corpus is a
deterministic synthetic mix modeled on silesia's composition (English
text, html/xml, source code, binary records, random, RLE).
"""

import json
import os
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
        is_available, native_compress_blocks, native_decompress_blocks,
        native_parse_blocks)

    BLK = 65536
    BATCH = int(os.environ.get("BENCH_BATCH", "64"))
    MB = int(os.environ.get("BENCH_MB", "48"))
    corpus = make_corpus(MB)
    n = len(corpus) - (len(corpus) % (BLK * BATCH))
    corpus = corpus[:n]
    nblocks = n // BLK
    print(f"[bench] corpus {n / 1e6:.1f} MB, {nblocks} blocks of 64KB, "
          f"batch {BATCH}, devices: {jax.devices()}", file=sys.stderr)

    blocks = np.frombuffer(corpus, np.uint8).reshape(nblocks, BLK)
    lens = np.full(nblocks, BLK, np.int32)
    starts = np.zeros(nblocks, np.int32)
    ccap = compress_bound(BLK)

    enc = _batched_encoder(BLK)

    # --- encode: warmup (compile) then timed pass ---
    b0 = blocks[:BATCH]
    out, olen = enc(b0, lens[:BATCH], starts[:BATCH])
    np.asarray(olen)

    t0 = time.perf_counter()
    comp_np = np.zeros((nblocks, ccap), np.uint8)
    clen_np = np.zeros(nblocks, np.int64)
    for i in range(0, nblocks, BATCH):
        out, olen = enc(blocks[i:i + BATCH], lens[i:i + BATCH],
                        starts[i:i + BATCH])
        comp_np[i:i + BATCH] = np.asarray(out)
        clen_np[i:i + BATCH] = np.asarray(olen)
    t_enc = time.perf_counter() - t0
    enc_gbs = n / t_enc / 1e9

    comp_total = int(clen_np.sum())
    ratio = n / comp_total
    print(f"[bench] device encode: {enc_gbs:.3f} GB/s  ratio {ratio:.3f} "
          f"({comp_total / 1e6:.1f} MB)", file=sys.stderr)

    # --- decode: batched host parse (native) + device reconstruction ---
    nseq_cap = MAX_SEQS(BLK)
    dec = _batched_decoder(BLK, nseq_cap)

    payloads = bytearray()
    offs = np.zeros(nblocks, np.int64)
    pos = 0
    for bi in range(nblocks):
        offs[bi] = pos
        payloads += comp_np[bi, :clen_np[bi]].tobytes()
        pos += int(clen_np[bi])
    payloads = bytes(payloads)

    t0 = time.perf_counter()
    lit, lsrc, mls, offsq, nss = native_parse_blocks(
        payloads, offs, clen_np, nseq_cap)
    t_parse = time.perf_counter() - t0
    print(f"[bench] host parse (batched native): {t_parse:.3f}s "
          f"({comp_total / t_parse / 1e9:.3f} GB/s of compressed)",
          file=sys.stderr)

    hists = np.zeros((BATCH, 1), np.uint8)
    outd, outl = dec(comp_np[:BATCH], hists, lit[:BATCH], lsrc[:BATCH],
                     mls[:BATCH], offsq[:BATCH], nss[:BATCH])
    np.asarray(outl)

    t0 = time.perf_counter()
    ok_lens = 0
    sample = {}
    for i in range(0, nblocks, BATCH):
        outd, outl = dec(comp_np[i:i + BATCH], hists,
                         lit[i:i + BATCH], lsrc[i:i + BATCH],
                         mls[i:i + BATCH], offsq[i:i + BATCH],
                         nss[i:i + BATCH])
        arr = np.asarray(outd)
        ok_lens += int((np.asarray(outl) == BLK).sum())
        if i == 0 or i == (nblocks // BATCH // 2) * BATCH:
            sample[i] = arr.copy()
    t_dec = time.perf_counter() - t0
    dec_gbs = n / t_dec / 1e9
    print(f"[bench] device decode: {dec_gbs:.3f} GB/s "
          f"(lens ok {ok_lens}/{nblocks}, incl. parse "
          f"{n / (t_dec + t_parse) / 1e9:.3f})", file=sys.stderr)

    for i, arr in sample.items():
        for k in (0, BATCH - 1):
            assert arr[k].tobytes() == corpus[(i + k) * BLK:
                                              (i + k + 1) * BLK], \
                f"decode mismatch at block {i + k}"

    combined = 2 * n / (t_enc + t_dec + t_parse) / 1e9

    # --- native single-thread CPU baseline (reference-class) ---
    vs = 1.0
    if is_available():
        nb = min(nblocks, 256)
        t0 = time.perf_counter()
        dstn, outln = native_compress_blocks(blocks[:nb],
                                             lens[:nb].astype(np.int64))
        t_ne = time.perf_counter() - t0
        noffs = np.zeros(nb, np.int64)
        noffs[1:] = np.cumsum(outln)[:-1]
        payl = b"".join(dstn[i, :outln[i]].tobytes() for i in range(nb))
        t0 = time.perf_counter()
        native_decompress_blocks(payl, noffs, outln, BLK)
        t_nd = time.perf_counter() - t0
        nat = 2 * nb * BLK / (t_ne + t_nd) / 1e9
        print(f"[bench] native 1-thread: enc {nb*BLK/t_ne/1e9:.3f} "
              f"dec {nb*BLK/t_nd/1e9:.3f} comb {nat:.3f} GB/s",
              file=sys.stderr)
        vs = combined / nat

    print(json.dumps({
        "metric": "encode+decode GB/s/chip, 64KB independent blocks, "
                  "silesia-like synthetic corpus",
        "value": round(combined, 4),
        "unit": "GB/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
