"""Scale-out serialization-point costs at bench scale (config-5 proxy).

A pod-scale deployment fans frame blocks over N chips; everything
that is NOT the per-chip encode/decode kernel is a shared host-side
serialization point.  This measures each one at bench scale on the
host (they are host phases -- identical machinery on a pod host):

  1. frame ASSEMBLY: ordered payload walk + block framing words +
     per-block xxh32 + streaming content xxh32 (the encode gather).
  2. frame SCAN: header parse + record walk + block xxh32 verify
     (the decode fan-out point).
  3. threaded fragment RESOLVE at 1..ncores threads (the decode
     serialization point the resolver threads amortize).
  4. content VERIFY: one xxh32 pass over the decoded corpus.

Real multi-chip is unavailable in this rig; per-chip rates come from
the chip bench (BENCH_r04), and the chips-per-host-core crossover
derived here feeds docs/SPEED_OF_LIGHT.md section 6.

Run: python experiments/scaleout_serialization.py [mb]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from bench import SPLIT_MAX, TIERS, make_corpus  # noqa: E402
from zig_lz4_tpu import frame as lz4f  # noqa: E402
from zig_lz4_tpu.constants import compress_bound  # noqa: E402
from zig_lz4_tpu.native import (native_compress_hc_blocks,  # noqa: E402
                                native_resolve_blocks, resolver_threads)
from zig_lz4_tpu.utils.xxhash32 import xxh32, xxh32_stream  # noqa: E402

BLK = 65536
MB = int(sys.argv[1]) if len(sys.argv) > 1 else 48
corpus = make_corpus(MB)
n = len(corpus) - len(corpus) % BLK
corpus = corpus[:n]
nb = n // BLK
blocks = np.frombuffer(corpus, np.uint8).reshape(nb, BLK)
print(f"{nb} x 64KB blocks ({n / 1e6:.0f} MB), "
      f"{resolver_threads()} host threads")

# HC9 payloads (bench-realistic stream shapes)
t0 = time.perf_counter()
dst, outl = native_compress_hc_blocks(blocks, np.full(nb, BLK, np.int64), 9)
print(f"native HC9 encode (payload prep): {n / (time.perf_counter() - t0) / 1e6:.0f} MB/s")

# --- 1. frame assembly ------------------------------------------------
info = lz4f.FrameInfo(block_size_id=lz4f.BlockSizeID.max64KB,
                      block_mode=lz4f.BlockMode.independent,
                      content_checksum=True, block_checksum=True,
                      content_size=n)
t_asm = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    parts = [lz4f.write_frame_header(info)]
    ch = xxh32_stream()
    ch.update(corpus)
    for bi in range(nb):
        stored = dst[bi, :outl[bi]].tobytes()
        parts.append(len(stored).to_bytes(4, "little"))
        parts.append(stored)
        parts.append(xxh32(stored).to_bytes(4, "little"))
    parts.append((0).to_bytes(4, "little"))
    parts.append(ch.digest().to_bytes(4, "little"))
    frame = b"".join(parts)
    t_asm = min(t_asm, time.perf_counter() - t0)
print(f"frame assembly (framing + blk/content xxh32): "
      f"{n / t_asm / 1e9:.3f} GB/s of raw ({t_asm:.3f}s)")

# --- 2. frame scan ----------------------------------------------------
t_scan = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    _info, pos = lz4f.parse_frame_header(frame)
    plist = []
    while True:
        word = int.from_bytes(frame[pos:pos + 4], "little")
        pos += 4
        if word == 0:
            break
        blen = word & 0x7FFFFFFF
        payload = frame[pos:pos + blen]
        pos += blen
        expect = int.from_bytes(frame[pos:pos + 4], "little")
        pos += 4
        assert xxh32(payload) == expect
        plist.append(payload)
    t_scan = min(t_scan, time.perf_counter() - t0)
print(f"frame scan (parse + block xxh32 verify): "
      f"{n / t_scan / 1e9:.3f} GB/s of raw ({t_scan:.3f}s)")

# --- 3. threaded resolve sweep ---------------------------------------
concat = b"".join(plist)
offs = np.zeros(nb, np.int64)
lens64 = np.array([len(p) for p in plist], np.int64)
offs[1:] = np.cumsum(lens64)[:-1]
fcap, rmax = TIERS[-1]          # the production resolve geometry
print(f"resolve config: fcap={fcap} round_limit={rmax} "
      f"split_max={SPLIT_MAX}")
for nt in (1, 2, 4, resolver_threads()):
    t_res = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        native_resolve_blocks(concat, offs, lens64, fcap, out_cap=BLK,
                              split_max=SPLIT_MAX, round_limit=rmax,
                              n_threads=nt)
        t_res = min(t_res, time.perf_counter() - t0)
    print(f"resolve x{nt:2d} threads: {n / t_res / 1e9:.3f} GB/s of "
          f"raw output ({t_res:.3f}s)")

# --- 4. content verify ------------------------------------------------
t_v = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    assert xxh32(corpus) == xxh32(corpus)  # two passes, halve below
    t_v = min(t_v, (time.perf_counter() - t0) / 2)
print(f"content xxh32: {n / t_v / 1e9:.3f} GB/s")
