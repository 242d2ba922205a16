"""Why does device L12 emit ~25% more sequences than native HC9 on
'code' content (hc_ratio_gap.py: 1.215x output, literal/match-byte
parity)?

For every adjacent sequence pair in the device stream, replay the
decode and ask: could the FIRST match have been extended (same
offset) past its recorded end?  If yes for many pairs, the deep-rank
tiers are truncating long matches and the greedy scan re-matches at a
DIFFERENT offset (so the emission chain-merge can't fuse them), and
the fix is candidate selection / chain extension; if no, the device
genuinely finds different (shorter) structure and the fix is finder
depth.

Run: python experiments/code_split_diag.py [cpu]
"""
import functools
import os
import sys

if "cpu" in sys.argv[1:]:
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402
import zig_lz4_tpu.ops.jax_block as jb  # noqa: E402
from zig_lz4_tpu.native import native_compress_hc_blocks  # noqa: E402

BLK = 65536


def codeish(n, r):
    lines = [b"    if (state->pos + len > state->cap) return -1;",
             b"    memcpy(dst + op, src + ip, run_length);",
             b"    for (size_t i = 0; i < n; ++i) acc += table[i];",
             b"    return lz4_emit_sequence(ctx, literals, match);",
             b"    uint32_t h = (seq * 2654435761u) >> shift;"]
    idx = r.integers(0, len(lines), n // 30)
    return b"\n".join(lines[i] for i in idx)[:n]


def boundary_stats(comp: bytes, raw: bytes, label: str):
    seqs = jb.parse_sequences(comp)
    out = bytearray()
    # (end_pos, offset, matchlen) per sequence, replayed
    ends = []
    for lit_b, off, ml in seqs:
        out += lit_b
        if ml:
            for _ in range(ml):
                out.append(out[len(out) - off])
            ends.append((len(out), off, ml))
    assert bytes(out) == raw
    n = len(raw)
    lost = 0          # extension bytes left on the table
    lossy_pairs = 0   # boundaries where the previous match could extend
    ext_hist = []
    for (end, off, ml) in ends:
        e = 0
        while end + e < n and raw[end + e] == raw[end + e - off]:
            e += 1
        if e >= 1:
            lossy_pairs += 1
            lost += e
            ext_hist.append(e)
    ext_hist = np.array(ext_hist) if ext_hist else np.zeros(1, int)
    print(f"{label}: {len(ends)} matches, {lossy_pairs} truncated "
          f"({100*lossy_pairs/max(len(ends),1):.1f}%), lost ext bytes "
          f"{lost} (p50 {np.percentile(ext_hist,50):.0f} "
          f"p90 {np.percentile(ext_hist,90):.0f} "
          f"max {ext_hist.max()})")
    return lossy_pairs, lost


def main():
    r = np.random.default_rng(0xC0FFEE)
    raw = codeish(BLK, r)
    blocks = np.frombuffer(raw, np.uint8).reshape(1, len(raw))
    lens = np.full(1, len(raw), np.int64)

    for deep in (3, 4):
        enc = jax.jit(jax.vmap(functools.partial(
            jb._encode_block, blk=BLK, hc=8, deep=deep)))
        out, olen = enc(blocks, lens.astype(np.int32),
                        np.zeros(1, np.int32))
        comp = bytes(np.asarray(out)[0][:int(olen[0])])
        print(f"deep={deep}: {len(comp)} bytes")
        boundary_stats(comp, raw, f"device L12 deep={deep}")

    cb, cl = native_compress_hc_blocks(blocks, lens, 9)
    comp9 = bytes(cb[0][:cl[0]])
    print(f"native HC9: {len(comp9)} bytes")
    boundary_stats(comp9, raw, "native HC9")


if __name__ == "__main__":
    main()
