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

if "cpu" in sys.argv[1:]:
    # sitecustomize may import jax before our env var lands
    jax.config.update("jax_platforms", "cpu")
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
    # (end_pos, offset, matchlen, next_lit_gap) per sequence, replayed
    ends = []
    for k, (lit_len, lit_start, ml, off) in enumerate(seqs):
        out += comp[lit_start:lit_start + lit_len]
        if ml:
            for _ in range(ml):
                out.append(out[len(out) - off])
            nxt_gap = (seqs[k + 1][0] if k + 1 < len(seqs)
                       else len(raw) - len(out))
            ends.append((len(out), off, ml, nxt_gap))
    assert bytes(out) == raw
    n = len(raw)
    lost = 0          # extension bytes left on the table
    lost_lit = 0      # ... of which land on literal-gap bytes
    lossy_pairs = 0   # boundaries where the previous match could extend
    full_cover = 0    # extension fully covers the NEXT match too
    ext_hist, ml_trunc = [], []
    for (end, off, ml, gap) in ends:
        e = 0
        while end + e < n and raw[end + e] == raw[end + e - off]:
            e += 1
        if e >= 1:
            lossy_pairs += 1
            lost += e
            lost_lit += min(e, gap)
            if e > gap:
                full_cover += 1
            ext_hist.append(e)
            ml_trunc.append(ml)
    ext_hist = np.array(ext_hist) if ext_hist else np.zeros(1, int)
    ml_trunc = np.array(ml_trunc) if ml_trunc else np.zeros(1, int)
    print(f"{label}: {len(ends)} matches, {lossy_pairs} truncated "
          f"({100*lossy_pairs/max(len(ends),1):.1f}%), lost ext bytes "
          f"{lost} (lit-gap {lost_lit}, past-next {lost - lost_lit}, "
          f"{full_cover} reach past next start) "
          f"(p50 {np.percentile(ext_hist,50):.0f} "
          f"p90 {np.percentile(ext_hist,90):.0f} "
          f"max {ext_hist.max()}); trunc recorded-ml p50 "
          f"{np.percentile(ml_trunc,50):.0f} "
          f"p10 {np.percentile(ml_trunc,10):.0f}")
    return lossy_pairs, lost


def main():
    os.environ.setdefault("NB", "1")
    its = [int(a[5:]) for a in sys.argv[1:] if a.startswith("iters")]
    if its:
        jb._EXT_ITERS = its[0]
        print(f"_EXT_ITERS = {its[0]}")
    from hc_ratio_gap import typed_blocks
    data = typed_blocks()          # 1 x 64KB block per content type
    names = list(data)
    blocks = np.stack([np.frombuffer(data[k], np.uint8) for k in names])
    lens = np.full(len(names), BLK, np.int64)

    for lvl in (9, 12):
        hc, deep = jb.level_params(lvl)
        enc = jax.jit(jax.vmap(functools.partial(
            jb._encode_block, blk=BLK, hc=hc, deep=deep)))
        out, olen = enc(blocks, lens.astype(np.int32),
                        np.zeros(len(names), np.int32))
        out = np.asarray(out)
        for i, name in enumerate(names):
            comp = bytes(out[i][:int(olen[i])])
            boundary_stats(comp, data[name],
                           f"{name:8s} dev L{lvl} ({len(comp)}B)")

    cb, cl = native_compress_hc_blocks(blocks, lens, 9)
    for i, name in enumerate(names):
        comp9 = bytes(cb[i][:cl[i]])
        boundary_stats(comp9, data[name],
                       f"{name:8s} natHC9  ({len(comp9)}B)")


if __name__ == "__main__":
    main()
