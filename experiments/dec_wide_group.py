"""Wide-group (g=16) windowed decoder: correctness + on-chip A/B.

The round-4 chip queue's named lever for the 2-round tier (38.2 MB/s,
the blended-decode bottleneck): g=16 groups with 32-byte publisher
windows halve the per-round sort rows (1 + 2*wins per 16 output
bytes instead of per 8) at the cost of doubled operand width --
sort cost is nearly independent of operand count, so the rows
should convert to time.

Modes:
  cpu  [nblk]      -- JAX_PLATFORMS=cpu correctness: g=16 output ==
                      g=8 output == oracle on every ok block, and
                      coverage (ok fraction) per g at the 2-round
                      tier geometry.
  chip [B] [reps]  -- timed A/B at the 2-round production tier
                      (fcap=8192, rounds=2) on the real chip.

reference decode semantics: src/lz4.zig:89-251.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

mode = sys.argv[1] if len(sys.argv) > 1 else "cpu"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import zig_lz4_tpu.ops.jax_block as jb  # noqa: E402
from zig_lz4_tpu.native import native_resolve_blocks  # noqa: E402
from zig_lz4_tpu.ops.block import decompress_safe  # noqa: E402
from bench import make_corpus, SPLIT_MAX  # noqa: E402

BLK = 65536
FCAP = 8192
ROUNDS = 2


def build_tier(nblk):
    """Encode nblk L9 blocks, resolve, return the 2-round-tier subset
    (padded arrays + indices) exactly as bench's mixed ladder sees it."""
    corpus = make_corpus(max(2, nblk * BLK // (1 << 20) + 1))
    blocks = np.frombuffer(corpus[:nblk * BLK], np.uint8).reshape(
        nblk, BLK)
    enc = jb._batched_encoder(BLK, *jb.level_params(9))
    B0 = min(nblk, 64)
    dl = jax.device_put(np.full(B0, BLK, np.int32))
    ds = jax.device_put(np.zeros(B0, np.int32))
    comp = np.zeros((nblk, jb.compress_bound(BLK)), np.uint8)
    clen = np.zeros(nblk, np.int64)
    for i in range(0, nblk, B0):
        o, l = enc(jax.device_put(blocks[i:i + B0]), dl, ds)
        comp[i:i + B0] = np.asarray(o)
        clen[i:i + B0] = np.asarray(l)
    payl = b"".join(comp[k, :clen[k]].tobytes() for k in range(nblk))
    offs = np.zeros(nblk, np.int64)
    offs[1:] = np.cumsum(clen)[:-1]
    fdst, fl, fsrc, fper, fph, nfrag, rounds, olens = \
        native_resolve_blocks(payl, offs, clen, FCAP, out_cap=BLK,
                              split_max=SPLIT_MAX, round_limit=12)
    sel = np.where((nfrag >= 0) & (rounds <= ROUNDS)
                   & (nfrag <= FCAP))[0]
    return (blocks, comp, clen, sel,
            (fdst[sel], fsrc[sel], fper[sel], fph[sel]),
            nfrag[sel], olens[sel].astype(np.int32))


if mode == "cpu":
    nblk = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    blocks, comp, clen, sel, frags, nfrag, olens = build_tier(nblk)
    print(f"{len(sel)}/{nblk} blocks on the 2-round tier", flush=True)
    for g in (8, 16):
        dec = jb._batched_frag_decoder_win(BLK, FCAP, ROUNDS, g=g)
        out, ok = dec(jnp.asarray(comp[sel]),
                      *(jnp.asarray(a) for a in frags),
                      jnp.asarray(nfrag), jnp.asarray(olens))
        out = np.asarray(out)
        ok = np.asarray(ok)
        bad = 0
        for k, bi in enumerate(sel):
            if not ok[k]:
                continue
            if not np.array_equal(out[k, :olens[k]],
                                  blocks[bi, :olens[k]]):
                bad += 1
        print(f"g={g:2d}: ok {int(ok.sum())}/{len(sel)} "
              f"(coverage {ok.mean():.3f}), mismatches on ok "
              f"blocks: {bad}", flush=True)
        assert bad == 0, f"g={g} produced wrong bytes on an ok block"
    print("CPU correctness: PASS", flush=True)

elif mode == "chip":
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    blocks, comp, clen, sel, frags, nfrag, olens = build_tier(B * 4)
    # ~20% of blocks land on this tier; tile to fill 2 full batches
    # (duplicates time identically under both variants -- fair A/B)
    k = np.arange(2 * B) % len(sel)
    sel_n = len(k)
    print(f"{len(sel)} tier blocks, timing {sel_n} (tiled) "
          f"in batches of {B}", flush=True)
    args = []
    for i in range(0, sel_n, B):
        ki = k[i:i + B]
        args.append((jax.device_put(comp[sel[ki]]),
                     tuple(jax.device_put(a[ki]) for a in frags),
                     jax.device_put(nfrag[ki]),
                     jax.device_put(olens[ki])))
    for g in (8, 16):
        dec = jb._batched_frag_decoder_win(BLK, FCAP, ROUNDS, g=g)
        a = args[0]
        o, ok = dec(a[0], *a[1], a[2], a[3])
        okf = float(np.asarray(ok).mean())
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            cs = []
            for a in args:
                o, ok = dec(a[0], *a[1], a[2], a[3])
                cs.append(jnp.sum(o[:, ::997].astype(jnp.int32)))
            float(np.asarray(sum(cs)))
            best = min(best, time.perf_counter() - t0)
        ms = best / sel_n * 1e3
        print(f"g={g:2d}: {ms:.3f} ms/blk = {BLK / ms / 1e3:.1f} MB/s "
              f"(ok {okf:.3f}, {sel_n} blocks)", flush=True)
else:
    raise SystemExit(f"unknown mode {mode}")
