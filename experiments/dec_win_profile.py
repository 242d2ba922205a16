"""Windowed vs byte-granular fragment decoder on the real chip.

Encodes a bench-corpus sample with the level-9 device HC encoder,
resolves fragments, then times BOTH decoders per tier at matched
batches and reports ms/blk, MB/s, and the windowed decoder's
self-validation (pool-overflow) rate.  This is the measurement gate
for making the windowed decoder the production tier engine.

Run: python experiments/dec_win_profile.py [mb]
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import zig_lz4_tpu.ops.jax_block as jb  # noqa: E402
from zig_lz4_tpu.constants import compress_bound  # noqa: E402
from zig_lz4_tpu.native import native_resolve_blocks  # noqa: E402
from zig_lz4_tpu.parallel.sharded import (_FRAG_SPLIT_MAX,  # noqa: E402
                                          _FRAG_TIERS)
from bench import make_corpus  # noqa: E402

BLK = 65536
B = 64
mbs = [int(a) for a in sys.argv[1:] if a.isdigit()]
MB = mbs[0] if mbs else 12
corpus = make_corpus(MB)
nb = len(corpus) // BLK // B * B
blocks = np.frombuffer(corpus[:nb * BLK], np.uint8).reshape(nb, BLK)

# level-9 HC encode on device (the headline stream)
enc = jb._batched_encoder(BLK, *jb.level_params(9))
dl = jax.device_put(np.full(B, BLK, np.int32))
ds = jax.device_put(np.zeros(B, np.int32))
payloads = bytearray()
offs = np.zeros(nb, np.int64)
lens64 = np.zeros(nb, np.int64)
pos = 0
for i in range(0, nb, B):
    o, l = enc(jax.device_put(blocks[i:i + B]), dl, ds)
    on, ln = np.asarray(o), np.asarray(l)
    for k in range(B):
        offs[i + k] = pos
        lens64[i + k] = int(ln[k])
        payloads += on[k, :int(ln[k])].tobytes()
        pos += int(ln[k])
payloads = bytes(payloads)
print(f"{nb} blocks encoded, ratio {nb * BLK / len(payloads):.3f}",
      flush=True)

fcap_hi = BLK // _FRAG_TIERS[-1][0]
fdst, flen, fsrc, fper, fph, nfrag, rounds, olens = \
    native_resolve_blocks(payloads, offs, lens64, fcap_hi, out_cap=BLK,
                          split_max=_FRAG_SPLIT_MAX,
                          round_limit=_FRAG_TIERS[-1][1])

ccap = compress_bound(BLK)
comp_np = np.zeros((nb, ccap), np.uint8)
for bi in range(nb):
    comp_np[bi, :lens64[bi]] = np.frombuffer(
        payloads[offs[bi]:offs[bi] + lens64[bi]], np.uint8)

taken = np.zeros(nb, bool)
for div, rmax in _FRAG_TIERS:
    fcap_t = BLK // div
    sel = np.where(~taken & (nfrag >= 0) & (nfrag <= fcap_t)
                   & (rounds <= rmax))[0]
    taken |= (~taken & (nfrag >= 0) & (nfrag <= fcap_t)
              & (rounds <= rmax))
    if not len(sel):
        print(f"tier (fcap={fcap_t}, r={rmax}): 0 blocks")
        continue
    ndp = min(len(sel) // B * B, 4 * B) or B
    sel = np.concatenate([sel, sel[:1].repeat(max(B - len(sel), 0))])
    sel = sel[:ndp] if len(sel) >= ndp else sel[:B]
    ndp = len(sel)
    # quantized fetch cap (mirrors sharded._decode_records)
    need = int(lens64[sel].max())
    fetch_t = next((q for q in (BLK // 4, BLK // 2, ccap)
                    if q >= need), ccap)
    args = []
    for i in range(0, ndp, B):
        s = sel[i:i + B]
        args.append((jax.device_put(comp_np[s][:, :fetch_t]),
                     jax.device_put(fdst[s, :fcap_t]),
                     jax.device_put(fsrc[s, :fcap_t]),
                     jax.device_put(fper[s, :fcap_t]),
                     jax.device_put(fph[s, :fcap_t]),
                     jax.device_put(nfrag[s]),
                     jax.device_put(olens[s].astype(np.int32)), s))

    for name in ("byte", "win"):
        if name == "byte":
            dec = jb._batched_frag_decoder(BLK, fcap_t, rmax)
        else:
            if not jb.device_win_decoder_supports(BLK, fcap_t, fetch_t):
                print(f"tier (fcap={fcap_t}, r={rmax}) win: unsupported")
                continue
            dec = jb._batched_frag_decoder_win(BLK, fcap_t, rmax)
        r = dec(*args[0][:7])
        np.asarray(r[:, ::997] if name == "byte" else r[1])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            checks = []
            for a in args:
                r = dec(*a[:7])
                o = r if name == "byte" else r[0]
                checks.append(jnp.sum(o[:, ::997].astype(jnp.int32)))
            np.asarray(sum(checks))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        okrate = ""
        r = dec(*args[0][:7])
        o = r if name == "byte" else r[0]
        on = np.asarray(o)
        oks = np.ones(B, bool) if name == "byte" else np.asarray(r[1])
        okrate = f"  ok {oks.mean():.3f}"
        bad = 0
        for k in range(B):
            bi = int(args[0][7][k])
            if oks[k] and on[k, :BLK].tobytes() != blocks[bi].tobytes():
                bad += 1
        assert bad == 0, f"{bad} wrong blocks in {name}"
        print(f"tier (fcap={fcap_t}, r={rmax}) {len(sel):4d}/{nb} blks "
              f"{name:4s}: {t / ndp * 1e3:6.3f} ms/blk "
              f"{ndp * BLK / t / 1e6:6.1f} MB/s{okrate}", flush=True)
