"""Chase (pointer-doubling) vs windowed vs byte decoders on the chip.

Two comparisons on level-9 HC device streams:

1. PRODUCTION-RESOLVE tiers (split_max=8, round_limit=12): time all
   three decoders per tier at matched batches -- the apples-to-apples
   engine comparison.
2. RELAXED RESOLVE (round_limit=64): the chase decoder's depth budget
   is 2^(dense+doublings), so the resolver can keep natural chains;
   measure single-config chase coverage + speed over blocks the
   linear-round tiers cannot take at all.

Run: python experiments/dec_chase_profile.py [mb]
"""
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
B = min(B, max(len(corpus) // BLK, 1))
nb = len(corpus) // BLK // B * B
assert nb > 0, f"corpus too small: {len(corpus)} bytes"
blocks = np.frombuffer(corpus[:nb * BLK], np.uint8).reshape(nb, BLK)

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
ccap = compress_bound(BLK)
comp_np = np.zeros((nb, ccap), np.uint8)
for bi in range(nb):
    comp_np[bi, :lens64[bi]] = np.frombuffer(
        payloads[offs[bi]:offs[bi] + lens64[bi]], np.uint8)


def time_dec(dec, args, two_out=True, label=""):
    r = dec(*args[0][:7])
    np.asarray(r[1] if two_out else r[:, ::997])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        checks = []
        for a in args:
            r = dec(*a[:7])
            o = r[0] if two_out else r
            checks.append(jnp.sum(o[:, ::997].astype(jnp.int32)))
        np.asarray(sum(checks))
        ts.append(time.perf_counter() - t0)
    r = dec(*args[0][:7])
    o = r[0] if two_out else r
    oks = np.asarray(r[1]) if two_out else np.ones(B, bool)
    on = np.asarray(o)
    bad = sum(1 for k in range(B)
              if oks[k] and on[k, :BLK].tobytes()
              != blocks[int(args[0][7][k])].tobytes())
    assert bad == 0, f"{bad} wrong blocks in {label}"
    return min(ts), oks.mean()


def stage(sel, fcap_t, rA):
    fdst, flen, fsrc, fper, fph, nfrag, rounds, olens = rA
    ndp = min(len(sel) // B * B, 4 * B) or B
    sel = np.concatenate([sel, sel[:1].repeat(max(B - len(sel), 0))])
    sel = sel[:ndp] if len(sel) >= ndp else sel[:B]
    ndp = len(sel)
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
    return args, ndp, fetch_t


# ---- part 1: production resolve, engine comparison per tier --------
fcap_hi = BLK // _FRAG_TIERS[-1][0]
rA = native_resolve_blocks(payloads, offs, lens64, fcap_hi, out_cap=BLK,
                           split_max=_FRAG_SPLIT_MAX,
                           round_limit=_FRAG_TIERS[-1][1])
nfragA, roundsA = rA[5], rA[6]
taken = np.zeros(nb, bool)
for div, rmax in _FRAG_TIERS:
    fcap_t = BLK // div
    ok = (~taken & (nfragA >= 0) & (nfragA <= fcap_t)
          & (roundsA <= rmax))
    sel = np.where(ok)[0]
    taken |= ok
    if not len(sel):
        continue
    args, ndp, fetch_t = stage(sel, fcap_t, rA)
    for name in ("win", "chase"):
        if name == "win":
            dec = jb._batched_frag_decoder_win(BLK, fcap_t, rmax)
        else:
            from zig_lz4_tpu.parallel.sharded import _chase_config
            dn, dbl, qc = _chase_config(max(rmax, 2))
            dec = jb._batched_frag_decoder_chase(BLK, fcap_t, dn,
                                                 dbl, qc)
        t, okr = time_dec(dec, args, True, name)
        print(f"tier (fcap={fcap_t}, r={rmax}) {len(sel):4d}/{nb} "
              f"{name:5s}: {t / ndp * 1e3:6.3f} ms/blk "
              f"{ndp * BLK / t / 1e6:6.1f} MB/s  ok {okr:.3f}",
              flush=True)

# ---- part 2: relaxed resolve, single-config chase coverage --------
for sm in (_FRAG_SPLIT_MAX, 24):
    rB = native_resolve_blocks(payloads, offs, lens64, BLK, out_cap=BLK,
                               split_max=sm, round_limit=64)
    nfragB, roundsB = rB[5], rB[6]
    for div in (4, 2):
        fcap_t = BLK // div
        ok = (nfragB >= 0) & (nfragB <= fcap_t) & (roundsB <= 64)
        sel = np.where(ok)[0]
        if not len(sel):
            continue
        args, ndp, fetch_t = stage(sel, fcap_t, rB)
        dec = jb._batched_frag_decoder_chase(BLK, fcap_t, dense=5,
                                             doublings=1, qcap=4096)
        t, okr = time_dec(dec, args, True, "chase-relaxed")
        print(f"relaxed sm={sm} fcap={fcap_t} d=5+1q4096: cover "
              f"{len(sel)}/{nb} ({len(sel)/nb:.3f})  "
              f"{t / ndp * 1e3:6.3f} ms/blk "
              f"{ndp * BLK / t / 1e6:6.1f} MB/s  ok {okr:.3f}",
              flush=True)
    # mixed-ladder question: the win decoder on NATURAL-chain
    # fragments (shallow blocks resolve identically under rl=64, and
    # nfrag only shrinks) -- if win stays faster on rounds<=2/8
    # blocks, production should run win shallow tiers + chase rest
    # off this SINGLE resolve
    for fcap_t, rmax in ((BLK // 8, 2), (BLK // 4, 8)):
        ok = (nfragB >= 0) & (nfragB <= fcap_t) & (roundsB <= rmax)
        sel = np.where(ok)[0]
        if not len(sel):
            continue
        args, ndp, fetch_t = stage(sel, fcap_t, rB)
        dec = jb._batched_frag_decoder_win(BLK, fcap_t, rmax)
        t, okr = time_dec(dec, args, True, "win-natural")
        print(f"natural sm={sm} win({fcap_t},{rmax}): cover "
              f"{len(sel)}/{nb} ({len(sel)/nb:.3f})  "
              f"{t / ndp * 1e3:6.3f} ms/blk "
              f"{ndp * BLK / t / 1e6:6.1f} MB/s  ok {okr:.3f}",
              flush=True)

# ---- part 3: (dense, doublings, qcap) sweep at the coverage config -
# Each config is its own XLA program (compile ~1-5 min over the
# tunnel) -- keep the sweep tight.  ok < 1 means the frontier pool
# overflowed for some blocks (production self-flags and reroutes).
rB = native_resolve_blocks(payloads, offs, lens64, BLK, out_cap=BLK,
                           split_max=_FRAG_SPLIT_MAX, round_limit=64)
nfragB, roundsB = rB[5], rB[6]
fcap_t = BLK // 2
ok = (nfragB >= 0) & (nfragB <= fcap_t) & (roundsB <= 64)
sel = np.where(ok)[0]
args, ndp, fetch_t = stage(sel, fcap_t, rB)
# configs from the frontier sim (chase_depth_sim.py): pure-dense
# depth 32/64, the production (5,1,4096), and the naive (2,4) the
# sim predicts overflows its pool on 12.5% of blocks
for dense, dbl, qcap in ((5, 1, 4096), (5, 0, 0), (6, 0, 0),
                         (4, 1, 4096), (2, 4, 0)):
    dec = jb._batched_frag_decoder_chase(BLK, fcap_t, dense=dense,
                                         doublings=dbl, qcap=qcap)
    t, okr = time_dec(dec, args, True, f"d{dense}+{dbl}q{qcap}")
    print(f"sweep dense={dense} dbl={dbl} qcap={qcap or BLK // 8}: "
          f"{t / ndp * 1e3:6.3f} ms/blk {ndp * BLK / t / 1e6:6.1f} "
          f"MB/s  ok {okr:.3f}", flush=True)
