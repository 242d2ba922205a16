"""On-chip A/B of the FLATTENED-resolver decode ladder (round 5).

The tail-flattening change (native resolver + mirror) cuts resolver
round depth from <= 12 to <= 4 on HC9-class streams at split_max=32
(experiments/resolve_flatten_study.py).  This measures, on DEVICE
level-9 streams:

  OLD ladder (round-4 production): resolve sm=8 rl=12,
      tiers (8192, 2) win g16 / (16384, 8) chase d8 / (65536, 12)
      chase d16  -- the BENCH_r04 configuration, re-measured so the
      A/B shares one session.
  NEW ladder (proposed): resolve sm=32 rl=8,
      tiers (8192, 2) win g16 / (16384, 2) win g16 / (32768, 4)
      chase d4 / (65536, 8) chase d8.

Reports per-tier blocks, ms/blk, MB/s, self-valid ok fraction, and
the blended device-only rate of each ladder.
Run: python experiments/dec_flatten_ab.py [mb]
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
from zig_lz4_tpu.parallel.sharded import _chase_config  # noqa: E402
from bench import make_corpus  # noqa: E402

BLK = 65536
B = 64
mbs = [int(a) for a in sys.argv[1:] if a.isdigit()]
MB = mbs[0] if mbs else 12
corpus = make_corpus(MB)
nb = len(corpus) // BLK // B * B
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
print(f"{nb} device-L9 blocks, ratio {nb * BLK / len(payloads):.3f}",
      flush=True)
ccap = compress_bound(BLK)
comp_np = np.zeros((nb, ccap), np.uint8)
for bi in range(nb):
    comp_np[bi, :lens64[bi]] = np.frombuffer(
        payloads[offs[bi]:offs[bi] + lens64[bi]], np.uint8)


def stage(didx, fcap_t, r):
    fdst, flen, fsrc, fper, fph, nfrag, rounds, olens = r
    ndp = -(-len(didx) // B) * B
    dsel = np.concatenate([didx, didx[:1].repeat(ndp - len(didx))]
                          ).astype(int)
    args = []
    for i in range(0, ndp, B):
        sl = dsel[i:i + B]
        need = int(lens64[sl].max())
        fetch_t = next((q for q in (BLK // 4, BLK // 2, ccap)
                        if q >= need), ccap)
        args.append((jax.device_put(comp_np[sl, :fetch_t]),)
                    + tuple(jax.device_put(a[sl, :fcap_t]) for a in
                            (fdst, fsrc, fper, fph))
                    + (jax.device_put(nfrag[sl]),
                       jax.device_put(olens[sl].astype(np.int32)), sl))
    return args


def time_tier(dec, args):
    o, okf = dec(*args[0][:7])
    ok0 = np.asarray(okf)
    # spot-verify two blocks of the first batch
    o0 = np.asarray(o)
    for k in (0, len(args[0][7]) // 2):
        if ok0[k]:
            bi = int(args[0][7][k])
            assert o0[k].tobytes() == corpus[bi * BLK:(bi + 1) * BLK], \
                f"mismatch at block {bi}"
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        checks = []
        for a in args:
            o, okf = dec(*a[:7])
            checks.append(jnp.sum(o[:, ::997].astype(jnp.int32))
                          + jnp.sum(okf))
        np.asarray(sum(checks))
        ts.append(time.perf_counter() - t0)
    nblk = sum(len(a[7]) for a in args)
    return min(ts), nblk, float(ok0.mean())


def run_ladder(name, sm, rl, tiers):
    t0 = time.perf_counter()
    r = native_resolve_blocks(payloads, offs, lens64, BLK, out_cap=BLK,
                              split_max=sm, round_limit=rl,
                              reuse_buffers=False)
    t_res = time.perf_counter() - t0
    _fd, _fl, _fs, _fp, _fh, nfrag, rounds, _ol = r
    print(f"[{name}] resolve sm={sm} rl={rl}: {t_res:.3f}s; rounds "
          f"p50/p90/max {int(np.percentile(rounds, 50))}/"
          f"{int(np.percentile(rounds, 90))}/{rounds.max()}", flush=True)
    taken = np.zeros(nb, bool)
    tot_t, tot_b = 0.0, 0
    for fcap_t, rmax_t, engine in tiers:
        okm = (~taken & (nfrag >= 0) & (nfrag <= fcap_t)
               & (rounds <= rmax_t))
        taken |= okm
        didx = np.where(okm)[0]
        if not len(didx):
            print(f"  tier ({fcap_t},{rmax_t},{engine}): 0 blocks",
                  flush=True)
            continue
        if engine == "win":
            dec = jb._batched_frag_decoder_win(BLK, fcap_t, rmax_t,
                                               g=16)
        else:
            dec = jb._batched_frag_decoder_chase(
                BLK, fcap_t, *_chase_config(rmax_t))
        args = stage(didx, fcap_t, r)
        t, nblk, okf = time_tier(dec, args)
        tot_t += t
        tot_b += len(didx)
        print(f"  tier ({fcap_t},{rmax_t},{engine}): {len(didx)} blks "
              f"{t / nblk * 1e3:.3f} ms/blk ({nblk * BLK / t / 1e6:.1f} "
              f"MB/s) ok {okf:.3f}", flush=True)
    print(f"[{name}] blended: {tot_b}/{nb} blocks "
          f"({tot_b / nb:.3f}) in {tot_t:.3f}s = "
          f"{tot_b * BLK / max(tot_t, 1e-9) / 1e6:.1f} MB/s device-only",
          flush=True)


run_ladder("OLD", 8, 12, ((8192, 2, "win"), (16384, 8, "chase"),
                          (65536, 12, "chase")))
run_ladder("NEW", 32, 8, ((8192, 2, "win"), (16384, 2, "win"),
                          (32768, 4, "chase"), (65536, 8, "chase")))
