"""On-chip measurement of the T-map decode path (round 5).

The per-byte literal-source map (native lz4tpu_resolve_tmap) fully
path-compresses LZ77 chains on the host at memcpy class, leaving the
device ONE parity-keyed fetch merge per block -- this measures, on
device level-9 streams:

  * host T-fill rate (GB/s of output bytes) vs the fragment resolve
  * device one-merge decode ms/blk at B=64, fetch quantized per batch
  * correctness spot-checks (byte-compare vs the corpus)

Decision: if the one-merge decode beats the mixed ladder's blended
rate (~2.5-3.3 ms/blk, experiments/dec_flatten_ab.py), the T-map
becomes the production default decode engine at 100% coverage.
Run: python experiments/dec_tmap_chip.py [mb]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import zig_lz4_tpu.ops.jax_block as jb  # noqa: E402
from zig_lz4_tpu.constants import compress_bound  # noqa: E402
from zig_lz4_tpu.native import (native_resolve_blocks,  # noqa: E402
                                native_resolve_tmap)
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

# --- host T-fill vs fragment resolve (min-of-3 each) -----------------
t_t = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    T, olens = native_resolve_tmap(payloads, offs, lens64, BLK)
    t_t = min(t_t, time.perf_counter() - t0)
t_f = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    native_resolve_blocks(payloads, offs, lens64, BLK, out_cap=BLK,
                          split_max=8, round_limit=12)
    t_f = min(t_f, time.perf_counter() - t0)
over = int((olens < 0).sum())
print(f"host T-fill: {t_t:.3f}s ({nb * BLK / t_t / 1e9:.3f} GB/s out, "
      f"{len(payloads) / t_t / 1e9:.3f} GB/s comp)  fragment resolve "
      f"sm=8: {t_f:.3f}s  overcap {over}", flush=True)

# --- device one-merge decode, fetch quantized per batch --------------
comp_np = np.zeros((nb, ccap), np.uint8)
for bi in range(nb):
    comp_np[bi, :lens64[bi]] = np.frombuffer(
        payloads[offs[bi]:offs[bi] + lens64[bi]], np.uint8)

args = []
for i in range(0, nb, B):
    sl = np.arange(i, i + B)
    need = int(lens64[sl].max())
    fetch_t = next((q for q in (BLK // 4, BLK // 2, ccap)
                    if q >= need), ccap)
    args.append((jax.device_put(comp_np[sl, :fetch_t]),
                 jax.device_put(T[sl]),
                 jax.device_put(olens[sl].astype(np.int32)), sl))

dec = jb._batched_tmap_decoder(BLK)
o = dec(*args[0][:3])
o0 = np.asarray(o)
for k in (0, B // 2, B - 1):
    bi = int(args[0][3][k])
    assert o0[k].tobytes() == corpus[bi * BLK:(bi + 1) * BLK], \
        f"tmap mismatch at block {bi}"
print("first-batch byte-compare OK", flush=True)

ts = []
for _ in range(3):
    t0 = time.perf_counter()
    checks = []
    for a in args:
        o = dec(*a[:3])
        checks.append(jnp.sum(o[:, ::997].astype(jnp.int32)))
    np.asarray(sum(checks))
    ts.append(time.perf_counter() - t0)
t = min(ts)
print(f"device one-merge decode: {nb} blks {t:.3f}s = "
      f"{t / nb * 1e3:.3f} ms/blk ({nb * BLK / t / 1e6:.1f} MB/s "
      f"device-only, 100% coverage)", flush=True)
