"""(a) Encode-batch amortization B=64/128/256; (b) fragment-decode
eligibility of DEVICE-encoded streams (fast vs HC mode) -- round-1
sweeps used host-encoded payloads, which fragment differently."""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import zig_lz4_tpu.ops.jax_block as jb  # noqa: E402
from zig_lz4_tpu.native import native_resolve_blocks  # noqa: E402
from bench import make_corpus  # noqa: E402

BLK = 65536
corpus = make_corpus(24)
NB = len(corpus) // BLK
blocks = np.frombuffer(corpus[:NB * BLK], np.uint8).reshape(NB, BLK)

# (a) batch scaling, fast mode
for B in (64, 128, 256):
    nb = (NB // B) * B
    fn = jax.jit(jax.vmap(functools.partial(jb._encode_block, blk=BLK)))
    dbs = [jax.device_put(blocks[i:i + B]) for i in range(0, nb, B)]
    dl = jax.device_put(np.full(B, BLK, np.int32))
    ds = jax.device_put(np.zeros(B, np.int32))
    o, ol = fn(dbs[0], dl, ds)
    np.asarray(ol)
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        checks = []
        for db in dbs:
            _o, ol = fn(db, dl, ds)
            checks.append(jnp.sum(ol))
        np.asarray(sum(checks))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"B={B:3d}: {t/nb*1e3:6.3f} ms/blk  {nb*BLK/t/1e6:6.1f} MB/s",
          flush=True)

# (b) eligibility of device-encoded streams, fast vs HC
for hc in (0, 8):
    B = 64
    nb = (NB // B) * B
    fn = jax.jit(jax.vmap(functools.partial(jb._encode_block, blk=BLK,
                                            hc=hc)))
    dl = jax.device_put(np.full(B, BLK, np.int32))
    ds = jax.device_put(np.zeros(B, np.int32))
    payl = bytearray()
    offs = np.zeros(nb, np.int64)
    lens = np.zeros(nb, np.int64)
    pos = 0
    for i in range(0, nb, B):
        o, ol = fn(jax.device_put(blocks[i:i + B]), dl, ds)
        o = np.asarray(o)
        ol = np.asarray(ol)
        for k in range(B):
            offs[i + k] = pos
            lens[i + k] = int(ol[k])
            payl += o[k, :int(ol[k])].tobytes()
            pos += int(ol[k])
    payl = bytes(payl)
    print(f"hc={hc}: device ratio {nb*BLK/len(payl):.4f}", flush=True)
    r = native_resolve_blocks(payl, offs, lens, 32768, BLK, 0, 4, 8)
    _fd, _fl, _fs, _fp, _fh, nfrag, rounds, _ol = r
    for fcap_t, rmax_t in ((8192, 2), (16384, 4), (32768, 8)):
        el = int(((nfrag >= 0) & (nfrag <= fcap_t)
                  & (rounds <= rmax_t)).sum())
        print(f"   tier({fcap_t},{rmax_t}): {100*el/nb:.0f}%",
              end="", flush=True)
    ok = nfrag >= 0
    print(f"   [nfrag p50/p90 "
          f"{int(np.percentile(nfrag[ok], 50))}/"
          f"{int(np.percentile(nfrag[ok], 90))}]", flush=True)
