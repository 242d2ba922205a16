import numpy as np
from zig_lz4_tpu.parallel.sharded import ShardedFrameCodec
from zig_lz4_tpu import frame as lz4f
rng = np.random.default_rng(3)
data = (b"the quick brown fox " * 50_000)[:512*1024] + \
    bytes(rng.integers(0, 256, 65536, dtype=np.uint8).tobytes())
c = ShardedFrameCodec()
fr = c.compress_frame(data)
assert lz4f.decompress_frame(fr) == data
assert c.decompress_frame(lz4f.compress_frame(data)) == data   # tmap decode
assert c.decompress_frame(fr) == data
# probes: corruption, empty, 1-byte
import zig_lz4_tpu.errors as E
bad = bytearray(fr); bad[len(bad)//2] ^= 0x40
try:
    c.decompress_frame(bytes(bad)); raise SystemExit("corruption not caught")
except (E.LZ4Error, Exception) as e:
    assert "hecksum" in type(e).__name__ or "orrupt" in type(e).__name__, type(e)
assert c.decompress_frame(c.compress_frame(b"")) == b""
assert c.decompress_frame(c.compress_frame(b"x")) == b"x"
print("drive OK: tmap-default frame round-trips + corruption/empty/1-byte probes")
# linked-mode probe: windowed T-map engine on device
prefs = lz4f.Preferences(frame_info=lz4f.FrameInfo(
    block_size_id=lz4f.BlockSizeID.max64KB,
    block_mode=lz4f.BlockMode.linked, content_checksum=True))
ldata = (b"linked window history reaches back across blocks " * 20000)[:900_000] \
    + bytes(rng.integers(0, 256, 50_000, dtype=np.uint8).tobytes()) + data[:300_000]
lfr = lz4f.compress_frame(ldata, prefs)
assert c.decompress_frame(lfr) == ldata
print("drive OK: linked T-map device decode round-trips")
