"""Two-process multi-host rehearsal (SURVEY.md section 4 multi-node).

Launches 2 real ``jax.distributed`` processes on localhost (CPU
backend), each compressing/decompressing its host-major span of the
corpus through MultiHostFrameCodec, and asserts both produce frames
bit-identical to the single-process run -- exercising the pcount>1
paths of _allgather_bytes and the span logic that single-process runs
degenerate away.
"""

import hashlib
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import sys
import time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
coord, pid = sys.argv[1], int(sys.argv[2])
t0 = time.time()

def phase(name):
    # per-worker phase timestamps: when this rehearsal fails, the logs
    # show exactly which phase each process was in and for how long
    print(f"PHASE {pid} {name} +{time.time() - t0:.1f}s", flush=True)

phase("initialize")
from zig_lz4_tpu.parallel import multihost
multihost.initialize(coordinator_address=coord, num_processes=2,
                     process_id=pid)
phase("initialized")   # incl. the clique-rendezvous warm collective
import hashlib
import numpy as np
from zig_lz4_tpu.parallel.multihost import MultiHostFrameCodec
from zig_lz4_tpu import frame as lz4f

rng = np.random.default_rng(77)
corpus = (b"multi host corpus block " * 40_000)[:700_000] + \
    rng.integers(0, 256, 100_000, dtype=np.uint8).tobytes()
codec = MultiHostFrameCodec(block_size_id=lz4f.BlockSizeID.max64KB)
phase("compress")
frame = codec.compress_corpus(corpus, content_hash=True)
phase("decompress")
back = codec.decompress_corpus(frame)
assert back == corpus, "multi-host round-trip mismatch"
phase("done")
print(f"RESULT {pid} {hashlib.sha256(frame).hexdigest()}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_multihost(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)      # children use 1 CPU device each
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(pid)],
        cwd="/root/repo", env=env, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True) for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, \
            f"worker failed:\nphases: {out[-1000:]}\n{err[-4000:]}"
        outs.append(out)
    hashes = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                _, pid, h = line.split()
                hashes[int(pid)] = h
    assert set(hashes) == {0, 1}
    assert hashes[0] == hashes[1], "hosts disagree on the frame"

    # the 2-process frame must be bit-identical to a 1-process run
    import numpy as np
    from zig_lz4_tpu.parallel.multihost import MultiHostFrameCodec
    from zig_lz4_tpu import frame as lz4f
    rng = np.random.default_rng(77)
    corpus = (b"multi host corpus block " * 40_000)[:700_000] + \
        rng.integers(0, 256, 100_000, dtype=np.uint8).tobytes()
    codec = MultiHostFrameCodec(block_size_id=lz4f.BlockSizeID.max64KB)
    frame1 = codec.compress_corpus(corpus, content_hash=True)
    assert hashlib.sha256(frame1).hexdigest() == hashes[0]
    assert codec.decompress_corpus(frame1) == corpus
