"""Test configuration.

Tests run JAX on a virtual 8-device CPU mesh so multi-chip sharding
paths (shard_map over a ('blocks',) mesh) are exercised without TPU
hardware.  Must be set before JAX initializes.
"""

import os
import random

# Force CPU: the session sitecustomize registers the axon TPU backend
# and sets jax_platforms="axon,cpu" itself, overriding the env var --
# so the env var alone is not enough; update jax.config after import.
# Tests must run on a virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest


@pytest.fixture(scope="session")
def corpus():
    """Deterministic fixture corpus mirroring the reference compat suite.

    reference: src/test_compat.zig:25-57 (TestData.init): short string,
    1000B of 8-byte repeats, lorem text, seeded random, empty, byte ramp.
    """
    rng = random.Random(0x5EED)
    lorem = (b"Lorem ipsum dolor sit amet, consectetur adipiscing elit, "
             b"sed do eiusmod tempor incididunt ut labore et dolore magna "
             b"aliqua. Ut enim ad minim veniam, quis nostrud exercitation "
             b"ullamco laboris nisi ut aliquip ex ea commodo consequat. ")
    return {
        "hello": b"Hello World!",
        "repeated": b"ABCDEFGH" * 125,                       # 1000 bytes
        "lorem": lorem * 40,
        "random256": bytes(rng.randrange(256) for _ in range(256)),
        "empty": b"",
        "ramp": bytes(i & 0xFF for i in range(100_000)),
        "tiny": b"abc",
        "rle": b"a" * 10_000,
        "mixed": (lorem + bytes(rng.randrange(256) for _ in range(333))) * 30,
    }
