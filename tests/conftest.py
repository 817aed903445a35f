"""Test configuration.

Sharding tests run on a virtual 8-device CPU mesh (the driver separately
dry-runs the multi-chip path); kernel correctness tests run wherever JAX
lands. We force CPU with 8 virtual devices for determinism and speed of
the test suite — matching the reference's `-mmt` matrix strategy of
exercising 1..N workers over identical data (tests/main.test:79-92).
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

# the image's sitecustomize pins JAX_PLATFORMS=axon (real TPU); force CPU
# for the deterministic virtual-mesh test suite
import jax

jax.config.update("jax_platforms", "cpu")

import hashlib
import random
import shutil

import numpy as np
import pytest

REF_7ZZ = "/tmp/refsrc/CPP/7zip/Bundles/Alone2/_o/7zz"


def have_ref() -> bool:
    return shutil.which(REF_7ZZ) is not None or os.path.exists(REF_7ZZ)


requires_ref = pytest.mark.skipif(
    not have_ref(), reason="reference 7zz binary not built")


@pytest.fixture(scope="session")
def corpus():
    """Deterministic mixed-content test corpus."""
    rng = random.Random(0x7A7A)
    nprng = np.random.default_rng(0x7A7A)
    samples = {}
    # highly compressible text
    words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
             "compression", "zstandard", "lz4", "tpu", "kernel", "entropy"]
    samples["text"] = (" ".join(rng.choice(words) for _ in range(20000))
                       ).encode()
    # repetitive
    samples["repeat"] = b"abcabcabcabd" * 5000 + b"tail-literals"
    # incompressible
    samples["random"] = nprng.integers(0, 256, 100_000, dtype=np.uint8).tobytes()
    # sparse / zeros
    z = np.zeros(80_000, dtype=np.uint8)
    z[::997] = 255
    samples["sparse"] = z.tobytes()
    # short edge cases
    samples["empty"] = b""
    samples["one"] = b"x"
    samples["short"] = b"hello world!"
    samples["min13"] = b"aaaaaaaaaaaaa"  # 13 bytes
    # binary-ish structured data
    t = np.arange(30_000, dtype=np.uint32)
    samples["struct"] = (t * 2654435761).astype(np.uint32).tobytes()[:100_000]
    return samples


def sha256(b: bytes) -> str:
    return hashlib.sha256(b).hexdigest()
