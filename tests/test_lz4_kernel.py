"""Tests for the fused LZ4 device encoder stack.

Asserts, on real corpus data and adversarial patterns:
  twin (numpy spec, ops/lz4_twin2) == plane math (jnp, ops/lz4_plane)
  == Pallas kernels in interpret mode (ops/lz4_pallas) byte-for-byte,
and that every output round-trips through the block decoder. A mesh
test drives the plane pipeline (including the tier-B lax.sort) under
shard_map. Small W keeps CI time sane; the math is W-independent.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tpu7z.models.lz4 import block as blockmod  # noqa: E402
from tpu7z.ops import lz4_plane as P  # noqa: E402
from tpu7z.ops import lz4_twin2 as T  # noqa: E402

W = 16


def _patterns():
    """Blocks that exercise every phase: literals, near/far matches,
    long runs (255-gaps), row-boundary merges, short blocks."""
    rng = np.random.default_rng(7)
    words = [b"alpha ", b"beta ", b"gamma ", b"delta ", b"zstd ", b"tpu "]
    text = b"".join(words[i] for i in rng.integers(0, 6, 14000))[:P.BLOCK]
    zeros_mid = bytearray(rng.integers(0, 256, P.BLOCK, dtype=np.uint8))
    zeros_mid[1000:9000] = b"\x00" * 8000          # long run: merge chains
    far = bytearray(rng.integers(0, 256, P.BLOCK, dtype=np.uint8))
    far[40000:40600] = far[2000:2600]               # 38K offset: tier B only
    rand = rng.integers(0, 256, P.BLOCK, dtype=np.uint8).tobytes()
    corpus = None
    try:
        corpus = open("/tmp/tpu7z_bench_corpus.bin", "rb").read(P.BLOCK)
    except OSError:
        pass
    out = [(bytes(text.ljust(P.BLOCK, b" ")), P.BLOCK),
           (bytes(zeros_mid), P.BLOCK),
           (bytes(far), P.BLOCK),
           (rand, P.BLOCK),
           (bytes(text[:50000]).ljust(P.BLOCK, b"\x00"), 50000)]
    if corpus:
        out.append((corpus, P.BLOCK))
    return out


@pytest.fixture(scope="module")
def plane_fn():
    return jax.jit(lambda b, n: P.encode_block_planes(b, n, W=W))


@pytest.mark.parametrize("idx", range(len(_patterns())))
def test_twin_matches_plane_and_roundtrips(idx, plane_fn):
    data, n = _patterns()[idx]
    arr = np.frombuffer(data, np.uint8)
    twin = T.encode_block(arr.astype(np.int64), n, W=W)
    assert blockmod.decompress_block(twin, dst_size=n) == data[:n]

    plane = arr.astype(np.int32).reshape(P.NROWS, P.ROW)
    out, used = plane_fn(jnp.asarray(plane), jnp.int32(n))
    got = np.asarray(out).reshape(-1)[:int(used)].astype(np.uint8).tobytes()
    assert got == twin


@pytest.mark.parametrize("idx", range(len(_patterns())))
def test_pallas_interpret_matches_twin(idx):
    """The actual pallas_call pipeline (interpret mode on CPU) must
    reproduce the twin byte-for-byte on EVERY adversarial pattern —
    the docstring contract of ops/lz4_pallas.py."""
    from tpu7z.ops import lz4_pallas as LP
    data, n = _patterns()[idx]
    arr = np.frombuffer(data, np.uint8)
    twin = T.encode_block(arr.astype(np.int64), n, W=W)
    blocks = jnp.asarray(arr[None, :])
    ns = jnp.full((1,), n, jnp.int32)
    out, used = LP.encode_blocks(blocks, ns, W=W, interpret=True)
    got = np.asarray(out)[0, : int(used[0])].astype(np.uint8).tobytes()
    assert got == twin


def test_tier_b_finds_far_matches():
    data, n = _patterns()[2]          # 38K-offset repeat
    arr = np.frombuffer(data, np.uint8)
    v = T.phase0_words(arr.astype(np.int64))
    so8 = T.phase1b_sorted_candidates(v, n)
    assert (so8[40000:40500] == 38000).sum() > 400


def test_merge_single_ml_ext_byte():
    """Merged matches must never need a second ml-extension byte."""
    data = b"\x00" * P.BLOCK          # worst case: one giant run
    arr = np.frombuffer(data, np.uint8).astype(np.int64)
    comp = T.encode_block(arr, P.BLOCK, W=W)
    assert blockmod.decompress_block(comp, dst_size=P.BLOCK) == data
    # parity merge => 256-byte sequences, ~4.3 bytes each
    assert len(comp) < P.BLOCK // 256 * 6 + 64


def test_mesh_shard_map_plane_pipeline():
    """Drive the plane pipeline (with the tier-B sort) under an
    8-device shard_map and assert bytes equal the single-device run."""
    import os
    if "xla_force_host_platform_device_count" not in os.environ.get(
            "XLA_FLAGS", ""):
        pytest.skip("needs the 8-device CPU mesh from conftest")
    from jax.sharding import PartitionSpec as Ps
    try:
        from jax.experimental.shard_map import shard_map
    except ImportError:
        from jax import shard_map
    from tpu7z.parallel.mesh import make_mesh, DATA_AXIS

    D = min(8, len(jax.devices()))
    mesh = make_mesh(D)
    pats = _patterns()
    blocks = np.zeros((D, P.NROWS, P.ROW), np.int32)
    for d in range(D):
        data, _ = pats[d % len(pats)]
        blocks[d] = np.frombuffer(data, np.uint8).astype(
            np.int32).reshape(P.NROWS, P.ROW)
    ns = np.full((D, 1), P.BLOCK, np.int32)

    def body(blk, n_):
        out, used = P.encode_block_planes(blk[0], n_[0, 0], W=W)
        return out[None], used.reshape(1, 1)

    kw = {}
    try:
        sm = shard_map(body, mesh=mesh,
                       in_specs=(Ps(DATA_AXIS, None, None),
                                 Ps(DATA_AXIS, None)),
                       out_specs=(Ps(DATA_AXIS, None, None),
                                  Ps(DATA_AXIS, None)), **kw)
    except TypeError:
        pytest.skip("shard_map signature mismatch")
    outs, useds = jax.jit(sm)(jnp.asarray(blocks), jnp.asarray(ns))
    outs = np.asarray(outs)
    useds = np.asarray(useds).reshape(D)
    single = jax.jit(lambda b, n: P.encode_block_planes(b, n, W=W))
    for d in range(D):
        o1, u1 = single(jnp.asarray(blocks[d]), jnp.int32(P.BLOCK))
        a = outs[d].reshape(-1)[: useds[d]].astype(np.uint8).tobytes()
        b = (np.asarray(o1).reshape(-1)[: int(u1)]
             .astype(np.uint8).tobytes())
        assert a == b
        raw = blocks[d].reshape(-1).astype(np.uint8).tobytes()
        assert blockmod.decompress_block(a, dst_size=P.BLOCK) == raw
