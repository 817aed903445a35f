#!/usr/bin/env python3
"""Benchmark driver: prints ONE JSON line for the graft driver.

Headline metric: the ON-DEVICE LZ4 encode pipeline (tier-B lax.sort
matcher + six fused Pallas stages) over the full 32 MiB deterministic
mixed corpus, verified bit-exact by round-tripping every block. The
headline `value` is ALWAYS the device tier — never the host C++ tier
(reported separately in detail.host_native_MBps).

vs_baseline: the reference 7zz binary is re-measured IN THE SAME RUN
(`7zz a -mmt=1 -m0=lz4:x1` over the same bytes on this machine,
best-of-3) when a built binary can be found; otherwise the recorded
2026-08-17 local measurement is used and detail.baseline_source says so.

Timing notes (docs/PERFORMANCE.md): the axon remote-TPU platform has a
~27 ms per-dispatch floor and `block_until_ready` does not synchronize,
so every timed iteration ends with a device->host fetch of the
per-block used-bytes vector, and the payload is the full 32 MiB to
amortize the floor. Compilation (~6 min cold for the Mosaic stages) is
done before timing inside the child, with the jax persistent
compilation cache at /tmp/jaxcache so reruns are warm.

The axon dev tunnel / TPU worker can hang or crash; each attempt runs
in an isolated subprocess with a hard timeout, falling back from the
TPU to a host-CPU JAX build of the identical pipeline (smaller slice:
XLA-CPU executes the same math far slower), so the driver always gets a
result line (detail.device_platform records which ran).
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

import numpy as np

# Recorded fallback (BASELINE.md, 2026-08-17, this machine class, full
# 32 MiB corpus) — used ONLY when no reference binary is found in-run.
RECORDED_REF_LZ4_ENC_MBS = 124.2

REF_BINARY_CANDIDATES = (
    os.environ.get("TPU7Z_REF_7ZZ", ""),
    "/tmp/refsrc/CPP/7zip/Bundles/Alone2/_o/7zz",
    "/root/reference/CPP/7zip/Bundles/Alone2/_o/7zz",
)

CORPUS_PATH = "/tmp/tpu7z_bench_corpus.bin"
CORPUS_SIZE = 32 << 20
TPU_MB = 32          # full corpus on the TPU tier
CPU_MB = 2           # XLA-CPU fallback runs the same math ~100x slower
TPU_TIMEOUT = 1800   # cold Mosaic compile of the 6-stage chain is ~6 min
CPU_TIMEOUT = 900
W = int(os.environ.get("TPU7Z_BENCH_W", "0"))  # 0: tier-B4 subsumes tier-A


def get_corpus() -> bytes:
    if (os.path.exists(CORPUS_PATH)
            and os.path.getsize(CORPUS_PATH) == CORPUS_SIZE):
        return open(CORPUS_PATH, "rb").read()
    from tpu7z.utils.corpus import make_corpus
    data = make_corpus(CORPUS_SIZE)
    with open(CORPUS_PATH, "wb") as f:
        f.write(data)
    return data


def measure_reference(data: bytes):
    """Time `7zz a -mmt=1 -m0=lz4:x1` on `data`, best of 3.

    Returns (enc_MBps, comp_size, binary_path) or None if no binary.
    Protocol per /root/reference/README.md:278-293 (single thread).
    """
    binary = next((p for p in REF_BINARY_CANDIDATES
                   if p and os.path.isfile(p) and os.access(p, os.X_OK)),
                  None) or shutil.which("7zz")
    if binary is None:
        return None
    with tempfile.TemporaryDirectory(prefix="tpu7z_refbench_") as td:
        src = os.path.join(td, "corpus.bin")
        with open(src, "wb") as f:
            f.write(data)
        best, csize = None, None
        for _ in range(3):
            arc = os.path.join(td, "out.7z")
            if os.path.exists(arc):
                os.unlink(arc)
            t0 = time.time()
            r = subprocess.run(
                [binary, "a", "-mmt=1", "-m0=lz4:x1", "-bd", arc, src],
                capture_output=True, timeout=600)
            dt = time.time() - t0
            if r.returncode != 0 or not os.path.exists(arc):
                return None
            csize = os.path.getsize(arc)
            mbs = len(data) / dt / 1e6
            best = mbs if best is None else max(best, mbs)
        return best, csize, binary


def _verify_blocks(data, outh, usedh, N):
    """Round-trip every block; returns total compressed bytes."""
    from tpu7z import native
    lib = native._load()
    from tpu7z.models.lz4 import block as blockmod
    import ctypes
    comp_total = 0
    B = len(usedh)
    dst = ctypes.create_string_buffer(N) if lib is not None else None
    for b in range(B):
        comp = outh[b, : usedh[b]].astype(np.uint8).tobytes()
        comp_total += min(len(comp), N + 4)
        orig = data[b * N:(b + 1) * N]
        if lib is not None:
            r = lib.tz_lz4_decode(comp, len(comp), dst, N)
            ok = r == N and dst.raw[:N] == orig
        else:
            ok = blockmod.decompress_block(comp, dst_size=N) == orig
        if not ok:
            raise RuntimeError(f"round-trip mismatch block {b}")
    return comp_total


def child(platform: str) -> int:
    import jax
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    os.makedirs("/tmp/jaxcache", exist_ok=True)
    import jax.numpy as jnp
    from tpu7z.ops import lz4_plane as P

    mb = TPU_MB if platform != "cpu" else CPU_MB
    data = get_corpus()[: mb << 20]
    N = P.BLOCK
    B = len(data) // N
    blocks = jnp.asarray(
        np.frombuffer(data[: B * N], dtype=np.uint8).reshape(B, N))
    blocks = jax.device_put(blocks)
    ns = jnp.full((B,), N, jnp.int32)

    if platform == "cpu":
        # identical math, XLA-CPU build (Mosaic kernels are TPU-only;
        # interpret mode is ~1000x slower, so use the plane pipeline)
        planes = blocks.reshape(B, P.NROWS, P.ROW).astype(jnp.int32)

        @jax.jit
        def encode(planes, ns):
            f = lambda args: P.encode_block_planes(  # noqa: E731
                args[0], args[1], W=W)
            outs, useds = jax.lax.map(f, (planes, ns))
            return outs.reshape(B, -1), useds

        run = lambda: encode(planes, ns)  # noqa: E731
    else:
        from tpu7z.ops import lz4_pallas
        run = lambda: lz4_pallas.encode_blocks(blocks, ns, W=W)  # noqa

    sys.stderr.write(f"[child {platform}] compiling B={B} W={W}\n")
    t0 = time.time()
    out, used = run()
    _ = np.asarray(used)  # compile + settle
    sys.stderr.write(f"[child {platform}] compiled in "
                     f"{time.time()-t0:.0f}s\n")

    best = 1e9
    for _i in range(3):
        t0 = time.time()
        out, used = run()
        usedh = np.asarray(used)  # forced device->host sync
        best = min(best, time.time() - t0)
    enc_mbs = B * N / best / 1e6

    # verification pass (untimed): every block must round-trip
    outh = np.asarray(out)
    comp_total = _verify_blocks(data, outh, usedh, N)
    print(json.dumps({
        "enc_mbs": enc_mbs, "comp_total": comp_total, "bench_mb": mb,
        "device": str(jax.devices()[0])}))
    return 0


def bench_host_native(data: bytes):
    """Host-native C++ LZ4 encoder (tpu7z/native) — the CPU tier of the
    framework, reported in detail only (never the headline)."""
    import ctypes
    from tpu7z import native
    from tpu7z.models.lz4 import block as blockmod
    lib = native._load()
    if lib is None:
        return None
    cap = len(data) + len(data) // 255 + 64
    buf = ctypes.create_string_buffer(cap)
    t0 = time.time()
    r = lib.tz_lz4_encode(data, len(data), buf, cap)
    dt = time.time() - t0
    if r <= 0:
        return None
    if blockmod.decompress_block(buf.raw[:r], dst_size=len(data)) != data:
        return None
    return len(data) / dt / 1e6, len(data) / r


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        return child(sys.argv[2])

    corpus = get_corpus()  # ensure cached before timed children run
    data_len = TPU_MB << 20

    ref = None
    try:
        ref = measure_reference(corpus[:data_len])
    except Exception as e:  # noqa
        sys.stderr.write(f"reference measurement failed: {e}\n")
    if ref is not None:
        ref_mbs, ref_csize, ref_bin = ref
        baseline_source = f"measured in-run: {ref_bin}"
    else:
        ref_mbs, ref_csize, ref_bin = RECORDED_REF_LZ4_ENC_MBS, None, None
        baseline_source = "recorded 2026-08-17 (no 7zz binary found in-run)"

    result = None
    platform = None
    for plat, timeout in (("tpu", TPU_TIMEOUT), ("cpu", CPU_TIMEOUT)):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", plat],
                capture_output=True, timeout=timeout,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            if r.returncode == 0 and r.stdout.strip():
                result = json.loads(r.stdout.decode().strip().splitlines()[-1])
                platform = plat
                break
            sys.stderr.write(f"{plat} child failed rc={r.returncode}: "
                             f"{r.stderr.decode()[-300:]}\n")
        except subprocess.TimeoutExpired:
            sys.stderr.write(f"{plat} child timed out after {timeout}s\n")
        except Exception as e:  # noqa
            sys.stderr.write(f"{plat} child error: {e}\n")

    host = None
    try:
        host = bench_host_native(corpus[:data_len])
    except Exception as e:  # noqa
        sys.stderr.write(f"host-native tier failed: {e}\n")

    if result is None:
        print(json.dumps({
            "metric": "lz4_encode_MBps_per_chip", "value": 0,
            "unit": "MB/s", "vs_baseline": 0,
            "error": "all device bench platforms failed",
            "detail": {
                "ref_MBps_same_run": round(ref_mbs, 1),
                "baseline_source": baseline_source,
                "host_native_MBps": round(host[0], 1) if host else None,
            }}))
        return 0

    enc_mbs = result["enc_mbs"]
    bench_bytes = result["bench_mb"] << 20
    print(json.dumps({
        "metric": "lz4_encode_MBps_per_chip",
        "value": round(enc_mbs, 1),
        "unit": "MB/s",
        "vs_baseline": round(enc_mbs / ref_mbs, 3),
        "detail": {
            "corpus_MB": result["bench_mb"],
            "headline_tier": "tpu" if platform == "tpu" else "cpu-fallback",
            "verified": "all blocks bit-exact round-trip",
            "device_MBps": round(enc_mbs, 1),
            "device_ratio": round(bench_bytes / result["comp_total"], 3),
            "device_platform": "tpu-axon" if platform == "tpu"
            else "cpu-fallback",
            "device": result["device"],
            "matcher_W": W,
            "timing": "forced device->host fetch per iteration; "
                      "32MB payload amortizes the ~27ms dispatch floor",
            "ref_MBps_same_run": round(ref_mbs, 1),
            "ref_csize": ref_csize,
            "ref_ratio": (round(data_len / ref_csize, 3)
                          if ref_csize else None),
            "baseline_source": baseline_source,
            "host_native_MBps": round(host[0], 1) if host else None,
            "host_native_ratio": round(host[1], 3) if host else None,
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
