#!/usr/bin/env python3
"""Benchmark driver: prints ONE JSON line for the graft driver.

Measures the full on-device LZ4 encode pipeline (batched match finding +
greedy parse + token emission — compressed bytes are produced in HBM) on
the deterministic mixed corpus, then pulls the outputs once and verifies
bit-exact round-trip of every block.

vs_baseline compares against the reference 7zz single-core lz4:x1 encode
MB/s measured on this machine over the same corpus (BASELINE.md,
"Measured local baseline"). Note: this dev environment reaches the TPU
over a ~12 MB/s relay tunnel, so host<->device staging is excluded from
the steady-state rate (data-resident model, as in production where the
chip is fed over PCIe/ICI); staging time is reported in detail.
"""

import json
import os
import sys
import time

import numpy as np

REF_LZ4_ENC_MBS = 124.2  # 7zz -mmt=1 -m0=lz4:x1, same corpus, this host

CORPUS_PATH = "/tmp/tpu7z_bench_corpus.bin"
CORPUS_SIZE = 32 << 20
BENCH_MB = 16  # staged subset (tunnel-limited staging)


def get_corpus() -> bytes:
    if (os.path.exists(CORPUS_PATH)
            and os.path.getsize(CORPUS_PATH) == CORPUS_SIZE):
        return open(CORPUS_PATH, "rb").read()
    from tpu7z.utils.corpus import make_corpus
    data = make_corpus(CORPUS_SIZE)
    with open(CORPUS_PATH, "wb") as f:
        f.write(data)
    return data


def main():
    import jax
    import jax.numpy as jnp
    from tpu7z.ops import lz4_emit_jax, match_jax
    from tpu7z.models.lz4 import block as blockmod

    data = get_corpus()[: BENCH_MB << 20]
    N = 1 << 16
    B = 16  # 1 MiB per batch
    BUF = lz4_emit_jax.buf_size(N)
    nbatches = len(data) // (B * N)
    lengths = jnp.asarray(np.full(B, N, np.int32))

    @jax.jit
    def encode(blocks, lengths):
        sel, ml, mo = match_jax.find_matches(blocks, lengths)
        return lz4_emit_jax.emit_blocks(blocks, lengths, sel, ml, mo, N=N)

    # stage input on device (one-time; tunnel-limited in this dev env)
    t_stage0 = time.time()
    staged = []
    for i in range(nbatches):
        chunk = np.frombuffer(data[i * B * N:(i + 1) * B * N],
                              dtype=np.uint8).reshape(B, N)
        staged.append(jax.device_put(jnp.asarray(chunk)))
    jax.block_until_ready(staged)
    t_stage = time.time() - t_stage0

    # compile
    out, used = encode(staged[0], lengths)
    jax.block_until_ready((out, used))

    # steady-state device throughput
    t0 = time.time()
    results = []
    for i in range(nbatches):
        results.append(encode(staged[i], lengths))
    jax.block_until_ready(results)
    dt = time.time() - t0
    enc_mbs = len(data) / dt / 1e6

    # pull outputs once; verify every block round-trips bit-exactly
    comp_total = 0
    ok = True
    for i in range(nbatches):
        outf = np.asarray(results[i][0])
        usedh = np.asarray(results[i][1])
        for b in range(B):
            comp = outf[b * BUF:b * BUF + usedh[b]].tobytes()
            comp_total += min(len(comp), N + 4)
            orig = data[(i * B + b) * N:(i * B + b + 1) * N]
            if blockmod.decompress_block(comp, dst_size=N) != orig:
                ok = False
    if not ok:
        print(json.dumps({"metric": "lz4_encode_MBps_per_chip", "value": 0,
                          "unit": "MB/s", "vs_baseline": 0,
                          "error": "round-trip mismatch"}))
        return 1

    result = {
        "metric": "lz4_encode_MBps_per_chip",
        "value": round(enc_mbs, 1),
        "unit": "MB/s",
        "vs_baseline": round(enc_mbs / REF_LZ4_ENC_MBS, 3),
        "detail": {
            "corpus_MB": len(data) / 1e6,
            "ratio": round(len(data) / comp_total, 3),
            "stage_seconds": round(t_stage, 1),
            "device": str(jax.devices()[0]),
            "verified": "all blocks bit-exact round-trip",
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
