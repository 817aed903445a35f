"""zstdmt-style overlap-prefix sharded encode (one frame, N jobs).

Behavioral reference: C/zstd/zstdmt_compress.c:693-760. Properties
mirrored from the reference's -mmt matrices (tests/main.test:79-92):
bytes identical across worker counts, decodes everywhere, size close to
the single-job encode.
"""

import os
import subprocess

import pytest

from tpu7z import native
from tpu7z.models.zstd import frame
from tpu7z.parallel import zstd_jobs

REF = "/tmp/refsrc/CPP/7zip/Bundles/Alone2/_o/7zz"


@pytest.fixture(scope="module")
def blob(corpus):
    return (corpus["text"] + corpus["struct"] + corpus["random"]
            + corpus["sparse"] + corpus["repeat"]) * 2


def test_worker_count_invariance(blob):
    if native._load() is None:
        pytest.skip("native library unavailable")
    outs = [zstd_jobs.compress_sharded(blob, level=3, workers=w,
                                       job_size=256 << 10,
                                       overlap=128 << 10)
            for w in (1, 2, 4, 8)]
    assert all(o == outs[0] for o in outs)
    assert frame.decompress(outs[0]) == blob


def test_size_close_to_single_job(corpus):
    # non-duplicated data: overlap-prefix jobs lose almost nothing vs a
    # single job (duplication beyond the overlap reach is the one case
    # where jobs lose long-range matches, exactly like the reference's
    # zstdmt with small job sizes)
    if native._load() is None:
        pytest.skip("native library unavailable")
    data = corpus["text"] + corpus["struct"] + corpus["random"] + corpus["sparse"]
    sharded = zstd_jobs.compress_sharded(data, level=3, workers=4,
                                         job_size=128 << 10,
                                         overlap=64 << 10)
    single = native.zstd_encode(data, level=3)
    assert len(sharded) <= len(single) * 1.01


def test_frame_compress_threads_param(blob):
    out = frame.compress(blob, level=3, threads=4)
    assert frame.decompress(out) == blob


@pytest.mark.skipif(not os.path.exists(REF), reason="no reference binary")
def test_reference_decodes_sharded_frame(tmp_path, blob):
    if native._load() is None:
        pytest.skip("native library unavailable")
    arc = tmp_path / "s.zst"
    arc.write_bytes(zstd_jobs.compress_sharded(blob, level=19, workers=4,
                                               job_size=256 << 10,
                                               overlap=128 << 10))
    r = subprocess.run([REF, "e", "-so", "-tzstd", str(arc)],
                       capture_output=True)
    assert r.returncode == 0 and r.stdout == blob
