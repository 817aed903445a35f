"""Block-parallel decode driver tests (MtDec analog, C/MtDec.c): the
speculative span scan must find boundaries without decoding, worker
counts must not change output bytes, and corrupt spans must fail loudly.
"""

import numpy as np
import pytest

from tpu7z.models.lz4 import frame as lz4f
from tpu7z.models.lzma import lzma2 as l2
from tpu7z.models.zstd import frame as zf
from tpu7z.parallel import decode as pd
from tpu7z.utils.errors import CorruptError


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(11)
    words = [b"alpha ", b"beta ", b"gamma ", b"delta ", b"mtdec "]
    text = b"".join(words[i] for i in rng.integers(0, 5, 60000))
    noise = rng.integers(0, 256, 40000, np.uint8).tobytes()
    return text + noise + text[:50000]


class TestZstdFrames:
    def test_scan_matches_frames(self, corpus):
        step = len(corpus) // 3 + 1
        frames = [zf.compress(corpus[i:i + step], level=3)
                  for i in range(0, len(corpus), step)]
        blob = b"".join(frames)
        spans = pd.scan_zstd_frames(blob)
        assert [s for _, s in spans] == [len(f) for f in frames]

    def test_scan_skippable_and_checksumless(self, corpus):
        skip = (0x184D2A50).to_bytes(4, "little") + (8).to_bytes(
            4, "little") + b"12345678"
        blob = skip + zf.compress(corpus[:1000], level=1) + skip
        spans = pd.scan_zstd_frames(blob)
        assert len(spans) == 3 and spans[0][1] == 16 and spans[2][1] == 16

    @pytest.mark.parametrize("threads", [1, 2, 4])
    def test_worker_invariance(self, corpus, threads):
        step = len(corpus) // 4 + 1
        blob = b"".join(zf.compress(corpus[i:i + step], level=3)
                        for i in range(0, len(corpus), step))
        assert pd.decompress_zstd(blob, threads=threads) == corpus

    def test_corrupt_span_raises(self, corpus):
        blob = zf.compress(corpus, level=3) * 2
        bad = bytearray(blob)
        bad[len(blob) // 2] ^= 0xFF
        with pytest.raises(Exception):
            pd.decompress_zstd(bytes(bad), threads=2)

    def test_truncated_raises(self, corpus):
        blob = zf.compress(corpus, level=3)
        with pytest.raises(CorruptError):
            pd.scan_zstd_frames(blob[:len(blob) // 2])


class TestLz4Blocks:
    @pytest.mark.parametrize("threads", [1, 2, 4])
    def test_block_parallel(self, corpus, threads):
        c = lz4f.compress_frame(corpus, block_size=1 << 16,
                                block_independence=True)
        assert pd.decompress_lz4(c, threads=threads) == corpus

    def test_linked_falls_back_serial(self, corpus):
        c = lz4f.compress_frame(corpus, block_size=1 << 16,
                                block_independence=False)
        assert pd.decompress_lz4(c, threads=4) == corpus

    def test_content_checksum_enforced(self, corpus):
        c = bytearray(lz4f.compress_frame(corpus, block_size=1 << 16,
                                          block_independence=True))
        c[-1] ^= 0xFF  # content checksum trailer
        with pytest.raises(CorruptError):
            pd.decompress_lz4(bytes(c), threads=2)


class TestLzma2Groups:
    def test_group_scan_and_parallel(self, corpus):
        step = len(corpus) // 4 + 1
        streams = [l2.compress(corpus[i:i + step])
                   for i in range(0, len(corpus), step)]
        multi = b"".join(s[:-1] for s in streams) + b"\x00"
        groups = pd.scan_lzma2_groups(multi)
        assert len(groups) >= len(streams)
        for threads in (1, 2, 4):
            assert pd.decompress_lzma2(multi, threads=threads) == corpus
        # serial reference decoder agrees
        assert l2.decompress(multi) == corpus

    def test_single_group_passthrough(self, corpus):
        c = l2.compress(corpus[:30000])
        assert pd.decompress_lzma2(c, threads=4) == corpus[:30000]


def test_parallel_zstd_measured_speedup():
    """With the native tier (ctypes drops the GIL), 2 workers must
    actually beat 1 on a multi-frame stream — guards the claim in the
    module docstring instead of assuming it (threshold is lenient for
    noisy CI boxes; skipped when the native library is absent)."""
    import time

    from tpu7z import native
    from tpu7z.models.zstd import frame as zf
    from tpu7z.parallel import decode as pdec

    if native._load() is None:
        pytest.skip("native library not built")
    import os
    if os.cpu_count() < 2 or os.getloadavg()[0] > 1.5:
        pytest.skip("needs an idle second core for a meaningful "
                    "speedup measurement")
    # compute-bound frames: level-19 text decodes at a few hundred
    # MB/s/core (sequence-execution bound), far from the memory-bus
    # ceiling, so a second worker shows real scaling. (Level-1/3 frames
    # decode near memcpy speed and saturate a 2-core memory bus alone.)
    words = [b"alpha", b"beta", b"gamma", b"delta", b"epsilon", b"zeta"]
    rng = np.random.default_rng(5)
    piece = b" ".join(words[i] for i in rng.integers(0, 6, 400000))
    frames = [zf.compress(piece, level=19) for _ in range(6)]
    blob = b"".join(frames)

    def best(threads, iters=5):
        b = 1e9
        for _ in range(iters):
            t0 = time.perf_counter()
            out = pdec.decompress_zstd(blob, threads=threads)
            b = min(b, time.perf_counter() - t0)
        assert out == piece * 6
        return b

    t1 = best(1)
    t2 = best(2)
    # require a real (if modest) win; flaky-noise guard at 1.15x
    assert t2 < t1 / 1.15, (t1, t2)
