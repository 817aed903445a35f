"""Decode the reference repo's committed golden regression archives
(tests/regr-arc/ — the reference's own cross-version stability suite,
tests/regression.test) and verify the pinned content hashes."""

import hashlib
import os

import pytest

from tpu7z.containers.sevenzip import SevenZipReader
from tpu7z.models import brotli
from tpu7z.models.zstd import frame as zframe

DIR = "/root/reference/tests/regr-arc/"
TEST_TXT_SHA = "aeda0f81c8376d1678af53927a08cf641cafab8b68aef509c881eb0be0bc3c97"
PWD = "very-secret-pwd"

pytestmark = pytest.mark.skipif(not os.path.isdir(DIR),
                                reason="reference fixtures not mounted")


def sha(b):
    return hashlib.sha256(b).hexdigest()


@pytest.mark.parametrize("name", ["test.txt.7z", "test.txt.br.7z",
                                  "test.txt.zstd.7z"])
def test_single_file_7z_fixtures(name):
    out = SevenZipReader(open(DIR + name, "rb").read()).extract_all()
    assert sha(out["test.txt"]) == TEST_TXT_SHA


@pytest.mark.parametrize("name", ["test.txt.zstd"])
def test_zstd_stream_fixture(name):
    data = zframe.decompress(open(DIR + name, "rb").read())
    assert sha(data) == TEST_TXT_SHA


@pytest.mark.parametrize("name", ["test.txt.br", "test.txt.br-mt.br"])
def test_brotli_stream_fixtures(name):
    data = brotli.decompress_mt_container(open(DIR + name, "rb").read())
    assert sha(data) == TEST_TXT_SHA


@pytest.mark.parametrize("name", ["test-sol.7z", "test-sol.br.7z",
                                  "test-sol.zstd.7z",
                                  "test-sol.zstd.max.7z"])
def test_solid_fixtures(name):
    out = SevenZipReader(open(DIR + name, "rb").read()).extract_all()
    assert sha(out["test.txt"]) == TEST_TXT_SHA
    assert len(out["tesx.txt"]) == 100000


def test_encrypted_solid_fixture():
    """AES-encrypted archive (incl. encrypted folder chain) created by an
    older reference version."""
    out = SevenZipReader(open(DIR + "xenc-pwd-sol.zstd.7z", "rb").read(),
                         password=PWD).extract_all()
    ref = SevenZipReader(
        open(DIR + "test-sol.zstd.7z", "rb").read()).extract_all()
    assert out == ref
