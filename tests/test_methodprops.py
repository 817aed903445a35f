"""Method-property parsing (MethodProps.cpp analog).

The -mmt cases mirror the reference's switch matrix
(tests/main.test:79-92) and the ParseMtProp grammar
(CPP/7zip/Common/MethodProps.cpp:113-192).
"""

import pytest

from tpu7z.utils.errors import TpuzError
from tpu7z.utils.methodprops import parse_method_spec, parse_mt, parse_size


def test_method_spec_full():
    name, props = parse_method_spec("zstd:x22:wlog=27:long")
    assert name == "zstd"
    assert props == {"x": 22, "wlog": 27, "long": True}


def test_method_spec_shorthand():
    name, props = parse_method_spec("lzma2:d24:a1")
    assert name == "lzma2"
    assert props == {"d": 24, "a": 1}


def test_method_spec_values():
    _, props = parse_method_spec("zstd:ldm=on:chk=off:strat=btopt")
    assert props == {"ldm": True, "chk": False, "strat": "btopt"}


def test_size_log_and_units():
    assert parse_size("24") == 1 << 24
    assert parse_size("64k") == 64 << 10
    assert parse_size("16m") == 16 << 20
    assert parse_size("1g") == 1 << 30
    assert parse_size("123b") == 123
    with pytest.raises(TpuzError):
        parse_size("64")  # log >= 64 is invalid
    with pytest.raises(TpuzError):
        parse_size("12q")


@pytest.mark.parametrize("spec,cpus,expect", [
    ("on", 8, 8),
    ("off", 8, 0),
    ("1", 8, 1),
    ("2", 8, 2),
    ("16", 8, 8),        # capped at cpu count
    ("d2", 8, 6),        # force down by 2
    ("d", 8, 7),         # bare d = down 1
    ("u", 8, 8),         # bare u = up 1, capped
    ("p25", 8, 2),       # 25 percent
    ("p25u1", 8, 3),     # 25% then up 1
    ("p1+1", 8, 1),      # 8*1//100=0 -> floor 1... then +1 -> see below
    ("-", 8, 0),         # trailing - = off
    ("+", 8, 8),         # trailing + = on
    ("4u2", 8, 6),       # absolute then up
])
def test_mt_grammar(spec, cpus, expect):
    got = parse_mt(spec, cpus)
    if spec == "p1+1":
        # 8*1//100 = 0, then +1 => 1
        assert got == 1
    else:
        assert got == expect


def test_mt_none_and_bool():
    assert parse_mt(None, 4) == 4
    assert parse_mt(True, 4) == 4
    assert parse_mt(False, 4) == 0
    assert parse_mt(3, 4) == 3


def test_mt_invalid():
    with pytest.raises(TpuzError):
        parse_mt("zzz", 8)
