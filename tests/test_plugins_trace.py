"""Plugin loading (LoadCodecs.cpp analog) and tracing (zstd_trace.h
analog) tests."""

import os
import textwrap

import pytest

from tpu7z.models.registry import CODECS, get_codec
from tpu7z.utils import plugins, trace
from tpu7z.utils.errors import TpuzError


def _write_plugin(d, name="myplug.py", codec="revcodec"):
    p = d / name
    p.write_text(textwrap.dedent(f"""
        def _c(data, level=5, **kw):
            return bytes(reversed(data))
        def _d(data, **kw):
            return bytes(reversed(data))
        TPU7Z_CODECS = [{{"name": "{codec}", "method_id": 0x7F0001,
                          "compress": _c, "decompress": _d,
                          "levels": (1, 1)}}]
    """))
    return str(p)


def test_plugin_loads_and_registers(tmp_path):
    path = _write_plugin(tmp_path)
    try:
        names = plugins.load_plugin_file(path)
        assert names == ["revcodec"]
        c = get_codec("revcodec")
        assert c.decompress(c.compress(b"abc")) == b"abc"
    finally:
        CODECS.pop("revcodec", None)


def test_plugin_dir_scan(tmp_path):
    _write_plugin(tmp_path, "one.py", "plugscan")
    (tmp_path / "broken.py").write_text("raise RuntimeError('boom')")
    try:
        result = plugins.load_plugins([str(tmp_path)])
        ok = [v for v in result.values() if isinstance(v, list)]
        bad = [v for v in result.values() if isinstance(v, str)]
        assert ok == [["plugscan"]]
        assert len(bad) == 1 and "boom" in bad[0]
    finally:
        CODECS.pop("plugscan", None)


def test_plugin_rejects_duplicate(tmp_path):
    path = _write_plugin(tmp_path, codec="zstd")  # collides
    with pytest.raises(TpuzError):
        plugins.load_plugin_file(path)


def test_trace_span_records():
    trace.attach(keep_records=True)
    try:
        with trace.span("unit.test", size=1000):
            pass
        recs = trace.records()
        assert recs and recs[-1]["name"] == "unit.test"
        assert "seconds" in recs[-1] and "MBps" in recs[-1]
    finally:
        trace.detach()
        trace.clear()


def test_trace_codec_integration():
    from tpu7z.models.zstd import frame
    events = []
    trace.attach(events.append)
    try:
        data = b"payload " * 500
        frame.decompress(frame.compress(data, level=1))
        names = {e["name"] for e in events}
        assert {"zstd.compress", "zstd.decompress"} <= names
    finally:
        trace.detach()


def test_trace_disabled_is_noop():
    assert not trace.enabled() or os.environ.get("TPU7Z_TRACE")
    with trace.span("never.recorded"):
        pass
    assert not trace.records()
