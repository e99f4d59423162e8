"""Wire-format pins for the vendored minimal protobuf runtime
(``gmall_flink_parent_spark/vendor/``): hand-computed proto3 byte
sequences per the public encoding spec, plus the message semantics the
transformWithState state-server client depends on. Loaded by file path
so the pins hold even in environments where the REAL protobuf package
is installed (there the vendor never activates at runtime, but its
bytes must stay correct for the environments where it does)."""

from __future__ import annotations

import importlib.util
import os

import pytest

_VENDOR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "gmall_flink_parent_spark",
    "vendor",
    "google",
    "protobuf",
)


def _load(name: str, fname: str):
    spec = importlib.util.spec_from_file_location(name, os.path.join(_VENDOR, fname))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


mini = _load("vendor_mini", "_mini.py")


def _mk(name, fields, oneofs=()):
    """Build a message class from (name, number, type, repeated, oneof)."""
    specs = {
        f[0]: mini.FieldSpec(f[0], f[1], f[2], f[3] if len(f) > 3 else False,
                             f[4] if len(f) > 4 else None, "")
        for f in fields
    }
    return type(
        name,
        (mini.MiniMessage,),
        {
            "_FIELDS": specs,
            "_BY_NUM": {s.number: s for s in specs.values()},
            "_ONEOF_NAMES": list(oneofs),
        },
    )


def test_varint_scalar_wire_bytes():
    # field 1 int32 = 150 → tag 0x08, varint 0x96 0x01 (the spec's
    # canonical example)
    M = _mk("M", [("a", 1, mini.TYPE_INT32)])
    assert M(a=150).SerializeToString() == b"\x08\x96\x01"
    m = M()
    m.ParseFromString(b"\x08\x96\x01")
    assert m.a == 150


def test_negative_int64_is_ten_byte_twos_complement():
    M = _mk("M", [("a", 1, mini.TYPE_INT64)])
    raw = M(a=-2).SerializeToString()
    # -2 → 0xFFFF...FE as 64-bit → varint FE FF FF FF FF FF FF FF FF 01
    assert raw == b"\x08" + b"\xfe" + b"\xff" * 8 + b"\x01"
    m = M()
    m.ParseFromString(raw)
    assert m.a == -2


def test_string_and_bytes_wire_bytes():
    M = _mk("M", [("s", 2, mini.TYPE_STRING), ("b", 3, mini.TYPE_BYTES)])
    assert M(s="testing").SerializeToString() == b"\x12\x07testing"
    assert M(b=b"\x00\x01").SerializeToString() == b"\x1a\x02\x00\x01"
    m = M()
    m.ParseFromString(b"\x12\x07testing\x1a\x02\x00\x01")
    assert m.s == "testing" and m.b == b"\x00\x01"


def test_default_scalars_not_serialized_but_oneof_members_are():
    M = _mk(
        "M",
        [("a", 1, mini.TYPE_INT32), ("x", 2, mini.TYPE_INT32, False, 0)],
        oneofs=["method"],
    )
    assert M(a=0).SerializeToString() == b""  # implicit presence
    assert M(x=0).SerializeToString() == b"\x10\x00"  # oneof: explicit


def test_oneof_set_clears_siblings():
    M = _mk(
        "M",
        [("x", 1, mini.TYPE_INT32, False, 0), ("y", 2, mini.TYPE_INT32, False, 0)],
        oneofs=["method"],
    )
    m = M(x=5)
    m.y = 7
    assert m.SerializeToString() == b"\x10\x07"  # only y survives


def test_submessage_presence_on_write_only():
    Inner = _mk("Inner", [("durationMs", 1, mini.TYPE_INT64)])
    outer_fields = {
        "ttl": mini.FieldSpec("ttl", 4, mini.TYPE_MESSAGE, False, None, ""),
        "name": mini.FieldSpec("name", 1, mini.TYPE_STRING, False, None, ""),
    }
    outer_fields["ttl"].msg_cls = Inner
    Outer = type(
        "Outer",
        (mini.MiniMessage,),
        {
            "_FIELDS": outer_fields,
            "_BY_NUM": {s.number: s for s in outer_fields.values()},
            "_ONEOF_NAMES": [],
        },
    )
    m = Outer(name="x")
    _ = m.ttl.durationMs  # READ does not create presence
    assert m.SerializeToString() == b"\x0a\x01x"
    m.ttl.durationMs = 300  # WRITE through the auto-vivified child does
    raw = m.SerializeToString()
    assert raw == b"\x0a\x01x" + b"\x22\x03\x08\xac\x02"
    back = Outer()
    back.ParseFromString(raw)
    assert back.HasField("ttl") and back.ttl.durationMs == 300


def test_none_kwarg_means_unset():
    M = _mk("M", [("a", 1, mini.TYPE_INT64)])
    assert M(a=None).SerializeToString() == b""


def test_repeated_message_and_bytes_roundtrip():
    Item = _mk("Item", [("v", 1, mini.TYPE_BYTES)])
    fields = {
        "items": mini.FieldSpec("items", 1, mini.TYPE_MESSAGE, True, None, ""),
        "blobs": mini.FieldSpec("blobs", 2, mini.TYPE_BYTES, True, None, ""),
    }
    fields["items"].msg_cls = Item
    M = type(
        "M",
        (mini.MiniMessage,),
        {"_FIELDS": fields, "_BY_NUM": {s.number: s for s in fields.values()},
         "_ONEOF_NAMES": []},
    )
    raw = M(items=[Item(v=b"a"), Item(v=b"bc")], blobs=[b"x", b"y"]).SerializeToString()
    back = M()
    back.ParseFromString(raw)
    assert [i.v for i in back.items] == [b"a", b"bc"]
    assert list(back.blobs) == [b"x", b"y"]


def test_unknown_fields_skipped_by_wire_type():
    M = _mk("M", [("a", 1, mini.TYPE_INT32)])
    # unknown field 9 varint, unknown field 10 LEN, then known field 1
    raw = b"\x48\x07" + b"\x52\x03abc" + b"\x08\x2a"
    m = M()
    m.ParseFromString(raw)
    assert m.a == 42


def test_packed_repeated_varints_parse():
    M = _mk("M", [("xs", 4, mini.TYPE_INT32, True)])
    m = M()
    m.ParseFromString(b"\x22\x03\x01\x96\x01")  # [1, 150] packed
    assert list(m.xs) == [1, 150]


def test_file_descriptor_parser_against_pysparks_blob():
    """Parse the REAL serialized FileDescriptorProto embedded in
    PySpark's generated StateMessage_pb2 and pin the schema facts the
    client relies on."""
    import re

    pb2_src = None
    try:
        import zipfile

        for zpath in (
            "/opt/spark/python/lib/pyspark.zip",
        ):
            if os.path.exists(zpath):
                with zipfile.ZipFile(zpath) as z:
                    pb2_src = z.read(
                        "pyspark/sql/streaming/proto/StateMessage_pb2.py"
                    ).decode()
                break
    except Exception:
        pb2_src = None
    if pb2_src is None:
        try:
            import pyspark.sql.streaming.proto.StateMessage_pb2 as pb2mod

            pb2_src = open(pb2mod.__file__).read()
        except Exception:
            pytest.skip("StateMessage_pb2 source not locatable")
    m = re.search(r"AddSerializedFile\(\s*(b['\"].*?['\"])\s*\)", pb2_src, re.S)
    assert m, "serialized descriptor not found in pb2 source"
    blob = eval(m.group(1))  # noqa: S307 — a bytes literal from the installed pyspark
    package, messages, enums = mini.parse_file_descriptor(blob)
    assert package == "org.apache.spark.sql.execution.streaming.state"
    byname = {ms.name: ms for ms in messages}
    req = byname["StateRequest"]
    fieldnums = {f.name: f.number for f in req.fields}
    assert fieldnums["version"] == 1
    assert fieldnums["statefulProcessorCall"] == 2
    assert fieldnums["timerRequest"] == 5
    scc = byname["StateCallCommand"]
    ttl = {f.name: f for f in scc.fields}["ttl"]
    assert ttl.type == mini.TYPE_MESSAGE and ttl.type_name.endswith(".TTLConfig")
    resp = byname["StateResponseWithListGet"]
    val = {f.name: f for f in resp.fields}["value"]
    assert val.type == mini.TYPE_BYTES and val.repeated
    handle = {e.name: e for e in enums}["HandleState"]
    assert dict(handle.values)["PRE_INIT"] == 0 and dict(handle.values)["CLOSED"] == 5


def test_vendored_google_does_not_shadow_sibling_namespace_portions(tmp_path):
    """Round-13 advisor finding: the vendored ``google`` used to be a
    plain regular package, so once vendor/ joined sys.path it won over
    every OTHER PEP 420 ``google.*`` namespace portion (google-auth,
    google-cloud-*, ...) — fresh imports of unrelated google
    distributions failed process-wide. The fix makes vendor/google
    namespace-extending via ``pkgutil.extend_path``. Reproduce the
    advisor's case in a clean subprocess: a sibling ``google.fakelib``
    namespace portion must stay importable after the package exposes
    the vendored protobuf, and the vendored protobuf itself must still
    resolve."""
    import subprocess
    import sys

    portion = tmp_path / "portion" / "google" / "fakelib"
    portion.mkdir(parents=True)
    (portion / "__init__.py").write_text("MARK = 'sibling-portion'\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import sys;"
        f"sys.path.insert(0, {str(tmp_path / 'portion')!r});"
        f"sys.path.insert(0, {repo!r});"
        "import gmall_flink_parent_spark;"
        "from google.protobuf import descriptor;"  # vendored (or real) runtime
        "import google.fakelib;"
        "assert google.fakelib.MARK == 'sibling-portion';"
        "print('OK')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=120
    )
    assert out.returncode == 0, out.stderr
    assert "OK" in out.stdout
