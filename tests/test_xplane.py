"""utils/xplane.py — the stdlib XSpace (.xplane.pb) decoder.

Two evidence sources:
  * tests/fixtures/probe_tpu.xplane.pb — a REAL v5e capture (18 KB) of a
    2-matmul jit with stage_lm / stage_vocode named scopes, taken on the
    driver's TPU chip.  This pins the decoder against the actual bytes the
    real profiler emits (field order, interned stats, wrapper nesting).
  * hand-encoded synthetic XSpace bytes — exercises wire-format corners the
    fixture may not contain (multi-byte varints, ref_value interning,
    unknown fixed32/fixed64 fields, host-plane skipping, wrapper filtering).

CPU captures carry no per-op metadata at all (XLA:CPU thunks don't record
tf_op), so stage attribution is a TPU-trace feature; bench runs on the real
chip where the xplane decoder is the only working source (the trace-viewer
JSON there is truncated and tf_op-less — the r3 finding this module fixes).
"""

import gzip
import json
import os

import pytest

from vibevoice_tpu.utils import xplane
from vibevoice_tpu.utils.profile_report import aggregate_stages, aggregate_trace

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "probe_tpu.xplane.pb")


# ------------------------------------------------------- real-TPU fixture


def test_fixture_stage_totals():
    st = xplane.stage_totals(FIXTURE, ("stage_lm", "stage_vocode",
                                       "stage_diffusion"))
    assert st["stage_lm"] > 0
    assert st["stage_vocode"] > 0
    assert st["stage_diffusion"] == 0.0          # scope absent from the probe
    parts = st["stage_lm"] + st["stage_vocode"] + st["other"]
    assert st["total"] == pytest.approx(parts, rel=1e-9)


def test_fixture_op_rows():
    rows = xplane.op_rows(FIXTURE)
    assert rows, "no leaf ops decoded from the device plane"
    assert rows == sorted(rows, key=lambda r: -r["total_ms"])
    for r in rows:
        assert r["count"] >= 1
        assert r["mean_us"] == pytest.approx(
            r["total_ms"] * 1e3 / r["count"], rel=1e-9)
    # the probe's two matmul stages must be visible in the examples
    blob = " ".join(r["example"] for r in rows)
    assert "stage_lm" in blob and "stage_vocode" in blob


def test_fixture_device_plane_detection():
    planes = xplane.parse_device_planes(FIXTURE)
    names = [p.name for p in planes]
    assert any(n.startswith("/device:TPU") for n in names)
    assert all("/host" not in n for n in names)
    tpu = next(p for p in planes if p.name.startswith("/device:TPU"))
    assert any(ln.name == xplane.OP_TIMELINE for ln in tpu.lines)


def test_fixture_matches_tf_parser():
    """Ground-truth cross-check against tensorflow's generated proto code
    (present in this image; skipped wherever it isn't)."""
    tf_pb2 = pytest.importorskip("tensorflow.tsl.profiler.protobuf.xplane_pb2")
    sp = tf_pb2.XSpace()
    sp.ParseFromString(open(FIXTURE, "rb").read())
    want = 0
    for pl in sp.planes:
        if not pl.name.startswith("/device:TPU"):
            continue
        smeta = {k: v.name for k, v in pl.stat_metadata.items()}
        cats = {}
        for k, em in pl.event_metadata.items():
            for s in em.stats:
                if smeta.get(s.metadata_id) == "hlo_category":
                    cats[k] = s.str_value or smeta.get(s.ref_value, "")
        for ln in pl.lines:
            if ln.name != xplane.OP_TIMELINE:
                continue
            for ev in ln.events:
                if cats.get(ev.metadata_id) in ("while", "conditional",
                                                "call", "fusion root"):
                    continue
                want += ev.duration_ps
    got = xplane.stage_totals(FIXTURE, ("stage_lm",))["total"]
    assert got == pytest.approx(want / 1e9, rel=1e-9)


# ------------------------------------------------- profile_report plumbing


def test_aggregate_stages_prefers_xplane(tmp_path):
    """With both an xplane.pb and a (stale, truncated) trace.json.gz in the
    session dir, the xplane numbers win."""
    sess = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    sess.mkdir(parents=True)
    (sess / "vm.xplane.pb").write_bytes(open(FIXTURE, "rb").read())
    decoy = {"traceEvents": [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "X", "pid": 1, "name": "fusion.9", "dur": 999999.0,
         "args": {"tf_op": "jit(f)/stage_diffusion/mul:"}},
    ]}
    with gzip.open(sess / "vm.trace.json.gz", "wt") as f:
        json.dump(decoy, f)
    st = aggregate_stages(str(tmp_path), ("stage_lm", "stage_vocode",
                                          "stage_diffusion"))
    assert st["stage_lm"] > 0
    assert st["stage_diffusion"] == 0.0          # decoy JSON was NOT used
    rows = aggregate_trace(str(tmp_path))
    assert all(r["name"] != "fusion.9" for r in rows)


def test_aggregate_stages_falls_back_to_json_without_xplane(tmp_path):
    sess = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    sess.mkdir(parents=True)
    ev = {"traceEvents": [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "X", "pid": 1, "name": "fusion.1", "dur": 2000.0,
         "args": {"tf_op": "jit(f)/stage_lm/dot_general:"}},
    ]}
    with gzip.open(sess / "vm.trace.json.gz", "wt") as f:
        json.dump(ev, f)
    st = aggregate_stages(str(tmp_path), ("stage_lm",))
    assert st["stage_lm"] == pytest.approx(2.0)


# ------------------------------------------------------ synthetic encoding


def _varint(n):
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field(num, wire, payload):
    tag = _varint((num << 3) | wire)
    if wire == 2:
        return tag + _varint(len(payload)) + payload
    if wire == 0:
        return tag + _varint(payload)
    if wire == 1:
        return tag + payload.to_bytes(8, "little")
    if wire == 5:
        return tag + payload.to_bytes(4, "little")
    raise AssertionError(wire)


def _stat_meta(sid, name):
    entry = _field(1, 0, sid) + _field(2, 2, name.encode())
    return _field(5, 2, _field(1, 0, sid) + _field(2, 2, entry))


def _event_meta(eid, display, stats_bytes):
    em = (_field(1, 0, eid) + _field(2, 2, b"%" + display.encode())
          + _field(4, 2, display.encode()) + stats_bytes)
    return _field(4, 2, _field(1, 0, eid) + _field(2, 2, em))


def _synthetic_xspace():
    """Device plane with: one wrapper `while` event (10 ms — must be
    dropped), one stage_lm op (multi-byte-varint duration, tf_op via
    str_value), one stage_vocode op (tf_op via ref_value interning), one
    unscoped op; plus a host plane that must be skipped entirely, and
    unknown fixed32/fixed64 fields sprinkled in."""
    TF_OP, HLO_CAT, INTERN = 1, 2, 3
    smeta = (_stat_meta(TF_OP, "tf_op") + _stat_meta(HLO_CAT, "hlo_category")
             + _stat_meta(INTERN, "jit(f)/stage_vocode/dot_general:"))

    def stat_str(mid, s):
        return _field(5, 2, _field(1, 0, mid) + _field(5, 2, s.encode()))

    def stat_ref(mid, ref):
        return _field(5, 2, _field(1, 0, mid) + _field(7, 0, ref))

    ems = (
        _event_meta(1, "while.1", stat_str(HLO_CAT, "while"))
        + _event_meta(2, "fusion.1",
                      stat_str(TF_OP, "jit(f)/stage_lm/dot_general:")
                      + stat_str(HLO_CAT, "convolution fusion"))
        + _event_meta(3, "fusion.2", stat_ref(TF_OP, INTERN)
                      + stat_str(HLO_CAT, "loop fusion"))
        + _event_meta(4, "copy.1", stat_str(HLO_CAT, "copy"))
    )

    def event(mid, dur_ps):
        # unknown fixed64 field 19 exercises the skip path
        return _field(4, 2, _field(1, 0, mid) + _field(3, 0, dur_ps)
                      + _field(19, 1, 0xDEADBEEF))

    ops_line = _field(3, 2, (_field(2, 2, b"XLA Ops")
                             + event(1, 10_000_000_000)   # 10 ms wrapper
                             + event(2, 3_000_000_000)    # 3 ms stage_lm
                             + event(3, 1_500_000_000)    # 1.5 ms vocode
                             + event(2, 1_000_000_000)    # +1 ms stage_lm
                             + event(4, 500_000_000)))    # 0.5 ms other
    async_line = _field(3, 2, (_field(2, 2, b"Async XLA Ops")
                               + event(2, 999_000_000_000)))  # ignored
    dev_plane = _field(1, 2, (_field(1, 0, 2)
                              + _field(2, 2, b"/device:TPU:0")
                              + ops_line + async_line + ems + smeta
                              + _field(20, 5, 7)))        # unknown fixed32
    host_line = _field(3, 2, _field(2, 2, b"python")
                       + event(1, 777_000_000_000))
    host_plane = _field(1, 2, _field(2, 2, b"/host:CPU") + host_line)
    custom = _field(1, 2, _field(2, 2, b"/device:CUSTOM:Megascale Trace"))
    return host_plane + dev_plane + custom


def test_synthetic_roundtrip(tmp_path):
    p = tmp_path / "vm.xplane.pb"
    p.write_bytes(_synthetic_xspace())
    st = xplane.stage_totals(str(p), ("stage_lm", "stage_vocode"))
    assert st["stage_lm"] == pytest.approx(4.0)      # 3 + 1 ms
    assert st["stage_vocode"] == pytest.approx(1.5)  # via ref_value intern
    assert st["other"] == pytest.approx(0.5)         # copy only; wrapper out
    assert st["total"] == pytest.approx(6.0)
    rows = xplane.op_rows(str(p))
    by = {r["name"]: r for r in rows}
    assert "while.1" not in by
    assert by["fusion.1"]["count"] == 2
    assert by["fusion.1"]["total_ms"] == pytest.approx(4.0)
    assert by["fusion.2"]["example"].startswith("jit(f)/stage_vocode")


def test_find_xplane_picks_newest(tmp_path):
    for ts in ("2026_01_01_00_00_00", "2026_02_02_00_00_00"):
        d = tmp_path / "plugins" / "profile" / ts
        d.mkdir(parents=True)
        (d / "vm.xplane.pb").write_bytes(b"")
    got = xplane.find_xplane(str(tmp_path))
    assert "2026_02_02_00_00_00" in got
    assert xplane.find_xplane(str(tmp_path / "nope")) is None
