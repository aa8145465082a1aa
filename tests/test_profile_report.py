"""Op-level profile report aggregation (utils/profile_report.py)."""

import gzip
import json
import os

from vibevoice_tpu.utils.profile_report import aggregate_trace, format_report


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    os.makedirs(d)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def test_aggregate_trace_sums_device_ops(tmp_path):
    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "X", "pid": 3, "name": "fusion.1", "dur": 100,
         "args": {"long_name": "%fusion.1 = bf16[2,8960] ..."}},
        {"ph": "X", "pid": 3, "name": "fusion.1", "dur": 50},
        {"ph": "X", "pid": 3, "name": "while.84", "dur": 9999},   # wrapper: skip
        {"ph": "X", "pid": 3, "name": "jit_run(123)", "dur": 9999},
        {"ph": "X", "pid": 7, "name": "host_thing", "dur": 9999},  # host: skip
        {"ph": "X", "pid": 3, "name": "convert.2", "dur": 30},
    ]
    rows = aggregate_trace(_write_trace(tmp_path, events))
    assert [r["name"] for r in rows] == ["fusion.1", "convert.2"]
    assert rows[0]["total_ms"] == 0.15 and rows[0]["count"] == 2
    assert "bf16[2,8960]" in rows[0]["example"]
    table = format_report(rows, top=1)
    assert "fusion.1" in table and "+1 more" in table


def test_aggregate_stages_buckets_by_tf_op_metadata(tmp_path):
    """Stage attribution reads the scope path from tf_op (real-TPU traces)
    or long_name, skips whole-executable jit_/while wrappers and host
    events, and puts unscoped device time in "other"."""
    from vibevoice_tpu.utils.profile_report import aggregate_stages

    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "X", "pid": 3, "name": "fusion.1", "dur": 100,
         "args": {"tf_op": "jit_run_chunk/stage_lm/dot_general"}},
        {"ph": "X", "pid": 3, "name": "fusion.2", "dur": 40,
         "args": {"long_name": "... stage_diffusion/while/dot ..."}},
        {"ph": "X", "pid": 3, "name": "conv.3", "dur": 25,
         "args": {"tf_op": "jit_run_chunk/stage_vocode/conv_general"}},
        {"ph": "X", "pid": 3, "name": "conv.4", "dur": 15,
         "args": {"tf_op": "jit_run_chunk/stage_semantic/conv_general"}},
        {"ph": "X", "pid": 3, "name": "sort.5", "dur": 20},        # unscoped
        {"ph": "X", "pid": 3, "name": "jit_run_chunk(9)", "dur": 9999},
        {"ph": "X", "pid": 3, "name": "while.84", "dur": 9999},
        {"ph": "X", "pid": 7, "name": "host_thing", "dur": 9999,
         "args": {"tf_op": "stage_lm/whatever"}},                  # host: skip
    ]
    st = aggregate_stages(_write_trace(tmp_path, events))
    assert st["stage_lm"] == 0.1
    assert st["stage_diffusion"] == 0.04
    assert st["stage_vocode"] == 0.025
    assert st["stage_semantic"] == 0.015
    assert st["other"] == 0.02
    assert abs(st["total"] - 0.2) < 1e-9


def test_aggregate_trace_host_included_when_asked(tmp_path):
    events = [
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "X", "pid": 7, "name": "host_thing", "dur": 10},
    ]
    rows = aggregate_trace(_write_trace(tmp_path, events), device_only=False)
    assert rows and rows[0]["name"] == "host_thing"
