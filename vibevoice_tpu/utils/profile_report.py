"""Op-level device profile reports from jax.profiler traces.

The reference has no profiling subsystem at all (SURVEY.md §5.1 — a tqdm bar
and time deltas); this module closes the loop the other way: capture a
``jax.profiler`` trace around any callable and turn the trace-viewer JSON the
TPU runtime emits into an aggregated per-op table (total device ms, call
count, mean us) without TensorBoard — stdlib gzip/json only.

Used three ways:
  * library: ``report = profile_callable(fn)`` -> rows + formatted table
  * bench: ``BENCH_PROFILE=1 python bench.py`` prints the top device ops of
    one measured run to stderr
  * CLI: ``python -m vibevoice_tpu.utils.profile_report <trace_dir> [--top N]``
    for traces captured elsewhere (e.g. via utils.profiling.device_trace)
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import tempfile
from typing import Callable, Dict, List, Optional


def _find_trace_json(trace_dir: str) -> str:
    pats = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not pats:
        raise FileNotFoundError(
            f"no *.trace.json.gz under {trace_dir}/plugins/profile/*/")
    return pats[-1]                     # newest session (lexicographic ts)


def aggregate_trace(trace_dir: str, device_only: bool = True) -> List[dict]:
    """Parse the newest trace session in ``trace_dir`` into per-op rows:
    [{"name", "total_ms", "count", "mean_us", "example"}], sorted by
    total device time descending.

    Prefers the ``*.xplane.pb`` sidecar (decoded by utils/xplane.py) — the
    trace-viewer JSON is truncated on real-TPU captures (hundreds of device
    events kept out of hundreds of thousands), so the JSON path is only a
    fallback for captures that lack the xplane file.  Module- and
    scan-wrapper events are excluded either way so leaf ops don't get
    double counted."""
    from . import xplane
    xp = xplane.find_xplane(trace_dir)
    if xp is not None and device_only:
        rows = xplane.op_rows(xp)
        if rows:
            return rows
    path = _find_trace_json(trace_dir)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pids: Dict[int, str] = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")

    totals: Dict[str, float] = {}
    counts: Dict[str, int] = {}
    example: Dict[str, str] = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        proc = pids.get(e["pid"], "")
        if device_only and "TPU" not in proc and "device" not in proc.lower():
            continue
        name = e["name"]
        if name.startswith(("jit_", "while")):
            continue
        totals[name] = totals.get(name, 0.0) + e["dur"]
        counts[name] = counts.get(name, 0) + 1
        if name not in example:
            long = (e.get("args") or {}).get("long_name", "")
            example[name] = long[:160]
    rows = [{"name": n, "total_ms": t / 1e3, "count": counts[n],
             "mean_us": t / max(counts[n], 1), "example": example.get(n, "")}
            for n, t in totals.items()]
    rows.sort(key=lambda r: -r["total_ms"])
    return rows


STEP_STAGES = ("stage_lm", "stage_diffusion", "stage_vocode", "stage_semantic")


def aggregate_stages(trace_dir: str,
                     stages: tuple = STEP_STAGES) -> Dict[str, float]:
    """Bucket device time by the generate-step named scopes
    (generation/generate.py `stage_*` jax.named_scope wrappers, which XLA
    carries into each op's metadata).  Returns {stage: total_ms} plus
    "other" (device time outside any stage scope — prefill, sampling,
    bookkeeping) and "total".  Fusions that merge ops across a scope
    boundary are attributed to whichever scope their metadata kept, so the
    split is an attribution, not an exact wall partition.

    Prefers the ``*.xplane.pb`` sidecar: real-TPU trace-viewer JSON carries
    neither the full device event stream nor ``tf_op`` metadata (r3 finding
    — the JSON path collapsed every stage to "other" on the driver chip), so
    the JSON path below only serves captures without an xplane file."""
    from . import xplane as _xp
    xp = _xp.find_xplane(trace_dir)
    if xp is not None:
        st = _xp.stage_totals(xp, stages)
        if st.get("total", 0) > 0:
            return st
    path = _find_trace_json(trace_dir)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pids: Dict[int, str] = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")

    out = {s: 0.0 for s in stages}
    out["other"] = 0.0
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        proc = pids.get(e["pid"], "")
        if "TPU" not in proc and "device" not in proc.lower():
            continue
        name = e["name"]
        if name.startswith(("jit_", "while")):
            continue
        args = e.get("args") or {}
        # the scope path lands in the op's `tf_op` metadata on real-TPU
        # traces ("jit_run_chunk/stage_lm/..."); long_name / the event name
        # carry it on other backends
        meta = " ".join((name, args.get("long_name", ""),
                         args.get("tf_op", "")))
        total += e["dur"]
        for s in stages:
            if s in meta:
                out[s] += e["dur"]
                break
        else:
            out["other"] += e["dur"]
    return {k: v / 1e3 for k, v in {**out, "total": total}.items()}


def format_report(rows: List[dict], top: int = 25) -> str:
    lines = [f"{'total_ms':>10}  {'count':>8}  {'mean_us':>9}  op"]
    for r in rows[:top]:
        lines.append(f"{r['total_ms']:10.2f}  {r['count']:8d}  "
                     f"{r['mean_us']:9.1f}  {r['name'][:70]}")
    other = sum(r["total_ms"] for r in rows[top:])
    if other:
        lines.append(f"{other:10.2f}  {'':8}  {'':9}  (+{len(rows) - top} more)")
    return "\n".join(lines)


def profile_callable(fn: Callable[[], object], trace_dir: Optional[str] = None,
                     top: int = 25) -> dict:
    """Run ``fn`` under a jax.profiler trace and aggregate the device ops.
    Returns {"rows", "table", "trace_dir"}.  The traced run is slower than a
    plain run (instrumentation) — use the numbers for *relative* attribution,
    not absolute step times."""
    import jax
    trace_dir = trace_dir or tempfile.mkdtemp(prefix="vvprof_")
    with jax.profiler.trace(trace_dir):
        out = fn()
        jax.block_until_ready(jax.tree.leaves(out) or 0)
    rows = aggregate_trace(trace_dir)
    return {"rows": rows, "table": format_report(rows, top),
            "trace_dir": trace_dir}


def main(argv: Optional[List[str]] = None) -> None:
    import argparse
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("trace_dir", help="directory passed to jax.profiler.trace")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--host", action="store_true",
                    help="include host-side events too")
    args = ap.parse_args(argv)
    rows = aggregate_trace(args.trace_dir, device_only=not args.host)
    print(format_report(rows, args.top))


if __name__ == "__main__":
    main()
