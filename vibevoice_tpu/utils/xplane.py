"""Pure-stdlib decoder for the XSpace profiler protobuf (``*.xplane.pb``).

Why this exists: on real-TPU runs the trace-viewer JSON that
``jax.profiler.trace`` emits is *truncated* (the vvstages capture carried 810
device events in JSON vs 257k in the xplane) and its device events carry no
``tf_op`` metadata, so the per-stage attribution that drives bench's
``step_frac_*`` keys silently collapsed to "other".  The ``.xplane.pb``
sidecar is the authoritative record: every XLA op event on the TensorCore
timeline, with per-op metadata (``tf_op`` scope path, ``hlo_category``,
``source``) interned in the plane.  TensorBoard's profiler plugin decodes it
with the TF proto stack; we decode it with ~150 lines of stdlib wire-format
parsing so the dependency stays zero (tensorflow is multi-second to import
and not a declared dep).

Schema (field numbers verified against tensorflow.tsl.profiler.protobuf
xplane_pb2 in this environment; the format is stable — it is TensorBoard's
on-disk interchange):

  XSpace        { 1: repeated XPlane planes }
  XPlane        { 1: id, 2: name, 3: repeated XLine lines,
                  4: map<int64, XEventMetadata> event_metadata,
                  5: map<int64, XStatMetadata>  stat_metadata }
  XLine         { 2: name, 11: display_name, 4: repeated XEvent events }
  XEvent        { 1: metadata_id, 3: duration_ps }
  XEventMetadata{ 1: id, 2: name, 4: display_name, 5: repeated XStat stats }
  XStat         { 1: metadata_id, 2: double, 3: uint64, 4: int64,
                  5: str_value, 6: bytes, 7: ref_value (str interned as a
                  stat_metadata entry whose *name* is the value) }
  XStatMetadata { 1: id, 2: name }

The reference has no profiling subsystem (SURVEY.md §5.1); this is part of
the beyond-reference tracing stack alongside utils/profile_report.py.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Iterator, List, Optional, Tuple

# ---------------------------------------------------------------- wire level


def _iter_fields(buf: bytes, pos: int, end: int) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) for one message span.

    value is: int for varint(0); a (start, end) span into ``buf`` for
    length-delimited(2); raw little-endian int for fixed64(1)/fixed32(5).
    Unknown wire types raise — better loud than silently desynced.
    """
    while pos < end:
        # inline varint (tag)
        tag = 0
        shift = 0
        while True:
            b = buf[pos]
            pos += 1
            tag |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            val = 0
            shift = 0
            while True:
                b = buf[pos]
                pos += 1
                val |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            yield field, 0, val
        elif wire == 2:
            ln = 0
            shift = 0
            while True:
                b = buf[pos]
                pos += 1
                ln |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            yield field, 2, (pos, pos + ln)
            pos += ln
        elif wire == 1:
            yield field, 1, int.from_bytes(buf[pos:pos + 8], "little")
            pos += 8
        elif wire == 5:
            yield field, 5, int.from_bytes(buf[pos:pos + 4], "little")
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire} at offset {pos}")


def _span_str(buf: bytes, span: Tuple[int, int]) -> str:
    return buf[span[0]:span[1]].decode("utf-8", "replace")


# -------------------------------------------------------------- plane models


class EventMeta:
    """One interned op: display name + resolved string stats (tf_op etc.)."""

    __slots__ = ("name", "display_name", "stats")

    def __init__(self) -> None:
        self.name = ""
        self.display_name = ""
        self.stats: Dict[str, str] = {}


class Line:
    __slots__ = ("name", "display_name", "events")

    def __init__(self) -> None:
        self.name = ""
        self.display_name = ""
        # flat parallel arrays: (metadata_id, offset_ps, duration_ps) per
        # event — offsets make device IDLE GAPS measurable, not just busy
        self.events: List[Tuple[int, int, int]] = []


class Plane:
    __slots__ = ("name", "lines", "event_metadata")

    def __init__(self) -> None:
        self.name = ""
        self.lines: List[Line] = []
        self.event_metadata: Dict[int, EventMeta] = {}


def _parse_event(buf: bytes, span: Tuple[int, int]) -> Tuple[int, int, int]:
    mid = off = dur = 0
    for f, w, v in _iter_fields(buf, span[0], span[1]):
        if f == 1 and w == 0:
            mid = v
        elif f == 2 and w == 0:
            off = v
        elif f == 3 and w == 0:
            dur = v
    return mid, off, dur


def _parse_line(buf: bytes, span: Tuple[int, int]) -> Line:
    ln = Line()
    ev = ln.events
    for f, w, v in _iter_fields(buf, span[0], span[1]):
        if f == 4 and w == 2:
            ev.append(_parse_event(buf, v))
        elif f == 2 and w == 2:
            ln.name = _span_str(buf, v)
        elif f == 11 and w == 2:
            ln.display_name = _span_str(buf, v)
    return ln


def _parse_stat(buf: bytes, span: Tuple[int, int]) -> Tuple[int, Optional[str], Optional[int]]:
    """Return (stat_metadata_id, str_value_or_None, ref_value_or_None)."""
    mid = 0
    sval: Optional[str] = None
    rval: Optional[int] = None
    for f, w, v in _iter_fields(buf, span[0], span[1]):
        if f == 1 and w == 0:
            mid = v
        elif f == 5 and w == 2:
            sval = _span_str(buf, v)
        elif f == 7 and w == 0:
            rval = v
    return mid, sval, rval


def _parse_plane(buf: bytes, span: Tuple[int, int],
                 name_only: bool = False) -> Plane:
    pl = Plane()
    # raw collected spans so stat refs can be resolved after stat_metadata
    em_spans: List[Tuple[int, Tuple[int, int]]] = []
    stat_names: Dict[int, str] = {}
    for f, w, v in _iter_fields(buf, span[0], span[1]):
        if f == 2 and w == 2:
            pl.name = _span_str(buf, v)
            if name_only:
                return pl
        elif name_only:
            continue
        elif f == 3 and w == 2:
            pl.lines.append(_parse_line(buf, v))
        elif f == 4 and w == 2:  # map entry {1: key, 2: XEventMetadata}
            key = 0
            val_span = None
            for f2, w2, v2 in _iter_fields(buf, v[0], v[1]):
                if f2 == 1 and w2 == 0:
                    key = v2
                elif f2 == 2 and w2 == 2:
                    val_span = v2
            if val_span is not None:
                em_spans.append((key, val_span))
        elif f == 5 and w == 2:  # map entry {1: key, 2: XStatMetadata}
            key = 0
            name = ""
            for f2, w2, v2 in _iter_fields(buf, v[0], v[1]):
                if f2 == 1 and w2 == 0:
                    key = v2
                elif f2 == 2 and w2 == 2:
                    for f3, w3, v3 in _iter_fields(buf, v2[0], v2[1]):
                        if f3 == 2 and w3 == 2:
                            name = _span_str(buf, v3)
                            break
            stat_names[key] = name
    for key, vs in em_spans:
        em = EventMeta()
        for f2, w2, v2 in _iter_fields(buf, vs[0], vs[1]):
            if f2 == 2 and w2 == 2:
                em.name = _span_str(buf, v2)
            elif f2 == 4 and w2 == 2:
                em.display_name = _span_str(buf, v2)
            elif f2 == 5 and w2 == 2:
                mid, sval, rval = _parse_stat(buf, v2)
                if sval is None and rval is not None:
                    # interned string: the value is the *name* of the
                    # stat_metadata entry ref_value points at
                    sval = stat_names.get(rval)
                if sval is not None:
                    em.stats[stat_names.get(mid, str(mid))] = sval
        pl.event_metadata[key] = em
    return pl


# ------------------------------------------------------------------ file API


def find_xplane(trace_dir: str) -> Optional[str]:
    """Newest ``*.xplane.pb`` under a ``jax.profiler.trace`` directory."""
    pats = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.xplane.pb")))
    return pats[-1] if pats else None


def _is_device_plane(name: str) -> bool:
    return name.startswith("/device:") and "CUSTOM" not in name


def parse_device_planes(path: str) -> List[Plane]:
    """Parse only the device planes of an XSpace file.

    Host planes (which carry ~1000x more events than the device on a long
    capture) are skipped after a cheap name-only peek, which keeps a 65 MB
    real-TPU capture within a few seconds of pure-Python parse time.
    """
    buf = open(path, "rb").read()
    planes: List[Plane] = []
    for f, w, v in _iter_fields(buf, 0, len(buf)):
        if f == 1 and w == 2:
            peek = _parse_plane(buf, v, name_only=True)
            if _is_device_plane(peek.name):
                planes.append(_parse_plane(buf, v))
    return planes


OP_TIMELINE = "XLA Ops"

# region wrappers on the op timeline NEST their body ops (a `while` event's
# duration contains every leaf inside it) — counting them would double every
# loop body, so only leaves contribute to time totals
_WRAPPER_CATEGORIES = frozenset({"while", "conditional", "call", "fusion root"})


def device_op_events(path: str) -> Iterator[Tuple[str, EventMeta, int]]:
    """Yield (plane_name, event_metadata, duration_ps) for every LEAF op
    event on the TensorCore timeline (the "XLA Ops" line) of every device
    plane.  Async/DMA lines are excluded (they overlap compute — adding them
    would double-count device time), as are while/conditional region
    wrappers (their spans contain their body ops)."""
    empty = EventMeta()
    for pl in parse_device_planes(path):
        for ln in pl.lines:
            if ln.name != OP_TIMELINE:
                continue
            for mid, _off, dur in ln.events:
                em = pl.event_metadata.get(mid, empty)
                if em.stats.get("hlo_category") in _WRAPPER_CATEGORIES:
                    continue
                yield pl.name, em, dur


def device_op_spans(path: str) -> Iterator[Tuple[str, EventMeta, int, int]]:
    """Like :func:`device_op_events` but with start offsets:
    (plane_name, event_metadata, offset_ps, duration_ps).  Sorting by offset
    and summing inter-op holes measures device IDLE between scheduled ops —
    the dispatch/prologue cost that per-op durations structurally hide."""
    empty = EventMeta()
    for pl in parse_device_planes(path):
        for ln in pl.lines:
            if ln.name != OP_TIMELINE:
                continue
            for mid, off, dur in ln.events:
                em = pl.event_metadata.get(mid, empty)
                if em.stats.get("hlo_category") in _WRAPPER_CATEGORIES:
                    continue
                yield pl.name, em, off, dur


def stage_totals(path: str, stages: Tuple[str, ...]) -> Dict[str, float]:
    """Bucket TensorCore device time by named-scope substrings found in each
    op's ``tf_op`` metadata.  Returns {stage: ms} plus "other" and "total"."""
    out = {s: 0.0 for s in stages}
    out["other"] = 0.0
    total = 0.0
    for _, em, dur in device_op_events(path):
        tf_op = em.stats.get("tf_op", "")
        total += dur
        for s in stages:
            if s in tf_op:
                out[s] += dur
                break
        else:
            out["other"] += dur
    return {k: v / 1e9 for k, v in {**out, "total": total}.items()}


def op_rows(path: str) -> List[dict]:
    """Aggregate per-op rows from the TensorCore timeline, shaped like
    profile_report.aggregate_trace: [{"name", "total_ms", "count",
    "mean_us", "example"}] sorted by total device time descending."""
    totals: Dict[str, float] = {}
    counts: Dict[str, int] = {}
    example: Dict[str, str] = {}
    for _, em, dur in device_op_events(path):
        name = em.display_name or em.name or "?"
        totals[name] = totals.get(name, 0.0) + dur
        counts[name] = counts.get(name, 0) + 1
        if name not in example:
            example[name] = (em.stats.get("tf_op", "") or em.name)[:160]
    rows = [{"name": n, "total_ms": t / 1e9, "count": counts[n],
             "mean_us": t / 1e6 / max(counts[n], 1),
             "example": example.get(n, "")}
            for n, t in totals.items()]
    rows.sort(key=lambda r: -r["total_ms"])
    return rows
