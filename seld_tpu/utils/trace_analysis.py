"""Parse jax.profiler xplane traces into op-level time tables.

Host-side analysis for traces captured with `seld_tpu.utils.profiling.trace`
— aggregates the TPU device plane's "XLA Ops" line by HLO opcode / fusion
name so hotspots are visible without TensorBoard (which this environment's
tensorboard-plugin-profile cannot serve due to a protobuf mismatch; the
xplane proto itself parses fine with the pure-python protobuf impl).

Usage:
    report = analyze_trace("/tmp/jax-trace")
    print(format_report(report))
"""
from __future__ import annotations

import glob
import os
import re
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

_OP_RE = re.compile(r"%?([\w\.\-]+)\s*=\s*[^\s]+\s+([\w\-]+)\(")


def _load_xspace(trace_dir: str):
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "xplane proto unavailable; install tensorflow(-tsl) protos") from e

    paths = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def _classify(name: str) -> str:
    m = _OP_RE.search(name)
    if m:
        opname, opcode = m.group(1), m.group(2)
        if opcode in ("fusion", "convolution", "dot"):
            return f"{opcode}:{re.sub(r'[0-9.]+$', '', opname) or opname}"
        return opcode
    # metadata strings are often truncated mid-type; fall back to the HLO
    # result name on the left of '=' with trailing instance digits stripped
    lhs = name.split(" = ")[0].strip().lstrip("%")
    if lhs:
        return re.sub(r"[0-9.]+$", "", lhs) or lhs
    return name.split("(")[0][:48] or "?"


def analyze_trace(trace_dir: str, device_substr: str = "TPU",
                  line_name: str = "XLA Ops") -> Dict:
    """-> {'total_ms', 'n_steps', 'ops': [(ms, pct, count, label), ...]}."""
    xs = _load_xspace(trace_dir)
    planes = [p for p in xs.planes if device_substr in p.name]
    if not planes:
        planes = [p for p in xs.planes if p.name.startswith("/device:")]
    if not planes:
        raise ValueError("no device plane found in trace")
    plane = planes[0]

    ev_meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
    n_steps = 0
    total = defaultdict(lambda: [0, 0])
    for line in plane.lines:
        if line.name == "Steps":
            n_steps = len(line.events)
        if line.name != line_name:
            continue
        for ev in line.events:
            key = _classify(ev_meta.get(ev.metadata_id, "?"))
            total[key][0] += ev.duration_ps
            total[key][1] += 1

    ssum = sum(v[0] for v in total.values()) or 1
    ops = sorted(
        ((ps / 1e9, 100.0 * ps / ssum, cnt, key)
         for key, (ps, cnt) in total.items()),
        reverse=True)
    return {"total_ms": ssum / 1e9, "n_steps": n_steps,
            "device": plane.name, "ops": ops}


def format_report(report: Dict, top: int = 20) -> str:
    lines = [f"device {report['device']}: busy "
             f"{report['total_ms']:.1f} ms over {report['n_steps']} steps"]
    lines.append(f"{'ms':>9} {'%':>6} {'count':>7}  op")
    for ms, pct, cnt, key in report["ops"][:top]:
        lines.append(f"{ms:9.2f} {pct:6.1f} {cnt:7d}  {key}")
    return "\n".join(lines)
