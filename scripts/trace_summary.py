#!/usr/bin/env python3
"""Summarize a jax.profiler trace: top ops by device self-time.

Usage: python scripts/trace_summary.py <trace_dir> [--top 30]

Reads the ``*.trace.json.gz`` Perfetto/chrome-trace dump that
``jax.profiler.trace`` writes under ``<dir>/plugins/profile/<run>/`` and
prints per-op and per-kernel-group totals for the TPU device track — a
poor man's op_profile for a box with no TensorBoard.
"""
from __future__ import annotations

import argparse
import collections
import gzip
import json
import pathlib
import re


def find_trace(root: str) -> pathlib.Path:
    paths = sorted(pathlib.Path(root).rglob("*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {root}")
    return paths[-1]


def group_name(name: str) -> str:
    """Collapse fusion suffixes/ids: 'fusion.123' -> 'fusion',
    'custom-call.42' -> 'custom-call'."""
    return re.sub(r"[.\d]+$", "", name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    path = find_trace(args.trace_dir)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # device tracks: pid whose process_name metadata mentions TPU/device
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in proc_names.items()
                   if re.search(r"TPU|/device|XLA Op", n, re.I)}

    per_op = collections.Counter()
    per_group = collections.Counter()
    per_scope = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        name = e.get("name", "?")
        per_op[name] += dur
        per_group[group_name(name)] += dur
        # XLA op events carry HLO metadata: args.long_name / args.tf_op hold
        # the jax source scope ('jit(fwd)/.../MaskBev/backbone/...') — the
        # only way to attribute anonymous fusion.N ops to model components
        args_ = e.get("args") or {}
        scope = args_.get("long_name") or args_.get("tf_op") or ""
        if scope:
            # keep the leading path components that name a model part
            parts = re.split(r"[;,]", scope)[0].split("/")
            keep = [p for p in parts if not re.match(
                r"^(jit|jvp|transpose|while|body|cond|branch|scan|remat)",
                p)]
            per_scope["/".join(keep[:4]) or scope[:60]] += dur
        else:
            per_scope[f"<no-scope> {group_name(name)}"] += dur
        total += dur

    print(f"trace: {path}")
    print(f"device event time total: {total / 1e3:.2f} ms "
          f"(tracks: {sorted(proc_names[p] for p in device_pids)[:4]}...)")
    print(f"\n== top {args.top} ops ==")
    for name, dur in per_op.most_common(args.top):
        print(f"{dur / 1e3:9.2f} ms  {100 * dur / max(total, 1):5.1f}%  {name[:110]}")
    print(f"\n== top {args.top} op groups ==")
    for name, dur in per_group.most_common(args.top):
        print(f"{dur / 1e3:9.2f} ms  {100 * dur / max(total, 1):5.1f}%  {name[:110]}")
    print(f"\n== top {args.top} source scopes ==")
    for name, dur in per_scope.most_common(args.top):
        print(f"{dur / 1e3:9.2f} ms  {100 * dur / max(total, 1):5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
