#!/usr/bin/env python
"""Regenerate BENCH_SWEEP.md from a sweep log's BENCH_RESULT lines.

Adds the dual-roofline context: for VMEM-resident working sets the HBM
roofline is not the operative bound (the VPU gather/FMA rate is — see
README "The VPU-gather bound"), so the table marks which regime each
matrix ran in.

Usage: python scripts/sweep_table.py sweep.log [out.md]
"""
from __future__ import annotations

import json
import re
import sys
import time

TAG = "BENCH_RESULT "
PRESTAGE = 100 * 1024 * 1024


def parse(path: str):
    rows = {}
    order = []
    matrix = None
    for ln in open(path):
        m = re.search(r"backend=\w+ matrix=(\S+)", ln)
        if m:
            matrix = m.group(1)
            if matrix not in rows:
                rows[matrix] = {}
                order.append(matrix)
        i = ln.find(TAG)
        if i >= 0 and matrix:
            d = json.loads(ln[i + len(TAG):])
            rows[matrix][d["model"]] = d
    return [(m, rows[m]) for m in order]


def main():
    log_path = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else "BENCH_SWEEP.md"
    rows = parse(log_path)
    lines = [
        "# Benchmark sweep (TPU v5e, 1 chip)",
        "",
        f"Generated from {log_path} on {time.strftime('%Y-%m-%d %H:%M')}; "
        "device-side loop, dispatch cost subtracted, timed region "
        "auto-escalated above tunnel jitter (protocol: spmv.cu:100-122 + "
        "utils/timing.py).",
        "",
        "`regime`: VMEM = working set pre-staged in VMEM, the operative "
        "bound is the VPU gather/FMA rate (README: \"The VPU-gather "
        "bound\" — a pure gather body caps at ~50% HBM-frac); HBM = "
        "streamed from HBM, the HBM roofline applies directly.",
        "",
        "| matrix | nnz | EHYB GFLOP/s | % HBM roofline | regime | "
        "setup s | CSR (XLA) | BCOO (vendor) | speedup vs BCOO |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for name, r in rows:
        e, c, b = r.get("ehyb"), r.get("csr"), r.get("bcoo")
        if not e:
            lines.append(f"| {name} | - | FAIL | | | | | | |")
            continue
        regime = "VMEM" if e.get("bytes_model", 0) < PRESTAGE else "HBM"
        setup = e.get("setup_seconds", {}).get("total", None)
        setup_s = f"{setup:.0f}" if setup else "-"
        csr_s = f"{c['gflops']:.2f}" if c else "FAIL"
        bcoo_s = f"{b['gflops']:.2f}" if b else "FAIL"
        vs = f"{e['gflops']/b['gflops']:.0f}x" if b else "-"
        lines.append(
            f"| {name} | {e['nnz']:,} | {e['gflops']:.1f} | "
            f"{100*e['roofline_frac']:.0f}% | {regime} | {setup_s} | "
            f"{csr_s} | {bcoo_s} | {vs} |")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(rows)} matrices)")


if __name__ == "__main__":
    main()
