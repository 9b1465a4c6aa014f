#!/usr/bin/env python3
"""(Re)write the round-13 columns (quiet / cold / sf1 / x10 ratio) in the
per-query BENCH history table in BASELINE.md. Idempotent: if the four
r13 columns are already present they are stripped and regenerated, so
a quieter re-run can refresh the quiet column in place. Dev tooling.

Usage: python3 scripts/update_baseline_table.py
Reads bench_detail.json (r13 quiet sf0.1), bench_cold.json (r13 cold
sf0.1), bench_profile_sf1.json (r13 sf1) from the repo root.
"""
import json, re

quiet = json.load(open("bench_detail.json"))
cold = json.load(open("bench_cold.json"))
sf1 = json.load(open("bench_profile_sf1.json"))

N_NEW = 4  # r13-quiet | r13-cold | r13-sf1 | x10 ratio


def strip_new(line):
    """Drop the last N_NEW cells if the header says they exist."""
    cells = line.rstrip().rstrip("|").split("|")
    return "|".join(cells[:-N_NEW]) + "|"


lines = open("BASELINE.md").read().split("\n")
out = []
in_table = False
has_new = False
for ln in lines:
    if ln.startswith("| query |"):
        in_table = True
        has_new = "r13-quiet" in ln
        base = strip_new(ln) if has_new else ln.rstrip()
        out.append(base + " r13-quiet | r13-cold | r13-sf1 | ×10 ratio |")
        continue
    if in_table and ln.startswith("|---|"):
        base = strip_new(ln) if has_new else ln.rstrip()
        out.append(base + "---|---|---|---|")
        continue
    m = re.match(r"^\| (q\d+\w*) \|", ln)
    if in_table and m:
        q = m.group(1)
        base = strip_new(ln) if has_new else ln.rstrip()
        qw = quiet["queries"].get(q)
        cw = cold["queries"].get(q)
        sw = sf1["queries"].get(q)
        # a query missing from any profile gets an em-dash cell, never a
        # crash mid-rewrite or a row shorter than the header
        def cell(v):
            return f"{v:.2f}" if v is not None else "—"
        warm = " (w)" if q in quiet.get("warm", []) else ""
        ratio = f"{sw / qw:.1f}" if qw and sw is not None else "—"
        qcell = cell(qw) + (warm if qw is not None else "")
        out.append(base + f" {qcell} | {cell(cw)} | {cell(sw)} | {ratio} |")
        continue
    if in_table and not ln.startswith("|"):
        in_table = False
    out.append(ln)

open("BASELINE.md", "w").write("\n".join(out))
print("updated", sum(1 for l in out if re.match(r"^\| q\d", l)), "rows")
