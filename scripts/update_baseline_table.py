#!/usr/bin/env python3
"""(Re)write the newest round's columns in the per-query BENCH history
table in BASELINE.md. Idempotent per round: if this round's columns are
already present they are stripped and regenerated, so a quieter re-run
can refresh a column in place. Earlier rounds' columns are kept as
history. Dev tooling.

Usage: python3 scripts/update_baseline_table.py
Round 16 reads the per-query full-resolution maps from the repo root:
bench_detail.json (the r16 sf0.1 sweep of record), plus
bench_profile_sf05_r16.json and bench_profile_sf1_r16.json.
"""
import json, re

quiet = json.load(open("bench_detail.json"))
sf05 = json.load(open("bench_profile_sf05_r16.json"))
sf1 = json.load(open("bench_profile_sf1_r16.json"))

TAG = "r16-rec"
HEADER = " r16-rec | r16-sf0.5 | r16-sf1 |"
N_NEW = 3


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
        has_new = TAG in ln
        base = strip_new(ln) if has_new else ln.rstrip()
        out.append(base + HEADER)
        continue
    if in_table and ln.startswith("|---|"):
        base = strip_new(ln) if has_new else ln.rstrip()
        out.append(base + "---|---|---|")
        continue
    m = re.match(r"^\| (q\d+\w*) \|", ln)
    if in_table and m:
        q = m.group(1)
        base = strip_new(ln) if has_new else ln.rstrip()

        # a query missing from any profile gets an em-dash cell, never a
        # crash mid-rewrite or a row shorter than the header
        def cell(src, q=q):
            v = src["queries"].get(q)
            if v is None:
                return "—"
            warm = " (w)" if q in src.get("warm", []) else ""
            return f"{v:.2f}{warm}"

        out.append(base + f" {cell(quiet)} | {cell(sf05)} | {cell(sf1)} |")
        continue
    if in_table and not ln.startswith("|"):
        in_table = False
    out.append(ln)

open("BASELINE.md", "w").write("\n".join(out))
print("updated", sum(1 for l in out if re.match(r"^\| q\d", l)), "rows")
