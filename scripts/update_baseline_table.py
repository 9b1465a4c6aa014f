#!/usr/bin/env python3
"""Append round-13 columns (quiet / cold / sf1 / x10 ratio) to the
per-query BENCH history table in BASELINE.md. Dev tooling only.

Usage: python3 scripts/update_baseline_table.py
Reads bench_detail.json (r13 quiet sf0.1), bench_cold.json (r13 cold
sf0.1), bench_profile_sf1.json (r13 sf1) from the repo root.
"""
import json, re

quiet = json.load(open("bench_detail.json"))
cold = json.load(open("bench_cold.json"))
sf1 = json.load(open("bench_profile_sf1.json"))

lines = open("BASELINE.md").read().split("\n")
out = []
header_done = False
for ln in lines:
    m = re.match(r"^\| (q\d+\w*) \|", ln)
    if ln.startswith("| query |") and not header_done:
        assert ln.rstrip().endswith("×5 ratio |"), ln
        out.append(ln.rstrip() + " r13-quiet | r13-cold | r13-sf1 | ×10 ratio |")
        header_done = True
    elif header_done and ln.startswith("|---|"):
        out.append(ln.rstrip() + "---|---|---|---|")
        header_done = "sep_done"
    elif m:
        q = m.group(1)
        qw = quiet["queries"].get(q)
        cw = cold["queries"].get(q)
        sw = sf1["queries"].get(q)
        if qw is None:
            out.append(ln)
            continue
        warm = " (w)" if q in quiet.get("warm", []) else ""
        ratio = sw / qw if qw else float("nan")
        out.append(ln.rstrip() +
                   f" {qw:.2f}{warm} | {cw:.2f} | {sw:.2f} | {ratio:.1f} |")
    else:
        out.append(ln)

open("BASELINE.md", "w").write("\n".join(out))
print("updated", sum(1 for l in out if re.match(r"^\| q\d", l)), "rows")
