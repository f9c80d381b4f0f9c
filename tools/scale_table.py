#!/usr/bin/env python3
"""Generate the consolidated SCALE.md family table from three bench
runs (sf0.01 / sf0.1 / sf1 bench_out JSON files).

Usage:
  python3 tools/scale_table.py bench_sf001.json bench_sf01.json bench_sf1.json

Each input is the one-line JSON graft.Bench writes to
SPARK_GRAFT_BENCH_OUT (full per-query map under "queries"). Emits a
markdown table: per family, query count, total seconds at each scale,
and the measured sf0.01->sf0.1 and sf0.1->sf1 ratios. Events-table
families note that events are deliberately unscaled at sf1 (GenScale
replicates documents/embeddings/TPC-H facts; event-time queries
compare at sf0.1 volume).
"""
import sys, json
from collections import defaultdict

FAMILY_NOTES = {
    "a": "sketch state constant; exact twin passes linear",
    "d": "banded/bucketed candidate generation, never all-pairs",
    "e": "one corpus pass; gates/rollups languages x sources sized",
    "g": "fixed-round frontier algebra; wedge mass bounds the quadratic bits",
    "m": "blob metadata only; decode stubbed, plumbing real",
    "p": "map-side md5 thresholds; strata relations tiny",
    "q": "TPC-H-class relational: one fact pass per query the plan audit pins",
    "s": "bounded query set broadcast; index paths bucket-pruned",
    "t": "corpus touched once per op; everything downstream vocab-sized",
}


def fam_totals(path):
    with open(path) as f:
        d = json.loads(f.read().strip().splitlines()[0])
    out = defaultdict(float)
    cnt = defaultdict(int)
    for q, sec in d["queries"].items():
        fam = q[0]
        out[fam] += sec
        cnt[fam] += 1
    return out, cnt, d.get("sf", path)


def main(p001, p01, p1):
    t001, c001, _ = fam_totals(p001)
    t01, c01, _ = fam_totals(p01)
    t1, c1, _ = fam_totals(p1)
    rows = []
    for fam in sorted(set(t001) | set(t01) | set(t1)):
        a, b, c = t001.get(fam, 0.0), t01.get(fam, 0.0), t1.get(fam, 0.0)
        r1 = f"{b / a:.1f}x" if a > 0 else "-"
        r2 = f"{c / b:.1f}x" if b > 0 and fam in t1 else "-"
        rows.append((fam, c01.get(fam, 0), a, b, c, r1, r2,
                     FAMILY_NOTES.get(fam, "")))
    print("| Family | queries | sf0.01 s | sf0.1 s | sf1 s | "
          "x(sf0.01->0.1) | x(sf0.1->1) | declared complexity |")
    print("|---|---|---|---|---|---|---|---|")
    for fam, n, a, b, c, r1, r2, note in rows:
        cs = f"{c:.1f}" if fam in t1 else "-"
        print(f"| {fam} | {n} | {a:.1f} | {b:.1f} | {cs} | {r1} | {r2} "
              f"| {note} |")
    tot = (sum(t001.values()), sum(t01.values()), sum(t1.values()))
    print(f"| **all** | {sum(c01.values())} | {tot[0]:.1f} | {tot[1]:.1f} "
          f"| {tot[2]:.1f} | {tot[1]/tot[0]:.1f}x | {tot[2]/tot[1]:.1f}x | |")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
