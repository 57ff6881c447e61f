#!/usr/bin/env python3
"""Turn graft.ScalingBench output into the SCALING.md slope table.

Usage: python3 scripts/scaling_report.py <scaling_run.log>

Parses the `SCALING {...}` JSON lines, groups by query, and computes
log-log slopes of COLD seconds (full per-query work, caches rebuilt)
against the driving table's row count between consecutive scales.
Output rows are also sloped: a threshold op whose OUTPUT grows
quadratically on an isotropic fixture is output-bound, not badly
planned — the runtime-per-output-row column separates the two.
"""
import json
import math
import re
import sys

# driving table per query and its row count per dir
TABLE = {
    "ann_ivf": "embeddings", "ann_lsh": "embeddings",
    "dedup_embed_ann": "embeddings",
    "similarity_topk_per_query": "embeddings",
    "dedup_clusters": "documents", "dedup_minhash": "documents",
    "pipeline_corpus_prep": "documents", "text_contamination": "documents",
    "text_tfidf": "documents",
    "events_concurrency": "events", "geo_co_presence": "events",
    "geo_lanes_top": "events",
}
ROWS = {
    "sf0.01": {"events": 10000, "documents": 500, "embeddings": 500},
    "sf0.1": {"events": 100000, "documents": 5000, "embeddings": 2000},
    "sf1": {"events": 1000000, "documents": 50000, "embeddings": 20000},
}


def tier(d):
    if "sf0.01" in d:
        return "sf0.01"
    if "sf0.1" in d:
        return "sf0.1"
    return "sf1"


def main(path):
    recs = {}
    for line in open(path):
        m = re.search(r"SCALING (\{.*\})", line)
        if not m:
            continue
        r = json.loads(m.group(1))
        if "error" in r:
            print(f"ERROR {r['query']} at {r['dir']}: {r['error']}")
            continue
        recs.setdefault(r["query"], {})[tier(r["dir"])] = r
    print(f"| query | n-axis | cold s (0.01/0.1/1) | slope 0.01->0.1 | "
          f"slope 0.1->1 | warm slope 0.1->1 | rows (0.01/0.1/1) | "
          f"out-slope 0.1->1 | s per out-row 0.1->1 |")
    print("|---|---|---|---|---|---|---|---|---|")
    for q in sorted(recs):
        t = recs[q]
        tab = TABLE[q]
        def val(k, f):
            return t[k][f] if k in t else None
        cold = [val(k, "cold") for k in ("sf0.01", "sf0.1", "sf1")]
        warm = [val(k, "warm") for k in ("sf0.01", "sf0.1", "sf1")]
        rows = [val(k, "rows") for k in ("sf0.01", "sf0.1", "sf1")]

        def slope(i, j, series=None):
            series = cold if series is None else series
            if (series[i] is None or series[j] is None
                    or series[i] <= 0 or series[j] <= 0):
                return float("nan")
            n1 = ROWS[("sf0.01", "sf0.1", "sf1")[i]][tab]
            n2 = ROWS[("sf0.01", "sf0.1", "sf1")[j]][tab]
            return math.log(series[j] / series[i]) / math.log(n2 / n1)

        def oslope(i, j):
            if not rows[i] or not rows[j]:
                return float("nan")
            n1 = ROWS[("sf0.01", "sf0.1", "sf1")[i]][tab]
            n2 = ROWS[("sf0.01", "sf0.1", "sf1")[j]][tab]
            return math.log(rows[j] / rows[i]) / math.log(n2 / n1)

        per_out = (cold[2] / rows[2]) if (cold[2] and rows[2]) else float("nan")
        per_out_prev = (cold[1] / rows[1]) if (cold[1] and rows[1]) else float("nan")
        cold_s = "/".join("-" if c is None else f"{c:.2f}" for c in cold)
        rows_s = "/".join("-" if r is None else str(r) for r in rows)
        print(f"| {q} | {tab} | {cold_s} | {slope(0,1):.2f} | "
              f"{slope(1,2):.2f} | {slope(1,2,warm):.2f} | {rows_s} | "
              f"{oslope(1,2):.2f} | "
              f"{per_out_prev:.2e} -> {per_out:.2e} |")


if __name__ == "__main__":
    main(sys.argv[1])
