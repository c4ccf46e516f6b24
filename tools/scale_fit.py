#!/usr/bin/env python3
"""Fit time-vs-rows scaling exponents from a graft.ScaleCurve JSON dump.

Usage: python3 tools/scale_fit.py /tmp/graft_scale/curve.json

For each query, performs a least-squares fit of log(min time) against
log(input rows) over all measured scale points (documents rows for the
d*/t* queries, embeddings rows for d06/e02), and prints a markdown table
ready for SCALE.md. Exponent < 1.3 is the near-linear bar from the
round-4 verdict; sub-second points are noise-dominated (JVM/job setup),
so the fit also reports the largest-decade exponent (last two points),
which is the honest at-scale number.
"""
import json
import math
import sys


def main(path: str) -> None:
    with open(path) as f:
        data = json.load(f)
    # preserve file order = ascending scale order as passed to ScaleCurve;
    # union query names across ALL labels (a partial run merged via
    # curve_merge.py may be missing queries from any one label)
    labels = list(data.keys())
    queries = []
    for l in labels:
        for q in data[l]["queries"]:
            if q not in queries:
                queries.append(q)
    print("| query | " + " | ".join(
        f"{l} ({data[l].get('docs', '?')}d/{data[l].get('embeddings', '?')}e)"
        for l in labels)
        + " | fit exp | last-decade exp |")
    print("|---" * (len(labels) + 3) + "|")
    for q in queries:
        rows_key = "embeddings" if q.startswith(("d06", "e02", "e04")) else "docs"
        pts = [(data[l][rows_key], data[l]["queries"][q]["min"])
               for l in labels
               if q in data[l]["queries"] and rows_key in data[l]]
        # one time cell per label so columns stay aligned when a label
        # is missing this query (or its row counts)
        times = " | ".join(
            f"{data[l]['queries'][q]['min']:.2f}s"
            if q in data[l]["queries"] else "—"
            for l in labels)
        # a query with < 2 scale points (or all points at one scale) has
        # no fittable slope — report n/a instead of crashing the table
        xs = [math.log(n) for n, _ in pts]
        ys = [math.log(t) for _, t in pts]
        if len(set(xs)) < 2:
            print(f"| {q} | {times} | n/a | n/a |")
            continue
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / \
            sum((x - mx) ** 2 for x in xs)
        last = ("n/a" if xs[-1] == xs[-2]
                else f"{(ys[-1] - ys[-2]) / (xs[-1] - xs[-2]):.2f}")
        print(f"| {q} | {times} | {slope:.2f} | {last} |")


if __name__ == "__main__":
    main(sys.argv[1])
