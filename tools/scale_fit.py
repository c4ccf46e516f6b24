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
    # preserve file order = ascending scale order as passed to ScaleCurve
    labels = list(data.keys())
    queries = list(data[labels[0]]["queries"].keys())
    print("| query | " + " | ".join(
        f"{l} ({data[l]['docs']}d/{data[l]['embeddings']}e)" for l in labels)
        + " | fit exp | last-decade exp |")
    print("|---" * (len(labels) + 3) + "|")
    for q in queries:
        rows_key = "embeddings" if q.startswith(("d06", "e02")) else "docs"
        pts = [(data[l][rows_key], data[l]["queries"][q]["min"])
               for l in labels if q in data[l]["queries"]]
        xs = [math.log(n) for n, _ in pts]
        ys = [math.log(t) for _, t in pts]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / \
            sum((x - mx) ** 2 for x in xs)
        last = (ys[-1] - ys[-2]) / (xs[-1] - xs[-2])
        times = " | ".join(f"{t:.2f}s" for _, t in pts)
        print(f"| {q} | {times} | {slope:.2f} | {last:.2f} |")


if __name__ == "__main__":
    main(sys.argv[1])
