#!/usr/bin/env python3
"""Rebuild a ScaleCurve-shaped JSON from '[scalecurve] <label> <query>
min=..s [a,b,c]' log lines (used when a run dies before writing its JSON),
optionally merging real ScaleCurve JSON files over it.

Usage: curve_merge.py out.json rows.json log1 [log2|curve.json ...]
rows.json maps label -> {"docs": N, "embeddings": N}.
"""
import json
import re
import sys

LINE = re.compile(
    r"\[scalecurve\] (\S+) (\S+) min=([\d.]+)s \[([\d.,]+)\]")


def main(out, rows_path, sources):
    with open(rows_path) as f:
        rows = json.load(f)
    data = {}
    for src in sources:
        text = open(src).read()
        if text.lstrip().startswith("{"):
            for label, entry in json.loads(text).items():
                data.setdefault(label, {"queries": {}})
                data[label].update(
                    {k: v for k, v in entry.items() if k != "queries"})
                data[label]["queries"].update(entry["queries"])
        else:
            for label, q, mn, samples in LINE.findall(text):
                data.setdefault(label, {"queries": {}})
                data[label]["queries"][q] = {
                    "min": float(mn),
                    "samples": [float(x) for x in samples.split(",")]}
    for label, entry in data.items():
        # a label seen in a log but absent from rows.json must not lose
        # the whole merge — warn and leave its row counts unset
        if label in rows:
            entry.update(rows[label])
        else:
            print(f"warning: label {label!r} missing from {rows_path}; "
                  "row counts unset", file=sys.stderr)
    with open(out, "w") as f:
        json.dump(data, f, indent=1)
    print(f"wrote {out}: " + ", ".join(
        f"{l}({len(e['queries'])}q)" for l, e in data.items()))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
