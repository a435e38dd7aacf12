#!/usr/bin/env python
"""Aggregate results.json files from log directories into one CSV
(reference process_logs.py equivalent).

  python cli_process_logs.py logs/ --output all_results.csv
"""
import argparse
import csv
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("roots", nargs="+", help="log directories to scan")
    p.add_argument("--output", default="all_results.csv")
    args = p.parse_args(argv)

    rows = []
    for root in args.roots:
        for dirpath, _, files in os.walk(root):
            if "results.json" not in files:
                continue
            path = os.path.join(dirpath, "results.json")
            try:
                with open(path) as f:
                    data = json.load(f)
            except json.JSONDecodeError:
                continue
            for task, entry in data.items():
                result = entry.get("result") if isinstance(entry, dict) \
                    else entry
                if isinstance(result, dict):
                    # structured results (lm-eval / code tasks): one row
                    # per scalar metric subfield, like the reference's
                    # "acc,none" / "pass@1" extraction (process_logs.py)
                    for metric, value in _flatten(result):
                        rows.append({"log_dir": dirpath, "task": task,
                                     "metric": metric, "result": value})
                else:
                    rows.append({"log_dir": dirpath, "task": task,
                                 "metric": "", "result": result})
    if rows:
        with open(args.output, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["log_dir", "task", "metric",
                                              "result"])
            w.writeheader()
            w.writerows(rows)
    print(f"wrote {len(rows)} rows to {args.output}")


def _flatten(d, prefix=""):
    for k, v in d.items():
        name = f"{prefix}{k}"
        if isinstance(v, dict):
            yield from _flatten(v, name + ".")
        elif isinstance(v, (int, float, str, bool)):
            yield name, v


if __name__ == "__main__":
    main()
