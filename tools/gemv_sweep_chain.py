#!/usr/bin/env python
"""Shape sweep of quantized GEMV speedup vs bf16 using the value-fetched
repeated-chain methodology (see bench.py: the relay acks dispatch, so
only value-fetched long chains measure real execution; the reference's
A5000 sweep is README.md:440-455).

  python tools/gemv_sweep_chain.py --out benchmarks/gemv_sweep_chain_r2.json
Run ALONE on the TPU host.
"""
import argparse
import json
import sys

sys.path.insert(0, ".")

import bench

FMTS = ("int4p", "int8p", "any4", "nf4")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shapes",
                   default="1024,2048,4096,8192,"
                           "8192x2048,2048x8192,2048x2048,512x2048",
                   help="comma list of K (square) or NxK entries; the "
                        "NxK defaults are the Llama-1B decode linears")
    p.add_argument("--fmts", default=",".join(FMTS),
                   help="comma list of quantized formats to time "
                        "(bf16 baseline always measured)")
    p.add_argument("--rounds", type=int, default=5)
    p.add_argument("--budget-s", type=float, default=240.0)
    p.add_argument("--out", default="benchmarks/gemv_sweep_chain_r2.json")
    args = p.parse_args()

    fmts = tuple(args.fmts.split(","))
    out = {}
    for spec in args.shapes.split(","):
        shape = tuple(int(v) for v in spec.split("x"))
        if len(shape) == 1:
            shape = (shape[0], shape[0])
        per_layer, eff_gbs = bench.measure(
            shape=shape, fmts=fmts, budget_s=args.budget_s,
            rounds=args.rounds)
        row = {"bf16_us_per_layer": round(per_layer["bf16"] * 1e6, 2),
               "bf16_effective_gbs": round(eff_gbs, 0)}
        for fmt in fmts:
            row[fmt] = round(per_layer["bf16"] / per_layer[fmt], 3)
        out[spec] = row
        print(f"{spec}: {row}", file=sys.stderr)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
