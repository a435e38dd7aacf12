#!/usr/bin/env python
"""m-scaling of the production quantized formats vs the bf16 MXU matmul
(the int8-MXU story: w4a8 contracts int8 codes directly, so at batched m
it rides the MXU's double int8 rate where weight-only formats pay VPU
dequant work per element and fall back toward bf16 parity).

Value-fetched repeated 16-layer chains (bench.measure) per (m, fmt).
Run ALONE on the TPU host:

  python tools/bench_m_sweep.py --fmts w4a8,int4p --ms 1,16,64,256
"""
import argparse
import json
import sys

sys.path.insert(0, ".")

import bench


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shape", default="4096")
    p.add_argument("--fmts", default="w4a8,int4p")
    p.add_argument("--ms", default="1,16,64,256")
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--budget-s", type=float, default=60.0)
    p.add_argument("--out", default="benchmarks/m_sweep_r2.json")
    args = p.parse_args()

    shape = tuple(int(v) for v in args.shape.split("x"))
    if len(shape) == 1:
        shape = (shape[0], shape[0])
    fmts = tuple(args.fmts.split(","))

    out = {}
    for m in (int(v) for v in args.ms.split(",")):
        per_layer, eff_gbs = bench.measure(
            shape=shape, fmts=fmts, budget_s=args.budget_s,
            rounds=args.rounds, m=m)
        # weight-bytes-equivalent throughput (N*K*2 / t): a true HBM
        # bandwidth reading only while the bf16 chain is weight-bound
        # (m <~ 64); at larger m the chain goes MXU-compute-bound and
        # this is just a normalized rate, not bandwidth
        row = {"bf16_us_per_layer": round(per_layer["bf16"] * 1e6, 2),
               "bf16_weight_gbs_equiv": round(eff_gbs, 0)}
        for fmt in fmts:
            row[fmt] = round(per_layer["bf16"] / per_layer[fmt], 3)
        out[f"m{m}"] = row
        print(f"m={m}: {row}", file=sys.stderr)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
