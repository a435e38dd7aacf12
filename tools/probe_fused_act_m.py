#!/usr/bin/env python
"""A/B the w4a8 fused-activation-quant kernel vs external quantize+scale
at the FUSED_ACT_M_MAX boundary (m=64): the fused variant stages the full
[m, k] float row in VMEM, which may stop paying past decode-shaped m.
Decides the FUSED_ACT_M_MAX default. Run ALONE on the TPU host."""
import json
import sys

sys.path.insert(0, ".")

import bench
from any4_tpu.ops.pallas import gemv


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    out = {}
    # the fused arm must admit the probed m (if m > the default cap, both
    # arms would silently take the external-quant path)
    for label, cap in (("fused_act", max(m, gemv.FUSED_ACT_M_MAX)),
                       ("external_quant", m - 1)):
        gemv.FUSED_ACT_M_MAX = cap
        per_layer, eff = bench.measure(
            shape=(4096, 4096), fmts=("w4a8",), m=m,
            budget_s=45, rounds=3)
        out[label] = {"w4a8_us_per_layer": round(per_layer["w4a8"] * 1e6, 2),
                      "bf16_us_per_layer": round(per_layer["bf16"] * 1e6, 2),
                      "speedup": round(per_layer["bf16"] /
                                       per_layer["w4a8"], 3),
                      "bf16_effective_gbs": round(eff, 0)}
        print(f"m={m} {label}: {out[label]}", file=sys.stderr)
    print(json.dumps({f"m{m}": out}))


if __name__ == "__main__":
    main()
