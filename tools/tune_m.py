#!/usr/bin/env python
"""m-scaling of the pair-packed kernel vs the dequant-then-matmul prefill
path (decides ops.linear.FUSED_M_MAX). Value-fetched repeated 16-layer
chains (see bench.py for why). Run ALONE on the TPU host:

  python tools/tune_m.py --fmt int4p --shape 4096 --ms 1,8,16,32,64,128
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

LAYERS = 16


def build_stacks(fmt, K, N, rng):
    from any4_tpu.ops import linear as lin
    ps, ss, zs, ls = [], [], [], []
    for _ in range(LAYERS):
        w = jnp.asarray(rng.standard_normal((N, K), np.float32))
        qt = lin.quantize_tensor(w, fmt, 128)
        ps.append(qt.packed); ss.append(qt.scales); zs.append(qt.zeros)
        if qt.lut is not None:
            ls.append(qt.lut)
    return (jnp.stack(ps), jnp.stack(ss), jnp.stack(zs),
            jnp.stack(ls) if ls else None)


def timed(f, args):
    t0 = time.perf_counter()
    y = f(*args)
    float(np.asarray(jax.device_get(y[0, 0])))
    return time.perf_counter() - t0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--fmt", default="int4p")
    p.add_argument("--shape", type=int, default=4096)
    p.add_argument("--ms", default="1,8,16,32,64,128,256")
    p.add_argument("--rounds", type=int, default=3)
    args = p.parse_args()
    K = N = args.shape
    rng = np.random.default_rng(0)

    from any4_tpu.ops import linear as lin
    from any4_tpu.ops.pallas import gemv

    stacks = build_stacks(args.fmt, K, N, rng)

    def make(m, mode, reps):
        x0 = jnp.asarray(rng.standard_normal((m, K), np.float32)
                         ).astype(jnp.bfloat16)

        @jax.jit
        def run(x, st):
            ps, ss, zs, ls = st

            def chain(_, a):
                for i in range(LAYERS):
                    if mode == "fused":
                        a = gemv.quantized_matmul(
                            a, ps[i], ss[i], zs[i],
                            None if ls is None else ls[i], fmt=args.fmt,
                            group_size=128, n=N)
                    else:
                        w = lin.dequantize_tensor(lin.QuantizedTensor(
                            ps[i], ss[i], zs[i],
                            None if ls is None else ls[i], args.fmt, 128,
                            (N, K), jnp.bfloat16))
                        a = (a @ w.T).astype(jnp.bfloat16)
                return a * (1.0 / LAYERS)

            return jax.lax.fori_loop(0, reps, chain, x)

        return run, x0

    out = {}
    for m in [int(v) for v in args.ms.split(",")]:
        for mode in ("fused", "dequant"):
            reps = 1024 if mode == "fused" else 8
            f, x0 = make(m, mode, reps)
            y = f(x0, stacks)
            jax.block_until_ready(y)          # compile
            best = float("inf")
            for _ in range(args.rounds):
                best = min(best, timed(f, (x0, stacks)))
            per_layer = (best - 0.04) / (reps * LAYERS)
            out[f"m{m}_{mode}_us"] = round(per_layer * 1e6, 1)
            print(f"m={m} {mode}: {per_layer*1e6:.1f} us/layer",
                  file=sys.stderr)
    path = f"benchmarks/tune_m_{args.fmt}_{args.shape}.json"
    with open(path, "w") as fjs:
        json.dump(out, fjs, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
