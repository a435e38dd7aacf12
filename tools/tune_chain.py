#!/usr/bin/env python
"""block_n x k_chunk tuning sweep for the pair-packed kernels using the
value-fetched repeated-chain methodology (see bench.py: the relay acks
``block_until_ready`` at dispatch, so only value-fetched long chains
measure real execution). Reference analog: tinygemm's template-parameter
sweep (TinyGemmImpl.cuh kBlocksPerN/kChunksPerK instantiation).

  python tools/tune_chain.py --fmt int4p --shape 4096
Run ALONE on the TPU host.
"""
import argparse
import functools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import bench


def build_cfg_chain(x, stacks, shape, kernel_fmt, reps, block_n, k_chunk,
                    use_gather=True):
    """bench.build_chain with explicit kernel block config."""
    from any4_tpu.ops.pallas import gemv
    N, K = shape

    def layer(a, st, i):
        p, s, z, l = st
        return gemv.quantized_matmul(
            a, p[i], s[i], z[i], None if l is None else l[i],
            fmt=kernel_fmt, group_size=128, n=N,
            block_n=block_n, k_chunk=k_chunk, use_gather=use_gather)

    @jax.jit
    def run(a, st):
        def body(_, a):
            out = a
            for i in range(bench.LAYERS):
                out = layer(out, st, i)
            return (out * jax.lax.rsqrt(
                jnp.float32(jnp.mean(out * out)) + 1e-6)
                ).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, reps, body, a)

    return functools.partial(run, x, stacks)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--fmt", default="int4p")
    p.add_argument("--shape", default="4096")
    p.add_argument("--block-n", default="256,512,1024,2048")
    p.add_argument("--k-chunk", default="1,2,4")
    p.add_argument("--select", action="store_true",
                   help="also time the select-16 one-hot dequant variant "
                        "(use_gather=False) at each config")
    p.add_argument("--rounds", type=int, default=6)
    p.add_argument("--target-call-s", type=float, default=1.0)
    p.add_argument("--out", default="benchmarks/tune_chain_r2.json")
    args = p.parse_args()

    shape = tuple(int(v) for v in args.shape.split("x"))
    if len(shape) == 1:
        shape = (shape[0], shape[0])
    N, K = shape

    from any4_tpu.ops import linear as lin
    w = jax.random.normal(jax.random.PRNGKey(0), (N, K), jnp.float32)
    w = w * (K ** -0.5)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, K)).astype(jnp.bfloat16)
    qt = lin.quantize_tensor(w, args.fmt, group_size=128)
    stack = lambda a: None if a is None else jnp.stack([a] * bench.LAYERS)
    stacks = (stack(qt.packed), stack(qt.scales), stack(qt.zeros),
              stack(qt.lut))
    kf = lin._kernel_fmt(qt.fmt, qt.lut)

    tiny = jax.jit(lambda v: v + 1)
    bench.timed_exec(tiny, (x,))
    rtt = min(bench.timed_exec(tiny, (x,)) for _ in range(3))

    # calibrate reps on the default config
    nkb = K // 1024
    probe = build_cfg_chain(x, stacks, shape, kf, 1, 512,
                            2 if nkb % 2 == 0 else 1)
    probe()
    t1 = max(min(bench.timed_exec(probe, ()) for _ in range(2)) - rtt, 1e-3)
    reps = max(1, min(512, int(args.target_call_s / t1)))
    print(f"rtt {rtt*1e3:.1f} ms, probe {t1*1e3:.1f} ms -> reps={reps}",
          file=sys.stderr)

    fns = {}
    for bn in (int(v) for v in args.block_n.split(",")):
        if N % bn and bn > N:
            continue
        for kc in (int(v) for v in args.k_chunk.split(",")):
            if nkb % kc:
                continue
            variants = [(f"bn{bn}/kc{kc}", True)]
            if args.select:
                variants.append((f"bn{bn}/kc{kc}/sel", False))
            for key, ug in variants:
                try:
                    f = build_cfg_chain(x, stacks, shape, kf, reps, bn, kc,
                                        use_gather=ug)
                    f()  # compile (may fail on VMEM overflow)
                    fns[key] = f
                    print(f"compiled {key}", file=sys.stderr)
                except Exception as e:
                    print(f"{key}: {type(e).__name__} "
                          f"{str(e).splitlines()[0][:100]}", file=sys.stderr)

    best = {k: float("inf") for k in fns}
    for r in range(args.rounds):
        for k, f in fns.items():
            best[k] = min(best[k], max(bench.timed_exec(f, ()) - rtt, 1e-6))
    out = {k: round(v / (reps * bench.LAYERS) * 1e6, 2)
           for k, v in sorted(best.items(), key=lambda kv: kv[1])}
    for k, v in out.items():
        print(f"{k}: {v} us/layer", file=sys.stderr)
    with open(args.out, "w") as f:
        json.dump({"fmt": args.fmt, "shape": list(shape), "reps": reps,
                   "us_per_layer": out}, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
