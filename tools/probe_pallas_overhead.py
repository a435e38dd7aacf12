#!/usr/bin/env python
"""Isolate the per-call overhead of a pallas_call vs a plain XLA op.

Round-2d gap analysis (PERF_NOTES): w4a8 kernel device time 15.6 us but
chain wall 24.5 us/layer, while bf16's XLA dot shows wall ~= device. If
pallas calls pay a fixed ~9-12 us dispatch/launch gap on this runtime,
every kernel format is handicapped by it and the vs_baseline 0.58 ->
0.8 target (VERDICT r3 item #3) is about the launch path, not the
kernel body. Chains measured (16 calls, value-fetched, fast-regime
minima):

  xla_copy      y = x + 1 (XLA elementwise, floor)
  pallas_nop    single-block [1,4096] copy kernel, no grid
  pallas_grid   same copy over an (8,4) grid, trivial blocks
  pallas_cost   pallas_nop WITH a large cost_estimate attached
  w4a8          production kernel (reference point)
  bf16          XLA dot (device-bound reference)

Run ALONE on the TPU host: python tools/probe_pallas_overhead.py
"""
import functools
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import bench
from any4_tpu.ops import linear as lin

N = K = 4096


def _copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + jnp.bfloat16(1.0)


def _grid_copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + jnp.bfloat16(1.0)


def pallas_nop(x, cost=False):
    kw = {}
    if cost:
        kw["cost_estimate"] = pl.CostEstimate(
            flops=2 * N * K, bytes_accessed=N * K // 2,
            transcendentals=0)
    return pl.pallas_call(
        _copy_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, K), jnp.bfloat16),
        **kw,
    )(x)


def pallas_grid(x):
    return pl.pallas_call(
        _grid_copy_kernel,
        grid=(8, 4),
        in_specs=[pl.BlockSpec((1, K // 4), lambda i, kc: (0, kc),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, K // 4), lambda i, kc: (0, kc),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, K), jnp.bfloat16),
    )(x)


def chain(fn, x, reps):
    @jax.jit
    def run(a):
        def body(_, a):
            out = a
            for _ in range(bench.LAYERS):
                out = fn(out)
            return (out * jax.lax.rsqrt(
                jnp.float32(jnp.mean(out * out)) + 1e-6)
                ).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, reps, body, a)

    return functools.partial(run, x)


def main():
    x = jax.random.normal(jax.random.PRNGKey(1), (1, K)).astype(jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(0), (N, K), jnp.float32)
    w = w * (K ** -0.5)
    wb = jnp.stack([w.astype(jnp.bfloat16)] * bench.LAYERS)
    qt = jax.jit(functools.partial(
        lin.quantize_tensor, fmt="w4a8", group_size=128))(w)
    stack = lambda a: jnp.stack([a] * bench.LAYERS)
    st = (stack(qt.packed), stack(qt.scales), stack(qt.zeros))

    tiny = jax.jit(lambda v: v + 1)
    bench.timed_exec(tiny, (x,))
    rtt = min(bench.timed_exec(tiny, (x,)) for _ in range(3))
    probe = bench.build_chain("bf16", x, (wb,), (N, K), None, 1)
    probe()
    t1 = min(bench.timed_exec(probe, ()) for _ in range(2)) - rtt
    t1 = max(t1, bench.LAYERS * N * K * 2 / 850e9)
    reps = max(1, min(4096, int(1.0 / t1)))
    print(f"rtt {rtt*1e3:.1f} ms, reps {reps}", file=sys.stderr)

    from any4_tpu.ops.pallas import gemv

    def w4a8_layer_i(a, i):
        return gemv.quantized_matmul(
            a, st[0][i], st[1][i], st[2][i], None, fmt="w4a8",
            group_size=128, n=N)

    @jax.jit
    def w4a8_run(a, stk):
        def body(_, a):
            out = a
            for i in range(bench.LAYERS):
                out = gemv.quantized_matmul(
                    out, stk[0][i], stk[1][i], stk[2][i], None,
                    fmt="w4a8", group_size=128, n=N)
            return (out * jax.lax.rsqrt(
                jnp.float32(jnp.mean(out * out)) + 1e-6)
                ).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, reps, body, a)

    fns = {
        "xla_copy": chain(jax.jit(lambda a: a + 1), x, reps),
        "pallas_nop": chain(lambda a: pallas_nop(a), x, reps),
        "pallas_cost": chain(lambda a: pallas_nop(a, cost=True), x, reps),
        "pallas_grid": chain(pallas_grid, x, reps),
        "bf16": bench.build_chain("bf16", x, (wb,), (N, K), None, reps),
        "w4a8": functools.partial(w4a8_run, x, st),
    }
    for f in fns.values():
        f()
    best = {k: float("inf") for k in fns}
    for r in range(6):
        for k, f in fns.items():
            best[k] = min(best[k], max(bench.timed_exec(f, ()) - rtt, 1e-6))
    out = {}
    for k, v in best.items():
        us = v / (reps * bench.LAYERS) * 1e6
        out[k] = round(us, 2)
        print(f"{k:12s} {us:8.2f} us/call", file=sys.stderr)
    with open("benchmarks/probe_pallas_overhead.json", "w") as f:
        json.dump({"us_per_call": out, "reps": reps}, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
