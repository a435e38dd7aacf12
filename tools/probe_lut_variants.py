#!/usr/bin/env python
"""Isolate the LUT-format kernel's cost structure on hardware.

Production `_q4_kernel` (any4/int4/nf4 fused-table gather) measures
~133-153 us/layer at 4096x4096 m=1 in the fast regime vs bf16's ~45 us
and int4p's ~28 us -- consistent with the per-plane dynamic gather
retiring ~one 128-lane row per cycle. This probe times production-shaped
variants (same BlockSpecs, same dot, same chain/value-fetch methodology
as bench.py) to find what actually burns the time:

  prod        fused-table gather (production _q4_kernel, fmt=lut4)
  nogather    codes used arithmetically (no gather at all): lower bound
              of unpack + dot + epilogue
  global      gather from a row-INVARIANT broadcast table, scale/zero
              applied post-gather (tests whether table row-variance
              serializes the vgather across sublanes)
  globalbf16  like global but the table is bf16 (half the table bytes)

If `global` ~= `prod`, take_along_axis lowers to the same (slow) gather
regardless of operand uniformity and the LUT formats are at their
hardware ceiling; if `global` << `prod`, reroute all global-table
formats (int4/nf4/fp4/mx4/global-any4) through the post-affine kernel.

Run ALONE on the TPU host: python tools/probe_lut_variants.py
"""
import functools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from any4_tpu.ops.packing import LANES, PACK_BLOCK, PLANES, pack_int4
from any4_tpu.ops import quant as q

N = K = 4096
BN = 512
KBS = 2
LAYERS = 16
G = 128  # group size; one scale row per plane


def _mk_variant(body):
    """Production-shaped launch: grid (nb, nk), same specs as gemv.py."""
    nk = K // PACK_BLOCK // KBS
    nb = N // BN

    def kern(x_ref, w_ref, s_ref, z_ref, l_ref, o_ref, acc_ref):
        kc = pl.program_id(1)

        @pl.when(kc == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        planes = body(w_ref[:], s_ref[:], z_ref[:], l_ref[:])
        wfull = jnp.concatenate(planes, axis=1)
        part = jax.lax.dot_general(
            x_ref[:], wfull, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] + part

        @pl.when(kc == nk - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    @jax.jit
    def run(x, packed, st, zt, lut):
        return pl.pallas_call(
            kern,
            grid=(nb, nk),
            in_specs=[
                pl.BlockSpec((1, KBS * PACK_BLOCK), lambda i, kc: (0, kc),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BN, KBS * LANES), lambda i, kc: (i, kc),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((KBS * 8, BN), lambda i, kc: (kc, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((KBS * 8, BN), lambda i, kc: (kc, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 16), lambda i, kc: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BN), lambda i, kc: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((1, BN), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(x, packed, st, zt, lut)

    return run


def _planes_iter(w):
    for j in range(KBS * PLANES):
        b, jj = divmod(j, PLANES)
        wb = w[:, b * LANES:(b + 1) * LANES]
        yield j, ((wb if jj == 0 else
                   jax.lax.shift_right_logical(wb, 4 * jj)) & 0xF)


def body_prod(w, s, z, lut):
    """Fused-table gather (row-variant table), as production."""
    st = s.astype(jnp.float32).T      # [BN, 16]
    zt = z.astype(jnp.float32).T
    lut128 = jnp.concatenate([lut.astype(jnp.float32)] * 8, axis=1)
    lut_t = jnp.broadcast_to(lut128, (BN, LANES))
    lane = jax.lax.broadcasted_iota(jnp.int32, (BN, LANES), 1)
    planes = []
    for t in range(KBS):
        gidx = (t * 8 + lane // 16) % (KBS * 8)
        sg = jnp.take_along_axis(
            jnp.concatenate([st] * (LANES // (KBS * 8)), axis=1), gidx, 1)
        zg = jnp.take_along_axis(
            jnp.concatenate([zt] * (LANES // (KBS * 8)), axis=1), gidx, 1)
        table = lut_t * sg + zg
        for p in range(PLANES):
            j = t * PLANES + p
            b, jj = divmod(j, PLANES)
            wb = w[:, b * LANES:(b + 1) * LANES]
            codes = (wb if jj == 0 else
                     jax.lax.shift_right_logical(wb, 4 * jj)) & 0xF
            idx = codes + 16 * (lane // 16)
            planes.append(jnp.take_along_axis(table, idx, axis=1)
                          .astype(jnp.bfloat16))
    return planes


def body_nogather(w, s, z, lut):
    """Codes used arithmetically -- no gather (wrong numbers, right cost)."""
    st = s.astype(jnp.float32).T
    zt = z.astype(jnp.float32).T
    planes = []
    for j, codes in _planes_iter(w):
        val = codes.astype(jnp.float32) - 8.0
        planes.append((val * st[:, j:j + 1] + zt[:, j:j + 1])
                      .astype(jnp.bfloat16))
    return planes


def body_global(w, s, z, lut):
    """Row-invariant table gather; per-group affine applied post-gather."""
    st = s.astype(jnp.float32).T
    zt = z.astype(jnp.float32).T
    lut128 = jnp.concatenate([lut.astype(jnp.float32)] * 8, axis=1)
    table = jnp.broadcast_to(lut128, (BN, LANES))
    lane = jax.lax.broadcasted_iota(jnp.int32, (BN, LANES), 1)
    planes = []
    for j, codes in _planes_iter(w):
        idx = codes + 16 * (lane // 16)
        g = jnp.take_along_axis(table, idx, axis=1)
        planes.append((g * st[:, j:j + 1] + zt[:, j:j + 1])
                      .astype(jnp.bfloat16))
    return planes


def body_global16(w, s, z, lut):
    """Row-invariant table WITHOUT lane-offset index math: gather with the
    raw 0..15 codes against a table whose every 16-lane tile repeats the
    LUT. If tpu.dynamic_gather indexes within the full 128-lane row this
    is identical to body_global minus 2 index ops; the point is to see if
    small uniform indices unlock a faster path."""
    st = s.astype(jnp.float32).T
    zt = z.astype(jnp.float32).T
    lut128 = jnp.concatenate([lut.astype(jnp.float32)] * 8, axis=1)
    table = jnp.broadcast_to(lut128, (BN, LANES))
    planes = []
    for j, codes in _planes_iter(w):
        g = jnp.take_along_axis(table, codes, axis=1)
        planes.append((g * st[:, j:j + 1] + zt[:, j:j + 1])
                      .astype(jnp.bfloat16))
    return planes


BODIES = {
    "prod": body_prod,
    "nogather": body_nogather,
    "global": body_global,
    "global16": body_global16,
}


def main():
    w = jax.random.normal(jax.random.PRNGKey(0), (N, K), jnp.float32)
    w = w * (K ** -0.5)
    codes, scales, zeros = q.group_quantize(w, n_bit=4, group_size=G)
    packed = pack_int4(codes)
    st = scales.T.astype(jnp.float32)   # [K/G, N]
    zt = zeros.T.astype(jnp.float32)
    lut = (jnp.arange(16, dtype=jnp.float32) - 8.0)[None, :]
    x = jax.random.normal(jax.random.PRNGKey(1), (1, K)).astype(jnp.bfloat16)

    stacks = {k: jnp.stack([v] * LAYERS)
              for k, v in [("p", packed), ("s", st), ("z", zt)]}

    def chain(runner, reps):
        @jax.jit
        def f(a, p, s, z, l):
            def body(_, a):
                out = a
                for i in range(LAYERS):
                    out = runner(out, p[i], s[i], z[i], l)
                return (out * jax.lax.rsqrt(
                    jnp.float32(jnp.mean(out * out)) + 1e-6)
                    ).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, reps, body, a)
        return f

    results = {}
    REPS = 256
    fns = {}
    for name, body in BODIES.items():
        fns[name] = chain(_mk_variant(body), REPS)
        y = fns[name](x, stacks["p"], stacks["s"], stacks["z"], lut)
        jax.block_until_ready(y)
    # correctness spot-check: global vs prod on one layer
    v0 = _mk_variant(body_prod)(x, packed, st, zt, lut)
    v1 = _mk_variant(body_global)(x, packed, st, zt, lut)
    err = float(jnp.max(jnp.abs(v0.astype(jnp.float32)
                                - v1.astype(jnp.float32))))
    print(f"global-vs-prod max abs diff: {err:.3e}", flush=True)

    for rnd in range(4):
        for name in BODIES:
            t0 = time.perf_counter()
            y = fns[name](x, stacks["p"], stacks["s"], stacks["z"], lut)
            float(np.asarray(jax.device_get(y[0, 0])))
            dt = (time.perf_counter() - t0) / REPS / LAYERS
            results.setdefault(name, []).append(dt)
            print(f"round {rnd} {name:12s}: {dt*1e6:8.2f} us/layer",
                  flush=True)

    out = {k: {"best_us_per_layer": round(min(v) * 1e6, 2)}
           for k, v in results.items()}
    out["global_vs_prod_maxdiff"] = err
    with open("benchmarks/probe_lut_variants.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
