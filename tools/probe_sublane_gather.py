#!/usr/bin/env python
"""Probe: dynamic gather along SUBLANES (dim 0, single-vreg) vs LANES.

Mosaic lowers `take_along_axis(table, idx, axis=0)` to
`tpu.dynamic_gather(..., [0])`; on v5e it only compiles when the whole
array is one vreg tall (8 sublanes, 32-bit dtype). A 16-entry LUT then
needs 2 gathers (lo/hi half) + compare + select per [8, bn] slice.
This probe times that formulation against the production lane gather at
matched volume to decide whether a TRANSPOSED weight layout (k on
sublanes, output rows on lanes) can make any4 dequant cheap
(VERDICT r2 weak #1).

Run ALONE on the TPU host: python tools/probe_sublane_gather.py
"""
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

BN = 512       # lanes (output rows in the transposed layout)
ROWS = 128     # sublanes per k-group
REPS = 64
NGRP = 8


def _time(f, *args):
    jax.block_until_ready(f(*args))
    best = 1e9
    for _ in range(7):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def run_case(out, name, fn, *args):
    try:
        t = _time(fn, *args)
        n_gather = REPS * ROWS * BN
        out[name] = {"s": t, "gelem_per_s": round(n_gather / t / 1e9, 2)}
        print(name, out[name])
    except Exception as e:  # noqa: BLE001
        msg = (str(e).split("\n") + [""])[0][:200] or repr(e)[:200]
        out[name] = {"error": msg}
        print(name, "ERROR:", msg)


def main():
    out = {}
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 16, (NGRP * ROWS, BN)), jnp.int32)

    # lo/hi LUT halves tiled to one vreg height: [8, BN] f32
    lut = rng.normal(size=(16, BN)) * 10
    tlo = jnp.asarray(lut[:8], jnp.float32)
    thi = jnp.asarray(lut[8:], jnp.float32)

    # --- sublane formulation: per [8, BN] slice, 2 gathers + select ---
    def kern_sub(tlo_ref, thi_ref, w_ref, o_ref):
        tlo = tlo_ref[:]
        thi = thi_ref[:]
        acc = jnp.zeros((ROWS, BN), jnp.float32)

        def step(i, acc):
            w = w_ref[pl.ds((i % NGRP) * ROWS, ROWS), :]
            outs = []
            for s in range(ROWS // 8):
                c = w[s * 8:(s + 1) * 8, :]
                c7 = c & 7
                glo = jnp.take_along_axis(tlo, c7, axis=0)
                ghi = jnp.take_along_axis(thi, c7, axis=0)
                outs.append(jnp.where(c >= 8, ghi, glo))
            return acc + jnp.concatenate(outs, axis=0)

        o_ref[:] = jax.lax.fori_loop(0, REPS, step, acc)

    @jax.jit
    def run_sub(tlo, thi, w):
        return pl.pallas_call(
            kern_sub,
            out_shape=jax.ShapeDtypeStruct((ROWS, BN), jnp.float32),
        )(tlo, thi, w)

    run_case(out, "sublane_2x8_f32", run_sub, tlo, thi, codes)

    # --- correctness of the sublane formulation (no reps) ---
    def kern_chk(tlo_ref, thi_ref, w_ref, o_ref):
        tlo = tlo_ref[:]
        thi = thi_ref[:]
        w = w_ref[:ROWS, :]
        outs = []
        for s in range(ROWS // 8):
            c = w[s * 8:(s + 1) * 8, :]
            c7 = c & 7
            glo = jnp.take_along_axis(tlo, c7, axis=0)
            ghi = jnp.take_along_axis(thi, c7, axis=0)
            outs.append(jnp.where(c >= 8, ghi, glo))
        o_ref[:] = jnp.concatenate(outs, axis=0)

    y = pl.pallas_call(
        kern_chk,
        out_shape=jax.ShapeDtypeStruct((ROWS, BN), jnp.float32),
    )(tlo, thi, codes)
    cn = np.asarray(codes)[:ROWS]
    ref = np.asarray(lut)[cn, np.arange(BN)[None, :]]
    ok = np.array_equal(np.asarray(y), ref.astype(np.float32))
    out["sublane_correct"] = bool(ok)
    print("sublane correctness:", ok)

    # --- lane gather reference at matched volume ---
    tab_lane = jnp.asarray(
        np.tile(rng.normal(size=(NGRP * ROWS, 16)), (1, 8)), jnp.float32)

    def kern_lane(t_ref, w_ref, o_ref):
        acc = jnp.zeros((ROWS, BN), jnp.float32)

        def step(i, acc):
            w = w_ref[pl.ds((i % NGRP) * ROWS, ROWS), :]
            t = t_ref[pl.ds((i % NGRP) * ROWS, ROWS), :]
            outs = [jnp.take_along_axis(
                t, (w[:, j * 128:(j + 1) * 128]) & 15, axis=1)
                for j in range(BN // 128)]
            return acc + jnp.concatenate(outs, axis=1)

        o_ref[:] = jax.lax.fori_loop(0, REPS, step, acc)

    @jax.jit
    def run_lane(t, w):
        return pl.pallas_call(
            kern_lane,
            out_shape=jax.ShapeDtypeStruct((ROWS, BN), jnp.float32),
        )(t, w)

    run_case(out, "lane_f32_ref", run_lane, tab_lane, codes)

    # --- basic-op chain at matched volume (cost floor reference) ---
    def kern_ops(t_ref, w_ref, o_ref):
        acc = jnp.zeros((ROWS, BN), jnp.float32)

        def step(i, acc):
            w = w_ref[pl.ds((i % NGRP) * ROWS, ROWS), :]
            v = ((w & 15) | 1).astype(jnp.float32)
            return acc + v

        o_ref[:] = jax.lax.fori_loop(0, REPS, step, acc)

    @jax.jit
    def run_ops(t, w):
        return pl.pallas_call(
            kern_ops,
            out_shape=jax.ShapeDtypeStruct((ROWS, BN), jnp.float32),
        )(t, w)

    run_case(out, "basic_3op_chain", run_ops, tlo, codes)

    with open("benchmarks/probe_sublane_gather.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
