#!/usr/bin/env python
"""Probe Mosaic dynamic_gather dtype/axis support on the live TPU.

Round-3 finding (benchmarks/lab_any4_r3.json): every any4 kernel built on
f32/i32 gathers or on the transposed layout floors at >= 37 us/layer at
4096^2 (vs w4a8 24.5, bf16 46). The only structure fast enough for
"any4 >= 1.5x bf16" is w4a8's own (quad-packed rows-on-sublanes, codes as
int8 via ONE bitcast) -- which needs an 8-bit LANE gather
``take_along_axis(table_i8 [bn, 128], c8 [bn, 128], axis=1)`` whose index
IS the bitcast output. This probe answers, per (dtype, axis, idx-dtype):
does it compile, is it correct, roughly what does it cost?

Run ALONE on the TPU host: python tools/probe_gather_dtypes.py
"""
import functools
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN = 256
REPS = 64  # in-kernel gather reps (varied data defeats CSE)


def mk(axis, tdt, idt, reps):
    def kern(t_ref, i_ref, o_ref):
        t = t_ref[:]
        idx = i_ref[:]
        acc = jnp.zeros(t.shape, t.dtype)
        for r in range(reps):
            # vary the index each rep so the loop can't be CSE'd
            iv = (idx + r) % t.shape[axis] if reps > 1 else idx
            acc = acc + jnp.take_along_axis(t, iv.astype(idt), axis=axis)
        o_ref[:] = acc

    return kern


def run_case(name, axis, tdt, idt, shape, reps=1):
    rows, cols = shape
    reach = rows if axis == 0 else cols
    key = jax.random.PRNGKey(0)
    if tdt == jnp.int8:
        t = jax.random.randint(key, shape, -100, 100, jnp.int32).astype(tdt)
    elif tdt in (jnp.bfloat16, jnp.float32):
        t = jax.random.normal(key, shape, jnp.float32).astype(tdt)
    else:
        t = jax.random.randint(key, shape, -100, 100, tdt)
    idx = jax.random.randint(jax.random.PRNGKey(1), shape, 0, min(reach, 16),
                             jnp.int32)
    out_dt = jnp.float32 if tdt in (jnp.bfloat16, jnp.float32) else jnp.int32

    fn = pl.pallas_call(
        mk(axis, tdt, idt, reps),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, tdt),
    )
    try:
        y = jax.jit(fn)(t, idx)
        y.block_until_ready()
    except Exception as e:
        return {"ok": False, "err": f"{type(e).__name__}: {str(e)[:160]}"}
    if reps == 1:
        ref = jnp.take_along_axis(t.astype(out_dt), idx, axis=axis)
        good = bool(jnp.all(y.astype(out_dt) == ref))
        return {"ok": True, "correct": good}
    # timing: best of 5
    import time
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(t, idx))
        best = min(best, time.perf_counter() - t0)
    per_gather_us = best / reps * 1e6
    return {"ok": True, "us_per_gather_of_shape": round(per_gather_us, 3)}


def main():
    out = {}
    cases = [
        # name, axis, table dtype, idx cast dtype, shape
        ("lane_f32_i32", 1, jnp.float32, jnp.int32, (8, 128)),
        ("lane_i8_i32", 1, jnp.int8, jnp.int32, (32, 128)),
        ("lane_i8_i8", 1, jnp.int8, jnp.int8, (32, 128)),
        ("lane_bf16_i32", 1, jnp.bfloat16, jnp.int32, (16, 128)),
        ("lane_bf16_i16", 1, jnp.bfloat16, jnp.int16, (16, 128)),
        ("sub_f32_i32", 0, jnp.float32, jnp.int32, (8, 256)),
        ("sub_i8_i32", 0, jnp.int8, jnp.int32, (32, 256)),
        ("sub_i8_i8", 0, jnp.int8, jnp.int8, (32, 256)),
        ("sub_bf16_i32", 0, jnp.bfloat16, jnp.int32, (16, 256)),
    ]
    for name, axis, tdt, idt, shape in cases:
        r = run_case(name, axis, tdt, idt, shape)
        out[name] = r
        print(f"{name:16s} {r}", file=sys.stderr)
        if r.get("correct"):
            # cost at production-ish width
            big = (shape[0], 512) if axis == 0 else (512, 128)
            rt = run_case(name + "_timed", axis, tdt, idt, big, reps=REPS)
            out[name]["timing_shape"] = list(big)
            out[name].update(rt)
            print(f"  -> {rt}", file=sys.stderr)
    with open("benchmarks/probe_gather_dtypes.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
