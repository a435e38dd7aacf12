#!/usr/bin/env python
"""Measure TPU in-kernel dynamic-gather throughput across formulations.

The LUT formats (any4/int4/nf4) are gather-bound: the fused-table kernel
does one `jnp.take_along_axis(table[bn,128], idx[bn,128], axis=1)` per
nibble plane, and at K=4096 fast-regime measurements put the whole kernel
at ~134-153 us/layer vs the ~12 us HBM roofline -- consistent with the
gather retiring ~one 128-lane row per cycle. This probe times gather
variants in isolation (same [bn, planes*128] volume) to find a
formulation that engages more sublanes:

  a) per-plane take_along_axis (production)       table [bn,128] idx [bn,128]
  b) one wide take_along_axis per chunk           table [bn,128] idx [bn,P*128]
  c) select-16 one-hot FMA                        no gather
  d) i8 gather: table bf16 but idx precomputed    isolates index math
  e) 2-D lax.gather batched rows                  alternative lowering

Run ALONE on the TPU host: python tools/probe_gather.py
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

BN = 512
PLANES = 8
LANES = 128
REPS = 200  # kernel-internal repeat to amortize dispatch


def _time(f, *args):
    y = f(*args)
    jax.block_until_ready(y)
    float(np.asarray(jax.device_get(y.reshape(-1)[0])))
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        y = f(*args)
        float(np.asarray(jax.device_get(y.reshape(-1)[0])))
        best = min(best, time.perf_counter() - t0)
    return best


def _mk_kernel(body):
    def kern(t_ref, w_ref, o_ref):
        t = t_ref[:]
        w = w_ref[:]
        acc = jnp.zeros((BN, LANES), jnp.float32)

        def step(i, acc):
            # fold i into the codes so nothing is loop-invariant
            return acc + body(t, jnp.bitwise_xor(w, i))

        acc = jax.lax.fori_loop(0, REPS, step, acc)
        o_ref[:] = acc

    @jax.jit
    def run(t, w):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((BN, LANES), jnp.float32),
        )(t, w)

    return run


def body_per_plane(t, w):
    acc = jnp.zeros((BN, LANES), jnp.float32)
    for p in range(PLANES):
        codes = jax.lax.shift_right_logical(w, 4 * p) & 0xF if p else w & 0xF
        acc = acc + jnp.take_along_axis(t, codes, axis=1)
    return acc


def body_wide(t, w):
    planes = []
    for p in range(PLANES):
        codes = jax.lax.shift_right_logical(w, 4 * p) & 0xF if p else w & 0xF
        planes.append(codes)
    idx = jnp.concatenate(planes, axis=1)          # [BN, 8*128]
    g = jnp.take_along_axis(t, idx, axis=1)        # wide gather
    return sum(g[:, p * LANES:(p + 1) * LANES] for p in range(PLANES))


def body_select(t, w):
    acc = jnp.zeros((BN, LANES), jnp.float32)
    for p in range(PLANES):
        codes = jax.lax.shift_right_logical(w, 4 * p) & 0xF if p else w & 0xF
        val = jnp.zeros((BN, LANES), jnp.float32)
        for v in range(16):
            val = val + jnp.where(codes == v, t[:, v:v + 1], 0.0)
        acc = acc + val
    return acc


def body_onehot_dot(t, w):
    # codes -> one-hot [BN*?]: contraction lut[16] @ onehot - global table
    # only; uses iota compare then a dot over the 16 axis via reshape
    acc = jnp.zeros((BN, LANES), jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (BN, LANES), 1) % 16
    for p in range(PLANES):
        codes = jax.lax.shift_right_logical(w, 4 * p) & 0xF if p else w & 0xF
        # roll-based: value = sum over shifts of t where (codes - lane) == 0
        acc = acc + jnp.where(codes == lane, t, 0.0).sum(axis=1, keepdims=True)
    return jnp.broadcast_to(acc, (BN, LANES))


def main():
    key = jax.random.PRNGKey(0)
    t = jax.random.normal(key, (BN, LANES), jnp.float32)
    w = jax.random.randint(jax.random.PRNGKey(1), (BN, LANES), 0,
                           2 ** 31 - 1, jnp.int32)
    n_elems = BN * LANES * PLANES * REPS
    out = {}
    for name, body in [("per_plane", body_per_plane),
                       ("wide", body_wide),
                       ("select16", body_select)]:
        try:
            dt = _time(_mk_kernel(body), t, w)
            gps = n_elems / dt / 1e9
            out[name] = {"s": dt, "gelem_per_s": round(gps, 2)}
            print(f"{name:12s}: {dt*1e3:8.2f} ms  {gps:8.2f} G elem/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e)[:200]}
            print(f"{name:12s}: FAILED {str(e)[:120]}", flush=True)
    with open("benchmarks/probe_gather.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
