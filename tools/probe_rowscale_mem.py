#!/usr/bin/env python
"""Probe: does the per-row-scale XLA int8 dot hoist a transposed weight
copy inside a decode scan?

The 8B any4q8r decode OOMed at ~8 GB of weights on a 16 GB chip --
consistent with XLA materializing a loop-invariant relayout/transpose of
every [n, k] int8 weight used inside lax.scan (weights 2x). This probe
runs a scan-decode-shaped loop over a few big rowscale layers in three
variants and reads device memory_stats():

  A: packed [n, k], dot_general contracting (1, 1)   (current layout)
  B: packed [k, n], dot_general contracting (1, 0)   (natural MXU feed)
  C: variant A outside any scan (no LICM possible)

plus wall us/layer for each, so the fix (if B) can be adopted without
losing the 654 GB/s rate. Run ALONE on the TPU.
"""
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import bench

L = 8
N, K = 16384, 8192          # 134 MB int8 per layer -> 1.07 GB of weights
ACT_QMAX = 127.0


def mem_mb():
    st = jax.local_devices()[0].memory_stats() or {}
    return round(st.get("bytes_in_use", 0) / 1e6, 1)


def quant_act(a):
    xf = a.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                     1e-8) / ACT_QMAX
    xq = jnp.clip(jnp.round(xf / sx), -ACT_QMAX, ACT_QMAX).astype(jnp.int8)
    return xq, sx


def layer_nk(a, w, s):
    xq, sx = quant_act(a)
    P = jax.lax.dot_general(xq, w, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = P.astype(jnp.float32) * s * sx
    return y[:, :K].astype(jnp.bfloat16)


def layer_kn(a, w, s):
    xq, sx = quant_act(a)
    P = jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = P.astype(jnp.float32) * s * sx
    return y[:, :K].astype(jnp.bfloat16)


def main():
    key = jax.random.PRNGKey(0)
    w_nk = jax.random.randint(key, (L, N, K), -127, 127,
                              jnp.int32).astype(jnp.int8)
    w_kn = jnp.transpose(w_nk, (0, 2, 1)).copy()
    s = jnp.ones((L, 1, N), jnp.float32) * 1e-2
    x = jax.random.normal(key, (1, K)).astype(jnp.bfloat16)
    jax.block_until_ready((w_nk, w_kn))
    base = mem_mb()
    print(f"baseline bytes_in_use: {base} MB "
          f"(weights 2x {L*N*K/1e6:.0f} MB)", file=sys.stderr)

    def scan_fn(layer, w):
        @jax.jit
        def run(x, w, s):
            def step(a, _):
                for i in range(L):
                    a = layer(a, w[i], s[i])
                return a, a[0, 0]
            out, ys = jax.lax.scan(step, x, None, length=32)
            return ys
        return functools.partial(run, x, w, s)

    out = {"baseline_mb": base, "weights_mb": round(2 * L * N * K / 1e6, 1)}
    for name, layer, w in (("A_nk_scan", layer_nk, w_nk),
                           ("B_kn_scan", layer_kn, w_kn)):
        f = scan_fn(layer, w)
        y = f()
        jax.block_until_ready(y)
        peak = mem_mb()
        t0 = time.perf_counter()
        float(np.asarray(jax.device_get(f()[-1])))
        dt = time.perf_counter() - t0
        out[name] = {"bytes_in_use_mb": peak,
                     "excess_vs_baseline_mb": round(peak - base, 1),
                     "us_per_layer": round(dt / (32 * L) * 1e6, 2)}
        print(f"{name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))
    with open("benchmarks/probe_rowscale_mem_r5.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
