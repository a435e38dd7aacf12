"""Benchmark: any4 fused dequant-GEMV speedup vs bf16 matmul (the
reference's headline microbenchmark, README.md:440-455: 1xK * KxK GEMV at
K=4096; the reference reports ANY4 2.29x / INT4 3.26x on an A5000).

Measurement notes: the TPU in this environment is reached through a shared
relay whose effective throughput flips between a fast (device-resident) and
slow (contended) regime over time, so single-window timings are unreliable.
We alternate short baseline/candidate windows many times and take the ratio
of the minima (both minima land in the fast regime).

Prints one JSON line:
  {"metric": ..., "value": N, "unit": "x", "vs_baseline": N/2.29}
plus per-format details on stderr.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_ANY4_SPEEDUP = 2.29  # A5000, K=4096 (reference README.md:455)
REFERENCE_SPEEDUPS = {"any4": 2.29, "int4": 3.26, "nf4": 2.23,
                      "int4p": 3.26, "int8p": 1.0}


def window(f, args, iters):
    t0 = time.perf_counter()
    r = None
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def best_of_alternating(fns, rounds=20, iters=20, budget_s=600.0,
                        fast_us=100.0):
    """fns: {name: (callable, args)}. Alternates windows; returns (min
    time per name, fast_regime_seen). The shared pool is bimodal
    (PERF_NOTES): keeps sampling up to ``budget_s`` until several windows
    land in the fast regime (bf16 < fast_us), since throttled-state
    ratios carry no signal."""
    best = {k: float("inf") for k in fns}
    for k, (f, a) in fns.items():
        jax.block_until_ready(f(*a))
    t0 = time.time()
    fast_rounds = 0
    r = 0
    while (r < rounds or fast_rounds < 3) and time.time() - t0 < budget_s \
            and fast_rounds < 6:
        rb = None
        for k, (f, a) in fns.items():
            t = window(f, a, iters)
            best[k] = min(best[k], t)
            if k == "bf16":
                rb = t
        if rb is not None and rb * 1e6 < fast_us:
            fast_rounds += 1
        elif rb is not None and rb > 500e-6:
            time.sleep(5)
        r += 1
    return best, fast_rounds > 0


def main():
    from any4_tpu.ops import linear as lin
    from any4_tpu.ops.pallas import gemv

    K = N = 4096
    M = 1
    w = jax.random.normal(jax.random.PRNGKey(0), (N, K), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (M, K)).astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)

    fns = {"bf16": (jax.jit(lambda a, b: a @ b.T), (x, wb))}
    for fmt in ("any4", "int4", "int4p", "int8p", "nf4"):
        kw = dict(kmeans_iters=8) if fmt == "any4" else {}
        qt = lin.quantize_tensor(w, fmt, group_size=128, **kw)
        kfmt = lin._kernel_fmt(qt.fmt, qt.lut)
        f = jax.jit(lambda a, p, s, z, l, kf=kfmt:
                    gemv.quantized_matmul(a, p, s, z, l, fmt=kf,
                                          group_size=128, n=N))
        fns[fmt] = (f, (x, qt.packed, qt.scales, qt.zeros, qt.lut))

    best, fast_seen = best_of_alternating(fns)
    t_b = best["bf16"]
    print(f"bf16 best: {t_b * 1e6:.1f} us "
          f"({2 * N * K / t_b / 1e9:.0f} GB/s eff)", file=sys.stderr)
    if not fast_seen:
        print("WARNING: no fast-regime window observed (bf16 stayed "
              f"{t_b*1e6:.0f} us); ratios reflect the throttled state -- "
              "see benchmarks/profile_kernels_r2.json for device-time "
              "ratios", file=sys.stderr)
    speedups = {}
    for fmt in ("any4", "int4", "int4p", "int8p", "nf4"):
        speedups[fmt] = t_b / best[fmt]
        ref = REFERENCE_SPEEDUPS[fmt]
        print(f"{fmt} best: {best[fmt] * 1e6:.1f} us, "
              f"speedup {speedups[fmt]:.2f}x (reference {ref:.2f}x)",
              file=sys.stderr)

    value = round(speedups["any4"], 3)
    out = {
        "metric": "any4_gemv_speedup_vs_bf16_K4096",
        "value": value,
        "unit": "x",
        "vs_baseline": round(value / REFERENCE_ANY4_SPEEDUP, 3),
        "detail": {k: round(v, 3) for k, v in speedups.items()},
        "bf16_us": round(t_b * 1e6, 1),
        "fast_regime_observed": fast_seen,
    }
    if not fast_seen:
        # throttled wall ratios carry no signal; attach the device-time
        # profiler ratios (regime-proof, tools/profile_kernels.py) so the
        # artifact records the real kernel comparison
        try:
            with open("benchmarks/profile_kernels_r2.json") as f:
                prof = json.load(f)
            dev = {k: v["top_ops"][0]["median_us"]
                   for k, v in prof.items() if v.get("top_ops")}
            if "bf16" in dev:
                out["device_time_speedups_same_dvfs_state"] = {
                    k: round(dev["bf16"] / v, 2)
                    for k, v in dev.items() if k != "bf16"}
        except (OSError, json.JSONDecodeError, KeyError, IndexError):
            pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
