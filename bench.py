"""Benchmark: quantized dequant-GEMV speedup vs bf16 matmul (the
reference's headline microbenchmark, README.md:440-455: 1xK * KxK GEMV at
K=4096; the reference reports ANY4 2.29x / INT4 3.26x on an A5000).

Shape of the measurement: a single 4096^2 GEMV on this chip completes in
~15-20us wall in the fast regime for EVERY format -- that is the relay's
per-call dispatch floor, not compute (bf16 at 18us would imply 2.7 TB/s,
above HBM speed), so single-op ratios carry no signal. Instead we time a
16-layer CHAIN of GEMVs over 16 distinct weight buffers (decode-shaped:
each layer's weights stream from HBM, the floor is amortized 16x) and
report per-layer time. This matches how the kernels are actually used
(tools/bench_decode.py measures the same effect end-to-end).

Headline value = int4p (magic-number pair-packed int4, the production
latency format); any4/int4/nf4 LUT formats reported in detail. When a
recorded e2e 1B decode run exists (tools/bench_decode.py), its tokens/s
numbers are attached as e2e_decode_1b.

Measurement notes: the TPU in this environment is reached through a shared
relay whose effective throughput flips between a fast (device-resident) and
slow (contended) regime over time, so single-window timings are unreliable.
We alternate short baseline/candidate windows many times and take the ratio
of the minima (both minima land in the fast regime).

Prints one JSON line:
  {"metric": ..., "value": N, "unit": "x", "vs_baseline": N/3.26}
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
LAYERS = 16  # GEMVs per chain; distinct weight buffers so each streams HBM


def window(f, args, iters):
    t0 = time.perf_counter()
    r = None
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def best_of_alternating(fns, rounds=20, iters=4, budget_s=600.0,
                        fast_us=100.0):
    """fns: {name: (callable, args)}. Alternates windows; returns (min
    time per name, fast_regime_seen). The shared pool is bimodal
    (PERF_NOTES): keeps sampling up to ``budget_s`` until several windows
    land in the fast regime (bf16 per-layer < fast_us), since
    throttled-state ratios carry no signal."""
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
        if rb is not None and rb * 1e6 / LAYERS < fast_us:
            fast_rounds += 1
        elif rb is not None and rb / LAYERS > 500e-6:
            time.sleep(5)
        r += 1
    return best, fast_rounds > 0


def main():
    from any4_tpu.ops import linear as lin
    from any4_tpu.ops.pallas import gemv

    K = N = 4096
    M = 1
    L = LAYERS
    # scale weights ~1/sqrt(K) so activations stay O(1) through the chain
    w = jax.random.normal(jax.random.PRNGKey(0), (N, K), jnp.float32)
    w = w * (K ** -0.5)
    x = jax.random.normal(jax.random.PRNGKey(1), (M, K)).astype(jnp.bfloat16)
    stack = lambda a: None if a is None else jnp.stack([a] * L)

    wbs = stack(w.astype(jnp.bfloat16))  # (L, N, K): L distinct buffers

    def chain_bf16(a, ws):
        for i in range(L):
            a = a @ ws[i].T
        return a

    fns = {"bf16": (jax.jit(chain_bf16), (x, wbs))}
    for fmt in ("any4", "int4", "int4p", "int8p", "nf4"):
        kw = dict(kmeans_iters=8) if fmt == "any4" else {}
        qt = lin.quantize_tensor(w, fmt, group_size=128, **kw)
        kfmt = lin._kernel_fmt(qt.fmt, qt.lut)
        ps, ss, zs, ls = (stack(qt.packed), stack(qt.scales),
                          stack(qt.zeros), stack(qt.lut))

        def chain_q(a, p, s, z, l, kf=kfmt):
            for i in range(L):
                a = gemv.quantized_matmul(
                    a, p[i], s[i], z[i], None if l is None else l[i],
                    fmt=kf, group_size=128, n=N)
            return a

        fns[fmt] = (jax.jit(chain_q), (x, ps, ss, zs, ls))

    best, fast_seen = best_of_alternating(fns)
    t_b = best["bf16"] / L
    print(f"bf16 best: {t_b * 1e6:.1f} us/layer "
          f"({2 * N * K / t_b / 1e9:.0f} GB/s eff)", file=sys.stderr)
    if not fast_seen:
        print("WARNING: no fast-regime window observed (bf16 stayed "
              f"{t_b*1e6:.0f} us/layer); ratios reflect the throttled "
              "state -- see benchmarks/profile_kernels_r2.json for "
              "device-time ratios", file=sys.stderr)
    speedups = {}
    for fmt in ("any4", "int4", "int4p", "int8p", "nf4"):
        speedups[fmt] = best["bf16"] / best[fmt]
        ref = REFERENCE_SPEEDUPS[fmt]
        print(f"{fmt} best: {best[fmt] / L * 1e6:.1f} us/layer, "
              f"speedup {speedups[fmt]:.2f}x (reference {ref:.2f}x)",
              file=sys.stderr)

    # headline = int4p, the production latency format (magic-number
    # pair-packed int4, gather-free -- the analog of the reference's
    # fastest path, README.md:440-455 int4 3.26x). any4/nf4 (LUT gather
    # formats, the accuracy play) are reported alongside in detail.
    value = round(speedups["int4p"], 3)
    out = {
        "metric": "int4p_gemv_chain16_speedup_vs_bf16_K4096",
        "value": value,
        "unit": "x",
        "vs_baseline": round(value / REFERENCE_SPEEDUPS["int4p"], 3),
        "detail": {k: round(v, 3) for k, v in speedups.items()},
        "bf16_us_per_layer": round(t_b * 1e6, 1),
        "fast_regime_observed": fast_seen,
    }
    # attach the north-star e2e artifact (tokens/s/chip quantized decode,
    # tools/bench_decode.py) when a recorded run exists
    decode = {}
    for fmt in ("int4p", "any4"):
        try:
            with open(f"benchmarks/bench_decode_1b_{fmt}_r2.log") as f:
                for ln in f:
                    if ln.startswith("{"):
                        decode[fmt] = json.loads(ln)
        except (OSError, json.JSONDecodeError):
            pass
    if decode:
        out["e2e_decode_1b"] = {
            k: {"tok_s": v.get(f"{k}_tok_s"), "bf16_tok_s": v.get("bf16_tok_s"),
                "speedup": v.get("speedup")} for k, v in decode.items()}
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
