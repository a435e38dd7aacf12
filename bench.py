"""Benchmark: quantized dequant-GEMV speedup vs bf16 matmul (the
reference's headline microbenchmark, README.md:440-455: 1xK * KxK GEMV at
K=4096; the reference reports ANY4 2.29x / INT4 3.26x on an A5000).

Measurement design (hard-won; see PERF_NOTES.md "relay timing"):
- The TPU is reached through a relay whose ``block_until_ready`` acks at
  DISPATCH, not execution: a 16-matmul chain whose device time is
  provably >=750us (jax.profiler) returns "ready" in ~100us. Wall-clock
  of dispatch-acked calls measures queue throughput, not kernels.
- The only honest wall measurement is a call whose VALUE is fetched
  (forces execution) and whose device time is large enough to amortize
  the ~40ms fetch round-trip. We run a 16-layer GEMV chain over 16
  distinct weight buffers (decode-shaped), repeated R times inside one
  jit via lax.fori_loop, with R chosen adaptively so one timed call
  takes ~0.5-2s of real device time.
- The device itself is bimodal (DVFS of the shared pool: ~700 GB/s fast,
  ~20 GB/s throttled). Formats are timed in interleaved rounds and the
  per-format minima compared; the report carries the measured effective
  bandwidth so the regime is visible.

Headline value = int4p (magic-number pair-packed int4, the production
latency format); any4/int4/nf4 LUT formats reported in detail. When a
recorded e2e 1B decode run exists (tools/bench_decode.py), its tokens/s
numbers are attached as e2e_decode_1b.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": "x", "vs_baseline": N/3.26}
plus per-format details on stderr.
"""
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_ANY4_SPEEDUP = 2.29  # A5000, K=4096 (reference README.md:455)
REFERENCE_SPEEDUPS = {"any4": 2.29, "any4t": 2.29, "any4q8": 2.29,
                      "any4q8r": 2.29, "int4": 3.26, "nf4": 2.23,
                      "nf4t": 2.23, "int4p": 3.26, "int8": 1.0,
                      "int8p": 1.0, "w4a8": 3.26, "w8a8": 1.0,
                      "w8a8r": 1.0}
LAYERS = 16  # GEMVs per chain; distinct weight buffers so each streams HBM
# NOTE: "any4"/"nf4" default to the transposed sublane-gather packing,
# "int4" to the pair-packed magic kernel, and "int8"/"w8a8"/"any4q8" to
# the grouped XLA-dot layout (quantize_tensor round-5 routing); the
# explicit any4t/nf4t entries confirm the identity, int8p keeps the
# retired split-byte design measurable, and any4q8r/w8a8r are the
# per-row-scale XLA formats (plain-dot rate at m=1)
FMTS = ("any4", "any4t", "any4q8", "any4q8r", "int4", "int4p", "int8",
        "int8p", "nf4", "nf4t", "w4a8", "w8a8", "w8a8r")


def timed_exec(f, args):
    """Time one call INCLUDING a scalar value fetch (the only barrier the
    relay honors; block_until_ready acks at dispatch)."""
    t0 = time.perf_counter()
    y = f(*args)
    float(np.asarray(jax.device_get(y[0, 0])))
    return time.perf_counter() - t0


def build_chain(fmt, x, stacks, shape, kernel_fmt, reps):
    """Jitted R-times-repeated 16-layer GEMV chain; value-fetch timed.
    Square shapes feed each layer's output into the next; non-square
    shapes run the 16 GEMVs off the carried vector and fold their sum
    back into it (a real data dependency, so the loop cannot be
    dead-code-eliminated)."""
    from any4_tpu.ops.pallas import gemv
    L = LAYERS
    N, K = shape

    if fmt == "bf16":
        def layer(a, st, i):
            (ws,) = st
            return a @ ws[i].T
    elif kernel_fmt in ("w8a8g", "int8g", "any4q8g",
                        "w8a8r", "int8r", "any4q8r"):
        # XLA-dot formats: no Pallas kernel -- rebuild the tensor and go
        # through the production linear dispatch
        from any4_tpu.ops import linear as lin

        def layer(a, st, i):
            p, s, z, l = st
            qt = lin.QuantizedTensor(
                p[i], s[i], z[i], None, kernel_fmt,
                group_size=(K if kernel_fmt.endswith("r") else 128),
                shape=(N, K), dtype=jnp.bfloat16)
            return lin.linear(a, qt).astype(jnp.bfloat16)
    elif fmt in ("w4a8", "w8a8", "any4q8"):
        def layer(a, st, i):
            p, s, z, l = st
            if a.shape[0] <= gemv.FUSED_ACT_M_MAX:
                # float input -> activation quantization fused in-kernel
                # (one dispatch per layer; PERF_NOTES round 2d)
                return gemv.quantized_matmul(
                    a, p[i], s[i], z[i], None, fmt=kernel_fmt,
                    group_size=128, n=N, out_dtype=jnp.bfloat16)
            # larger m: external per-row absmax int8 quantize + post-scale
            # (the production dispatch, ops.linear.linear)
            from any4_tpu.ops import linear as lin
            xq, sx = lin.quantize_activations(a)
            y = gemv.quantized_matmul(
                xq, p[i], s[i], z[i], None, fmt=kernel_fmt, group_size=128,
                n=N, out_dtype=jnp.float32)
            return (y * sx).astype(jnp.bfloat16)
    elif fmt == "int8p":
        def layer(a, st, i):
            # duplicate each 128-wide x group for the split-byte planes
            # (mirrors ops.linear.linear's int8p dispatch)
            p, s, z, l = st
            xr = a.reshape(a.shape[0], a.shape[-1] // 128, 128)
            xq = jnp.repeat(xr, 2, axis=-2).reshape(
                a.shape[0], 2 * a.shape[-1])
            return gemv.quantized_matmul(
                xq, p[i], s[i], z[i], None,
                fmt=kernel_fmt, group_size=128, n=N)
    else:
        def layer(a, st, i):
            p, s, z, l = st
            return gemv.quantized_matmul(
                a, p[i], s[i], z[i], None if l is None else l[i],
                fmt=kernel_fmt, group_size=128, n=N)

    @jax.jit
    def run(a, st):
        def body(_, a):
            if N == K:
                out = a
                for i in range(L):
                    out = layer(out, st, i)
            else:
                acc = layer(a, st, 0)
                for i in range(1, L):
                    acc = acc + layer(a, st, i)
                acc = (acc[:, :K] if N >= K
                       else jnp.pad(acc, ((0, 0), (0, K - N))))
                out = a + acc.astype(a.dtype)
            # renormalize once per pass so values stay finite across reps
            # (cost is negligible vs 16 matmuls)
            return (out * jax.lax.rsqrt(
                jnp.float32(jnp.mean(out * out)) + 1e-6)
                ).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, reps, body, a)

    return functools.partial(run, x, stacks)


def measure(shape=(4096, 4096), fmts=FMTS, budget_s=420.0, rounds=6,
            target_call_s=2.0, verbose=True, m=1):
    """Interleaved minima of value-fetch-timed repeated chains.
    Returns (per-format best seconds per layer, bf16 effective GB/s)."""
    from any4_tpu.ops import linear as lin

    N, K = shape
    w = jax.random.normal(jax.random.PRNGKey(0), (N, K), jnp.float32)
    w = w * (K ** -0.5)
    x = jax.random.normal(jax.random.PRNGKey(1), (m, K)).astype(jnp.bfloat16)
    stack = lambda a: None if a is None else jnp.stack([a] * LAYERS)

    mats = {"bf16": (None, (stack(w.astype(jnp.bfloat16)),))}
    for fmt in fmts:
        kw = dict(kmeans_iters=8) \
            if fmt in ("any4", "any4t", "any4q8", "any4q8r") else {}
        # jit the quantizer: eager per-op dispatch through the relay takes
        # minutes per weight in the throttled regime (boundary-code jitter
        # vs eager is ~1e-7 -- irrelevant for timing)
        qt = jax.jit(functools.partial(
            lin.quantize_tensor, fmt=fmt, group_size=128, **kw))(w)
        mats[fmt] = (lin._kernel_fmt(qt.fmt, qt.lut),
                     (stack(qt.packed), stack(qt.scales), stack(qt.zeros),
                      stack(qt.lut)))

    # the value fetch itself costs a relay round-trip (~40 ms); measure it
    # on a trivial op and subtract, and choose R so real compute dwarfs it
    tiny = jax.jit(lambda v: v + 1)
    timed_exec(tiny, (x,))  # compile
    rtt = min(timed_exec(tiny, (x,)) for _ in range(3))

    # calibrate R on bf16 (the most HBM-hungry chain): one R=1 fetch-timed
    # call tells us the current regime
    probe = build_chain("bf16", x, mats["bf16"][1], shape, None, 1)
    probe()  # compile
    t1 = min(timed_exec(probe, ()) for _ in range(2)) - rtt
    # an R=1 chain in the fast regime is sub-RTT-jitter (device ~0.7 ms at
    # 4096^2 vs ~40 ms fetch): floor the estimate at the ANALYTIC chain
    # time at peak HBM bandwidth -- a true lower bound -- so small shapes
    # get enough reps to dwarf the rtt (the old flat 1 ms floor + cap 512
    # left K<=2048 calls below the rtt and the subtraction floored out,
    # producing garbage ratios)
    t1 = max(t1, LAYERS * N * K * 2 / 850e9)
    reps = max(1, min(32768, int(target_call_s / t1)))
    bw = LAYERS * N * K * 2 / t1 / 1e9
    if verbose:
        print(f"calibration: rtt {rtt*1e3:.1f} ms, R=1 chain "
              f"{t1*1e3:.1f} ms ({bw:.0f} GB/s eff) -> reps={reps}",
              file=sys.stderr)

    # one reps for every format: a quantized chain is at most ~3x faster
    # than bf16's >=target_call_s, so each call still dwarfs the rtt
    reps_of = {k: reps for k in mats}
    fns = {k: build_chain(k, x, st, shape, kf, reps_of[k])
           for k, (kf, st) in mats.items()}
    for f in fns.values():
        f()  # compile

    best = {k: float("inf") for k in fns}
    t0 = time.time()
    done = False
    for r in range(rounds):
        for k, f in fns.items():
            # check INSIDE the loop: reps calibrated in the fast regime
            # can make one call take ~40x target_call_s after a DVFS
            # throttle (documented bimodal pool), so between-round checks
            # alone can far overshoot the budget
            if r > 0 and time.time() - t0 > budget_s:
                done = True
                break
            best[k] = min(best[k], max(timed_exec(f, ()) - rtt, 1e-6))
        if done:
            break
    per_layer = {k: v / (reps_of[k] * LAYERS) for k, v in best.items()}
    eff_gbs = N * K * 2 / per_layer["bf16"] / 1e9
    return per_layer, eff_gbs


def _device_op_total_us(trace_dir) -> float:
    """Sum device-side op durations (us) from a jax.profiler trace."""
    import glob
    import gzip
    import os
    tot = 0.0
    for path in glob.glob(os.path.join(
            trace_dir, "**", "*.trace.json.gz"), recursive=True):
        with gzip.open(path, "rt") as f:
            trace = json.load(f)
        pid_names = {}
        for ev in trace.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pid_names[ev["pid"]] = ev["args"].get("name", "")
        for ev in trace.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            pname = pid_names.get(ev.get("pid"), "")
            if "TPU" not in pname and "/device:" not in pname:
                continue
            if ev.get("name", "").startswith(("jit_", "jit(")):
                tot += ev.get("dur", 0)
    return tot


def device_bracket(fmts=FMTS, shape=(4096, 4096), reps=8):
    """Per-format DEVICE time per layer (us) captured in one process/DVFS
    state via jax.profiler -- the regime-robust companion to the wall
    minima (VERDICT r2 weak #7: single-run wall captures can mislead when
    the shared pool throttles mid-run; device ratios within one trace
    compare designs regardless of the clock state)."""
    import tempfile
    from any4_tpu.ops import linear as lin

    N, K = shape
    w = jax.random.normal(jax.random.PRNGKey(0), (N, K), jnp.float32)
    w = w * (K ** -0.5)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, K)).astype(jnp.bfloat16)
    stack = lambda a: None if a is None else jnp.stack([a] * LAYERS)
    out = {}
    chains = {}
    mats = {"bf16": (None, (stack(w.astype(jnp.bfloat16)),))}
    for fmt in fmts:
        kw = dict(kmeans_iters=8) \
            if fmt in ("any4", "any4t", "any4q8", "any4q8r") else {}
        qt = jax.jit(functools.partial(
            lin.quantize_tensor, fmt=fmt, group_size=128, **kw))(w)
        mats[fmt] = (lin._kernel_fmt(qt.fmt, qt.lut),
                     (stack(qt.packed), stack(qt.scales), stack(qt.zeros),
                      stack(qt.lut)))
    for name, (kf, st) in mats.items():
        chains[name] = build_chain(name, x, st, shape, kf, reps)
        chains[name]()  # compile outside the trace
    for name, f in chains.items():
        with tempfile.TemporaryDirectory() as td:
            with jax.profiler.trace(td):
                timed_exec(f, ())
            tot = _device_op_total_us(td)
        out[name] = round(tot / (reps * LAYERS), 2)
    return out


def main():
    per_layer, eff_gbs = measure()
    t_b = per_layer["bf16"]
    regime = "fast" if eff_gbs > 200 else "throttled"
    print(f"bf16 best: {t_b * 1e6:.1f} us/layer ({eff_gbs:.0f} GB/s eff, "
          f"{regime} regime)", file=sys.stderr)
    speedups = {}
    for fmt in FMTS:
        speedups[fmt] = t_b / per_layer[fmt]
        ref = REFERENCE_SPEEDUPS[fmt]
        print(f"{fmt} best: {per_layer[fmt] * 1e6:.1f} us/layer, "
              f"speedup {speedups[fmt]:.2f}x (reference {ref:.2f}x)",
              file=sys.stderr)

    # headline = the fastest exact-weight-semantics 4-bit format: int4p
    # (magic-number pair-packed, weight-only -- the analog of the
    # reference's fastest path, README.md:440-455 int4 3.26x) or w4a8
    # (same int4 weights on the int8 MXU with per-row int8 activations --
    # a throughput format the weight-only reference has no analog of).
    # any4/nf4 (LUT gather formats, the accuracy play) in detail.
    head = "w4a8" if speedups.get("w4a8", 0) > speedups["int4p"] \
        else "int4p"
    value = round(speedups[head], 3)
    out = {
        "metric": f"{head}_gemv_chain16_speedup_vs_bf16_K4096",
        "value": value,
        "unit": "x",
        "vs_baseline": round(value / REFERENCE_SPEEDUPS[head], 3),
        "detail": {k: round(v, 3) for k, v in speedups.items()},
        "bf16_us_per_layer": round(t_b * 1e6, 1),
        "bf16_effective_gbs": round(eff_gbs, 0),
        "regime": regime,
    }
    # attach the north-star e2e artifact (tokens/s/chip quantized decode,
    # tools/bench_decode.py) when a recorded run exists
    decode = {}
    for fmt in ("w4a8", "int4p", "any4t", "any4", "any4q8", "any4q8r"):
        for tag in ("qemb_r5", "r5", "qemb_r4", "r4", "qemb_r3", "r3",
                    "burst256", "burst", "r2b", "r2"):
            try:
                with open(f"benchmarks/bench_decode_1b_{fmt}_{tag}.log") as f:
                    for ln in f:
                        if ln.startswith("{"):
                            rec = json.loads(ln)
                            label = (f"{fmt}+qemb_{rec['quantize_embeddings']}"
                                     if rec.get("quantize_embeddings")
                                     else fmt)
                            rec[f"{label}_tok_s"] = rec.get(f"{fmt}_tok_s")
                            decode.setdefault(label, rec)
            except (OSError, json.JSONDecodeError):
                pass
    # w4a8 + quantized (tied) embeddings: the fastest recorded decode
    # config (the lm_head matmul reads w8a8 off the packed vocab table)
    try:
        with open("benchmarks/bench_decode_1b_w4a8_qemb_burst256.log") as f:
            for ln in f:
                if ln.startswith("{"):
                    q = json.loads(ln)
                    bf = decode.get("w4a8", {}).get("bf16_tok_s")
                    decode["w4a8+qemb_w8a8"] = {
                        "w4a8+qemb_w8a8_tok_s": q.get("w4a8_tok_s"),
                        "bf16_tok_s": bf,
                        "speedup": (round(q["w4a8_tok_s"] / bf, 3)
                                    if bf and q.get("w4a8_tok_s") else None)}
    except (OSError, json.JSONDecodeError, KeyError):
        pass
    if decode:
        out["e2e_decode_1b"] = {
            k: {"tok_s": v.get(f"{k}_tok_s"), "bf16_tok_s": v.get("bf16_tok_s"),
                "speedup": v.get("speedup")} for k, v in decode.items()}
    # FLAGSHIP scale (BASELINE.json's literal metric: tokens/s/chip for
    # quantized Llama-3.1-8B-class decode). bf16 does not fit this
    # chip's HBM, so each record carries the quantized checkpoint's own
    # HBM-roofline tokens/s and the % of it achieved
    # (tools/bench_decode.py --size 8b --host-init).
    dec8 = {}
    for fmt in ("any4q8r", "any4t", "any4", "w4a8", "any4q8"):
        try:
            with open(f"benchmarks/bench_decode_8b_{fmt}_r5.log") as f:
                for ln in f:
                    if ln.startswith("{"):
                        rec = json.loads(ln)
                        dec8[fmt] = {
                            "tok_s": rec.get(f"{fmt}_tok_s"),
                            "quant_gb": rec.get("quant_gb"),
                            "roofline_tok_s": rec.get("roofline_tok_s"),
                            "pct_of_roofline": rec.get("pct_of_roofline")}
        except (OSError, json.JSONDecodeError):
            pass
    for fmt in ("w4a8", "any4q8r"):
        try:
            with open(f"benchmarks/bench_engine_8b_{fmt}_solo_r5.json") as f:
                ab = json.loads(f.readline())
            dec8[f"engine_{fmt}"] = {
                "tok_s": ab["tok_s"], "rounds": ab.get("rounds"),
                "roofline_tok_s": ab.get("roofline_tok_s"),
                "pct_of_roofline": ab.get("pct_of_roofline"),
                "config": {k: ab.get(k) for k in
                           ("slots", "max_ctx", "burst", "kv_quantize")}}
        except (OSError, json.JSONDecodeError, KeyError):
            pass
    if dec8:
        out["e2e_decode_8b"] = dec8
    dec3 = {}
    for fmt in ("any4q8r", "w4a8"):
        try:
            with open(f"benchmarks/bench_decode_3b_{fmt}_r5.log") as f:
                for ln in f:
                    if ln.startswith("{"):
                        rec = json.loads(ln)
                        dec3[fmt] = {
                            "tok_s": rec.get(f"{fmt}_tok_s"),
                            "bf16_tok_s": rec.get("bf16_tok_s"),
                            "speedup": rec.get("speedup"),
                            "pct_of_roofline": rec.get("pct_of_roofline")}
        except (OSError, json.JSONDecodeError):
            pass
    if dec3:
        out["e2e_decode_3b"] = dec3
    # north-star ENGINE artifact: bf16 vs quantized serving throughput
    # alternated IN ONE PROCESS (tools/bench_engine_ab.py -- regime-
    # robust; the adjacent-window runs it superseded are kept as
    # bench_engine_1b_{bf16,w4a8_qemb}_r3.json)
    for label, fnames in (
            ("engine_1b", ("bench_engine_ab_1b_w4a8_r4.json",
                           "bench_engine_ab_1b_w4a8_r3.json")),
            ("engine_1b_ctx2048",
             ("bench_engine_ab_1b_w4a8_ctx2048_r4.json",
              "bench_engine_ab_1b_w4a8_ctx2048_r3.json")),
            ("engine_1b_ctx2048_kvq",
             ("bench_engine_ab_1b_w4a8_kvq_ctx2048_sc3d_r4.json",
              "bench_engine_ab_1b_w4a8_kvq_ctx2048_r4.json",
              "bench_engine_ab_1b_w4a8_kvq_ctx2048_r3.json")),
            # int8-KV tax isolated in-process: BOTH arms w4a8+qemb at the
            # same slots, bf16 vs int8 KV (ab_mode=kvq)
            ("engine_1b_kvq_tax_ctx2048",
             ("bench_engine_ab_1b_kvq_tax_ctx2048_r4.json",)),
            ("engine_1b_ctx4096",
             ("bench_engine_ab_1b_w4a8_ctx4096_r4.json",)),
            # TRUE long-context points (prompt ~= bucket; the plain
            # ctx-N rows decode at seq <= 192 whatever the bucket is)
            ("engine_1b_long2048",
             ("bench_engine_ab_1b_w4a8_long2048_r5.json",
              "bench_engine_ab_1b_w4a8_long2048_flash_r4.json",
              "bench_engine_ab_1b_w4a8_long2048_r4b.json")),
            ("engine_1b_long4096",
             ("bench_engine_ab_1b_w4a8_long4096_r5.json",
              "bench_engine_ab_1b_w4a8_long4096_r4b.json",
              "bench_engine_ab_1b_w4a8_long4096_flash_r4.json")),
            ("engine_1b_long4096_kvq",
             ("bench_engine_ab_1b_w4a8_kvq_long4096_r5.json",
              "bench_engine_ab_1b_w4a8_kvq_long4096_bf16dot_r4.json",
              "bench_engine_ab_1b_w4a8_kvq_long4096_sc3d_flash_r4.json",
              "bench_engine_ab_1b_w4a8_kvq_long4096_r4b.json")),
            ("engine_1b_kvcap_ctx2048",
             ("bench_engine_ab_1b_kvcap_ctx2048_r4.json",)),
            ("engine_1bmoe", ("bench_engine_ab_1bmoe_w4a8_burst64_r5.json",
                              "bench_engine_ab_1bmoe_w4a8_burst32_r5.json",
                              "bench_engine_ab_1bmoe_w4a8_depth4_r4.json",
                              "bench_engine_ab_1bmoe_w4a8_r4.json",
                              "bench_engine_ab_1bmoe_w4a8_r3.json"))):
        for fname in fnames:
            try:
                with open(f"benchmarks/{fname}") as f:
                    ab = json.loads(f.readline())
                out[label] = {
                    "bf16_tok_s": ab["bf16_tok_s"],
                    "w4a8_qemb_tok_s": ab["tok_s"],
                    "speedup": ab["speedup"],
                    "rounds": ab.get("rounds"),
                    "config": {k: ab.get(k) for k in
                               ("slots", "max_ctx", "burst", "pipeline",
                                "kv_layout", "kv_quantize", "ab_mode")},
                }
                break
            except (OSError, json.JSONDecodeError, KeyError):
                pass
    # regime bracket (VERDICT r2 weak #7): a fresh DEVICE-time capture of
    # every format in ONE profiler state, attached alongside the wall
    # minima so the artifact is robust to the pool's DVFS state
    try:
        dev = device_bracket()
        out["device_us_per_layer_one_state"] = dev
        if dev.get("bf16"):
            # fixed inter-op gap of this relay runtime: wall minus device
            # for the SAME bf16 chain (applies to plain XLA dots too --
            # NOT a pallas prologue, NOT DVFS; gap_account_r4.json)
            out["inter_op_gap_us"] = round(t_b * 1e6 - dev["bf16"], 2)
            out["device_time_speedups_one_state"] = {
                k: round(dev["bf16"] / v, 2)
                for k, v in dev.items() if k != "bf16" and v}
            if dev.get(head):
                # the wall headline rides the relay's dispatch floor and
                # the pool's DVFS state; the one-profiler-state device
                # ratio is the apples-to-apples comparison against the
                # reference's (device-resident) speedups
                out["vs_baseline_device"] = round(
                    dev["bf16"] / dev[head] / REFERENCE_SPEEDUPS[head], 3)
    except Exception as e:  # profiling must never sink the bench artifact
        out["device_bracket_error"] = f"{type(e).__name__}: {str(e)[:120]}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
