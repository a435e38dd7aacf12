#!/usr/bin/env python
"""Device-side op-time comparison of the GEMV candidates via jax.profiler.

Wall-clock timing on the shared relay is only valid in fast-regime windows
(PERF_NOTES), but the profiler records DEVICE op durations that compare
designs even while the pool is throttled (with the caveat that DVFS slows
the gather unit disproportionately, so gather-path numbers are pessimistic
relative to full clock -- see PERF_NOTES Addendum).

Run ALONE on the TPU host: python tools/profile_kernels.py
Writes benchmarks/profile_kernels_r2.json.
"""
import glob
import gzip
import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from any4_tpu.ops import linear as lin


def device_op_times(trace_dir):
    """Parse a jax.profiler trace for per-op device durations (us)."""
    out = {}
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
            name = ev.get("name", "")
            out.setdefault(name, []).append(ev.get("dur", 0))
    return out


def main():
    K = N = 4096
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((N, K), np.float32))
    x = jnp.asarray(rng.standard_normal((1, K), np.float32)).astype(
        jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)

    fns = {"bf16": (jax.jit(lambda a, b: a @ b.T), (x, wb))}
    for fmt in ("int4", "int4p", "any4"):
        kw = dict(kmeans_iters=3) if fmt == "any4" else {}
        qt = lin.quantize_tensor(w, fmt, group_size=128, **kw)
        fns[fmt] = (jax.jit(lambda a, q=qt: lin.linear(a, q)), (x,))

    for name, (f, a) in fns.items():
        t0 = time.time()
        jax.block_until_ready(f(*a))
        print(f"compiled {name} in {time.time()-t0:.0f}s", flush=True)

    results = {}
    for name, (f, a) in fns.items():
        tdir = f"/tmp/ktrace_{name}"
        shutil.rmtree(tdir, ignore_errors=True)
        with jax.profiler.trace(tdir):
            for _ in range(30):
                r = f(*a)
            jax.block_until_ready(r)
        ops = device_op_times(tdir)
        # the kernel of interest dominates; report the op with the largest
        # total device time, plus the full table
        totals = {k: (sum(v), len(v), float(np.median(v)))
                  for k, v in ops.items() if v}
        if not totals:
            print(f"{name}: NO device events captured", flush=True)
            continue
        top = sorted(totals.items(), key=lambda kv: -kv[1][0])[:4]
        results[name] = {
            "top_ops": [
                {"op": k, "total_us": round(t, 1), "count": c,
                 "median_us": round(m, 2)} for k, (t, c, m) in top],
        }
        print(f"{name}: " + "; ".join(
            f"{k.split('.')[-1][:40]} med {m:.1f}us x{c}"
            for k, (t, c, m) in top[:2]), flush=True)

    os.makedirs("benchmarks", exist_ok=True)
    with open("benchmarks/profile_kernels_r2.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote benchmarks/profile_kernels_r2.json", flush=True)


if __name__ == "__main__":
    main()
