#!/usr/bin/env python
"""Slim fast-regime watcher: times the production GEMV paths in
interleaved windows until enough fast-regime samples land (bf16 < 100us)
or the budget expires. Complements tools/perf_lab_r2.py (full candidate
sweep) and tools/profile_kernels.py (device-time ratios, regime-proof).

Run ALONE on the TPU host:
  PERF_WATCH_BUDGET_S=14400 python tools/perf_watch.py
"""
import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from any4_tpu.ops import linear as lin


def main():
    K = N = 4096
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((N, K), np.float32))
    x = jnp.asarray(rng.standard_normal((1, K), np.float32)).astype(
        jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)

    fns = {"bf16": (jax.jit(lambda a, b: a @ b.T), (x, wb)),
           "read_bf16": (jax.jit(
               lambda b: jnp.sum(b.astype(jnp.float32), axis=1)), (wb,))}
    for fmt in ("int4", "int4p", "int8p", "any4", "nf4"):
        kw = dict(kmeans_iters=3) if fmt == "any4" else {}
        qt = lin.quantize_tensor(w, fmt, group_size=128, **kw)
        fns[fmt] = (jax.jit(lambda a, q=qt: lin.linear(a, q)), (x,))
        if fmt == "int4p":
            fns["int4p_bn1024"] = (jax.jit(
                lambda a, q=qt: lin.linear(a, q, block_n=1024)), (x,))

    for name, (f, a) in fns.items():
        t0 = time.time()
        jax.block_until_ready(f(*a))
        print(f"compiled {name} in {time.time()-t0:.0f}s", flush=True)

    best = {k: float("inf") for k in fns}
    iters = 20
    fast_rounds = 0
    t_start = time.time()
    budget = float(os.environ.get("PERF_WATCH_BUDGET_S", 14400))
    r = 0
    while time.time() - t_start < budget and fast_rounds < 15:
        rb = None
        for name, (f, a) in fns.items():
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(*a)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / iters
            best[name] = min(best[name], dt)
            if name == "bf16":
                rb = dt
        if rb < 100e-6:
            fast_rounds += 1
            print(f"round {r}: FAST window! bf16 {rb*1e6:.1f} us "
                  f"({fast_rounds}/15)", flush=True)
        elif r % 10 == 0:
            print(f"round {r}: throttled (bf16 {rb*1e6:.1f} us)",
                  flush=True)
        if r % 10 == 0 or fast_rounds:
            with open("benchmarks/perf_watch_r2.json", "w") as fh:
                json.dump({k: round(v * 1e6, 2) for k, v in best.items()},
                          fh, indent=1)
        r += 1
        if rb > 500e-6:
            time.sleep(15)

    tb = best["bf16"]
    print("\n=== best windows (us) ===")
    for k in sorted(best):
        print(f"{k}: {best[k]*1e6:.1f} us ({tb/best[k]:.2f}x vs bf16)")
    with open("benchmarks/perf_watch_r2.json", "w") as fh:
        json.dump({k: round(v * 1e6, 2) for k, v in best.items()}, fh,
                  indent=1)
    print("wrote benchmarks/perf_watch_r2.json", flush=True)


if __name__ == "__main__":
    main()
