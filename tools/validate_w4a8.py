#!/usr/bin/env python
"""Hardware validation + device-time profile of the int8-MXU formats
(w4a8: quad-packed int4 weights x int8 activations; w8a8: int8 x int8).

Correctness: the quad layout depends on pltpu.bitcast(int32 -> int8)
splitting each word row onto 4 sublanes in byte order; interpret mode
agrees with the pack, but hardware must be checked independently
(the bf16 pair bitcast was verified on hardware the same way).

Then: device-op-time comparison bf16 / int4p / w4a8 / w8a8 in ONE
process/profiler state (regime-proof, PERF_NOTES methodology).

Run ALONE on the TPU host:
  python tools/validate_w4a8.py            # writes benchmarks/validate_w4a8.json
"""
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from any4_tpu.ops import linear as lin
from tools.profile_kernels import device_op_times

SHAPES = [  # (n, k, g, m)
    (4096, 4096, 128, 1),
    (4096, 4096, 128, 16),
    (16384, 2048, 128, 1),
    (2048, 8192, 256, 1),
]
REPS = 64


def check_correctness():
    out = {}
    for fmt in ("w4a8", "w8a8"):
        for (n, k, g, m) in SHAPES:
            key = f"{fmt}_{n}x{k}_g{g}_m{m}"
            w = jax.random.normal(jax.random.PRNGKey(0), (n, k),
                                  jnp.float32) * (k ** -0.5)
            qt = jax.jit(lambda a, fmt=fmt, g=g: lin.quantize_tensor(
                a, fmt, group_size=g))(w)
            x = jax.random.normal(jax.random.PRNGKey(1), (m, k))
            y = np.asarray(lin.linear(x, qt), np.float32)
            xq, sx = lin.quantize_activations(x)
            xd = np.asarray(xq, np.float32) * np.asarray(sx, np.float32)
            wd = np.asarray(lin.dequantize_tensor(qt, dtype=jnp.float32))
            ref = xd @ wd.T
            scale = max(float(np.abs(ref).max()), 1e-6)
            relmax = float(np.abs(y - ref).max() / scale)
            out[key] = {"relmaxerr": round(relmax, 6),
                        "ok": bool(relmax < 2e-2)}
            print(key, out[key], flush=True)
    return out


def profile_kernels():
    """Same-state device-op comparison at 4096^2 m=1 g=128."""
    N = K = 4096
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((N, K), np.float32) * (K ** -0.5))
    x = jnp.asarray(rng.standard_normal((1, K), np.float32)).astype(
        jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)

    fns = {"bf16": (jax.jit(lambda a, b: a @ b.T), (x, wb))}
    for fmt in ("int4p", "w4a8", "w8a8"):
        qt = jax.jit(lambda a, fmt=fmt: lin.quantize_tensor(
            a, fmt, group_size=128))(w)
        fns[fmt] = (jax.jit(lambda a, q=qt: lin.linear(a, q)), (x,))

    for name, (f, a) in fns.items():
        t0 = time.time()
        jax.block_until_ready(f(*a))
        print(f"compiled {name} in {time.time()-t0:.0f}s", flush=True)

    results = {}
    for name, (f, a) in fns.items():
        with tempfile.TemporaryDirectory() as td:
            with jax.profiler.trace(td):
                for _ in range(30):
                    r = f(*a)
                jax.block_until_ready(r)
                np.asarray(jax.device_get(jnp.sum(r)))
            ops = device_op_times(td)
        tops = sorted(((np.median(v), kk, len(v)) for kk, v in ops.items()
                       if len(v) >= 10), reverse=True)
        results[name] = {
            "top_ops": [{"op": kk[:80], "median_us": round(med, 1),
                         "count": cnt} for med, kk, cnt in tops[:3]]}
        print(name, results[name]["top_ops"][:1], flush=True)
    return results


def main():
    out = {"correctness": check_correctness(),
           "device_profile_4096_m1": profile_kernels()}
    with open("benchmarks/validate_w4a8.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: "ok" for k in out}))


if __name__ == "__main__":
    main()
