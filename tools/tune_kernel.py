#!/usr/bin/env python
"""Kernel tuning sweep: block_n and format comparison with regime-robust
interleaved timing. Run alone on the TPU machine.

  python tools/tune_kernel.py --k 4096 --m 1
"""
import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=4096)
    p.add_argument("--n", type=int, default=None)
    p.add_argument("--m", type=int, default=1)
    p.add_argument("--group-size", type=int, default=128)
    p.add_argument("--rounds", type=int, default=14)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    from any4_tpu.ops import linear as lin

    K = args.k
    N = args.n or K
    w = jax.random.normal(jax.random.PRNGKey(0), (N, K), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (args.m, K)).astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)

    fns = {"bf16": (jax.jit(lambda a, b: a @ b.T), (x, wb))}
    for fmt in ("int4", "any4", "nf4", "int8"):
        kw = dict(kmeans_iters=4) if fmt == "any4" else {}
        qt = lin.quantize_tensor(w, fmt, args.group_size, **kw)
        for bn in (256, 512, 1024):
            f = jax.jit(lambda a, q=qt, b=bn: lin.linear(a, q, block_n=b))
            fns[f"{fmt}/bn{bn}"] = (f, (x,))

    best = {k: float("inf") for k in fns}
    for k in list(fns):
        f, a = fns[k]
        try:
            jax.block_until_ready(f(*a))
            print(f"compiled {k}", flush=True)
        except Exception as e:
            print(f"compile FAIL {k}: {str(e).splitlines()[0][:100]}",
                  flush=True)
            del fns[k]
            del best[k]
    for r in range(args.rounds):
        for k, (f, a) in fns.items():
            t0 = time.perf_counter()
            for _ in range(args.iters):
                rr = f(*a)
            jax.block_until_ready(rr)
            best[k] = min(best[k], (time.perf_counter() - t0) / args.iters)
        print(f"round {r}: bf16 {best['bf16']*1e6:.1f} us", flush=True)

    tb = best["bf16"]
    for k in sorted(best):
        print(f"{k}: {best[k]*1e6:.1f} us ({tb/best[k]:.2f}x vs bf16)")


if __name__ == "__main__":
    main()
