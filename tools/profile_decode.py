#!/usr/bin/env python
"""Device-side op breakdown of one quantized decode step (jax.profiler).

Finds where the per-token time goes at realistic model scale -- the
device-op analog of the reference's per-module HookBasedProfiler
(benchmark.py:37-111). Run ALONE on the TPU host:

  python tools/profile_decode.py --size 1b --fmt int4p
Writes benchmarks/profile_decode_<size>_<fmt>.json.
"""
import argparse
import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tools.profile_kernels import device_op_times
from tools.bench_decode import SIZES


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="1b", choices=sorted(SIZES))
    p.add_argument("--fmt", default="int4p")
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--top", type=int, default=25)
    args = p.parse_args()

    from any4_tpu.models import generate, llama
    from any4_tpu.quant import api as quant_api

    cfg = llama.LlamaConfig(**SIZES[args.size])
    t0 = time.time()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    print(f"init in {time.time() - t0:.0f}s", file=sys.stderr)
    t0 = time.time()
    if args.fmt != "bf16":
        params = quant_api.quantize_model(params, fmt=args.fmt)
    print(f"quantized in {time.time() - t0:.0f}s", file=sys.stderr)

    prompt_len, batch = 128, 1
    prompt = jax.random.randint(jax.random.PRNGKey(1), (batch, prompt_len),
                                0, cfg.vocab_size)
    caches = llama.init_kv_caches(cfg, batch, prompt_len + args.steps + 4)
    logits, caches = generate.prefill(params, cfg, prompt, caches)
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    # warm the decode program
    _, caches = generate.decode_step(params, cfg, tok,
                                     jnp.int32(prompt_len), caches)
    jax.block_until_ready(caches)

    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            cur, cc = tok, caches
            for i in range(args.steps):
                lg, cc = generate.decode_step(
                    params, cfg, cur, jnp.int32(prompt_len + 1 + i), cc)
                cur = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            jax.block_until_ready(cur)
        ops = device_op_times(td)

    rows = []
    for name, durs in ops.items():
        rows.append({
            "op": name[:90],
            "calls": len(durs),
            "total_us": round(sum(durs), 1),
            "mean_us": round(sum(durs) / len(durs), 2),
        })
    rows.sort(key=lambda r: -r["total_us"])
    total = sum(r["total_us"] for r in rows)
    per_step = total / args.steps
    print(f"device total {total:.0f} us over {args.steps} steps "
          f"-> {per_step:.0f} us/step", file=sys.stderr)
    for r in rows[:args.top]:
        print(f"{r['total_us']:>10.1f} us  x{r['calls']:<4} "
              f"{r['op']}", file=sys.stderr)
    out = {"size": args.size, "fmt": args.fmt, "steps": args.steps,
           "device_us_per_step": round(per_step, 1), "top_ops": rows[:args.top]}
    path = f"benchmarks/profile_decode_{args.size}_{args.fmt}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"device_us_per_step": round(per_step, 1),
                      "out": path}))


if __name__ == "__main__":
    main()
