#!/usr/bin/env python
"""Device-op breakdown of the serving engine's batched decode burst
(jax.profiler through the relay). Finds where the per-step time goes at
realistic model scale with paged KV. Run ALONE on the TPU host:

  python tools/profile_engine.py --size 1b --fmt int4p --slots 8
Writes benchmarks/profile_engine_<size>_<fmt>.json.
"""
import argparse
import json
import sys
import tempfile

sys.path.insert(0, ".")

import jax
import numpy as np

from tools.bench_decode import SIZES
from tools.bench_engine_ab import MOE_SIZES
from tools.profile_kernels import device_op_times


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="1b",
                   choices=sorted(SIZES) + sorted(MOE_SIZES))
    p.add_argument("--fmt", default="int4p")
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--ctx", type=int, default=512)
    p.add_argument("--prompt-len", type=int, default=64)
    p.add_argument("--burst", type=int, default=8)
    p.add_argument("--bursts", type=int, default=4)
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--quantize-embeddings", default=None)
    p.add_argument("--kv-layout", default="paged",
                   choices=["paged", "contig"])
    p.add_argument("--kv-quantize", action="store_true")
    args = p.parse_args()

    from any4_tpu.models import llama
    from any4_tpu.quant import api
    from any4_tpu.serving import engine as eng

    if args.size in MOE_SIZES:
        from any4_tpu.models import mixtral
        cfg = mixtral.MixtralConfig(**MOE_SIZES[args.size])
        params = mixtral.init_params(cfg, jax.random.PRNGKey(0))
    else:
        cfg = llama.LlamaConfig(**SIZES[args.size])
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
    if args.fmt != "bf16":
        params = api.quantize_model(
            params, fmt=args.fmt,
            quantize_embeddings=args.quantize_embeddings)
    e = eng.Engine(params, cfg, max_slots=args.slots, max_ctx=args.ctx,
                   page_size=16, kv_layout=args.kv_layout,
                   kv_quantize=args.kv_quantize)
    rng = np.random.RandomState(0)
    for _ in range(args.slots):
        e.submit(rng.randint(0, cfg.vocab_size, args.prompt_len)
                 .astype(np.int32), max_new_tokens=10_000)
    # warm prefill + burst programs
    e.step(args.burst)
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(args.bursts):
                e.step(args.burst)
        ops = device_op_times(td)
    steps = args.bursts * args.burst
    rows = [{"op": k[:90], "calls": len(v),
             "total_us": round(sum(v), 1)} for k, v in ops.items()]
    rows.sort(key=lambda r: -r["total_us"])
    total = sum(r["total_us"] for r in rows)
    print(f"~{total/steps:.0f} us/step (sum over trace threads /"
          f" {steps} steps)", file=sys.stderr)
    for r in rows[:args.top]:
        print(f"{r['total_us']:>10.1f} us x{r['calls']:<4} {r['op']}",
              file=sys.stderr)
    out = {"size": args.size, "fmt": args.fmt, "slots": args.slots,
           "burst": args.burst, "rows": rows[:args.top]}
    path = f"benchmarks/profile_engine_{args.size}_{args.fmt}" + \
        ("_kvq" if args.kv_quantize else "") + ".json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"out": path, "us_per_step_sum": round(total/steps, 1)}))


if __name__ == "__main__":
    main()
