#!/usr/bin/env python
"""Serving-engine throughput: continuous-batching decode tokens/s
(the BASELINE north-star shape: paged KV + batched decode; add
--fmt int4p/any4 for quantized weights).

  python tools/bench_engine.py --size 1b --fmt int4p --slots 8
Run ALONE on the TPU host.
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from tools.bench_decode import SIZES  # shared architecture table


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="1b", choices=sorted(SIZES))
    p.add_argument("--fmt", default=None,
                   help="quantization format (default: bf16 dense)")
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--max-ctx", type=int, default=512)
    p.add_argument("--prompt-len", type=int, default=64)
    p.add_argument("--new-tokens", type=int, default=64)
    p.add_argument("--requests", type=int, default=16)
    p.add_argument("--group-size", type=int, default=128)
    p.add_argument("--kv-quantize", action="store_true")
    p.add_argument("--quantize-embeddings", default=None,
                   help="also quantize embed_tokens (e.g. w8a8): the tied "
                        "lm_head then runs the fused quantized kernel")
    p.add_argument("--burst", type=int, default=1,
                   help="decode steps fused per dispatch "
                        "(Engine.step burst)")
    p.add_argument("--pipeline", action="store_true",
                   help="dispatch burst k+1 before fetching burst k's "
                        "tokens (hides the host fetch round trip)")
    p.add_argument("--kv-layout", default="paged",
                   choices=["paged", "contig"])
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from any4_tpu.models import llama
    from any4_tpu.quant import api
    from any4_tpu.serving import engine as eng

    cfg = llama.LlamaConfig(**SIZES[args.size])
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    if args.fmt == "bf16":
        args.fmt = None
    if args.fmt:
        kw = dict(kmeans_iters=4) if args.fmt == "any4" else {}
        t0 = time.time()
        if args.quantize_embeddings:
            kw["quantize_embeddings"] = args.quantize_embeddings
        params = api.quant_methods[args.fmt](
            params, group_size=args.group_size, **kw)
        print(f"quantized ({args.fmt}) in {time.time()-t0:.0f}s",
              file=sys.stderr)

    e = eng.Engine(params, cfg, max_slots=args.slots, max_ctx=args.max_ctx,
                   page_size=16, kv_quantize=args.kv_quantize,
                   kv_layout=args.kv_layout)
    rng = np.random.RandomState(0)

    # warm by running the FULL workload once untimed: the burst program
    # recompiles per context-bucket width (power-of-two page buckets), so
    # a single short warm request leaves the wider buckets to compile
    # INSIDE the timed region -- a 30-120s remote-compile hit that
    # dominated earlier engine walls (ROUND_LOG r2 #18 regime noise)
    def submit_all():
        for _ in range(args.requests):
            e.submit(rng.randint(0, cfg.vocab_size, size=args.prompt_len)
                     .astype(np.int32), max_new_tokens=args.new_tokens)
    submit_all()
    e.run(burst=args.burst, pipeline=args.pipeline)

    submit_all()
    t0 = time.time()
    done = e.run(burst=args.burst, pipeline=args.pipeline)
    dt = time.time() - t0
    total_tokens = sum(len(r.out_tokens) for r in done)
    out = {"size": args.size, "fmt": args.fmt or "bf16",
           "slots": args.slots, "requests": args.requests,
           "total_new_tokens": total_tokens,
           "wall_s": round(dt, 2),
           "tok_s": round(total_tokens / dt, 2),
           "kv_quantize": args.kv_quantize, "burst": args.burst,
           "pipeline": args.pipeline, "kv_layout": args.kv_layout,
           "quantize_embeddings": args.quantize_embeddings}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
