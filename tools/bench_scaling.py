#!/usr/bin/env python
"""Tensor-parallel scaling report: decode tokens/s at tp in {1, 2, ...}
over however many devices are attached (the BASELINE north-star scaling
table: 1 chip / 1 host / N hosts).

On this container only one real TPU chip is attached, so real-ICI scaling
cannot be measured here; the same script reports the table on any larger
slice (and on the virtual CPU mesh for plumbing checks with --cpu).

  python tools/bench_scaling.py --size 1b --fmt any4 --new-tokens 32
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from tools.bench_decode import SIZES


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="tiny", choices=sorted(SIZES))
    p.add_argument("--fmt", default=None)
    p.add_argument("--slots", type=int, default=4)
    p.add_argument("--prompt-len", type=int, default=32)
    p.add_argument("--new-tokens", type=int, default=32)
    p.add_argument("--group-size", type=int, default=128)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from any4_tpu.models import llama
    from any4_tpu.parallel import tp as tpmod
    from any4_tpu.quant import api
    from any4_tpu.serving import engine as eng

    cfg = llama.LlamaConfig(**SIZES[args.size])
    ndev = len(jax.devices())
    tps = [t for t in (1, 2, 4, 8, 16) if t <= ndev
           and cfg.num_key_value_heads % t == 0]
    rng = np.random.RandomState(0)
    rows = []
    for tp in tps:
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        if args.fmt:
            kw = dict(kmeans_iters=3) if args.fmt == "any4" else {}
            params = api.quant_methods[args.fmt](
                params, group_size=args.group_size,
                row_parallel_shards=tp, **kw)
        if tp == 1:
            e = eng.Engine(params, cfg, max_slots=args.slots, max_ctx=256)
        else:
            mesh = tpmod.make_mesh(dp=1, tp=tp, devices=jax.devices()[:tp])
            sharded, specs = tpmod.shard_params(params, mesh, cfg=cfg)
            e = eng.Engine(sharded, cfg, max_slots=args.slots, max_ctx=256,
                           mesh=mesh, param_spec=specs)
        # warm
        e.submit(rng.randint(0, cfg.vocab_size, args.prompt_len), 2)
        e.run()
        for _ in range(args.slots):
            e.submit(rng.randint(0, cfg.vocab_size, size=args.prompt_len)
                     .astype(np.int32), max_new_tokens=args.new_tokens)
        t0 = time.time()
        done = e.run()
        dt = time.time() - t0
        toks = sum(len(r.out_tokens) for r in done)
        rows.append({"tp": tp, "tok_s": round(toks / dt, 2)})
        print(f"tp={tp}: {toks / dt:.1f} tok/s", file=sys.stderr)
    base = rows[0]["tok_s"]
    for r in rows:
        r["scaling_efficiency"] = round(r["tok_s"] / (base * r["tp"]), 3)
    print(json.dumps({"size": args.size, "fmt": args.fmt or "bf16",
                      "devices": ndev, "rows": rows}))


if __name__ == "__main__":
    main()
