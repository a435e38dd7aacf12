"""Compile (not run) the engine's decode-burst program for TPU and dump
the optimized HLO, looking for copy/fusion ops that touch pool-sized
buffers -- chasing the ~16x ~90us/step copy-done ops the ctx2048 profile
showed (benchmarks/profile_engine_1b_w4a8.json)."""
import argparse
import re
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tools.bench_decode import SIZES


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="1b")
    p.add_argument("--fmt", default="w4a8")
    p.add_argument("--ctx", type=int, default=2048)
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--burst", type=int, default=16)
    p.add_argument("--kv-quantize", action="store_true")
    p.add_argument("--out", default="/tmp/burst_hlo.txt")
    args = p.parse_args()

    from any4_tpu.models import llama
    from any4_tpu.quant import api
    from any4_tpu.serving import engine as eng

    cfg = llama.LlamaConfig(**SIZES[args.size])
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    qparams = api.quantize_model(params, fmt=args.fmt,
                                 quantize_embeddings="w8a8")
    e = eng.Engine(qparams, cfg, max_slots=args.slots, max_ctx=args.ctx,
                   page_size=16, kv_layout="contig",
                   kv_quantize=args.kv_quantize)
    tokens = jnp.zeros((args.slots,), jnp.int32)
    lens = jnp.zeros((args.slots,), jnp.int32)
    tables = jnp.asarray(e.alloc.table[:, :e.pps])
    lowered = jax.jit(
        eng._decode_burst_impl,
        static_argnames=("cfg", "page_size", "n_steps", "kv_layout"),
        donate_argnums=(5, 6),
    ).lower(qparams, cfg, tokens, lens, tables, e.cache.k_pages,
            e.cache.v_pages, e.page_size, args.burst, kv_layout="contig")
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    # summarize copies by shape
    copies = {}
    for m in re.finditer(r"= (\S+\[[^\]]*\][^ ]*) copy\(", txt):
        shape = m.group(1)
        copies[shape] = copies.get(shape, 0) + 1
    print("copy ops by shape:")
    for shape, cnt in sorted(copies.items(), key=lambda kv: -kv[1]):
        print(f"  x{cnt:<4} {shape}")
    print(f"full HLO -> {args.out} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
