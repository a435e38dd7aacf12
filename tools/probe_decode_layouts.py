#!/usr/bin/env python
"""Probe: do the decode program's preferred input layouts match the
at-rest layouts of the quantized weights?

The 8B any4q8r/any4q8 decode OOMs at ~8 GB of int8 weights on a 16 GB
chip while w4a8 (4.8 GB, int32-packed) runs -- consistent with XLA
re-laying out int8 operands at call time (source + copy both live ->
2x weight HBM). This compiles generate.decode_loop for a 2-layer
8B-shaped model and compares each packed leaf's array.format with the
compiled program's input format; mismatches are the copies.

Run ALONE on the TPU.
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from any4_tpu.models import generate, llama
from any4_tpu.quant import api


def main():
    fmt = sys.argv[1] if len(sys.argv) > 1 else "any4q8r"
    cfg = llama.LlamaConfig(
        vocab_size=4096, hidden_size=4096, intermediate_size=14336,
        num_hidden_layers=2, num_attention_heads=32,
        num_key_value_heads=8, head_dim=128, tie_word_embeddings=True)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    kw = dict(kmeans_iters=2) if fmt.startswith("any4") else {}
    qp = api.quantize_model(params, fmt=fmt, group_size=128, **kw)
    del params
    caches = llama.init_kv_caches(cfg, 1, 32)
    tok = jnp.zeros((1,), jnp.int32)
    comp = generate.decode_loop.lower(
        qp, cfg, tok, jnp.int32(8), caches, 8).compile()
    want = comp.input_formats[0][0]     # format tree for params

    from any4_tpu.quant.api import _walk
    flat_w, tree_w = jax.tree_util.tree_flatten(want)
    flat_p, tree_p = jax.tree_util.tree_flatten(qp)
    assert tree_w == tree_p or len(flat_w) == len(flat_p)
    n_mis = 0
    bytes_mis = 0
    for a, f in zip(flat_p, flat_w):
        have = a.format
        if have != f:
            n_mis += 1
            bytes_mis += a.size * a.dtype.itemsize
            if n_mis <= 6:
                print(f"MISMATCH {a.shape} {a.dtype}:\n  have {have}\n"
                      f"  want {f}", file=sys.stderr)
    print(f"fmt={fmt}: {n_mis}/{len(flat_p)} leaves mismatched, "
          f"{bytes_mis/1e6:.1f} MB would be re-laid out at call time")


if __name__ == "__main__":
    main()
