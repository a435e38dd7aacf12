#!/usr/bin/env python
"""Paged-attention decode variants: the custom flash kernel (grid
b*h*pages, one physical page per step) vs a dense gather+attention
(XLA ops). Decides the production dispatch in
serving/kv_cache.paged_attention.

Methodology (see PERF_NOTES "relay timing"): pages and q are LOOP-CARRIED
-- each step writes the previous output back into the page pool exactly
like real decode, so neither the gathers nor the kernel can be hoisted
out of the repeat loop (a prior version let XLA LICM the dense gather and
produced garbage). Primary metric is jax.profiler DEVICE time of each
variant's jitted chain, captured back-to-back in one process (regime-
robust); interleaved wall minima are reported as a cross-check.

Run ALONE on the TPU host:
  python tools/bench_paged_attn.py --b 8 --ctx 512 --seq 300
"""
import argparse
import functools
import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

REPS = 64


def build_chain(attn_fn, ps):
    """R decode steps: attend, then scatter a token derived from the
    output into the pages at position seq_len (real data dependency on
    both q and the pools)."""
    from any4_tpu.serving import kv_cache as kvc

    @jax.jit
    def chain(q0, k_pages, v_pages, seq_lens, table):
        b, nq, d = q0.shape
        h = k_pages.shape[0]

        def body(carry, _):
            q, kp, vp, lens = carry
            o = attn_fn(q, kp, vp, lens, table)          # [b, nq, d]
            kv_new = o.reshape(b, h, -1, d)[:, :, :1].transpose(
                0, 2, 1, 3)                               # [b, 1, h, d]
            page_ids = jnp.take_along_axis(
                table, (lens // ps)[:, None], axis=1)
            offs = (lens % ps)[:, None]
            kp = kvc.write_tokens(kp, kv_new, page_ids, offs)
            vp = kvc.write_tokens(vp, kv_new, page_ids, offs)
            return (o.astype(q.dtype), kp, vp, lens + 1), ()

        (q, kp, vp, lens), _ = jax.lax.scan(
            body, (q0, k_pages, v_pages, seq_lens), None, length=REPS)
        return q, kp

    return chain


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=8)
    p.add_argument("--h", type=int, default=8)
    p.add_argument("--rep", type=int, default=4)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--ps", type=int, default=16)
    p.add_argument("--ctx", type=int, default=512)
    p.add_argument("--seq", type=int, default=300)
    p.add_argument("--rounds", type=int, default=4)
    args = p.parse_args()

    from any4_tpu.serving import kv_cache as kvc
    from tools.profile_kernels import device_op_times

    b, h, rep, d, ps = args.b, args.h, args.rep, args.d, args.ps
    pps = args.ctx // ps
    # leave REPS decode positions of page headroom after --seq
    assert args.seq + REPS <= args.ctx, "--seq + 64 must fit in --ctx"
    P = b * pps + 1
    rng = np.random.default_rng(0)
    k_pages = jnp.asarray(rng.standard_normal((h, P, ps, d), np.float32)
                          ).astype(jnp.bfloat16)
    v_pages = jnp.asarray(rng.standard_normal((h, P, ps, d), np.float32)
                          ).astype(jnp.bfloat16)
    table = jnp.asarray(
        np.arange(1, b * pps + 1).reshape(b, pps).astype(np.int32))
    seq_lens = jnp.full((b,), args.seq, jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, h * rep, d), np.float32)
                    ).astype(jnp.bfloat16)

    fns = {
        "flash_paged": build_chain(
            functools.partial(kvc.flash_paged_decode,
                              interpret=jax.default_backend() != "tpu"),
            ps),
        "dense_gather": build_chain(kvc._dense_paged_attention, ps),
    }
    contig_ins = None
    if args.ctx % kvc.CONTIG_BLOCK_TOKENS == 0 or args.ctx <= \
            kvc.CONTIG_BLOCK_TOKENS:
        # contiguous-slot layout: slot b owns pages [b*pps, (b+1)*pps)
        # with no sink page, so slice page 0 off the benchmark pools and
        # renumber the table from 0
        kc_ = k_pages[:, 1:]
        vc_ = v_pages[:, 1:]
        tc_ = jnp.asarray(
            np.arange(b * pps, dtype=np.int32).reshape(b, pps))
        contig_ins = (q, kc_, vc_, seq_lens, tc_)
        fns["flash_contig"] = build_chain(
            functools.partial(kvc.contig_attention, impl="flash"), ps)
        fns["dense_contig"] = build_chain(
            functools.partial(kvc.contig_attention, impl="dense"), ps)
    if d % 128 == 0 and jax.default_backend() == "tpu":
        from jax.experimental.pallas.ops.tpu.paged_attention import (
            paged_attention as upstream_pa)

        def upstream(q_, kp, vp, lens, tbl):
            return upstream_pa(
                (q_ * (1.0 / np.sqrt(d))).astype(kp.dtype), kp, vp,
                lens.astype(jnp.int32), tbl,
                pages_per_compute_block=min(8, pps))
        fns["upstream_pa"] = build_chain(upstream, ps)
    ins = (q, k_pages, v_pages, seq_lens, table)
    ins_of = {n: (contig_ins if n.endswith("_contig") else ins)
              for n in fns}
    for n, f in fns.items():                     # compile + warm
        jax.block_until_ready(f(*ins_of[n]))

    out = {"b": b, "h": h, "rep": rep, "d": d, "ctx": args.ctx,
           "seq": args.seq, "reps": REPS}
    # primary: device time per chain, both captured in one process
    for name, f in fns.items():
        with tempfile.TemporaryDirectory() as td:
            with jax.profiler.trace(td):
                y = f(*ins_of[name])
                float(np.asarray(jax.device_get(y[0][0, 0, 0])))
            ops = device_op_times(td)
        tot = sum(sum(v) for k, v in ops.items()
                  if k.startswith(("jit_", "jit(")))
        out[name + "_device_us"] = round(tot / REPS, 1)
        print(f"{name}: {tot / REPS:.1f} us/step device", file=sys.stderr)
    # cross-check: interleaved wall minima of value-fetched chains
    walls = {n: float("inf") for n in fns}
    for _ in range(args.rounds):
        for name, f in fns.items():
            t0 = time.perf_counter()
            y = f(*ins_of[name])
            float(np.asarray(jax.device_get(y[0][0, 0, 0])))
            walls[name] = min(walls[name], time.perf_counter() - t0)
    for name, w in walls.items():
        out[name + "_wall_us"] = round(w / REPS * 1e6, 1)
    path = f"benchmarks/bench_paged_attn_b{b}_ctx{args.ctx}.json"
    with open(path, "w") as fjs:
        json.dump(out, fjs, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
