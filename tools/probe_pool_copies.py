#!/usr/bin/env python
"""Why does the engine's decode burst copy the KV page pools ~3x per
step? Minimal scan reproducing the pattern (write one token per slot ->
gather ctx -> carry pool), profiled per variant:

  A. production write_tokens ([h,P,ps,d] pool, reshape around scatter)
  B. flat [h, P*ps, d] pool, scatter + gather with no reshapes
  C. like A but scatter with unique_indices=True
  D. write via dynamic_update_slice per slot (lax.fori over b)

Run ALONE on the TPU host: python tools/probe_pool_copies.py
"""
import json
import sys
import tempfile

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tools.profile_kernels import device_op_times

STEPS = 32
B, H, PS, D = 8, 8, 16, 64
PPS = 32
P = B * PPS + 1


def variants():
    from any4_tpu.serving import kv_cache as kvc
    table = jnp.asarray(
        np.arange(1, B * PPS + 1).reshape(B, PPS).astype(np.int32))

    def gather_reduce(pool4, q):
        ctx = kvc.gather_ctx(pool4, table)          # [b, ctx, h, d]
        return (q + ctx.sum(axis=1).reshape(B, H * D)).astype(q.dtype)

    def page_off(lens):
        pids = jnp.take_along_axis(table, (lens // PS)[:, None], axis=1)
        return pids, (lens % PS)[:, None]

    def body_a(carry, _):
        pool, q, lens = carry
        pids, offs = page_off(lens)
        kv = q.reshape(B, 1, H, D)
        pool = kvc.write_tokens(pool, kv, pids, offs)
        return (pool, gather_reduce(pool, q), lens + 1), ()

    def body_b(carry, _):
        pool, q, lens = carry                        # pool [h, P*ps, d]
        pids, offs = page_off(lens)
        idx = (pids * PS + offs).reshape(-1)
        vals = q.reshape(B, H, D).transpose(1, 0, 2)
        pool = pool.at[:, idx].set(vals.astype(pool.dtype))
        ctx = pool[:, (table.reshape(-1)[:, None] * PS
                       + jnp.arange(PS)[None, :]).reshape(-1)]
        ctx = ctx.reshape(H, B, PPS * PS, D)
        q = (q + ctx.sum(axis=2).transpose(1, 0, 2).reshape(B, H * D)
             ).astype(q.dtype)
        return (pool, q, lens + 1), ()

    def body_c(carry, _):
        pool, q, lens = carry
        pids, offs = page_off(lens)
        flat = pool.reshape(H, P * PS, D)
        idx = (pids * PS + offs).reshape(-1)
        vals = q.reshape(B, H, D).transpose(1, 0, 2)
        flat = flat.at[:, idx].set(vals.astype(flat.dtype),
                                   unique_indices=True)
        pool = flat.reshape(pool.shape)
        return (pool, gather_reduce(pool, q), lens + 1), ()

    def body_d(carry, _):
        pool, q, lens = carry
        pids, offs = page_off(lens)
        kv = q.reshape(B, H, 1, D)

        def write_one(i, pl):
            upd = kv[i][:, None].astype(pl.dtype)    # [h, 1, 1, d]
            return jax.lax.dynamic_update_slice(
                pl, upd, (0, pids[i, 0], offs[i, 0], 0))
        pool = jax.lax.fori_loop(0, B, write_one, pool)
        return (pool, gather_reduce(pool, q), lens + 1), ()

    def attn(kctx, vctx, q, lens):
        """Real grouped-head attention math (the layout-pressure source:
        two einsums over the [h, b, c, d] views)."""
        qh = q.reshape(B, H, 1, D).transpose(1, 0, 2, 3)
        logits = jnp.einsum("hbrd,hbcd->hbrc", qh, kctx,
                            preferred_element_type=jnp.float32)
        pos = jnp.arange(kctx.shape[2])[None, None, None, :]
        mask = jnp.where(pos < lens[None, :, None, None], 0.0, -1e9)
        p = jax.nn.softmax(logits + mask, axis=-1)
        o = jnp.einsum("hbrc,hbcd->hbrd", p.astype(vctx.dtype), vctx,
                       preferred_element_type=jnp.float32)
        return o.transpose(1, 0, 2, 3).reshape(B, H * D).astype(q.dtype)

    def body_e(carry, _):
        """4-D pools + production write + dense attention (the engine's
        exact hot path, k and v pools)."""
        kp, vp, q, lens = carry
        pids, offs = page_off(lens)
        kv = q.reshape(B, 1, H, D)
        kp = kvc.write_tokens(kp, kv, pids, offs)
        vp = kvc.write_tokens(vp, kv, pids, offs)
        kctx = kvc.gather_ctx_hmajor(kp, table)
        vctx = kvc.gather_ctx_hmajor(vp, table)
        q = q + attn(kctx, vctx, q, lens + 1)
        return (kp, vp, q.astype(jnp.bfloat16), lens + 1), ()

    def body_f(carry, _):
        """Flat [h, T, d] pools: scatter + page-expanded gather share the
        operand shape, attention identical."""
        kp, vp, q, lens = carry
        pids, offs = page_off(lens)
        idx = (pids * PS + offs).reshape(-1)
        vals = q.reshape(B, H, D).transpose(1, 0, 2)
        kp = kp.at[:, idx].set(vals.astype(kp.dtype), unique_indices=True)
        vp = vp.at[:, idx].set(vals.astype(vp.dtype), unique_indices=True)
        cidx = (table.reshape(-1)[:, None] * PS
                + jnp.arange(PS)[None, :]).reshape(-1)
        kctx = kp[:, cidx].reshape(H, B, PPS * PS, D)
        vctx = vp[:, cidx].reshape(H, B, PPS * PS, D)
        q = q + attn(kctx, vctx, q, lens + 1)
        return (kp, vp, q.astype(jnp.bfloat16), lens + 1), ()

    return {"A_prod_write_tokens": (body_a, False),
            "B_flat_pool": (body_b, True),
            "C_unique_indices": (body_c, False),
            "D_dyn_update_slice": (body_d, False),
            "E_4d_pools_attn": (body_e, "kv4"),
            "F_flat_pools_attn": (body_f, "kvflat")}


def main():
    rng = np.random.default_rng(0)
    pool4 = jnp.asarray(rng.standard_normal((H, P, PS, D), np.float32)
                        ).astype(jnp.bfloat16)
    q0 = jnp.asarray(rng.standard_normal((B, H * D), np.float32)
                     ).astype(jnp.bfloat16)
    lens0 = jnp.full((B,), 100, jnp.int32)
    out = {}
    for name, (body, flat) in variants().items():
        if flat in ("kv4", "kvflat"):
            p1 = pool4.reshape(H, P * PS, D) if flat == "kvflat" else pool4
            carry0 = (p1, p1 + 0, q0, lens0)
        else:
            pool = pool4.reshape(H, P * PS, D) if flat else pool4
            carry0 = (pool, q0, lens0)

        @jax.jit
        def run(*carry, body=body):
            (pool, *rest), _ = jax.lax.scan(body, carry, None,
                                            length=STEPS)
            return pool, rest[-2] if len(rest) > 2 else rest[0]
        r = run(*carry0)
        jax.block_until_ready(r)
        with tempfile.TemporaryDirectory() as td:
            with jax.profiler.trace(td):
                r = run(*carry0)
                float(np.asarray(jax.device_get(r[1][0, 0])))
            ops = device_op_times(td)
        tot = sum(sum(v) for k, v in ops.items()
                  if k.startswith(("jit_", "jit(")))
        cp = sum(sum(v) for k, v in ops.items()
                 if k.startswith(("copy", "slice")))
        out[name] = {"us_per_step": round(tot / STEPS, 1),
                     "copy_us_per_step": round(cp / STEPS, 1)}
        print(name, out[name], file=sys.stderr)
    with open("benchmarks/probe_pool_copies.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
