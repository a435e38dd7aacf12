"""Probe: where does the int8-KV dense decode attention lose its 9%
(VERDICT r3 next #5)? Variants of _dense_attend_q8 at serving shapes,
chain-timed like bench.py (value-fetch, interleaved minima).

Variants:
  bf16        dense_attend over a bf16 ctx view (the baseline arm)
  q8          production _dense_attend_q8 (int8 codes + logits/probs scale)
  q8_deq      dequantize the views to bf16 first (materialized; the
              pre-round-3 design)
  q8_qq       ALSO quantize q to int8: int8 x int8 logits dot (2x MXU,
              no bf16 materialization of the code view), one fused
              (sq*ks) logit scale
"""
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import bench
from any4_tpu.serving import kv_cache as kvc

B, H, REP, D = 8, 8, 4, 64


def variants(ctx):
    key = jax.random.PRNGKey(0)
    q0 = jax.random.normal(key, (B, H * REP, D), jnp.bfloat16)
    kf = jax.random.normal(jax.random.PRNGKey(1), (H, B, ctx, D))
    vf = jax.random.normal(jax.random.PRNGKey(2), (H, B, ctx, D))
    amax_k = jnp.max(jnp.abs(kf), axis=-1, keepdims=True)
    amax_v = jnp.max(jnp.abs(vf), axis=-1, keepdims=True)
    kc = jnp.round(kf / amax_k * 127.5).astype(jnp.int8)
    vc = jnp.round(vf / amax_v * 127.5).astype(jnp.int8)
    ks, vs = amax_k.astype(jnp.float32), amax_v.astype(jnp.float32)
    kb = (kc.astype(jnp.float32) * ks * (1 / 127.5)).astype(jnp.bfloat16)
    vb = (vc.astype(jnp.float32) * vs * (1 / 127.5)).astype(jnp.bfloat16)
    lens = jnp.full((B,), ctx, jnp.int32)

    # every variant takes q as an ARGUMENT so the timing chain can feed
    # the output back in (a loop-carried dependence; without it XLA
    # hoists the whole attention out of the fori_loop -- first probe run
    # measured 0.0 us at ctx2048)
    fns = {}
    fns["bf16"] = lambda q: kvc._dense_attend(q, kb, vb, lens)
    fns["q8"] = lambda q: kvc._dense_attend_q8(q, kc, ks, vc, vs, lens)

    def q8_deq(q, kc, ks, vc, vs, lens):
        kd = (kc.astype(jnp.float32) * ks * (1 / 127.5)).astype(jnp.bfloat16)
        vd = (vc.astype(jnp.float32) * vs * (1 / 127.5)).astype(jnp.bfloat16)
        return kvc._dense_attend(q, kd, vd, lens)
    fns["q8_deq"] = lambda q: q8_deq(q, kc, ks, vc, vs, lens)

    def q8_qq(q, kc, ks, vc, vs, lens):
        b, nq, d = q.shape
        h = kc.shape[0]
        rep = nq // h
        qh = q.reshape(b, h, rep, d).transpose(1, 0, 2, 3)
        qf = qh.astype(jnp.float32)
        sq = jnp.maximum(jnp.max(jnp.abs(qf), axis=3, keepdims=True),
                         1e-8) / 127.0
        qq = jnp.clip(jnp.round(qf / sq), -127, 127).astype(jnp.int8)
        scale = 1.0 / np.sqrt(d)
        li = jnp.einsum("hbrd,hbcd->hbrc", qq, kc,
                        preferred_element_type=jnp.int32)
        logits = li.astype(jnp.float32) * (
            sq[..., 0] * scale)[:, :, :, None] \
            * (ks[..., 0] * (1 / 127.5))[:, :, None, :]
        ctx_pos = jnp.arange(kc.shape[2])[None, None, None, :]
        mask = jnp.where(ctx_pos < lens[None, :, None, None], 0.0, -1e9)
        probs = jax.nn.softmax(logits + mask, axis=-1)
        pv = probs * (vs[..., 0] * (1 / 127.5))[:, :, None, :]
        out = jnp.einsum("hbrc,hbcd->hbrd", pv.astype(jnp.bfloat16),
                         vc.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return out.transpose(1, 0, 2, 3).reshape(b, nq, d).astype(q.dtype)
    fns["q8_qq"] = lambda q: q8_qq(q, kc, ks, vc, vs, lens)
    return fns, q0


def main():
    out = {}
    for ctx in (2048, 4096):
        fns, q0 = variants(ctx)
        reps = 200

        def chain(f):
            @jax.jit
            def run(q):
                def body(i, q):
                    y = f(q)
                    # renormalized feedback keeps values finite and the
                    # loop body live
                    return (y * jax.lax.rsqrt(
                        jnp.float32(jnp.mean(y * y)) + 1e-6)
                        ).astype(jnp.bfloat16)
                out = jax.lax.fori_loop(0, reps, body, q)
                return jnp.sum(out.astype(jnp.float32))[None, None]
            return functools.partial(run, q0)

        runs = {k: chain(f) for k, f in fns.items()}
        tiny = jax.jit(lambda v: v + 1)
        x0 = jnp.zeros((1, 1), jnp.float32)
        bench.timed_exec(tiny, (x0,))
        rtt = min(bench.timed_exec(tiny, (x0,)) for _ in range(3))
        for f in runs.values():
            np.asarray(jax.device_get(f()))
        best = {k: float("inf") for k in runs}
        t0 = time.time()
        for r in range(4):
            if r > 0 and time.time() - t0 > 240:
                break
            for k, f in runs.items():
                t1 = time.perf_counter()
                np.asarray(jax.device_get(f()))
                best[k] = min(best[k],
                              max(time.perf_counter() - t1 - rtt, 1e-9))
        out[f"ctx{ctx}"] = {k: round(v / reps * 1e6, 2)
                            for k, v in best.items()}
        print(f"ctx{ctx}: " + json.dumps(out[f"ctx{ctx}"]), file=sys.stderr)
    print(json.dumps(out))
    with open("benchmarks/probe_attnq8_r4.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
