"""block_n x k_chunk sweep for the quad int8 kernel (w8a8q): every
int8-weight variant lands ~60 us/layer at the default bn512/kbs4 while
w4a8 (same dot structure, half the bytes) runs 26 -- is the geometry
starving the weight DMA pipeline?"""
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import bench
from any4_tpu.ops import packing, quant
from any4_tpu.ops.pallas import gemv

N = K = 4096


def main():
    w = jax.random.normal(jax.random.PRNGKey(0), (N, K), jnp.float32)
    w = w * (K ** -0.5)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, K)).astype(jnp.bfloat16)
    stack = lambda a: jnp.stack([a] * bench.LAYERS)

    @jax.jit
    def build():
        q, scales, zeros = quant.int8_quantize(w, 128)
        pq = packing.pack_int8_quad(q)
        s_t, z_t = packing.pad_group_arrays(scales, zeros, K, 128)
        return pq, s_t.T.astype(jnp.float32), z_t.T.astype(jnp.float32)

    pq, s_t, z_t = build()
    st = (stack(pq), stack(s_t), stack(z_t))

    def chain(bn, kc, reps):
        def layer(a, i):
            return gemv.quantized_matmul(
                a, st[0][i], st[1][i], st[2][i], None, fmt="w8a8q",
                group_size=128, n=N, block_n=bn, k_chunk=kc,
                out_dtype=jnp.bfloat16)

        @jax.jit
        def run(a):
            def body(_, a):
                out = a
                for i in range(bench.LAYERS):
                    out = layer(out, i)
                return (out * jax.lax.rsqrt(
                    jnp.float32(jnp.mean(out * out)) + 1e-6)
                    ).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, reps, body, a)
        return functools.partial(run, x)

    tiny = jax.jit(lambda v: v + 1)
    bench.timed_exec(tiny, (x,))
    rtt = min(bench.timed_exec(tiny, (x,)) for _ in range(3))
    reps = 1500
    import os
    cfg_env = os.environ.get("SWEEP_CONFIGS", "512:4,512:2,256:4,256:2")
    configs = [tuple(int(v) for v in c.split(":"))
               for c in cfg_env.split(",")]
    fns = {}
    for bn, kc in configs:
        try:
            f = chain(bn, kc, reps)
            f()
            fns[(bn, kc)] = f
        except Exception as e:
            print(f"bn{bn}/kc{kc}: {type(e).__name__} {str(e)[:80]}",
                  file=sys.stderr)
    best = {k: float("inf") for k in fns}
    t0 = time.time()
    for r in range(5):
        if r > 0 and time.time() - t0 > 360:
            break
        for k, f in fns.items():
            best[k] = min(best[k], max(bench.timed_exec(f, ()) - rtt, 1e-6))
    out = {f"bn{bn}_kc{kc}": round(v / (reps * bench.LAYERS) * 1e6, 2)
           for (bn, kc), v in best.items()}
    print(json.dumps(out))
    with open("benchmarks/tune_w8a8q_r4.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
