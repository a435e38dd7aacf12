"""Round-4 int8 lab part 2: quad-word (int32 + in-kernel bitcast) int8
layouts vs the part-1 losers (lab_int8_r4.json: int8-typed arrays are
62-122 us in every orientation)."""
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import bench
from any4_tpu.ops import linear as lin
from any4_tpu.ops import packing, quant

N = K = 4096


def main():
    w = jax.random.normal(jax.random.PRNGKey(0), (N, K), jnp.float32)
    w = w * (K ** -0.5)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, K)).astype(jnp.bfloat16)
    stack = lambda a: None if a is None else jnp.stack([a] * bench.LAYERS)

    @jax.jit
    def build():
        q, scales, zeros = quant.int8_quantize(w, 128)
        pq = packing.pack_int8_quad(q)
        s_t, z_t = packing.pad_group_arrays(scales, zeros, K, 128)
        return pq, s_t.T.astype(jnp.float32), z_t.T.astype(jnp.float32)

    pq, s_t, z_t = build()
    mats = {"bf16": (None, (stack(w.astype(jnp.bfloat16)),))}
    mats["w8a8q"] = ("w8a8q", (stack(pq), stack(s_t), stack(z_t), None))
    mats["int8q"] = ("int8q", (stack(pq), stack(s_t), stack(z_t), None))
    qt = jax.jit(functools.partial(
        lin.quantize_tensor, fmt="w4a8", group_size=128))(w)
    mats["w4a8"] = ("w4a8", (stack(qt.packed), stack(qt.scales),
                             stack(qt.zeros), None))

    tiny = jax.jit(lambda v: v + 1)
    bench.timed_exec(tiny, (x,))
    rtt = min(bench.timed_exec(tiny, (x,)) for _ in range(3))
    probe = bench.build_chain("bf16", x, mats["bf16"][1], (N, K), None, 1)
    probe()
    t1 = max(min(bench.timed_exec(probe, ()) for _ in range(2)) - rtt,
             bench.LAYERS * N * K * 2 / 850e9)
    reps = max(1, min(32768, int(2.0 / t1)))
    print(f"rtt {rtt*1e3:.1f} ms -> reps={reps}", file=sys.stderr)

    def chain_for(name):
        kf, st = mats[name]
        if name == "bf16":
            return bench.build_chain("bf16", x, st, (N, K), None, reps)
        base = "w4a8" if name in ("w8a8q", "w4a8") else "int4"
        return bench.build_chain(base, x, st, (N, K), kf, reps)

    fns = {k: chain_for(k) for k in mats}
    for f in fns.values():
        f()
    best = {k: float("inf") for k in fns}
    t0 = time.time()
    for r in range(6):
        if r > 0 and time.time() - t0 > 360:
            break
        for k, f in fns.items():
            best[k] = min(best[k], max(bench.timed_exec(f, ()) - rtt, 1e-6))
    per_layer = {k: v / (reps * bench.LAYERS) * 1e6 for k, v in best.items()}
    out = {"us_per_layer": {k: round(v, 2) for k, v in per_layer.items()},
           "speedup_vs_bf16": {k: round(per_layer["bf16"] / v, 3)
                               for k, v in per_layer.items()},
           "reps": reps}
    print(json.dumps(out))
    with open("benchmarks/lab_int8b_r4.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
