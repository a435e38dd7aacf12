"""ONE profile-backed account of the wall-vs-device kernel gap
(VERDICT r3 next #4): for each format, the SAME window produces both a
value-fetch wall time and a jax.profiler device-op total of the SAME
repeated chain -- wall_us and device_us per layer are then directly
comparable, with no cross-window DVFS ambiguity.

Round 2d blamed a "fixed ~10us pallas prologue"; round 3's probe said
per-call overhead ~0 and blamed DVFS. This measures both quantities in
one window, several rounds, and reports the pair from the FASTEST wall
round plus the distribution.
"""
import functools
import json
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import bench
from any4_tpu.ops import linear as lin

N = K = 4096
FMTS = ("bf16", "w4a8", "int4p", "any4")   # any4 -> any4t default


def main():
    w = jax.random.normal(jax.random.PRNGKey(0), (N, K), jnp.float32)
    w = w * (K ** -0.5)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, K)).astype(jnp.bfloat16)
    stack = lambda a: None if a is None else jnp.stack([a] * bench.LAYERS)

    mats = {"bf16": (None, (stack(w.astype(jnp.bfloat16)),))}
    for fmt in FMTS[1:]:
        kw = dict(kmeans_iters=8) if fmt == "any4" else {}
        qt = jax.jit(functools.partial(
            lin.quantize_tensor, fmt=fmt, group_size=128, **kw))(w)
        mats[fmt] = (lin._kernel_fmt(qt.fmt, qt.lut),
                     (stack(qt.packed), stack(qt.scales), stack(qt.zeros),
                      stack(qt.lut)))

    tiny = jax.jit(lambda v: v + 1)
    bench.timed_exec(tiny, (x,))
    rtt = min(bench.timed_exec(tiny, (x,)) for _ in range(3))
    # medium-sized reps: big enough that wall >> rtt, small enough that a
    # profiler trace of the whole call stays manageable
    reps = 64
    fns = {}
    for name, (kf, st) in mats.items():
        base = ("bf16" if name == "bf16" else
                "w4a8" if name == "w4a8" else "int4")
        fns[name] = bench.build_chain(base if base != "int4" else name,
                                      x, st, (N, K), kf, reps)
    for f in fns.values():
        f()  # compile

    rounds = {k: [] for k in fns}
    t0 = time.time()
    for r in range(8):
        if r > 0 and time.time() - t0 > 420:
            break
        for name, f in fns.items():
            # wall and device from the SAME timed call
            with tempfile.TemporaryDirectory() as td:
                with jax.profiler.trace(td):
                    wall = bench.timed_exec(f, ())
                dev = bench._device_op_total_us(td)
            rounds[name].append(
                (round((wall - rtt) / (reps * bench.LAYERS) * 1e6, 2),
                 round(dev / (reps * bench.LAYERS), 2)))
            print(f"r{r} {name}: wall {rounds[name][-1][0]} us/layer, "
                  f"device {rounds[name][-1][1]} us/layer", file=sys.stderr)

    out = {"rtt_ms": round(rtt * 1e3, 1), "reps": reps, "rounds": rounds}
    best = {}
    for name, rs in rounds.items():
        wall, dev = min(rs, key=lambda p: p[0])
        best[name] = {"wall_us": wall, "device_us": dev,
                      "gap_us": round(wall - dev, 2)}
    out["best_window"] = best
    print(json.dumps(out))
    with open("benchmarks/gap_account_r4.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
