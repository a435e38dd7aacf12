#!/usr/bin/env python
"""Benchmark the native C++ data plane against the jnp-on-CPU path on a
checkpoint-scale synthetic weight set (>= 1 GB float32).

Runs entirely host-side (forces the CPU backend) so it is safe to run
while the TPU is busy:  python tools/bench_native.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from any4_tpu import native  # noqa: E402
from any4_tpu.ops import linear as lin  # noqa: E402


def main():
    if not native.available():
        print("native data plane unavailable")
        return
    print(f"native threads: {native.num_threads()}")
    rng = np.random.default_rng(0)
    # 16 layers of [4096, 4096] f32 = 1.07 GB
    layers = [rng.standard_normal((4096, 4096), np.float32)
              for _ in range(16)]
    total_gb = sum(a.nbytes for a in layers) / 1e9
    print(f"synthetic checkpoint: {total_gb:.2f} GB")

    t0 = time.time()
    outs = [lin.quantize_tensor(w, "int4", group_size=128) for w in layers]
    t_native = time.time() - t0
    print(f"native quantize+pack: {t_native:.2f}s "
          f"({total_gb / t_native:.2f} GB/s)")

    t0 = time.time()
    outs_j = [lin.quantize_tensor(jnp.asarray(w), "int4", group_size=128)
              for w in layers]
    jax.block_until_ready([q.packed for q in outs_j])
    t_jnp = time.time() - t0
    print(f"jnp-CPU quantize+pack: {t_jnp:.2f}s "
          f"({total_gb / t_jnp:.2f} GB/s)")
    print(f"speedup: {t_jnp / t_native:.2f}x")

    np.testing.assert_array_equal(np.asarray(outs[0].packed),
                                  np.asarray(outs_j[0].packed))
    print("parity: packed words identical")


if __name__ == "__main__":
    main()
