#!/usr/bin/env python
"""Probe: does the relay memoize identical repeated executions?

Times a 16-layer bf16 GEMV chain (K=4096, 16 distinct 32MB weight
buffers = 512MB streamed per call) two ways:
  a) the SAME input x every call
  b) a DIFFERENT input x every call (16 pre-staged inputs, cycled)
If (a) is much faster than (b), identical calls are being served from a
cache somewhere in the relay and every wall-clock benchmark must vary
its inputs per call. Run ALONE on the TPU host.
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

K = 4096
L = 16


def main():
    w = jax.random.normal(jax.random.PRNGKey(0), (L, K, K), jnp.bfloat16)
    w = w * (K ** -0.5)
    xs = [jax.random.normal(jax.random.PRNGKey(i), (1, K)).astype(jnp.bfloat16)
          for i in range(16)]

    @jax.jit
    def chain(a, ws):
        for i in range(L):
            a = a @ ws[i].T
        return a

    jax.block_until_ready(chain(xs[0], w))

    for name, pick in [("same-x", lambda i: xs[0]),
                       ("cycled-x", lambda i: xs[i % 16]),
                       ("same-x2", lambda i: xs[1])]:
        for rep in range(3):
            t0 = time.perf_counter()
            r = None
            for i in range(16):
                r = chain(pick(i), w)
            jax.block_until_ready(r)
            dt = (time.perf_counter() - t0) / 16
            print(f"{name} rep{rep}: {dt*1e6:.1f} us/call "
                  f"({L * K * K * 2 / dt / 1e9:.0f} GB/s weight stream)")


if __name__ == "__main__":
    main()
