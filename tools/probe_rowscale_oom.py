#!/usr/bin/env python
"""Find the live-set ceiling of a rowscale-int8 decode scan.

The 8B any4q8r decode (8.08 GB of weights) dies RESOURCE_EXHAUSTED on a
chip that allocates 15 GB fine, input layouts match the compiled
program (probe_decode_layouts), and the w4a8 run (4.78 GB, int32-packed
words) works. Hypothesis: the scan program holds ~2x the int8 weight
bytes (e.g. a hoisted conversion of every weight). This scales the SAME
scan-decode structure until it OOMs: if int8 rowscale dies near half of
what an int32-packed control survives, the 2x theory is confirmed.

Run ALONE on the TPU.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

K, N = 4096, 14336          # 58.7 MB int8 per layer
ACT_QMAX = 127.0


def _rand_int8(key, shape):
    # native uint8 bits -> int8: randint(int32) would materialize a 4x
    # transient during GENERATION (which is what the first version of
    # this probe actually measured)
    bits = jax.random.bits(key, shape, jnp.uint8)
    return jax.lax.bitcast_convert_type(bits, jnp.int8)


def run_scan(L, kind):
    key = jax.random.PRNGKey(0)
    if kind == "rowscale":
        w = _rand_int8(key, (L, K, N))
    elif kind in ("grouped", "grouped_barrier"):
        # [L, G, n, 128] int8 batched-dot layout
        w = _rand_int8(key, (L, K // 128, N, 128))
    else:                    # int32 control: same BYTES as rowscale/4 elems
        w = jax.random.bits(key, (L, K, N // 4), jnp.uint32) \
            .astype(jnp.int32)
    s = jnp.ones((L, 1, N), jnp.float32) * 1e-3
    x = jax.random.normal(key, (1, K)).astype(jnp.bfloat16)
    jax.block_until_ready(w)

    @jax.jit
    def run(x, w, s):
        def step(a, _):
            for i in range(L):
                if kind == "rowscale":
                    xf = a.astype(jnp.float32)
                    sx = jnp.maximum(jnp.max(jnp.abs(xf), -1,
                                             keepdims=True), 1e-8) / ACT_QMAX
                    xq = jnp.clip(jnp.round(xf / sx), -ACT_QMAX,
                                  ACT_QMAX).astype(jnp.int8)
                    P = jax.lax.dot_general(
                        xq, w[i], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    y = (P.astype(jnp.float32) * s[i] * sx)
                elif kind in ("grouped", "grouped_barrier"):
                    G = K // 128
                    xf = a.astype(jnp.float32)
                    sx = jnp.maximum(jnp.max(jnp.abs(xf), -1,
                                             keepdims=True), 1e-8) / ACT_QMAX
                    xq = jnp.clip(jnp.round(xf / sx), -ACT_QMAX,
                                  ACT_QMAX).astype(jnp.int8)
                    xb = xq.reshape(1, G, 128).transpose(1, 0, 2)
                    wi = w[i]
                    if kind == "grouped_barrier":
                        # stop XLA hoisting any widened copy of the
                        # weight out of the scan body
                        wi = jax.lax.optimization_barrier(wi)
                    P = jax.lax.dot_general(
                        xb, wi, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.int32)   # [G, 1, N]
                    y = (jnp.sum(P.astype(jnp.float32), axis=0)
                         * s[i] * sx)
                else:
                    xb = a.astype(jnp.bfloat16)
                    wb = jax.lax.bitcast_convert_type(
                        w[i], jnp.int8).reshape(K, N).astype(jnp.bfloat16)
                    P = jax.lax.dot_general(
                        xb, wb, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    y = P * s[i]
                a = y[:, :K].astype(jnp.bfloat16)
            return a, a[0, 0]
        _, ys = jax.lax.scan(step, x, None, length=4)
        return ys
    y = run(x, w, s)
    jax.block_until_ready(y)
    return float(np.asarray(jax.device_get(y[-1])))


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "rowscale"
    for L in (60, 110, 150, 200, 240):
        gb = L * K * N / 1e9
        try:
            run_scan(L, kind)
            print(f"{kind} L={L} ({gb:.1f} GB weights): OK", flush=True)
        except Exception as e:
            print(f"{kind} L={L} ({gb:.1f} GB weights): "
                  f"FAIL {type(e).__name__} {str(e)[:140]}", flush=True)
            break


if __name__ == "__main__":
    main()
