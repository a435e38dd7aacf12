#!/usr/bin/env python
"""Round-5 staging lab part 2: the XLA escape from the Mosaic DMA wall.

lab_staging_r5 established: Pallas stages weight bytes at 245-280 GB/s
no matter how deep the manual DMA ring (even with NO compute), while a
plain XLA int8 x int8 -> int32 dot streams the same 16.8 MB at 654 GB/s
(25.7 us = 1.80x bf16). This lab answers:

  1. is the DMA wall dtype/layout-specific? (pure-DMA rings over the
     same bytes typed int32 / int8 / bf16 / f32)
  2. can the ACCURACY-TRUE grouped affine ride the XLA dot? The
     w8a8/any4q8 math needs per-128-group partials:
         y = sum_g P_g * s_g + sum(x_g) * z_g
     formulated as ONE batched dot: xb [G, m, 128] . W [G, n, 128]
     -> P [G, m, n] int32, then two tiny einsums fold s/z.
  3. how does that scale with m (prefill)?

If (2) lands near 26 us at m=1, every int8-weight format (w8a8, int8,
any4q8) moves from 0.72-0.77x bf16 to ~1.8x -- and the 8B flagship's
any4-accuracy story changes. Run ALONE on the TPU.
"""
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
import bench
from any4_tpu.ops import linear as lin

N = K = 4096
L = bench.LAYERS
G = K // 128
ACT_QMAX = 127.0


def make_chain(layer, x, stacks, reps):
    @jax.jit
    def run(x, stacks):
        def body(_, a):
            for i in range(L):
                a = layer(a, stacks, i)
            return a
        return jax.lax.fori_loop(0, reps, body, x)

    return lambda: run(x, stacks)


def quant_act(a):
    xf = a.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                     1e-8) / ACT_QMAX
    xq = jnp.clip(jnp.round(xf / sx), -ACT_QMAX, ACT_QMAX).astype(jnp.int8)
    return xq, sx


def xla_i8g(a, wg, s, z):
    """Grouped-affine int8 GEMV on XLA's own dot pipeline.

    wg [G, n, 128] int8 (codes grouped on a leading batch axis at pack
    time); s/z [G, n] f32. Exact w8a8 semantics: int32 partials per
    group, then the affine folds via two small contractions.
    """
    m = a.shape[0]
    xq, sx = quant_act(a)
    xb = xq.reshape(m, G, 128).transpose(1, 0, 2)       # [G, m, 128]
    P = jax.lax.dot_general(
        xb, wg, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)               # [G, m, n]
    xs = jnp.sum(xb.astype(jnp.int32), axis=2).astype(jnp.float32)  # [G, m]
    y = jnp.einsum("gmn,gn->mn", P.astype(jnp.float32), s) \
        + jnp.einsum("gm,gn->mn", xs, z)
    return (y * sx).astype(jnp.bfloat16)


def xla_i8c(a, w8, s, z):
    """Weight-only int8 via a convert-in-dot bf16 contraction: does XLA
    fuse the int8->bf16 convert into the dot read (half the bytes of a
    materialized bf16 view)? Grouped affine as above, f32 partials."""
    m = a.shape[0]
    xb = a.astype(jnp.bfloat16).reshape(m, G, 128).transpose(1, 0, 2)
    wg = w8.astype(jnp.bfloat16)                        # [G, n, 128]
    P = jax.lax.dot_general(
        xb, wg, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    xs = jnp.sum(xb.astype(jnp.float32), axis=2)
    y = jnp.einsum("gmn,gn->mn", P, s) + jnp.einsum("gm,gn->mn", xs, z)
    return y.astype(jnp.bfloat16)


def _dma_kernel(x_ref, w_hbm, o_ref, buf, sem, *, rows, cw, n_chunks, R):
    """Pure staging probe: ring-DMA the whole weight block through VMEM
    with no compute (natively typed source -- no bitcasts that could
    materialize a copy)."""
    i = pl.program_id(0)

    def cp(j, slot):
        return pltpu.make_async_copy(
            w_hbm.at[pl.ds(i * rows, rows), pl.ds(j * cw, cw)],
            buf.at[slot], sem.at[slot])

    for r in range(min(R, n_chunks)):
        cp(r, r).start()
    acc = jnp.zeros((1, 128), jnp.float32)
    for j in range(n_chunks):
        slot = j % R
        cp(j, slot).wait()
        acc = acc + buf[slot][0:1, 0:128].astype(jnp.float32)
        if j + R < n_chunks:
            cp(j + R, slot).start()
    # depend on x so a chained loop cannot reorder/elide the call
    o_ref[:] = (acc + x_ref[:, 0:128].astype(jnp.float32) * 0.0) \
        .astype(o_ref.dtype)


def dma_probe(x, arr, *, nb=8, n_chunks=4, R=4):
    R0, C = arr.shape
    rows, cw = R0 // nb, C // n_chunks
    y = pl.pallas_call(
        functools.partial(_dma_kernel, rows=rows, cw=cw,
                          n_chunks=n_chunks, R=R),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, x.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, nb * 128), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((R, rows, cw), arr.dtype),
            pltpu.SemaphoreType.DMA((R,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x, arr)
    return jnp.tile(y * 1e-3, (1, x.shape[1] // (nb * 128)))


def main():
    w = jax.random.normal(jax.random.PRNGKey(0), (N, K), jnp.float32)
    w = w * (K ** -0.5)
    stack = lambda a: None if a is None else jnp.stack([a] * L)

    qt = jax.jit(functools.partial(
        lin.quantize_tensor, fmt="w8a8", group_size=128))(w)  # -> w8a8q
    qt4 = jax.jit(functools.partial(
        lin.quantize_tensor, fmt="w4a8", group_size=128))(w)

    # grouped layout [G, n, 128] from the quad packing's dequant-exact
    # codes; scales/zeros [kp/g, n] -> [G, n]
    from any4_tpu.ops import packing
    codes = jax.jit(lambda p: packing.unpack_int8_quad(p, K))(qt.packed)
    wg = jnp.asarray(np.asarray(codes).reshape(N, G, 128)
                     .transpose(1, 0, 2))               # [G, n, 128] int8
    s = qt.scales                                        # [G, n]
    z = qt.zeros

    # correctness first (run on device, m=1 and m=16)
    for m in (1, 16):
        a = jax.random.normal(jax.random.PRNGKey(2), (m, K), jnp.float32)
        ref = lin.linear(a.astype(jnp.bfloat16), qt)
        got = xla_i8g(a.astype(jnp.bfloat16), wg, s, z)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
        print(f"xla_i8g m={m}: relmax {err/scale:.2e}", file=sys.stderr)
        assert err / scale < 2e-2

    bw = stack(w.astype(jnp.bfloat16))
    swg, ss, sz = stack(wg), stack(s), stack(z)
    p4, s4, z4 = stack(qt4.packed), stack(qt4.scales), stack(qt4.zeros)
    spq = stack(qt.packed)

    # same-byte DMA dtype probes (16.8 MB each, natively typed): is the
    # Mosaic DMA wall dtype/shape-specific?
    key = jax.random.PRNGKey(3)
    probes = {
        "dma_int32": stack(jax.random.randint(
            key, (N // 4, K), -2**31, 2**31 - 1, jnp.int32)),
        "dma_int8": stack(jax.random.randint(
            key, (N // 4, 4 * K), -127, 127, jnp.int32).astype(jnp.int8)),
        "dma_bf16": stack(jax.random.normal(
            key, (N // 4, 2 * K)).astype(jnp.bfloat16)),
        "dma_f32": stack(jax.random.normal(key, (N // 4, K),
                                           jnp.float32)),
    }

    def gemv_layer(a, st, i):
        from any4_tpu.ops.pallas import gemv
        return gemv.quantized_matmul(
            a, st[0][i], st[1][i], st[2][i], None, fmt="w4a8",
            group_size=128, n=N, out_dtype=jnp.bfloat16)

    x1 = jax.random.normal(jax.random.PRNGKey(1), (1, K)).astype(jnp.bfloat16)

    variants = {
        "bf16": (lambda a, st, i: a @ st[0][i].T, (bw,)),
        "w4a8": (gemv_layer, (p4, s4, z4)),
        "xla_i8g": (lambda a, st, i: xla_i8g(a, st[0][i], st[1][i],
                                             st[2][i]), (swg, ss, sz)),
        "xla_i8c": (lambda a, st, i: xla_i8c(a, st[0][i], st[1][i],
                                             st[2][i]), (swg, ss, sz)),
    }
    for name, arr in probes.items():
        variants[name] = (
            (lambda a, st, i: dma_probe(a, st[0][i])), (arr,))

    tiny = jax.jit(lambda v: v + 1)
    bench.timed_exec(tiny, (x1,))
    rtt = min(bench.timed_exec(tiny, (x1,)) for _ in range(3))
    probe = make_chain(variants["bf16"][0], x1, (bw,), 1)
    bench.timed_exec(probe, ())
    t1 = max(min(bench.timed_exec(probe, ()) for _ in range(2)) - rtt,
             L * N * K * 2 / 850e9)
    reps = max(1, min(32768, int(1.5 / t1)))
    print(f"rtt {rtt*1e3:.1f} ms -> reps={reps}", file=sys.stderr)

    fns = {}
    for name, (layer, st) in variants.items():
        try:
            f = make_chain(layer, x1, st, reps)
            f()
            fns[name] = f
            print(f"compiled {name}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:250]}",
                  file=sys.stderr)

    best = {k: float("inf") for k in fns}
    t0 = time.time()
    for r in range(6):
        if r > 0 and time.time() - t0 > 360:
            break
        for k, f in fns.items():
            best[k] = min(best[k], max(bench.timed_exec(f, ()) - rtt, 1e-6))
        print(f"round {r}: " + ", ".join(
            f"{k} {v/(reps*L)*1e6:.1f}" for k, v in best.items()),
            file=sys.stderr)
    per_layer = {k: round(v / (reps * L) * 1e6, 2) for k, v in best.items()}

    # m sweep for the grouped XLA path vs the pallas chunked path
    msweep = {}
    for m in (16, 64, 256):
        xm = jax.random.normal(jax.random.PRNGKey(4), (m, K)) \
            .astype(jnp.bfloat16)
        fx = make_chain(lambda a, st, i: xla_i8g(a, st[0][i], st[1][i],
                                                 st[2][i]),
                        xm, (swg, ss, sz), max(1, reps // (2 * m)))
        fq = make_chain(
            lambda a, st, i: lin.linear(
                a, lin.QuantizedTensor(st[0][i], st[1][i], st[2][i], None,
                                       "w8a8q", 128, (N, K), jnp.bfloat16)),
            xm, (spq, ss, sz), max(1, reps // (2 * m)))
        fb = make_chain(lambda a, st, i: (a @ st[0][i].T), xm, (bw,),
                        max(1, reps // (2 * m)))
        row = {}
        for nm, f in (("xla_i8g", fx), ("w8a8q", fq), ("bf16", fb)):
            try:
                f()
                t = min(max(bench.timed_exec(f, ()) - rtt, 1e-6)
                        for _ in range(3))
                row[nm] = round(t / (max(1, reps // (2 * m)) * L) * 1e6, 2)
            except Exception as e:  # noqa: BLE001
                row[nm] = f"FAILED {type(e).__name__}"
        msweep[m] = row
        print(f"m={m}: {row}", file=sys.stderr)

    out = {"shape": [N, K], "reps": reps,
           "us_per_layer_wall": per_layer,
           "speedup_vs_bf16": {k: round(per_layer["bf16"] / v, 3)
                               for k, v in per_layer.items()},
           "m_sweep_us_per_layer": msweep}
    print(json.dumps(out))
    with open("benchmarks/lab_xla8_r5.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
