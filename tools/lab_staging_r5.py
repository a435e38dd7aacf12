#!/usr/bin/env python
"""Round-5 VMEM staging-tax lab (VERDICT r4 weak #3 / next #2).

Round 4 measured every int8-weight Pallas layout at 60-65 us/layer at
4096^2 m=1 while bf16's XLA dot streams its 33.5 MB at ~730 GB/s -- the
marginal bandwidth on Pallas-staged weight bytes was ~250 GB/s (~2x the
ideal) and the conclusion rested on LAYOUT variants only. This lab
attacks the staging pipeline itself:

  bf16        XLA dot reference (the 730 GB/s yardstick)
  w8a8q       production quad-int8 kernel, auto-pipelined (60 us baseline)
  w8a8q_kc*   auto pipeline with smaller k-chunks (more, smaller blocks
              in flight)
  ring{R}_*   manual multi-buffered DMA: weights stay in HBM (ANY), the
              kernel async-copies cw-word chunks into an R-deep VMEM ring
              and overlaps the int8 dots with the next R-1 chunk fetches
  dma{R}      the same ring with NO compute: the pure staging ceiling
  xla_i8      plain XLA int8xint8->int32 dot_general on an [n, k] int8
              weight: is XLA's own pipeline also 2x-taxed on int8?

Every variant is chain-timed (16 stacked layers, reps inside one jit,
value-fetch forced) AND device-profiled in the same process, so the
w4a8 15.6-vs-25.4 us device-time contradiction (VERDICT r4 weak #2)
gets one reconciling capture: w4a8 runs in the same window.

Run ALONE on the TPU machine:  python tools/lab_staging_r5.py
"""
import functools
import json
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
import bench
from any4_tpu.ops import linear as lin
from any4_tpu.ops.pallas import gemv

N = K = 4096
L = bench.LAYERS
ACT_QMAX = 127.0


# ---------------------------------------------------------------- kernels
def _ring_kernel(x_ref, s_ref, z_ref, w_hbm, o_ref, buf, sem, *,
                 bn: int, cw: int, R: int, kp: int, compute: bool):
    """w8a8q GEMV with the weight operand ring-DMA'd from HBM.

    x [mp, kp] float VMEM (activation quant fused, as production decode);
    w_hbm [np/4, kp] int32 stays in HBM; each grid step (one n-block)
    copies cw-word chunks into an R-deep ring and runs the quad-int8
    dots while later chunks are in flight -- pipeline depth R instead of
    the auto-pipeline's double buffering.
    """
    i = pl.program_id(0)
    rows = bn // 4
    n_chunks = kp // cw

    def cp(j, slot):
        return pltpu.make_async_copy(
            w_hbm.at[pl.ds(i * rows, rows), pl.ds(j * cw, cw)],
            buf.at[slot], sem.at[slot])

    for r in range(min(R, n_chunks)):
        cp(r, r).start()

    xf = x_ref[:].astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True),
                     1e-8) / ACT_QMAX
    xq = jnp.clip(jnp.round(xf / sx), -ACT_QMAX, ACT_QMAX).astype(jnp.int8)
    mp = x_ref.shape[0]
    acc = jnp.zeros((mp, bn), jnp.float32)
    for j in range(n_chunks):
        slot = j % R
        cp(j, slot).wait()
        w = buf[slot]                                  # [rows, cw] int32
        if compute:
            for gg in range(cw // 128):
                g = j * (cw // 128) + gg
                wb = w[:, gg * 128:(gg + 1) * 128]
                cwt = pltpu.bitcast(wb, jnp.int8)      # [bn, 128]
                xg = xq[:, g * 128:(g + 1) * 128]
                part = jax.lax.dot_general(
                    xg, cwt, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                sg = s_ref[g:g + 1, :].astype(jnp.float32)
                zg = z_ref[g:g + 1, :].astype(jnp.float32)
                xs = jnp.sum(xg.astype(jnp.int32), axis=1,
                             keepdims=True).astype(jnp.float32)
                acc = acc + part.astype(jnp.float32) * sg + xs * zg
        else:
            # touch one vreg so the loop isn't empty; the DMAs are
            # side-effecting and happen regardless
            acc = acc + w[0:1, 0:128].astype(jnp.float32).sum()
        if j + R < n_chunks:
            cp(j + R, slot).start()
    o_ref[:] = (acc * sx).astype(o_ref.dtype)


def ring_matmul(x, packed, s, z, *, bn: int, cw: int, R: int,
                compute: bool = True, interpret: bool = False):
    mp, kp = x.shape
    np4, kpw = packed.shape
    assert kpw == kp
    nb = (np4 * 4) // bn
    rows = bn // 4
    return pl.pallas_call(
        functools.partial(_ring_kernel, bn=bn, cw=cw, R=R, kp=kp,
                          compute=compute),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((mp, kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp // 128, bn), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp // 128, bn), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((mp, bn), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np4 * 4), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((R, rows, cw), jnp.int32),
            pltpu.SemaphoreType.DMA((R,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x, s, z, packed)


# ------------------------------------------------------------------ chains
def make_chain(layer, x, stacks, reps):
    # stacks/x must be jit ARGUMENTS, not closure constants: constants are
    # serialized into the relay's remote-compile request body (HTTP 413
    # above ~0.5 GB)
    @jax.jit
    def run(x, stacks):
        def body(_, a):
            for i in range(L):
                a = layer(a, stacks, i)
            return a
        return jax.lax.fori_loop(0, reps, body, x)

    return lambda: run(x, stacks)


def main():
    w = jax.random.normal(jax.random.PRNGKey(0), (N, K), jnp.float32)
    w = w * (K ** -0.5)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, K)).astype(jnp.bfloat16)
    stack = lambda a: None if a is None else jnp.stack([a] * L)

    qt = jax.jit(functools.partial(
        lin.quantize_tensor, fmt="w8a8", group_size=128))(w)
    assert qt.fmt == "w8a8q", qt.fmt
    qt4 = jax.jit(functools.partial(
        lin.quantize_tensor, fmt="w4a8", group_size=128))(w)
    wq8 = jax.jit(lambda v: jnp.clip(
        jnp.round(v * (127.0 / jnp.max(jnp.abs(v)))), -127, 127
    ).astype(jnp.int8))(w)

    bw = stack(w.astype(jnp.bfloat16))
    sp, ss, sz = stack(qt.packed), stack(qt.scales), stack(qt.zeros)
    p4, s4, z4 = stack(qt4.packed), stack(qt4.scales), stack(qt4.zeros)
    s8 = stack(wq8)

    def bf16_layer(a, st, i):
        return a @ st[0][i].T

    def auto_layer(a, st, i, kc=None):
        return gemv.quantized_matmul(
            a, st[0][i], st[1][i], st[2][i], None, fmt="w8a8q",
            group_size=128, n=N, out_dtype=jnp.bfloat16, k_chunk=kc)

    def w4a8_layer(a, st, i):
        return gemv.quantized_matmul(
            a, st[0][i], st[1][i], st[2][i], None, fmt="w4a8",
            group_size=128, n=N, out_dtype=jnp.bfloat16)

    def ring_layer(a, st, i, bn, cwords, R, compute=True):
        return ring_matmul(a, st[0][i], st[1][i], st[2][i], bn=bn,
                           cw=cwords, R=R, compute=compute)

    def xla_i8_layer(a, st, i):
        xf = a.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                         1e-8) / ACT_QMAX
        xq = jnp.clip(jnp.round(xf / sx), -ACT_QMAX,
                      ACT_QMAX).astype(jnp.int8)
        part = jax.lax.dot_general(
            xq, st[0][i], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        return (part.astype(jnp.float32) * (sx / (ACT_QMAX * np.sqrt(K)))
                ).astype(jnp.bfloat16)

    variants = {
        "bf16": (bf16_layer, (bw,)),
        "w8a8q": (auto_layer, (sp, ss, sz)),
        "w8a8q_kc1": (functools.partial(auto_layer, kc=1), (sp, ss, sz)),
        "w8a8q_kc2": (functools.partial(auto_layer, kc=2), (sp, ss, sz)),
        "w4a8": (w4a8_layer, (p4, s4, z4)),
        "xla_i8": (xla_i8_layer, (s8,)),
        "ring2_bn512_cw512": (functools.partial(
            ring_layer, bn=512, cwords=512, R=2), (sp, ss, sz)),
        "ring4_bn512_cw512": (functools.partial(
            ring_layer, bn=512, cwords=512, R=4), (sp, ss, sz)),
        "ring3_bn512_cw1024": (functools.partial(
            ring_layer, bn=512, cwords=1024, R=3), (sp, ss, sz)),
        "ring2_bn1024_cw1024": (functools.partial(
            ring_layer, bn=1024, cwords=1024, R=2), (sp, ss, sz)),
        "ring4_bn256_cw1024": (functools.partial(
            ring_layer, bn=256, cwords=1024, R=4), (sp, ss, sz)),
        "ring6_bn512_cw256": (functools.partial(
            ring_layer, bn=512, cwords=256, R=6), (sp, ss, sz)),
        "dma2": (functools.partial(
            ring_layer, bn=512, cwords=512, R=2, compute=False),
            (sp, ss, sz)),
        "dma4": (functools.partial(
            ring_layer, bn=512, cwords=1024, R=4, compute=False),
            (sp, ss, sz)),
    }

    tiny = jax.jit(lambda v: v + 1)
    bench.timed_exec(tiny, (x,))
    rtt = min(bench.timed_exec(tiny, (x,)) for _ in range(3))
    probe = make_chain(bf16_layer, x, (bw,), 1)
    bench.timed_exec(probe, ())
    t1 = max(min(bench.timed_exec(probe, ()) for _ in range(2)) - rtt,
             L * N * K * 2 / 850e9)
    reps = max(1, min(32768, int(1.5 / t1)))
    print(f"rtt {rtt*1e3:.1f} ms -> reps={reps}", file=sys.stderr)

    fns = {}
    for name, (layer, st) in variants.items():
        try:
            f = make_chain(layer, x, st, reps)
            f()  # compile
            fns[name] = f
            print(f"compiled {name}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 - lab records lowering gaps
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  file=sys.stderr)

    best = {k: float("inf") for k in fns}
    t0 = time.time()
    for r in range(6):
        if r > 0 and time.time() - t0 > 480:
            break
        for k, f in fns.items():
            best[k] = min(best[k], max(bench.timed_exec(f, ()) - rtt, 1e-6))
        print(f"round {r}: " + ", ".join(
            f"{k} {v/(reps*L)*1e6:.1f}" for k, v in best.items()),
            file=sys.stderr)

    # one same-state device capture of the headline variants (reconciles
    # VERDICT r4 weak #2: w4a8 device 15.6 vs 25.4 us)
    dev = {}
    for name in ("bf16", "w8a8q", "w4a8", "xla_i8", "ring4_bn512_cw512",
                 "dma4"):
        if name not in fns:
            continue
        with tempfile.TemporaryDirectory() as td:
            with jax.profiler.trace(td):
                bench.timed_exec(fns[name], ())
            dev[name] = round(
                bench._device_op_total_us(td) / (reps * L), 2)
        print(f"device {name}: {dev[name]} us/layer", file=sys.stderr)

    per_layer = {k: round(v / (reps * L) * 1e6, 2) for k, v in best.items()}
    staged_mb = N * K / 1e6  # int8 bytes staged per layer
    out = {
        "shape": [N, K], "reps": reps,
        "us_per_layer_wall": per_layer,
        "device_us_per_layer": dev,
        "speedup_vs_bf16": {k: round(per_layer["bf16"] / v, 3)
                            for k, v in per_layer.items()},
        "staged_gbps": {k: round(staged_mb / v * 1e3, 1)
                        for k, v in per_layer.items()
                        if k.startswith(("ring", "dma", "w8a8q", "xla"))},
    }
    print(json.dumps(out))
    with open("benchmarks/lab_staging_r5.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
