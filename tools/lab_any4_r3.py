#!/usr/bin/env python
"""Round-3 any4 kernel lab: ablate the q4post kernel to find where the
~80 us over int4p goes (VERDICT r2 weak #1: any4 0.41x bf16).

Micro-probes (tools/probe_sublane_gather.py history) say a full-matrix
lane gather costs only ~5 basic-op equivalents (~4 us at 4096^2), so the
gather alone cannot explain 110.6 vs 28.8 us/layer. Candidates ablated
here, all timed with the bench chain methodology at 4096^2 m=1:

  any4        production q4post (reference point)
  nogather    gather replaced by 2 cheap ops (isolates gather+table cost)
  nodots      per-plane dots replaced by ONE whole-chunk dot (affine
              folded approximately; timing only)
  gdot        gathers emitted for all planes first, then dots (scheduling)
  int4p       pair-packed floor
  w4a8        int8-MXU floor
  bf16        XLA baseline

Run ALONE on the TPU host: python tools/lab_any4_r3.py
"""
import functools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import bench
from any4_tpu.ops import linear as lin
from any4_tpu.ops.pallas import gemv
from any4_tpu.ops.packing import LANES, PACK_BLOCK, PLANES

N = K = 4096
BLOCK_N = 512
KBS = 1


def _mk_kernel(mode):
    def kern(x_ref, w_ref, s_ref, z_ref, lut_ref, o_ref, acc_ref):
        kc = pl.program_id(1)
        nk = (K // PACK_BLOCK) // KBS
        bn = BLOCK_N

        @pl.when(kc == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        if mode == "pretiled":
            # lut arrives already tiled [bn, 128]; no in-kernel concat
            table = lut_ref[:].astype(jnp.float32)
        else:
            lut = lut_ref[:].astype(jnp.float32)
            table = jnp.concatenate([lut] * (LANES // 16), axis=1)

        xb = x_ref[:]
        w = w_ref[:]
        acc = acc_ref[:]
        if mode in ("any4", "nogather", "gdot", "pretiled"):
            vs = []
            for j in range(KBS * PLANES):
                b, jj = divmod(j, PLANES)
                wb = w[:, b * LANES:(b + 1) * LANES]
                codes = (wb if jj == 0 else
                         jax.lax.shift_right_logical(wb, 4 * jj)) & 0xF
                if mode == "nogather":
                    v = ((codes | 1) - 8).astype(jnp.bfloat16)
                else:
                    v = jnp.take_along_axis(table, codes, axis=1) \
                        .astype(jnp.bfloat16)
                if mode == "gdot":
                    vs.append((j, v))
                    continue
                xg = xb[:, j * LANES:(j + 1) * LANES]
                part = jax.lax.dot_general(
                    xg, v, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                sg = s_ref[j:j + 1, :].astype(jnp.float32)
                zg = z_ref[j:j + 1, :].astype(jnp.float32)
                xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
                acc = acc + part * sg + xs * zg
            if mode == "gdot":
                for j, v in vs:
                    xg = xb[:, j * LANES:(j + 1) * LANES]
                    part = jax.lax.dot_general(
                        xg, v, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    sg = s_ref[j:j + 1, :].astype(jnp.float32)
                    zg = z_ref[j:j + 1, :].astype(jnp.float32)
                    xs = jnp.sum(xg.astype(jnp.float32), axis=1,
                                 keepdims=True)
                    acc = acc + part * sg + xs * zg
        elif mode == "nodots":
            planes = []
            for j in range(KBS * PLANES):
                b, jj = divmod(j, PLANES)
                wb = w[:, b * LANES:(b + 1) * LANES]
                codes = (wb if jj == 0 else
                         jax.lax.shift_right_logical(wb, 4 * jj)) & 0xF
                planes.append(jnp.take_along_axis(table, codes, axis=1)
                              .astype(jnp.bfloat16))
            wfull = jnp.concatenate(planes, axis=1)
            part = jax.lax.dot_general(
                xb, wfull, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            # approximate affine (timing only): one scale row
            sg = s_ref[0:1, :].astype(jnp.float32)
            acc = acc + part * sg
        acc_ref[:] = acc

        @pl.when(kc == nk - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return kern


def pack_int4_t(codes):
    """Transposed planar packing: [n, kp] codes -> [kp/8, n] int32.

    k is blocked in 128-wide groups; within a group, word row K (of 16)
    holds in nibble p the code for k-offset p*16 + K, so unpacking plane p
    and concatenating planes along sublanes yields ct[j, r] = code(k=j)
    in NATURAL k order on sublanes."""
    n, kp = codes.shape
    c = codes.astype(jnp.int32).reshape(n, kp // 128, 8, 16)
    c = c.transpose(1, 3, 2, 0)                    # [groups, 16, 8, n]
    shifts = (4 * jnp.arange(8, dtype=jnp.int32))[None, None, :, None]
    words = jnp.sum(c << shifts, axis=2, dtype=jnp.int32)  # [groups, 16, n]
    return words.reshape(kp // 8, n)


def _mk_kernel_t(mode):
    """Transposed-layout kernel: k on sublanes, rows on lanes; LUT halves
    [8, bn] gathered along sublanes (tpu.dynamic_gather dim 0)."""
    def kern(x_ref, w_ref, s_ref, z_ref, lut_ref, o_ref, acc_ref):
        kc = pl.program_id(1)
        nk = (K // PACK_BLOCK) // KBS

        @pl.when(kc == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        lut_t = lut_ref[:].astype(jnp.float32)       # [16, bn]
        tlo = lut_t[0:8, :]
        thi = lut_t[8:16, :]
        xb = x_ref[:]                                # [1, kbs*1024] bf16
        w = w_ref[:]                                 # [kbs*128, bn] int32
        acc = acc_ref[:]
        for g in range(KBS * 8):                     # 128-k groups
            words = w[g * 16:(g + 1) * 16, :]        # [16, bn]
            planes = []
            for p in range(8):
                planes.append((words if p == 0 else
                               jax.lax.shift_right_logical(words, 4 * p))
                              & 0xF)
            ct = jnp.concatenate(planes, axis=0)     # [128, bn], k-naturals
            outs = []
            for s in range(16):
                cs = ct[s * 8:(s + 1) * 8, :]
                c7 = cs & 7
                if mode == "t_nogather":
                    v = (c7 | 1).astype(jnp.float32)
                else:
                    glo = jnp.take_along_axis(tlo, c7, axis=0)
                    ghi = jnp.take_along_axis(thi, c7, axis=0)
                    v = jnp.where(cs >= 8, ghi, glo)
                outs.append(v)
            deq = jnp.concatenate(outs, axis=0).astype(jnp.bfloat16)
            xg = xb[:, g * 128:(g + 1) * 128]
            part = jax.lax.dot_general(
                xg, deq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [1, bn]
            sg = s_ref[g:g + 1, :].astype(jnp.float32)
            zg = z_ref[g:g + 1, :].astype(jnp.float32)
            xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
            acc = acc + part * sg + xs * zg
        acc_ref[:] = acc

        @pl.when(kc == nk - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return kern


def _mk_kernel_a8(mode):
    """any4-a8 candidates: per-row LUT quantized to int8 (row scale folded
    into the group scales offline), sublane-gather the int8 codebook in the
    transposed layout, and ride the int8 MXU like w4a8 (fused activation
    quantization). Modes:

      a8_sel    int32 gather lo/hi halves + select -> astype(int8)
      a8_bf16g  bf16 table, ONE gather (16-bit vreg = 16-sublane reach)
                -> astype(int8)
      a8_floor  gather replaced by cheap ops (structural floor)
    """
    def kern(x_ref, w_ref, s_ref, z_ref, lut_ref, o_ref, acc_ref):
        kc = pl.program_id(1)
        nk = (K // PACK_BLOCK) // KBS
        csz = KBS * PACK_BLOCK

        @pl.when(kc == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        xf = x_ref[:].astype(jnp.float32)            # [1, K] full row
        sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True),
                         1e-8) / 127.0
        xc = x_ref[:, pl.ds(kc * csz, csz)].astype(jnp.float32)
        xq = jnp.clip(jnp.round(xc / sx), -127, 127).astype(jnp.int8)

        if mode == "a8_bf16g":
            lut8 = lut_ref[:].astype(jnp.bfloat16)   # [16, bn] int8 values
        else:
            lut8 = lut_ref[:]                        # [16, bn] int32
            tlo = lut8[0:8, :]
            thi = lut8[8:16, :]
        w = w_ref[:]                                 # [KBS*128, bn] int32
        acc = acc_ref[:]
        for g in range(KBS * 8):                     # 128-k groups
            words = w[g * 16:(g + 1) * 16, :]        # [16, bn]
            outs = []
            if mode == "a8_bf16g":
                for p in range(8):
                    # plane p codes [16, bn] sit at k = p*16 + K: one
                    # 16-reach bf16 gather per plane, concat is k-natural
                    cs = (words if p == 0 else
                          jax.lax.shift_right_logical(words, 4 * p)) & 0xF
                    outs.append(jnp.take_along_axis(lut8, cs, axis=0))
                deq = jnp.concatenate(outs, axis=0).astype(jnp.int8)
            else:
                for p in range(8):
                    wp = (words if p == 0 else
                          jax.lax.shift_right_logical(words, 4 * p)) & 0xF
                    for s in range(2):
                        cs = wp[s * 8:(s + 1) * 8, :]
                        if mode == "a8_floor":
                            v = cs - 8
                        else:
                            c7 = cs & 7
                            glo = jnp.take_along_axis(tlo, c7, axis=0)
                            ghi = jnp.take_along_axis(thi, c7, axis=0)
                            v = jnp.where(cs >= 8, ghi, glo)
                        outs.append(v)
                deq = jnp.concatenate(outs, axis=0).astype(jnp.int8)
            xg = xq[:, g * 128:(g + 1) * 128]
            part = jax.lax.dot_general(
                xg, deq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)    # [1, bn]
            sg = s_ref[g:g + 1, :].astype(jnp.float32)   # folded s*srow
            zg = z_ref[g:g + 1, :].astype(jnp.float32)
            xs = jnp.sum(xg.astype(jnp.int32), axis=1,
                         keepdims=True).astype(jnp.float32)
            acc = acc + part.astype(jnp.float32) * sg + xs * zg
        acc_ref[:] = acc

        @pl.when(kc == nk - 1)
        def _():
            o_ref[:] = (acc_ref[:] * sx).astype(o_ref.dtype)

    return kern


@functools.partial(jax.jit, static_argnames=("mode",))
def any4a8_variant(x, packed_t, sz, zz, lut8_t, *, mode):
    nk = (K // PACK_BLOCK) // KBS
    rows = KBS * PACK_BLOCK // LANES
    in_specs = [
        pl.BlockSpec((1, K), lambda i, kc: (0, 0),
                     memory_space=pltpu.VMEM),       # full row (fused act)
        pl.BlockSpec((KBS * 128, BLOCK_N), lambda i, kc: (kc, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, BLOCK_N), lambda i, kc: (kc, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, BLOCK_N), lambda i, kc: (kc, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((16, BLOCK_N), lambda i, kc: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        _mk_kernel_a8(mode),
        grid=(N // BLOCK_N, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, BLOCK_N), lambda i, kc: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((1, BLOCK_N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x, packed_t, sz, zz, lut8_t)


def build_a8_chain(mode, x, stacks, reps):
    def layer(a, st, i):
        p, s, z, l = st
        return any4a8_variant(a, p[i], s[i], z[i], l[i], mode=mode)

    @jax.jit
    def run(a, st):
        def body(_, a):
            out = a
            for i in range(bench.LAYERS):
                out = layer(out, st, i)
            return (out * jax.lax.rsqrt(
                jnp.float32(jnp.mean(out * out)) + 1e-6)
                ).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, reps, body, a)

    return functools.partial(run, x, stacks)


@functools.partial(jax.jit, static_argnames=("mode",))
def any4t_variant(x, packed_t, sz, zz, lut_t, *, mode):
    nk = (K // PACK_BLOCK) // KBS
    rows = KBS * PACK_BLOCK // LANES
    in_specs = [
        pl.BlockSpec((1, KBS * PACK_BLOCK), lambda i, kc: (0, kc),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((KBS * 128, BLOCK_N), lambda i, kc: (kc, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, BLOCK_N), lambda i, kc: (kc, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, BLOCK_N), lambda i, kc: (kc, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((16, BLOCK_N), lambda i, kc: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        _mk_kernel_t(mode),
        grid=(N // BLOCK_N, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, BLOCK_N), lambda i, kc: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((1, BLOCK_N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x, packed_t, sz, zz, lut_t)


def build_t_chain(mode, x, stacks, reps):
    def layer(a, st, i):
        p, s, z, l = st
        return any4t_variant(a, p[i], s[i], z[i], l[i], mode=mode)

    @jax.jit
    def run(a, st):
        def body(_, a):
            out = a
            for i in range(bench.LAYERS):
                out = layer(out, st, i)
            return (out * jax.lax.rsqrt(
                jnp.float32(jnp.mean(out * out)) + 1e-6)
                ).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, reps, body, a)

    return functools.partial(run, x, stacks)


@functools.partial(jax.jit, static_argnames=("mode",))
def any4_variant(x, packed, sz, zz, lut, *, mode):
    nk = (K // PACK_BLOCK) // KBS
    rows = KBS * PACK_BLOCK // LANES
    in_specs = [
        pl.BlockSpec((1, KBS * PACK_BLOCK), lambda i, kc: (0, kc),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((BLOCK_N, KBS * LANES), lambda i, kc: (i, kc),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, BLOCK_N), lambda i, kc: (kc, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, BLOCK_N), lambda i, kc: (kc, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((BLOCK_N, 128 if mode == "pretiled" else 16),
                     lambda i, kc: (i, 0), memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        _mk_kernel(mode),
        grid=(N // BLOCK_N, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, BLOCK_N), lambda i, kc: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((1, BLOCK_N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x, packed, sz, zz, lut)


def build_variant_chain(mode, x, stacks, reps):
    def layer(a, st, i):
        p, s, z, l = st
        return any4_variant(a, p[i], s[i], z[i], l[i], mode=mode)

    @jax.jit
    def run(a, st):
        def body(_, a):
            out = a
            for i in range(bench.LAYERS):
                out = layer(out, st, i)
            return (out * jax.lax.rsqrt(
                jnp.float32(jnp.mean(out * out)) + 1e-6)
                ).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, reps, body, a)

    return functools.partial(run, x, stacks)


def main():
    w = jax.random.normal(jax.random.PRNGKey(0), (N, K), jnp.float32)
    w = w * (K ** -0.5)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, K)).astype(jnp.bfloat16)
    stack = lambda a: None if a is None else jnp.stack([a] * bench.LAYERS)

    qt = jax.jit(functools.partial(
        lin.quantize_tensor, fmt="any4", group_size=128, kmeans_iters=8))(w)
    st_any4 = (stack(qt.packed), stack(qt.scales), stack(qt.zeros),
               stack(qt.lut))
    mats = {"bf16": ("bf16", None, (stack(w.astype(jnp.bfloat16)),))}
    for fmt in ("int4p", "w4a8"):
        q = jax.jit(functools.partial(
            lin.quantize_tensor, fmt=fmt, group_size=128))(w)
        mats[fmt] = (fmt, lin._kernel_fmt(q.fmt, q.lut),
                     (stack(q.packed), stack(q.scales), stack(q.zeros),
                      stack(q.lut)))

    tiny = jax.jit(lambda v: v + 1)
    bench.timed_exec(tiny, (x,))
    rtt = min(bench.timed_exec(tiny, (x,)) for _ in range(3))

    probe = bench.build_chain("bf16", x, mats["bf16"][2], (N, K), None, 1)
    probe()
    t1 = min(bench.timed_exec(probe, ()) for _ in range(2)) - rtt
    t1 = max(t1, bench.LAYERS * N * K * 2 / 850e9)
    reps = max(1, min(4096, int(1.0 / t1)))
    print(f"rtt {rtt*1e3:.1f} ms, reps {reps}, bf16 R=1 {t1*1e3:.2f} ms "
          f"({bench.LAYERS*N*K*2/t1/1e9:.0f} GB/s)", file=sys.stderr)

    lut_tiled = jnp.concatenate([qt.lut.astype(jnp.float32)] * 8, axis=1)
    st_tiled = (st_any4[0], st_any4[1], st_any4[2], stack(lut_tiled))
    # transposed layout inputs: repack codes, transpose the LUT
    from any4_tpu.ops.packing import unpack_int4
    codes = unpack_int4(qt.packed, K)
    packed_t = pack_int4_t(codes)
    lut_tt = qt.lut.astype(jnp.float32).T            # [16, n]
    st_t = (stack(packed_t), st_any4[1], st_any4[2], stack(lut_tt))
    # correctness of the transposed kernel vs production at one call
    y_ref = gemv.quantized_matmul(
        x, qt.packed, qt.scales, qt.zeros, qt.lut, fmt="any4",
        group_size=128, n=N)
    y_t = any4t_variant(x, packed_t, qt.scales, qt.zeros, lut_tt,
                        mode="t")
    import numpy as _np
    diff = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)
                                 - y_t.astype(jnp.float32))))
    scale_ref = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32))))
    print(f"any4t vs any4 maxdiff {diff:.4g} (ref max {scale_ref:.4g})",
          file=sys.stderr)

    # any4-a8: per-row LUT quantized to int8, row scale folded into the
    # group scales offline; codes ride the transposed packing + int8 MXU
    lut_f = qt.lut.astype(jnp.float32)                    # [n, 16]
    s_row = jnp.maximum(jnp.abs(lut_f).max(axis=1), 1e-12) / 127.0
    lut8 = jnp.round(lut_f / s_row[:, None])              # in [-127, 127]
    scales_fold = qt.scales.astype(jnp.float32) * s_row[None, :]
    lut8_t_i32 = lut8.astype(jnp.int32).T                 # [16, n]
    lut8_t_bf16 = lut8.astype(jnp.bfloat16).T
    st_a8 = (stack(packed_t), stack(scales_fold), stack(qt.zeros),
             stack(lut8_t_i32))
    st_a8g = (stack(packed_t), stack(scales_fold), stack(qt.zeros),
              stack(lut8_t_bf16))
    y_a8 = any4a8_variant(x, packed_t, scales_fold, qt.zeros, lut8_t_i32,
                          mode="a8_sel")
    rel = float(jnp.linalg.norm(y_a8.astype(jnp.float32)
                                - y_ref.astype(jnp.float32))
                / jnp.linalg.norm(y_ref.astype(jnp.float32)))
    print(f"any4a8 vs any4 rel-l2 {rel:.4g}", file=sys.stderr)
    try:
        y_g = any4a8_variant(x, packed_t, scales_fold, qt.zeros,
                             lut8_t_bf16, mode="a8_bf16g")
        relg = float(jnp.linalg.norm(y_g.astype(jnp.float32)
                                     - y_ref.astype(jnp.float32))
                     / jnp.linalg.norm(y_ref.astype(jnp.float32)))
        print(f"any4a8(bf16g) vs any4 rel-l2 {relg:.4g}", file=sys.stderr)
        bf16g_ok = relg < 0.05
    except Exception as e:
        print(f"a8_bf16g failed to compile: {type(e).__name__}: "
              f"{str(e)[:300]}", file=sys.stderr)
        bf16g_ok = False

    fns = {}
    for mode in ("any4", "nogather", "gdot", "nodots"):
        fns[mode] = build_variant_chain(mode, x, st_any4, reps)
    fns["pretiled"] = build_variant_chain("pretiled", x, st_tiled, reps)
    fns["any4t"] = build_t_chain("t", x, st_t, reps)
    fns["t_nogather"] = build_t_chain("t_nogather", x, st_t, reps)
    fns["a8_sel"] = build_a8_chain("a8_sel", x, st_a8, reps)
    fns["a8_floor"] = build_a8_chain("a8_floor", x, st_a8, reps)
    if bf16g_ok:
        fns["a8_bf16g"] = build_a8_chain("a8_bf16g", x, st_a8g, reps)
    for name, (fmt, kf, st) in mats.items():
        fns[name] = bench.build_chain(name, x, st, (N, K), kf, reps)
    for f in fns.values():
        f()

    best = {k: float("inf") for k in fns}
    for r in range(6):
        for k, f in fns.items():
            best[k] = min(best[k], max(bench.timed_exec(f, ()) - rtt, 1e-6))
    out = {}
    for k, v in best.items():
        us = v / (reps * bench.LAYERS) * 1e6
        out[k] = round(us, 2)
        print(f"{k:10s} {us:8.2f} us/layer")
    with open("benchmarks/lab_any4_r3.json", "w") as f:
        json.dump({"us_per_layer": out, "reps": reps}, f, indent=1)


if __name__ == "__main__":
    main()
