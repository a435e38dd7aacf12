#!/usr/bin/env python
"""Round-2 GEMV perf lab: every candidate dequant-GEMV design timed in
interleaved windows (regime-robust, see PERF_NOTES.md), plus roofline and
unit-throughput probes that bracket the achievable range.

Candidates (reference headline: README.md:440-455 — int4 3.26x, any4 2.29x
over torch bf16 at K=4096, m=1):
  bf16            XLA dot baseline (HBM roofline on this chip)
  int4/any4 prod  production fused-table gather kernel, block_n x k_chunk
  magic2          pair-packed int4, magic-number bf16 bitcast dequant,
                  per-group dots with post-dot scale (no per-element scale)
  magic3          same packing, single dot with per-element bf16 scale
  xla_int4/int8   no-pallas XLA fused convert+scale+dot (int4/int8 storage)
  int8dot         native int8 MXU dot (unit probe, not a format)
  read_*          pure HBM-read floors for bf16 / packed-int4 footprints
  g128/g256       dynamic-gather throughput at 128- vs 256-lane tables

Writes benchmarks/perf_lab_r2.json. Run ALONE on the TPU host (single
client relay):  timeout 5400 python tools/perf_lab_r2.py
"""
import functools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from any4_tpu.ops import linear as lin
from any4_tpu.ops import quant as qm
from any4_tpu.ops.pallas import gemv


# ---------------------------------------------------------------- magic pack
def magic_pack(codes: np.ndarray) -> jnp.ndarray:
    """Pair two output rows per int32 word.

    word(rp, kb*128 + l) bit-field [4p+16h, +4) holds
    code(2*rp + h, kb*512 + p*128 + l): nibble plane p covers one contiguous
    128-wide k-slice (= one g=128 quant group), halves h are the row pair.
    """
    N, K = codes.shape
    assert N % 2 == 0 and K % 1024 == 0
    t = codes.astype(np.uint64).reshape(N // 2, 2, K // 512, 4, 128)
    sh = (4 * np.arange(4, dtype=np.uint64))[None, None, None, :, None] + \
         (16 * np.arange(2, dtype=np.uint64))[None, :, None, None, None]
    words = (t << sh).sum(axis=(1, 3)).astype(np.uint32)
    return jnp.asarray(words.view(np.int32).reshape(N // 2, K // 4))


def _magic2_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *, nk):
    """Per-group dots; scales applied to [m, bn] partials after the MXU."""
    kc = pl.program_id(1)

    @pl.when(kc == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xb = x_ref[:]                     # [mp, 1024] bf16
    w = w_ref[:]                      # [bn//2, 256] int32
    acc = acc_ref[:]
    for b in range(2):
        wb = w[:, b * 128:(b + 1) * 128]
        for p in range(4):
            g = b * 4 + p
            t = (jax.lax.shift_right_logical(wb, 4 * p) & 0x000F000F) \
                | 0x43004300
            v = pltpu.bitcast(t, jnp.bfloat16)          # [bn, 128] = 128+c
            xg = xb[:, g * 128:(g + 1) * 128]
            part = jax.lax.dot_general(
                xg, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)     # [mp, bn]
            sg = s_ref[g:g + 1, :].astype(jnp.float32)  # [1, bn]
            zg = z_ref[g:g + 1, :].astype(jnp.float32)
            xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
            acc = acc + part * sg + xs * (zg - 136.0 * sg)
    acc_ref[:] = acc

    @pl.when(kc == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _magic3_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *, nk):
    """Single dot per chunk; per-element bf16 scale on the dequant values."""
    kc = pl.program_id(1)

    @pl.when(kc == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xb = x_ref[:]
    w = w_ref[:]
    st = s_ref[:].astype(jnp.float32).T          # [bn, 8]
    planes = []
    for b in range(2):
        wb = w[:, b * 128:(b + 1) * 128]
        for p in range(4):
            g = b * 4 + p
            t = (jax.lax.shift_right_logical(wb, 4 * p) & 0x000F000F) \
                | 0x43004300
            v = pltpu.bitcast(t, jnp.bfloat16)
            sB = st[:, g:g + 1]                  # [bn, 1]
            planes.append((v.astype(jnp.float32) * sB).astype(jnp.bfloat16))
    wfull = jnp.concatenate(planes, axis=1)      # [bn, 1024]
    part = jax.lax.dot_general(
        xb, wfull, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # zero + centering correction: y += sum_g xsum_g * (z_g - 136 s_g)
    xs = jnp.stack(
        [jnp.sum(xb[:, g * 128:(g + 1) * 128].astype(jnp.float32), axis=1)
         for g in range(8)], axis=1)             # [mp, 8]
    corr = jax.lax.dot_general(
        xs, z_ref[:].astype(jnp.float32) - 136.0 * s_ref[:].astype(
            jnp.float32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] + part + corr

    @pl.when(kc == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def make_magic(kernel, N, K, BN=512, mp=16, out_dtype=jnp.float32):
    nk = K // 1024
    grid = (N // BN, nk)
    return jax.jit(pl.pallas_call(
        functools.partial(kernel, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((mp, 1024), lambda i, kc: (0, kc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN // 2, 256), lambda i, kc: (i, kc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BN), lambda i, kc: (kc, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BN), lambda i, kc: (kc, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mp, BN), lambda i, kc: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((mp, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    ))


# ------------------------------------------------------------- gather probes
def _gprobe_kernel(tab_ref, idx_ref, o_ref, *, iters, width):
    def body(i, acc):
        idx = (idx_ref[:] + i) & (width - 1)
        return acc + jnp.take_along_axis(tab_ref[:], idx, axis=1)
    o_ref[:] = jax.lax.fori_loop(
        0, iters, body, jnp.zeros_like(tab_ref))


def make_gprobe(width, iters):
    kern = functools.partial(_gprobe_kernel, iters=iters, width=width)
    return jax.jit(pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((512, width), jnp.float32),
    ))


# ------------------------------------------------------------------- driver
def main():
    rng = np.random.default_rng(0)
    results = {}
    fns = {}     # name -> (fn, args)
    checks = {}  # name -> (slice_fn, ref)

    shapes = [(4096, 4096), (16384, 2048), (2048, 8192)]
    for N, K in shapes:
        tag = f"{N}x{K}"
        w = jnp.asarray(rng.standard_normal((N, K), np.float32))
        x = jnp.asarray(rng.standard_normal((1, K), np.float32)).astype(
            jnp.bfloat16)
        x16 = jnp.pad(x, ((0, 15), (0, 0)))
        wb = w.astype(jnp.bfloat16)
        fns[f"{tag}/bf16"] = (jax.jit(lambda a, b: a @ b.T), (x, wb))

        qt = lin.quantize_tensor(w, "int4", group_size=128)
        ref = np.asarray(x, np.float32) @ np.asarray(
            lin.dequantize_tensor(qt, dtype=jnp.float32), np.float32).T

        kcs = [c for c in (1, 2, 4) if (K // 1024) % c == 0]
        for bn in (256, 512, 1024):
            if bn > N:
                continue
            for kc in kcs:
                if (bn, kc) not in ((256, 2), (512, 1), (512, 2), (512, 4),
                                    (1024, 2), (1024, 4), (1024, 1)):
                    continue
                name = f"{tag}/int4_bn{bn}_kc{kc}"
                f = jax.jit(functools.partial(
                    lin.linear, block_n=bn, k_chunk=kc))
                fns[name] = (f, (x, qt))
                checks[name] = ref

        qt4 = lin.quantize_tensor(w, "any4", group_size=128, kmeans_iters=3)
        ref4 = np.asarray(x, np.float32) @ np.asarray(
            lin.dequantize_tensor(qt4, dtype=jnp.float32), np.float32).T
        for bn, kc in ((512, 2), (1024, 2), (1024, 4)):
            if (K // 1024) % kc or bn > N:
                continue
            name = f"{tag}/any4_bn{bn}_kc{kc}"
            f = jax.jit(functools.partial(lin.linear, block_n=bn, k_chunk=kc))
            fns[name] = (f, (x, qt4))
            checks[name] = ref4

        # magic pair-packed int4
        codes, s_, z_ = qm.group_quantize(w, 4, 128)
        mp_packed = magic_pack(np.asarray(codes))
        s_t = jnp.asarray(np.asarray(s_, np.float32).T)   # [K/g, N]
        z_t = jnp.asarray(np.asarray(z_, np.float32).T)
        # magic3 (single dot, per-element bf16 scale) is numerically dead:
        # bf16-rounding the biased (128+c)*s value loses the signal to
        # cancellation (measured relmaxerr 0.55). magic2 is exact.
        for nm, kern in (("magic2", _magic2_kernel),):
            for BN in ((512, 1024) if (N, K) == (4096, 4096) else (512,)):
                if BN > N:
                    continue
                name = f"{tag}/{nm}_bn{BN}"
                f = make_magic(kern, N, K, BN=BN)
                fns[name] = (f, (x16, mp_packed, s_t, z_t))
                checks[name] = ref

        if (N, K) == (4096, 4096):
            # pure-read floors
            fns[f"{tag}/read_bf16"] = (
                jax.jit(lambda b: jnp.sum(b.astype(jnp.float32), axis=1)),
                (wb,))
            fns[f"{tag}/read_int4"] = (
                jax.jit(lambda p: jnp.sum(p, axis=1)), (qt.packed,))

            # XLA fused dequant-dot, int8 and int4 storage
            G = K // 128
            c8 = (np.asarray(codes, np.int32) - 8).astype(np.int8)
            w8 = jnp.asarray(c8)
            sE = jnp.asarray(np.asarray(s_, np.float32))  # [N, G]
            zE = jnp.asarray(np.asarray(z_, np.float32))

            def xla_deq_dot(a, wq, s, z, N=N, K=K, G=G):
                wd = (wq.astype(jnp.float32).reshape(N, G, 128)
                      * s[..., None] + z[..., None])
                return a @ wd.reshape(N, K).astype(jnp.bfloat16).T

            fns[f"{tag}/xla_int8"] = (jax.jit(xla_deq_dot), (x, w8, sE, zE))
            checks[f"{tag}/xla_int8"] = ref
            try:
                w4 = jnp.asarray(c8.astype(np.int8)).astype(jnp.int4)
                fns[f"{tag}/xla_int4"] = (jax.jit(xla_deq_dot),
                                          (x, w4, sE, zE))
                checks[f"{tag}/xla_int4"] = ref
            except Exception as e:  # int4 dtype unsupported
                print(f"int4 dtype unavailable: {e}", flush=True)

            # native int8 MXU dot probe
            xi8 = jnp.asarray(rng.integers(-8, 8, (16, K), np.int8))
            fns[f"{tag}/int8dot"] = (
                jax.jit(lambda a, b: jax.lax.dot_general(
                    a, b, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)), (xi8, w8))

            # gather width probes: equal total gathers (16.8M)
            tab1 = jnp.asarray(rng.standard_normal((512, 128), np.float32))
            idx1 = jnp.asarray(rng.integers(0, 128, (512, 128), np.int32))
            fns[f"{tag}/g128"] = (make_gprobe(128, 256), (tab1, idx1))
            # g256 probe: Mosaic rejects 256-lane gather operands (compile
            # error) -- the pair-packed 256-entry-table design is dead

    # compile + numeric check
    for name in list(fns):
        f, a = fns[name]
        try:
            t0 = time.time()
            out = f(*a)
            jax.block_until_ready(out)
            msg = f"compiled {name} in {time.time() - t0:.0f}s"
            if name in checks:
                got = np.asarray(out, np.float32)[:1]
                refv = checks[name]
                err = np.abs(got[:, :refv.shape[1]] - refv).max() / (
                    np.abs(refv).std() + 1e-9)
                msg += f"  relmaxerr {err:.4f}"
                if err > 0.05:
                    msg += "  ** NUMERIC FAIL — dropped"
                    del fns[name]
            print(msg, flush=True)
        except Exception as e:
            print(f"compile FAIL {name}: {str(e).splitlines()[0][:140]}",
                  flush=True)
            del fns[name]

    # interleaved timing: the shared pool is bimodal (PERF_NOTES), so run
    # until enough FAST-regime windows are sampled (bf16 < 100us) or the
    # wall budget expires; throttled-regime rounds carry no signal
    best = {k: float("inf") for k in fns}
    iters = 20
    fast_rounds = 0
    t_start = time.time()
    budget_s = float(__import__("os").environ.get("PERF_LAB_BUDGET_S",
                                                  7200))
    r = 0
    while time.time() - t_start < budget_s and fast_rounds < 12:
        round_bf16 = None
        for name, (f, a) in fns.items():
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(*a)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / iters
            best[name] = min(best[name], dt)
            if name == "4096x4096/bf16":
                round_bf16 = dt
        if round_bf16 is not None and round_bf16 < 100e-6:
            fast_rounds += 1
        if r % 5 == 0:
            print(f"round {r}: bf16 this-round "
                  f"{(round_bf16 or 0)*1e6:.1f} us, best "
                  f"{best['4096x4096/bf16']*1e6:.1f} us, "
                  f"fast_rounds {fast_rounds}", flush=True)
            with open("benchmarks/perf_lab_r2.json", "w") as fh:
                json.dump({k: v * 1e6 for k, v in best.items()}, fh,
                          indent=1, sort_keys=True)
        r += 1
        if round_bf16 is not None and round_bf16 > 500e-6:
            time.sleep(20)  # throttled: wait out the slow regime cheaply

    print("\n=== results (us, best window) ===")
    for tag in sorted({k.split("/")[0] for k in best}):
        tb = best.get(f"{tag}/bf16")
        for k in sorted(k for k in best if k.startswith(tag + "/")):
            sp = f" ({tb / best[k]:.2f}x)" if tb else ""
            print(f"{k}: {best[k]*1e6:.1f} us{sp}")
    with open("benchmarks/perf_lab_r2.json", "w") as fh:
        json.dump({k: v * 1e6 for k, v in best.items()}, fh, indent=1,
                  sort_keys=True)
    print("wrote benchmarks/perf_lab_r2.json", flush=True)


if __name__ == "__main__":
    main()
