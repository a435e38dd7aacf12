#!/usr/bin/env python
"""Does Mosaic lower an int8 x int8 -> int32 dot_general on this chip,
and at what rate vs bf16? Feasibility probe for a w4a8 GEMV format
(int4 weights, int8 activations, int8-MXU dots).

One case per PROCESS (a failing Mosaic program can poison the TPU
client so every later pallas_call in the same process reports
FAILED_PRECONDITION — observed when all five cases ran in one process).

Run ALONE on the TPU host:
  python tools/probe_int8_dot.py --case bf16_span4096
  python tools/probe_int8_dot.py            # driver: all cases, subprocesses
"""
import argparse
import functools
import json
import subprocess
import sys
import tempfile

sys.path.insert(0, ".")

K, N = 4096, 4096
BN = 512
REPS = 64

# name -> (dtype, M, span)
CASES = {
    "bf16_span4096": ("bf16", 16, 4096),
    "bf16_span128": ("bf16", 16, 128),
    "i8_m32_span4096": ("int8", 32, 4096),
    "i8_m32_span128": ("int8", 32, 128),
    "i8_m16_span4096": ("int8", 16, 4096),
    "i8_m8_span512": ("int8", 8, 512),
}


def run_case(name):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tools.profile_kernels import device_op_times

    kind, m, span = CASES[name]
    if kind == "int8":
        idt, odt = jnp.int8, jnp.int32
    else:
        idt, odt = jnp.bfloat16, jnp.float32

    def kern(x_ref, w_ref, o_ref):
        acc = jnp.zeros((m, BN), odt)
        for g in range(K // span):
            xg = x_ref[:, g * span:(g + 1) * span]
            wg = w_ref[:, g * span:(g + 1) * span]
            acc = acc + jax.lax.dot_general(
                xg, wg, (((1,), (1,)), ((), ())),
                preferred_element_type=odt)
        o_ref[:] = acc

    rng = np.random.default_rng(0)
    if kind == "int8":
        x = jnp.asarray(rng.integers(-127, 127, (m, K)), idt)
        w = jnp.asarray(rng.integers(-127, 127, (N, K)), idt)
    else:
        x = jnp.asarray(rng.standard_normal((m, K)), idt)
        w = jnp.asarray(rng.standard_normal((N, K)), idt)

    f = pl.pallas_call(
        kern,
        grid=(N // BN,),
        in_specs=[pl.BlockSpec((m, K), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BN, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((m, BN), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, N), odt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )

    y = f(x, w)  # correctness vs XLA reference
    ref = jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=odt)
    if odt == jnp.int32:
        ok = bool(jnp.all(y == ref))
    else:
        d = jnp.abs(y.astype(jnp.float32) - ref.astype(jnp.float32))
        ok = bool(jnp.all(d <= 1e-2 * jnp.abs(ref.astype(jnp.float32)) + 1))

    @jax.jit
    def chain(x, w):
        def body(i, a):
            yy = f(a, w)
            return yy[:, :1].astype(x.dtype) * 0 + a  # data dep, x-shaped
        return jax.lax.fori_loop(0, REPS, body, x)

    jax.block_until_ready(chain(x, w))
    import numpy as _np
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            r = chain(x, w)
            _np.asarray(jax.device_get(r[0, 0]))
        ops = device_op_times(td)
    tot = sum(sum(v) for kk, v in ops.items()
              if kk.startswith(("jit_", "jit(")))
    return {"exact": ok, "us": round(tot / REPS, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default=None, choices=sorted(CASES))
    args = ap.parse_args()
    if args.case:
        try:
            out = run_case(args.case)
        except Exception as e:  # noqa: BLE001 - feasibility probe
            out = {"error": str(e)[:300]}
        print(json.dumps({args.case: out}))
        return

    results = {}
    for name in CASES:
        p = subprocess.run(
            [sys.executable, __file__, "--case", name],
            capture_output=True, text=True, timeout=900)
        got = None
        for ln in (p.stdout or "").splitlines():
            if ln.startswith("{"):
                got = json.loads(ln)[name]
        if got is None:
            got = {"error": (p.stderr or "no output")[-300:]}
        results[name] = got
        print(name, got, file=sys.stderr)
    with open("benchmarks/probe_int8_dot.json", "w") as fjs:
        json.dump(results, fjs, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
