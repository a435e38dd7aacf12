#!/usr/bin/env python
"""Hardware validation of round-2 kernels: compile + numeric check on the
real chip for everything that CI only covers in interpret mode.

- int4p pair-packed GEMV (several shapes incl. rectangular)
- int8p split-byte GEMV
- flash_paged_decode at hd=64 and hd=128, unquantized and int8 pools
- a small end-to-end engine decode at hd=64

Run ALONE on the TPU host:  python tools/validate_hw_r2.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from any4_tpu.ops import linear as lin
from any4_tpu.serving import kv_cache as kvc

FAILURES = []


def check(name, fn):
    t0 = time.time()
    try:
        fn()
        print(f"PASS {name} ({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:
        FAILURES.append(name)
        print(f"FAIL {name}: {str(e).splitlines()[0][:160]}", flush=True)


def gemv_case(fmt, n, k, g=128):
    def run():
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((n, k), np.float32))
        qt = lin.quantize_tensor(w, fmt, group_size=g)
        x = jnp.asarray(rng.standard_normal((1, k), np.float32))
        y = np.asarray(lin.linear(x, qt), np.float32)
        wd = lin.dequantize_tensor(qt, dtype=jnp.float32)
        ref = np.asarray(x, np.float32) @ np.asarray(wd).T
        err = np.abs(y - ref).max() / (np.abs(ref).std() + 1e-9)
        assert err < 0.05, f"relmaxerr {err:.4f}"
    return run


def flash_case(hd, quantized):
    def run():
        h, P, ps = 2, 9, 16
        b, nq = 2, 4
        rng = np.random.default_rng(1)
        table = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)
        lens = jnp.asarray([7, 40], jnp.int32)
        q = jnp.asarray(rng.standard_normal((b, nq, hd)), jnp.float32)
        if quantized:
            kq = jnp.asarray(rng.integers(-127, 128, (h, P, ps, hd)),
                             jnp.int8)
            vq = jnp.asarray(rng.integers(-127, 128, (h, P, ps, hd)),
                             jnp.int8)
            ks = jnp.asarray(rng.random((h, P, ps)) * 0.02 + 1e-3,
                             jnp.float32)
            vs = jnp.asarray(rng.random((h, P, ps)) * 0.02 + 1e-3,
                             jnp.float32)
            out = kvc.flash_paged_decode(q, (kq, ks), (vq, vs), lens, table)
            kd = kq.astype(jnp.float32) * ks[..., None]
            vd = vq.astype(jnp.float32) * vs[..., None]
        else:
            kd = jnp.asarray(rng.standard_normal((h, P, ps, hd)),
                             jnp.float32)
            vd = jnp.asarray(rng.standard_normal((h, P, ps, hd)),
                             jnp.float32)
            out = kvc.flash_paged_decode(q, kd, vd, lens, table)
        # dense reference
        kctx = kvc.gather_ctx(kd, table)
        vctx = kvc.gather_ctx(vd, table)
        rep = nq // h
        kx = jnp.repeat(kctx, rep, axis=2)
        vx = jnp.repeat(vctx, rep, axis=2)
        lg = jnp.einsum("bhd,bshd->bhs", q, kx) / np.sqrt(hd)
        mask = jnp.where(jnp.arange(kctx.shape[1])[None, None, :]
                         < lens[:, None, None], 0.0, -1e9)
        pr = jax.nn.softmax(lg + mask, -1)
        ref = jnp.einsum("bhs,bshd->bhd", pr, vx)
        # the MXU computes f32 dots at bf16 pass precision by default
        # (~0.4% relative); production q/KV are bf16 anyway
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=8e-3)
    return run


def engine_case():
    def run():
        from any4_tpu.models import llama
        from any4_tpu.serving import engine as eng
        cfg = llama.LlamaConfig(vocab_size=512, hidden_size=512,
                                intermediate_size=1024,
                                num_hidden_layers=2,
                                num_attention_heads=8,
                                num_key_value_heads=4, head_dim=64,
                                tie_word_embeddings=True)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        e = eng.Engine(params, cfg, max_slots=2, max_ctx=64, page_size=16)
        e.submit(np.arange(10, dtype=np.int32) + 1, max_new_tokens=4)
        e.submit(np.arange(5, dtype=np.int32) + 3, max_new_tokens=4)
        done = e.run(max_steps=100)
        assert len(done) == 2
        assert all(len(r.out_tokens) == 4 for r in done)
    return run


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    check("int4p 4096x4096 g128", gemv_case("int4p", 4096, 4096))
    check("int4p 16384x2048 g128", gemv_case("int4p", 16384, 2048))
    check("int4p 2048x8192 g256", gemv_case("int4p", 2048, 8192, g=256))
    check("int8p 4096x4096 g128", gemv_case("int8p", 4096, 4096))
    check("flash hd=64 dense-pool", flash_case(64, False))
    check("flash hd=128 dense-pool", flash_case(128, False))
    check("flash hd=64 int8-pool", flash_case(64, True))
    check("engine hd=64 decode", engine_case())
    print("FAILURES:", FAILURES if FAILURES else "none", flush=True)
    return 1 if FAILURES else 0


if __name__ == "__main__":
    sys.exit(main())
