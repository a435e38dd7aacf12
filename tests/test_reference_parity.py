"""Quantizer parity against the reference implementation itself.

The reference (/root/reference, facebookresearch/any4) is importable with
CPU torch in this container, so the uniform quantizers can be pinned
BIT-FOR-BIT and the k-means LUT pipeline pinned to matching
reconstruction quality on identical matrices — the offline stand-in for
the reference's golden perplexity regression (tests/test_accuracy.py:22)
until the full eval stack can run (VERDICT r2 missing #1).

Covered:
- ``group_quantize`` vs ``tinygemm_lib.utils.group_quantize_tensor``
  (codes + scales_and_zeros exact)
- asym/symmetric/int_zeros ``group_q``/``group_q1`` variants
  (quantize.py:106-331) vs our flags (exact)
- ``intq_quantize_tensor`` reconstruction (exact)
- ``anyq_quantize_tensor`` (parallelize=False, sklearn backend) vs
  ``any4_quantize``: per-row LUT reconstruction W-MSE within 1%
  relative (k-means seeds/inits differ; exact equality is not defined)
- anyq exactness: <=16 distinct group-normalized values per row -> both
  implementations reconstruct exactly.

These tests run on CPU only and skip if the reference tree is absent.
"""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available")


@pytest.fixture(scope="module")
def ref():
    """Import the reference quantize module with unused deps stubbed."""
    sys.path.insert(0, REF)
    for name in ("bitsandbytes", "tinygemm"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            # transformers probes importlib.util.find_spec("bitsandbytes"),
            # which raises on a stub whose __spec__ is None
            import importlib.machinery
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod
    import quantize as refq  # noqa: PLC0415
    from tinygemm_lib import utils as refutils  # noqa: PLC0415
    import torch  # noqa: PLC0415
    ns = types.SimpleNamespace(q=refq, utils=refutils, torch=torch)
    yield ns
    sys.path.remove(REF)


def _w(shape=(16, 256), seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    return rng.normal(size=shape).astype(dtype)


class TestGroupQuantParity:
    def test_group_quantize_tensor_exact(self, ref):
        from any4_tpu.ops import quant as q
        w = _w((32, 512), seed=1)
        codes, scales, zeros = q.group_quantize(w, n_bit=4, group_size=128)
        sz = np.asarray(q.pack_scales_and_zeros(scales, zeros))

        t = ref.torch.from_numpy(w)
        ref_codes, ref_sz = ref.utils.group_quantize_tensor(t, 4, 128)
        np.testing.assert_array_equal(np.asarray(codes, np.int32),
                                      ref_codes.numpy())
        np.testing.assert_array_equal(sz, ref_sz.float().numpy())

    @pytest.mark.parametrize("n_bit,g", [(4, 64), (4, 128), (8, 128),
                                         (2, 32), (4, 256)])
    def test_group_q_asym_exact(self, ref, n_bit, g):
        """Un-rounded group normalization (the anyq clustering domain)
        matches reference group_q bit-for-bit (quantize.py:106-149)."""
        from any4_tpu.ops import quant as q
        w = _w((8, 512), seed=n_bit * 10 + g)
        wq_f, scales, zeros = q.group_codes_float(w, n_bit, g)
        t = ref.torch.from_numpy(w)
        ref_wnew, _, ref_sz = ref.q.group_q(t, n_bit, q_group_size=g)
        np.testing.assert_array_equal(np.asarray(wq_f), ref_wnew.numpy())
        sz = np.asarray(q.pack_scales_and_zeros(scales, zeros))
        np.testing.assert_array_equal(sz, ref_sz.float().numpy())

    def test_group_q_symmetric_exact(self, ref):
        from any4_tpu.ops import quant as q
        w = _w((8, 256), seed=7)
        codes, scales, zeros = q.group_quantize(
            w, n_bit=4, group_size=128, symmetric=True)
        t = ref.torch.from_numpy(w)
        ref_wnew, _, ref_sz = ref.q.group_q(
            t, 4, q_group_size=128, assymetric=False)
        s_ref, z_ref = ref_sz[..., 0].T.numpy(), ref_sz[..., 1].T.numpy()
        np.testing.assert_array_equal(np.asarray(scales), s_ref)
        np.testing.assert_array_equal(np.asarray(zeros), z_ref)
        # reference leaves codes unrounded in group_q; round to compare.
        # symmetric codes in the reference are NOT shifted by +8; our
        # convention stores code+8 so reconstruction shares one formula.
        ref_codes = np.clip(np.round(ref_wnew.numpy()) + 8, 0, 15)
        np.testing.assert_array_equal(np.asarray(codes, np.float64),
                                      ref_codes)

    def test_group_q1_int_zeros_exact(self, ref):
        from any4_tpu.ops import quant as q
        w = _w((8, 256), seed=11)
        codes, scales, zeros = q.group_quantize(
            w, n_bit=4, group_size=64, int_zeros=True)
        t = ref.torch.from_numpy(w)
        ref_q, ref_scales, ref_zq = ref.q.group_q1(
            t, n_bit=4, q_group_size=64, assymetric=True, get_scale_zp=True)
        # reference returns UN-rounded codes (w/s + zq, clamped); rounding
        # commutes with the integer zero-point for non-tie values
        np.testing.assert_array_equal(
            np.asarray(codes, np.int32),
            np.round(ref_q.numpy()).astype(np.int32))
        np.testing.assert_array_equal(
            np.asarray(scales), ref_scales.view(w.shape[0], -1).numpy())
        # our zeros fold the integer zero-point: z = (8 - zq) * scale
        zq = ref_zq.view(w.shape[0], -1).numpy()
        sc = ref_scales.view(w.shape[0], -1).numpy()
        np.testing.assert_allclose(np.asarray(zeros), (8.0 - zq) * sc,
                                   rtol=1e-6, atol=1e-7)

    def test_reconstruction_matches_degroup(self, ref):
        from any4_tpu.ops import quant as q
        w = _w((8, 256), seed=3)
        codes, scales, zeros = q.group_quantize(w, n_bit=4, group_size=128)
        recon = np.asarray(q.group_dequantize(codes, scales, zeros,
                                              n_bit=4, group_size=128))
        t = ref.torch.from_numpy(w)
        ref_codes, ref_sz = ref.utils.group_quantize_tensor(t, 4, 128)
        ref_recon = ref.q.degroup_q(
            ref_codes.float(), ref_sz.float(), centering=True,
            q_group_size=128)
        np.testing.assert_allclose(recon, ref_recon.numpy(),
                                   rtol=1e-6, atol=1e-6)


class TestIntqParity:
    def test_intq_reconstruct_exact(self, ref):
        from any4_tpu.ops import quant as q
        w = _w((8, 256), seed=5)
        t = ref.torch.from_numpy(w)
        ref_recon = ref.q.intq_reconstruct_tensor(
            t, n_bit=4, q_group_size=128, dtype=ref.torch.float32)
        codes, scales, zeros = q.group_quantize(w, n_bit=4, group_size=128)
        recon = np.asarray(q.group_dequantize(codes, scales, zeros,
                                              n_bit=4, group_size=128))
        np.testing.assert_allclose(recon, ref_recon.numpy(),
                                   rtol=1e-5, atol=1e-6)


def _wmse(w, recon):
    return float(np.mean((w - recon) ** 2))


class TestAnyqParity:
    def test_anyq_wmse_within_1pct(self, ref):
        """Same matrix through both any4 pipelines: reconstruction W-MSE
        must agree within 1% relative (reference quantize.py:523-637)."""
        from any4_tpu.ops import quant as q
        from any4_tpu.quant import anyq
        w = _w((16, 512), seed=17)

        t = ref.torch.from_numpy(w)
        assign, lut_ref, _ = ref.q.anyq_quantize_tensor(
            t, n_bit=4, q_group_size=128, parallelize=False)
        ref_recon = ref.q.anyq_dequantize_tensor(
            assign, lut_ref, ref.q.group_q(t, 4, 128)[2],
            q_group_size=128).numpy()
        ref_mse = _wmse(w, ref_recon)

        codes, lut, scales, zeros = anyq.any4_quantize(
            w, n_bit=4, group_size=128, kmeans_iters=50, n_init=3)
        recon = np.asarray(q.anyq_dequantize(
            codes, lut, scales, zeros, n_bit=4, group_size=128))
        mse = _wmse(w, recon)

        assert mse <= ref_mse * 1.01, (mse, ref_mse)
        # sanity: both should beat plain int4 rounding
        c4, s4, z4 = q.group_quantize(w, n_bit=4, group_size=128)
        int4_mse = _wmse(w, np.asarray(q.group_dequantize(
            c4, s4, z4, n_bit=4, group_size=128)))
        assert mse < int4_mse and ref_mse < int4_mse

    def test_anyq_exact_when_16_values(self, ref):
        """Rows built from exactly 16 distinct group-normalized values
        reconstruct exactly in both implementations (the reference's
        test_anyq.py:39-49 exactness property)."""
        from any4_tpu.ops import quant as q
        from any4_tpu.quant import anyq
        rng = np.random.default_rng(23)
        vals = np.sort(rng.normal(size=16)).astype(np.float32)
        w = vals[rng.integers(0, 16, (4, 128))].astype(np.float32)
        # one group per row -> group normalization is a per-row affine,
        # preserving "16 distinct values per row"
        codes, lut, scales, zeros = anyq.any4_quantize(
            w, n_bit=4, group_size=128, kmeans_iters=100, n_init=4)
        recon = np.asarray(q.anyq_dequantize(
            codes, lut, scales, zeros, n_bit=4, group_size=128))
        np.testing.assert_allclose(recon, w, rtol=0, atol=2e-5)

        t = ref.torch.from_numpy(w)
        assign, lut_ref, _ = ref.q.anyq_quantize_tensor(
            t, n_bit=4, q_group_size=128, parallelize=False)
        ref_recon = ref.q.anyq_dequantize_tensor(
            assign, lut_ref, ref.q.group_q(t, 4, 128)[2],
            q_group_size=128).numpy()
        np.testing.assert_allclose(ref_recon, w, rtol=0, atol=2e-5)

    def test_anyq_global_lut_wmse(self, ref):
        """per_row=False (one global LUT, reference quantize.py:528-530)."""
        from any4_tpu.ops import quant as q
        from any4_tpu.quant import anyq
        w = _w((8, 256), seed=29)
        t = ref.torch.from_numpy(w)
        assign, lut_ref, sz_ref = ref.q.anyq_quantize_tensor(
            t, n_bit=4, q_group_size=128, per_row=False, parallelize=False)
        ref_recon = ref.q.anyq_dequantize_tensor(
            assign, lut_ref, sz_ref, q_group_size=128,
            per_row=False).numpy()
        codes, lut, scales, zeros = anyq.any4_quantize(
            w, n_bit=4, group_size=128, per_row=False,
            kmeans_iters=50, n_init=3)
        recon = np.asarray(q.anyq_dequantize(
            codes, lut, scales, zeros, n_bit=4, group_size=128))
        assert _wmse(w, recon) <= _wmse(w, ref_recon) * 1.02


class TestMXParity:
    """General MX element library vs the vendored reference
    (tinygemm_lib/mx): block quantization must be BIT-exact across every
    element format and rounding mode (VERDICT r2 missing #3)."""

    FMTS = ("int8", "int4", "int2", "fp8_e4m3", "fp8_e5m2", "fp6_e3m2",
            "fp6_e2m3", "fp4")

    @pytest.fixture(scope="class")
    def refmx(self, ref):
        from tinygemm_lib.mx import elemwise_ops, mx_ops
        return types.SimpleNamespace(mx_ops=mx_ops, elem=elemwise_ops,
                                     torch=ref.torch)

    @pytest.mark.parametrize("fmt", FMTS)
    @pytest.mark.parametrize("rnd", ["nearest", "even", "floor"])
    def test_quantize_mx_exact(self, refmx, fmt, rnd):
        from any4_tpu.ops import mx as jmx
        a = _w((8, 96), seed=11) * 3
        want = refmx.mx_ops._quantize_mx(
            refmx.torch.from_numpy(a), 8, fmt, axes=[-1], block_size=32,
            round=rnd).numpy()
        got = np.asarray(jmx.quantize_mx(a, fmt, block_size=32, axis=-1,
                                         round=rnd))
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("fmt", ["fp8_e4m3", "bfloat16", "fp16"])
    def test_quantize_elemwise_exact(self, refmx, fmt):
        from any4_tpu.ops import mx as jmx
        a = _w((4, 64), seed=12) * 100
        eb, mb, _, mn, _ = jmx.format_params(fmt)
        want = refmx.elem._quantize_elemwise_core(
            refmx.torch.from_numpy(a), mb, eb, mn, round="even").numpy()
        got = np.asarray(jmx.quantize_elemwise(a, mb, eb, mn, round="even"))
        np.testing.assert_array_equal(got, want)

    def test_scale_rounding_modes(self, refmx):
        from any4_tpu.ops import mx as jmx
        a = _w((4, 64), seed=13)
        for mode in ("even", "floor", "ceil"):
            want = refmx.mx_ops._shared_exponents(
                refmx.torch.from_numpy(a), method="max", axes=[-1],
                rounding_mode=mode).numpy()
            got = np.asarray(jmx.shared_exponents(a, method="max",
                                                  axes=[-1],
                                                  rounding_mode=mode))
            np.testing.assert_array_equal(got, want)

    def test_block_padding(self):
        # non-multiple block length pads then slices back
        from any4_tpu.ops import mx as jmx
        a = _w((3, 50), seed=14)
        q = np.asarray(jmx.quantize_mx(a, "fp4", block_size=32))
        assert q.shape == a.shape and np.isfinite(q).all()

    def test_matches_mx4_kernel_table(self):
        # the mx4 kernel format's table is the fp4 element grid normalized
        # by max_norm=6 (ops/formats.py stores absmax-relative values)
        from any4_tpu.ops import mx as jmx
        from any4_tpu.ops.formats import get_table
        vals = np.unique(np.asarray(jmx.quantize_elemwise(
            np.linspace(-6, 6, 1001, dtype=np.float32), 3, 2, 6.0))) / 6.0
        table = np.unique(np.asarray(get_table("fp4"), np.float32))
        assert set(vals.astype(np.float32).tolist()) <= set(table.tolist())


class TestModelParity:
    """Whole-MODEL pipeline parity: one random-init HF Llama pushed through
    the reference any4 pipeline (quantize.py:1011 ``any4`` -> ``anyq_layer``
    pseudo path, quantize.py:838-870) and through
    ``quant.api.quantize_model(pseudo=True)``, then evaluated on the same
    fixed token stream with each side's own forward. This is the offline
    stand-in for the reference's golden C4 regression
    (tests/test_accuracy.py:22, any4 Llama-3.2-1B ppl 13.952826): it
    covers calibration-free quantization wiring end to end -- layer
    selection + lm_head skip, group normalization, per-row k-means,
    reconstruction, and model math -- not just single tensors."""

    @pytest.fixture(scope="class")
    def quantized_pair(self, ref):
        transformers = pytest.importorskip("transformers")
        import copy

        import jax.numpy as jnp

        from any4_tpu.models import loader
        from any4_tpu.quant import api

        torch = ref.torch
        hf_cfg = transformers.LlamaConfig(
            vocab_size=256, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=128,
            tie_word_embeddings=False, attn_implementation="eager")
        torch.manual_seed(0)
        model = transformers.LlamaForCausalLM(hf_cfg).eval().float()

        cfg, params = loader.convert_torch_llama(model, dtype=jnp.float32)
        cfg = cfg.__class__(**{**cfg.__dict__, "dtype": jnp.float32})

        # reference pipeline (pseudo: weight.data <- reconstruction)
        model_q = copy.deepcopy(model)
        ref.q.any4(model_q, pseudo=True, parallelize=False)

        # our pipeline (pseudo: leaves <- dense reconstruction)
        qparams = api.quantize_model(params, fmt="any4", group_size=128,
                                     pseudo=True, kmeans_iters=50, n_init=3)

        ids = np.random.default_rng(7).integers(
            0, hf_cfg.vocab_size, (4, 64)).astype(np.int64)
        return model, model_q, cfg, params, qparams, ids

    @staticmethod
    def _torch_nll(ref, model, ids):
        torch = ref.torch
        with torch.no_grad():
            logits = model(input_ids=torch.from_numpy(ids)).logits.float()
        logp = torch.log_softmax(logits[:, :-1], dim=-1)
        tgt = torch.from_numpy(ids[:, 1:])
        nll = -logp.gather(-1, tgt[..., None])[..., 0]
        return float(nll.mean())

    @staticmethod
    def _jax_nll(params, cfg, ids):
        import jax.numpy as jnp

        from any4_tpu.models import llama
        logits, _ = llama.forward(params, cfg,
                                  jnp.asarray(ids, jnp.int32))
        logits = np.asarray(logits, np.float32)
        logp = logits[:, :-1] - _logsumexp(logits[:, :-1])
        tgt = ids[:, 1:]
        nll = -np.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return float(nll.mean())

    def test_quantized_ppl_within_1pct(self, ref, quantized_pair):
        model, model_q, cfg, params, qparams, ids = quantized_pair
        # sanity: the un-quantized forwards agree (HF parity)
        nll_t0 = self._torch_nll(ref, model, ids)
        nll_j0 = self._jax_nll(params, cfg, ids)
        assert abs(nll_t0 - nll_j0) < 1e-3, (nll_t0, nll_j0)

        nll_t = self._torch_nll(ref, model_q, ids)
        nll_j = self._jax_nll(qparams, cfg, ids)
        ppl_t, ppl_j = np.exp(nll_t), np.exp(nll_j)
        # pipeline-level criterion: quantized ppl within 1% relative
        assert abs(ppl_j - ppl_t) <= 0.01 * ppl_t, (ppl_j, ppl_t)
        # and the quantization perturbations themselves are comparable
        d_t, d_j = abs(nll_t - nll_t0), abs(nll_j - nll_j0)
        assert d_j <= max(d_t * 2.0, 5e-3), (d_j, d_t)

    def test_per_layer_wmse_parity(self, ref, quantized_pair):
        """Every quantized layer's reconstruction error must be within 5%
        of the reference pipeline's on the SAME weights (k-means
        seeds/backends differ -- sklearn vs vectorized Lloyd -- so exact
        equality is undefined; the 1% tensor-level bound holds in
        aggregate, 5% guards per-layer outliers)."""
        model, model_q, cfg, params, qparams, ids = quantized_pair
        sd0 = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        sdq = {k: v.detach().numpy()
               for k, v in model_q.state_dict().items()}
        name_map = {
            "q_proj": "self_attn.q_proj", "k_proj": "self_attn.k_proj",
            "v_proj": "self_attn.v_proj", "o_proj": "self_attn.o_proj",
            "gate_proj": "mlp.gate_proj", "up_proj": "mlp.up_proj",
            "down_proj": "mlp.down_proj",
        }
        checked = 0
        for i in range(cfg.num_hidden_layers):
            for ours, theirs in name_map.items():
                w0 = sd0[f"model.layers.{i}.{theirs}.weight"]
                wr = sdq[f"model.layers.{i}.{theirs}.weight"]
                assert not np.array_equal(w0, wr), \
                    f"reference did not quantize layers.{i}.{theirs}"
                wo = np.asarray(qparams["layers"][i][ours], np.float32)
                mse_ref = _wmse(w0, wr)
                mse_ours = _wmse(w0, wo)
                assert mse_ours <= mse_ref * 1.05, \
                    (i, ours, mse_ours, mse_ref)
                checked += 1
        assert checked == cfg.num_hidden_layers * len(name_map)
        # lm_head skipped on both sides
        assert np.array_equal(sd0["lm_head.weight"], sdq["lm_head.weight"])
        assert np.array_equal(np.asarray(qparams["lm_head"]),
                              sd0["lm_head.weight"])


def _logsumexp(x):
    m = x.max(axis=-1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(axis=-1, keepdims=True))


class TestAny4Q8ModelAccuracy:
    """any4q8 (LUT snapped to int8, codes materialized; runs on the
    int8-MXU kernel) must hold any4-level MODEL accuracy: same random-init
    HF-convention model, ppl delta vs the any4 pipeline within 1%."""

    def test_ppl_matches_any4(self, ref):
        transformers = pytest.importorskip("transformers")

        import jax.numpy as jnp

        from any4_tpu.models import loader
        from any4_tpu.quant import api

        torch = ref.torch
        hf_cfg = transformers.LlamaConfig(
            vocab_size=256, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=128,
            tie_word_embeddings=False, attn_implementation="eager")
        torch.manual_seed(3)
        model = transformers.LlamaForCausalLM(hf_cfg).eval().float()
        cfg, params = loader.convert_torch_llama(model, dtype=jnp.float32)
        cfg = cfg.__class__(**{**cfg.__dict__, "dtype": jnp.float32})
        ids = np.random.default_rng(9).integers(
            0, hf_cfg.vocab_size, (4, 64)).astype(np.int64)

        nlls = {}
        for fmt in ("any4", "any4q8"):
            qp = api.quantize_model(params, fmt=fmt, group_size=128,
                                    kmeans_iters=30, n_init=2, seed=0)
            nlls[fmt] = TestModelParity._jax_nll(qp, cfg, ids)
        ppl_a = float(np.exp(nlls["any4"]))
        ppl_q8 = float(np.exp(nlls["any4q8"]))
        assert abs(ppl_q8 - ppl_a) <= 0.01 * ppl_a, (ppl_q8, ppl_a)


# ours -> torch submodule path (shared by the model-parity classes)
_NAME_MAP = {
    "q_proj": "self_attn.q_proj", "k_proj": "self_attn.k_proj",
    "v_proj": "self_attn.v_proj", "o_proj": "self_attn.o_proj",
    "gate_proj": "mlp.gate_proj", "up_proj": "mlp.up_proj",
    "down_proj": "mlp.down_proj",
}


class TestCalibratedModelParity:
    """Model-level parity of the CALIBRATION-WEIGHTED any4 path (VERDICT
    r4 next #5a/#5c): a 4-layer hidden-256 Llama (nontrivial
    attention+MLP mixing), both pipelines quantizing with the SAME
    per-layer mean-|activation| vectors and ``scale_sample_weight=True``
    -- the exact path the reference's golden C4 value exercises
    (quantize.py:56-63,548-551). Also pins the capture machinery itself:
    our capture-dict calibration must agree with torch forward hooks on
    the same token stream."""

    @pytest.fixture(scope="class")
    def calibrated_pair(self, ref):
        transformers = pytest.importorskip("transformers")
        import copy

        import jax.numpy as jnp

        from any4_tpu import calibrate as cal
        from any4_tpu.models import loader
        from any4_tpu.quant import api

        torch = ref.torch
        hf_cfg = transformers.LlamaConfig(
            vocab_size=256, hidden_size=256, intermediate_size=512,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=128,
            tie_word_embeddings=False, attn_implementation="eager")
        torch.manual_seed(1)
        model = transformers.LlamaForCausalLM(hf_cfg).eval().float()
        cfg, params = loader.convert_torch_llama(model, dtype=jnp.float32)
        cfg = cfg.__class__(**{**cfg.__dict__, "dtype": jnp.float32})

        rng = np.random.default_rng(11)
        cal_ids = rng.integers(0, 256, (4, 64))
        eval_ids = rng.integers(0, 256, (4, 64))

        # our capture-dict calibration (mean |input| per linear)
        acts = cal.calibrate(params, cfg, jnp.asarray(cal_ids, jnp.int32))

        # torch-side mean |input| via forward hooks (the reference's
        # calibrate.get_mean_activations mechanics, calibrate.py:41-66)
        tsum, tcnt, hooks = {}, {}, []

        def mk(name):
            def hook(mod, inp, out):
                x = inp[0].detach().double().abs()
                x = x.reshape(-1, x.shape[-1])
                if name in tsum:
                    tsum[name] += x.sum(0)
                    tcnt[name] += x.shape[0]
                else:
                    tsum[name] = x.sum(0)
                    tcnt[name] = x.shape[0]
            return hook

        for name, mod in model.named_modules():
            if isinstance(mod, torch.nn.Linear) and "lm_head" not in name:
                hooks.append(mod.register_forward_hook(mk(name)))
        with torch.no_grad():
            model(input_ids=torch.from_numpy(cal_ids.astype(np.int64)))
        for h in hooks:
            h.remove()
        tacts = {k: (v / tcnt[k]).float() for k, v in tsum.items()}

        # reference pipeline with the torch-side calibration, weighted
        model_q = copy.deepcopy(model)
        ref.q.any4(model_q, pseudo=True, parallelize=False,
                   sample_weight=tacts, scale_sample_weight=True)

        # our pipeline with our calibration, same options
        qparams = api.quantize_model(
            params, fmt="any4", group_size=128, pseudo=True,
            kmeans_iters=50, n_init=3,
            sample_weight={k: np.asarray(v) for k, v in acts.items()},
            scale_sample_weight=True)

        return (model, model_q, cfg, params, qparams, eval_ids, acts,
                tacts)

    def test_capture_matches_torch_hooks(self, ref, calibrated_pair):
        *_, acts, tacts = calibrated_pair
        checked = 0
        for i in (0, 1, 2, 3):
            for ours, theirs in _NAME_MAP.items():
                a = np.asarray(acts[f"layers.{i}.{ours}"], np.float64)
                t = tacts[f"model.layers.{i}.{theirs}"].numpy()
                scale = max(float(np.abs(t).max()), 1e-6)
                np.testing.assert_allclose(a / scale, t / scale,
                                           atol=2e-3, rtol=0)
                checked += 1
        assert checked == 4 * len(_NAME_MAP)

    def test_calibrated_ppl_within_1pct(self, ref, calibrated_pair):
        model, model_q, cfg, params, qparams, ids, *_ = calibrated_pair
        nll_t0 = TestModelParity._torch_nll(ref, model, ids)
        nll_j0 = TestModelParity._jax_nll(params, cfg, ids)
        assert abs(nll_t0 - nll_j0) < 1e-3, (nll_t0, nll_j0)
        nll_t = TestModelParity._torch_nll(ref, model_q, ids)
        nll_j = TestModelParity._jax_nll(qparams, cfg, ids)
        ppl_t, ppl_j = np.exp(nll_t), np.exp(nll_j)
        assert abs(ppl_j - ppl_t) <= 0.01 * ppl_t, (ppl_j, ppl_t)
        d_t, d_j = abs(nll_t - nll_t0), abs(nll_j - nll_j0)
        assert d_j <= max(d_t * 2.0, 5e-3), (d_j, d_t)

    def test_calibrated_per_layer_wmse(self, ref, calibrated_pair):
        model, model_q, cfg, params, qparams, *_ = calibrated_pair
        sd0 = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        sdq = {k: v.detach().numpy()
               for k, v in model_q.state_dict().items()}
        checked = 0
        for i in range(cfg.num_hidden_layers):
            for ours, theirs in _NAME_MAP.items():
                w0 = sd0[f"model.layers.{i}.{theirs}.weight"]
                wr = sdq[f"model.layers.{i}.{theirs}.weight"]
                assert not np.array_equal(w0, wr)
                wo = np.asarray(qparams["layers"][i][ours], np.float32)
                assert _wmse(w0, wo) <= _wmse(w0, wr) * 1.05, \
                    (i, ours, _wmse(w0, wo), _wmse(w0, wr))
                checked += 1
        assert checked == cfg.num_hidden_layers * len(_NAME_MAP)


class TestQualityOrdering:
    """Accuracy-per-byte ordering at equal bits/group: any4 <= nf4 <= fp4
    (BASELINE.md group-size-ablation table; reference README.md:331-338).
    The reference's own nf4/fp4 run through bitsandbytes, which this
    container lacks (like lm_eval) -- so the ordering is pinned on OUR
    implementations, whose nf4/fp4 codebooks are constant-pinned in
    tests/test_quant.py and whose any4 learner is W-MSE-parity-pinned
    against the reference above."""

    @pytest.mark.parametrize("g", [64, 128, 256])
    def test_wmse_ordering(self, g):
        import jax.numpy as jnp

        from any4_tpu.ops import linear as lin
        w = _w((64, 1024), seed=g)
        mses = {}
        for fmt in ("any4", "nf4", "fp4"):
            kw = dict(kmeans_iters=50, n_init=3) if fmt == "any4" else {}
            qt = lin.quantize_tensor(jnp.asarray(w), fmt, group_size=g,
                                     **kw)
            mses[fmt] = _wmse(w, np.asarray(
                lin.dequantize_tensor(qt, jnp.float32)))
        assert mses["any4"] <= mses["nf4"] * 1.01, mses
        assert mses["nf4"] <= mses["fp4"] * 1.01, mses

    def test_model_ppl_ordering(self, ref):
        transformers = pytest.importorskip("transformers")
        import jax.numpy as jnp

        from any4_tpu.models import loader
        from any4_tpu.quant import api

        torch = ref.torch
        hf_cfg = transformers.LlamaConfig(
            vocab_size=256, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=128,
            tie_word_embeddings=False, attn_implementation="eager")
        torch.manual_seed(3)
        model = transformers.LlamaForCausalLM(hf_cfg).eval().float()
        cfg, params = loader.convert_torch_llama(model, dtype=jnp.float32)
        cfg = cfg.__class__(**{**cfg.__dict__, "dtype": jnp.float32})
        ids = np.random.default_rng(13).integers(0, 256, (4, 64))
        nll = {}
        for fmt in ("any4", "nf4", "fp4"):
            kw = dict(kmeans_iters=50, n_init=3) if fmt == "any4" else {}
            qp = api.quantize_model(params, fmt=fmt, group_size=128,
                                    pseudo=True, **kw)
            nll[fmt] = TestModelParity._jax_nll(qp, cfg, ids)
        ppl = {k: float(np.exp(v)) for k, v in nll.items()}
        # ordering with a little slack (a 2-layer random-init model is a
        # noisier judge than the 1B C4 table this mirrors)
        assert ppl["any4"] <= ppl["nf4"] * 1.02, ppl
        assert ppl["nf4"] <= ppl["fp4"] * 1.02, ppl
