"""OPT and Mixtral model-family tests (quantization-compatible forwards)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from any4_tpu.models import mixtral, opt
from any4_tpu.ops import linear as lin
from any4_tpu.quant import api


class TestOPT:
    @pytest.fixture(scope="class")
    def tiny(self):
        cfg = opt.OPTConfig.tiny(vocab=256, layers=2)
        params = opt.init_params(cfg, jax.random.PRNGKey(0))
        return cfg, params

    def test_forward_shapes(self, tiny):
        cfg, params = tiny
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0,
                                 cfg.vocab_size)
        logits, _ = opt.forward(params, cfg, ids)
        assert logits.shape == (2, 8, cfg.vocab_size)
        assert np.isfinite(np.asarray(logits, np.float32)).all()

    def test_causality(self, tiny):
        cfg, params = tiny
        ids = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0,
                                 cfg.vocab_size)
        ids2 = ids.at[0, -1].set((ids[0, -1] + 1) % cfg.vocab_size)
        l1, _ = opt.forward(params, cfg, ids)
        l2, _ = opt.forward(params, cfg, ids2)
        np.testing.assert_allclose(np.asarray(l1[:, :-1], np.float32),
                                   np.asarray(l2[:, :-1], np.float32),
                                   atol=1e-5)

    def test_quantizes_and_runs(self, tiny):
        cfg, params = tiny
        qp = api.quantize_model(params, fmt="int4", group_size=32)
        for layer in qp["layers"]:
            for nm in ("q_proj", "k_proj", "v_proj", "out_proj", "fc1",
                       "fc2"):
                assert isinstance(layer[nm], lin.QuantizedTensor), nm
        ids = jax.random.randint(jax.random.PRNGKey(3), (1, 8), 0,
                                 cfg.vocab_size)
        base, _ = opt.forward(params, cfg, ids)
        ql, _ = opt.forward(qp, cfg, ids)
        base = np.asarray(base, np.float32)
        ql = np.asarray(ql, np.float32)
        assert np.isfinite(ql).all()
        assert (base.argmax(-1) == ql.argmax(-1)).mean() >= 0.5


class TestMixtral:
    @pytest.fixture(scope="class")
    def tiny(self):
        cfg = mixtral.MixtralConfig.tiny(vocab=256, layers=2)
        params = mixtral.init_params(cfg, jax.random.PRNGKey(0))
        return cfg, params

    def test_forward_shapes(self, tiny):
        cfg, params = tiny
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0,
                                 cfg.vocab_size)
        logits, _ = mixtral.forward(params, cfg, ids)
        assert logits.shape == (2, 8, cfg.vocab_size)
        assert np.isfinite(np.asarray(logits, np.float32)).all()

    def test_routing_weights_sum_to_one(self, tiny):
        cfg, params = tiny
        x = jax.random.normal(jax.random.PRNGKey(2),
                              (1, 4, cfg.hidden_size), cfg.dtype)
        layer = params["layers"][0]
        router_logits = x.astype(jnp.float32) @ np.asarray(
            layer["router"], np.float32).T
        topv, _ = jax.lax.top_k(router_logits, cfg.num_experts_per_tok)
        gate = jax.nn.softmax(topv, axis=-1)
        np.testing.assert_allclose(np.asarray(gate.sum(-1)), 1.0, atol=1e-5)

    def test_expert_weights_quantize(self, tiny):
        cfg, params = tiny
        qp = api.quantize_model(params, fmt="int4", group_size=32)
        ex = qp["layers"][0]["experts"][0]
        for nm in ("w1", "w2", "w3"):
            assert isinstance(ex[nm], lin.QuantizedTensor), nm
        # router stays dense (not a quantization target by default)
        assert isinstance(qp["layers"][0]["router"], jax.Array)
        ids = jax.random.randint(jax.random.PRNGKey(3), (1, 6), 0,
                                 cfg.vocab_size)
        ql, _ = mixtral.forward(qp, cfg, ids)
        assert np.isfinite(np.asarray(ql, np.float32)).all()

    def test_single_expert_equals_dense_mlp(self):
        # with 1 expert and top-1 routing, MoE reduces to the plain MLP
        import dataclasses
        cfg = dataclasses.replace(
            mixtral.MixtralConfig.tiny(vocab=64, layers=1),
            num_local_experts=1, num_experts_per_tok=1)
        params = mixtral.init_params(cfg, jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1),
                              (1, 4, cfg.hidden_size), cfg.dtype)
        layer = params["layers"][0]
        out = mixtral.moe_ffn(layer, cfg, x)
        ex = layer["experts"][0]
        g = x @ np.asarray(ex["w1"]).T
        u = x @ np.asarray(ex["w3"]).T
        h = jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u
        ref = h @ np.asarray(ex["w2"]).T
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=2e-2, rtol=2e-2)

    def test_sparse_dispatch_matches_dense(self):
        # cond-skip sparse dispatch must be numerically identical to the
        # dense combine (the taken branch computes the same expression)
        cfg = mixtral.MixtralConfig.tiny(vocab=64, layers=1)
        params = mixtral.init_params(cfg, jax.random.PRNGKey(2))
        layer = params["layers"][0]
        for shape in ((1, 1), (2, 3)):
            x = jax.random.normal(jax.random.PRNGKey(3),
                                  (*shape, cfg.hidden_size), cfg.dtype)
            dense = mixtral.moe_ffn(layer, cfg, x, dispatch="dense")
            sparse = mixtral.moe_ffn(layer, cfg, x, dispatch="sparse")
            np.testing.assert_allclose(np.asarray(sparse, np.float32),
                                       np.asarray(dense, np.float32),
                                       atol=1e-6, rtol=1e-6)

    def test_sparse_dispatch_quantized(self):
        from any4_tpu.quant import api
        cfg = mixtral.MixtralConfig.tiny(vocab=64, layers=1)
        params = mixtral.init_params(cfg, jax.random.PRNGKey(4))
        qp = api.quantize_model(params, fmt="int4", group_size=32,
                                model_config=cfg)
        layer = qp["layers"][0]
        x = jax.random.normal(jax.random.PRNGKey(5),
                              (1, 2, cfg.hidden_size), cfg.dtype)
        dense = mixtral.moe_ffn(layer, cfg, x, dispatch="dense",
                                interpret=True)
        sparse = mixtral.moe_ffn(layer, cfg, x, dispatch="sparse",
                                 interpret=True)
        np.testing.assert_allclose(np.asarray(sparse, np.float32),
                                   np.asarray(dense, np.float32),
                                   atol=1e-6, rtol=1e-6)

    def test_auto_dispatch_thresholds(self):
        # auto = sparse at decode shapes, dense at prefill shapes; both
        # produce the dense numbers (covered above) -- here just exercise
        # the auto path end-to-end under jit
        cfg = mixtral.MixtralConfig.tiny(vocab=64, layers=1)
        params = mixtral.init_params(cfg, jax.random.PRNGKey(6))
        ids = jax.random.randint(jax.random.PRNGKey(7), (1, 3), 0,
                                 cfg.vocab_size)
        logits, _ = jax.jit(
            lambda p, i: mixtral.forward(p, cfg, i))(params, ids)
        assert np.isfinite(np.asarray(logits, np.float32)).all()


class TestMixtralExpertFusion:
    """Expert w1/w3 -> w13 fusion (models/fuse.py): 3 -> 2 decode
    dispatches per routed expert, numerics identical (the fused weight is
    the exact concatenation)."""

    @pytest.fixture(scope="class")
    def tiny(self):
        cfg = mixtral.MixtralConfig.tiny(vocab=256, layers=2)
        params = mixtral.init_params(cfg, jax.random.PRNGKey(4))
        return cfg, params

    def test_fused_matches_unfused_dense(self, tiny):
        from any4_tpu.models import fuse
        cfg, params = tiny
        ids = jax.random.randint(jax.random.PRNGKey(5), (1, 6), 0,
                                 cfg.vocab_size)
        base, _ = mixtral.forward(params, cfg, ids)
        fused = fuse.fuse_projections(params)
        ex = fused["layers"][0]["experts"][0]
        assert "w13" in ex and "w1" not in ex and "w3" not in ex
        out, _ = mixtral.forward(fused, cfg, ids)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(base, np.float32),
                                   atol=2e-2, rtol=2e-2)

    def test_fused_matches_unfused_quantized(self, tiny):
        from any4_tpu.models import fuse
        cfg, params = tiny
        qp = api.quantize_model(params, fmt="int4", group_size=32)
        ids = jax.random.randint(jax.random.PRNGKey(6), (1, 6), 0,
                                 cfg.vocab_size)
        base, _ = mixtral.forward(qp, cfg, ids)
        fused = fuse.fuse_projections(qp)
        assert isinstance(fused["layers"][0]["experts"][0]["w13"],
                          lin.QuantizedTensor)
        out, _ = mixtral.forward(fused, cfg, ids)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(base, np.float32),
                                   atol=1e-3, rtol=1e-3)

    def test_fused_experts_tp_matches_single(self):
        import jax as _jax
        if len(_jax.devices()) < 2:
            pytest.skip("needs >=2 devices")
        from any4_tpu.models import fuse
        from any4_tpu.parallel import tp
        # float32: under TP the psum's different summation order can flip
        # a bf16 router top-k near-tie, changing the routed expert set
        # (same caveat as TestMixtralTP)
        cfg = mixtral.MixtralConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=8,
            num_key_value_heads=4, head_dim=8, num_local_experts=4,
            num_experts_per_tok=2, tie_word_embeddings=True,
            dtype=jnp.float32)
        params = mixtral.init_params(cfg, jax.random.PRNGKey(4))
        fused = fuse.fuse_projections(params)
        ids = jax.random.randint(jax.random.PRNGKey(7), (2, 4), 0,
                                 cfg.vocab_size)
        base, _ = mixtral.forward(fused, cfg, ids)
        mesh = tp.make_mesh(dp=1, tp=2, devices=_jax.devices()[:2])
        sharded, specs = tp.shard_params(fused, mesh, cfg=cfg)
        fwd = tp.make_tp_forward(cfg, mesh, specs,
                                 forward_fn=mixtral.forward)
        out = fwd(sharded, ids)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(base, np.float32),
                                   atol=3e-2, rtol=3e-2)


class TestStackedExperts:
    """stack_experts: the whole routed FFN as TWO stacked GEMVs per layer
    (models/fuse.stack_experts) -- numerics identical to the dense
    combine up to f32 accumulation order."""

    @pytest.fixture(scope="class")
    def tiny(self):
        cfg = mixtral.MixtralConfig.tiny(vocab=256, layers=2)
        params = mixtral.init_params(cfg, jax.random.PRNGKey(8))
        return cfg, params

    def test_stacked_matches_dense(self, tiny):
        from any4_tpu.models import fuse
        cfg, params = tiny
        ids = jax.random.randint(jax.random.PRNGKey(9), (2, 6), 0,
                                 cfg.vocab_size)
        base, _ = mixtral.forward(params, cfg, ids)
        st = fuse.stack_experts(params)
        layer = st["layers"][0]
        assert "moe_w13" in layer and "experts" not in layer
        f, d, E = (cfg.intermediate_size, cfg.hidden_size,
                   cfg.num_local_experts)
        assert layer["moe_w13"].shape == (E * 2 * f, d)
        assert layer["moe_w2"].shape == (d, E * f)
        out, _ = mixtral.forward(st, cfg, ids)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(base, np.float32),
                                   atol=2e-2, rtol=2e-2)

    def test_stacked_after_w13_fusion(self, tiny):
        from any4_tpu.models import fuse
        cfg, params = tiny
        ids = jax.random.randint(jax.random.PRNGKey(10), (1, 5), 0,
                                 cfg.vocab_size)
        base, _ = mixtral.forward(params, cfg, ids)
        st = fuse.stack_experts(fuse.fuse_projections(params))
        out, _ = mixtral.forward(st, cfg, ids)
        # the stacked matmuls re-order the bf16 accumulation across
        # expert segments; the error compounds over layers
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(base, np.float32),
                                   atol=5e-2, rtol=5e-2)

    def test_stacked_quantized_runs_and_is_close(self, tiny):
        from any4_tpu.models import fuse
        cfg, params = tiny
        st = fuse.stack_experts(params)
        qp = api.quantize_model(st, fmt="int8", group_size=32)
        assert isinstance(qp["layers"][0]["moe_w13"], lin.QuantizedTensor)
        ids = jax.random.randint(jax.random.PRNGKey(11), (1, 5), 0,
                                 cfg.vocab_size)
        base, _ = mixtral.forward(st, cfg, ids)
        out, _ = mixtral.forward(qp, cfg, ids)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(base, np.float32),
                                   atol=0.15, rtol=0.15)

    def test_stacked_engine_matches_generate(self, tiny):
        from any4_tpu.models import fuse, generate
        from any4_tpu.serving import engine as eng
        cfg, params = tiny
        st = fuse.stack_experts(params)
        rng = np.random.RandomState(5)
        prompts = [rng.randint(0, cfg.vocab_size, size=n).astype(np.int32)
                   for n in (4, 7)]
        refs = [np.asarray(generate.generate(
            st, cfg, jnp.asarray(p[None]), max_new_tokens=6)[0, len(p):])
            for p in prompts]
        e = eng.Engine(st, cfg, max_slots=2, max_ctx=64, page_size=8,
                       kv_layout="contig")
        uids = [e.submit(p, max_new_tokens=6) for p in prompts]
        done = e.run(burst=4)
        by_uid = {r.uid: r for r in done}
        for uid, ref in zip(uids, refs):
            np.testing.assert_array_equal(
                np.asarray(by_uid[uid].out_tokens), ref)
