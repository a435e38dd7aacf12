"""Eval-layer tests: harness logging/routing, analyzer, diff, datasets."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from any4_tpu.evals import analyze, datasets, harness
from any4_tpu.models import llama
from any4_tpu.quant import api


@pytest.fixture(scope="module")
def tiny():
    cfg = llama.LlamaConfig.tiny(vocab=256, layers=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


class TestHarness:
    def test_log_results_appends(self, tmp_path):
        d = str(tmp_path)
        harness.log_results(d, "taskA", 1.5)
        harness.log_results(d, "taskB", 2.5)
        harness.log_results(d, "taskA", 1.0)  # update
        with open(os.path.join(d, "results.json")) as f:
            data = json.load(f)
        assert data["taskA"]["result"] == 1.0
        assert data["taskB"]["result"] == 2.5

    def test_task_done_skip(self, tmp_path):
        d = str(tmp_path)
        assert not harness.task_done(d, "x")
        harness.log_results(d, "x", 1.0)
        assert harness.task_done(d, "x")

    def test_run_tasks_synthetic_both_evaluators(self, tiny, tmp_path):
        cfg, params = tiny
        for ev in ("chunked", "stream"):
            out = harness.run_perplexity_tasks(
                params, cfg, ["wikitext-2"], seqlen=128, max_chunks=2,
                synthetic=True, log_dir=str(tmp_path / ev), evaluator=ev)
            (name, ppl), = out.items()
            assert name == "synthetic:wikitext-2"
            assert 1 < ppl < cfg.vocab_size * 10

    def test_overwrite_skip(self, tiny, tmp_path):
        cfg, params = tiny
        d = str(tmp_path)
        harness.log_results(d, "synthetic:wikitext-2", 7.0)
        out = harness.run_perplexity_tasks(
            params, cfg, ["wikitext-2"], synthetic=True, log_dir=d,
            seqlen=128, max_chunks=1)
        assert out == {}  # skipped


class TestAnalyze:
    def test_analyze_model_rows(self, tiny, tmp_path):
        cfg, params = tiny
        rows = analyze.analyze_model(
            params, fmts=["int4"], group_size=32, out_dir=str(tmp_path),
            calib_batch=8)
        assert rows and all("int4_w_mse" in r for r in rows)
        assert os.path.exists(tmp_path / "stats.csv")

    def test_any4_beats_int4_w_mse(self, tiny):
        cfg, params = tiny
        w = params["layers"][0]["q_proj"]
        e_int4 = analyze.quant_error(w, "int4", 32)["w_mse"]
        e_any4 = analyze.quant_error(w, "any4", 32,
                                     kmeans_iters=20)["w_mse"]
        assert e_any4 < e_int4

    def test_diff_models(self, tiny, tmp_path):
        cfg, params = tiny
        qp = api.quantize_model(params, fmt="int4", group_size=32,
                                pseudo=True)
        ids = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 0,
                                 cfg.vocab_size)
        rows = analyze.diff_models(params, qp, cfg, ids,
                                   out_dir=str(tmp_path))
        assert rows[-1]["layer"] == "logits"
        assert all(0.5 < r["cossim"] <= 1.0 + 1e-6 for r in rows)
        assert os.path.exists(tmp_path / "diffs.csv")

    def test_diff_identical_models_zero(self, tiny):
        cfg, params = tiny
        ids = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0,
                                 cfg.vocab_size)
        rows = analyze.diff_models(params, params, cfg, ids)
        assert all(r["mse"] < 1e-10 for r in rows)


class TestDatasets:
    def test_unknown_task_raises(self):
        with pytest.raises(ValueError):
            datasets.load_text("not-a-task")

    def test_offline_raises_unavailable(self):
        with pytest.raises(datasets.DatasetUnavailable):
            datasets.load_text("wikitext-2", max_chars=100)

    def test_synthetic_properties(self):
        s = datasets.synthetic_tokens(512, 2000, seed=3)
        assert s.dtype == np.int32 and len(s) == 2000
        assert s.min() >= 0 and s.max() < 512
        # zipf-ish: most common token much more frequent than median
        counts = np.bincount(s, minlength=512)
        assert counts.max() > 5 * np.median(counts[counts > 0])


class TestGPTQLoaders:
    """Seeded calibration-crop protocol (reference data_gptq.py
    get_loaders): the sampling rng must be bit-reproducible against the
    reference's stdlib `random.seed(seed)` / `random.randint` sequence."""

    def test_seeded_crops_match_reference_protocol(self):
        # literal transcription of data_gptq.py:45-55 (get_wikitext2 loop)
        import random
        ids = datasets.synthetic_tokens(1000, 5000, seed=3)
        seqlen, nsamples, seed = 128, 16, 7
        random.seed(seed)
        expect = []
        for _ in range(nsamples):
            i = random.randint(0, len(ids) - seqlen - 1) \
                if len(ids) > seqlen else 0
            expect.append(ids[i:i + seqlen])
        got = datasets.seeded_crops(ids, nsamples, seqlen, seed)
        np.testing.assert_array_equal(got, np.stack(expect))

    def test_seeded_crops_deterministic_and_seed_sensitive(self):
        ids = datasets.synthetic_tokens(500, 4000, seed=1)
        a = datasets.seeded_crops(ids, 8, 64, seed=0)
        b = datasets.seeded_crops(ids, 8, 64, seed=0)
        c = datasets.seeded_crops(ids, 8, 64, seed=1)
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)

    def test_synthetic_loaders_shapes(self):
        train, test = datasets.synthetic_loaders(256, nsamples=4, seqlen=32)
        assert train.shape == (4, 32) and train.dtype == np.int32
        assert test.ndim == 1 and len(test) >= 34

    def test_doc_crops_protocol(self):
        # per-document rejection sampling (data_gptq.py get_c4:88-104):
        # short docs are skipped, crops come from docs >= seqlen tokens
        class Tok:
            def encode(self, text):
                return [ord(c) % 97 for c in text]

        docs = ["ab", "x" * 300, "yz"]
        out = datasets._seeded_doc_crops(docs, Tok(), 4, 64, seed=5)
        assert out.shape == (4, 64)
        assert (out == ord("x") % 97).all()

    def test_get_loaders_offline_raises(self):
        with pytest.raises(datasets.DatasetUnavailable):
            datasets.get_loaders("wikitext-2", tokenizer=None, nsamples=1,
                                 seqlen=32)

    def test_get_loaders_unknown_raises(self):
        with pytest.raises(ValueError):
            datasets.get_loaders("nope", tokenizer=None)
