"""Offline end-to-end tests of the LM protocol (lm-eval route) and the
BigCode-style code-eval route.

The reference exercises these through installed harnesses
(eval.py:262-321); here the protocol core (JaxCausalLM) and the execution
pipelines run against a tiny model + byte tokenizer with no harness
installed, pinning the scoring math to a manual forward.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from any4_tpu.evals import code_eval, tasks_local
from any4_tpu.evals.lm_eval_adapter import JaxCausalLM
from any4_tpu.models import generate as gen
from any4_tpu.models import llama


@pytest.fixture(scope="module")
def tiny_lm():
    cfg = llama.LlamaConfig.tiny(vocab=256, layers=2)
    cfg = cfg.__class__(**{**cfg.__dict__, "dtype": jnp.float32})
    params = llama.init_params(cfg, jax.random.PRNGKey(3))
    lm = JaxCausalLM(params, cfg, tasks_local.ByteTokenizer(),
                     batch_size=4, max_length=128)
    return cfg, params, lm


class TestLoglikelihood:
    def test_matches_manual_forward(self, tiny_lm):
        cfg, params, lm = tiny_lm
        context, cont = "hello ", "world"
        [(ll, greedy)] = lm.loglikelihood([(context, cont)])
        tok = tasks_local.ByteTokenizer()
        ids = tok.encode(context) + tok.encode(cont)
        logits, _ = llama.forward(params, cfg,
                                  jnp.asarray([ids], jnp.int32))
        logp = jax.nn.log_softmax(
            np.asarray(logits, np.float32)[0, :-1], axis=-1)
        tgt = np.array(ids[1:])
        per_tok = np.take_along_axis(logp, tgt[:, None], 1)[:, 0]
        n = len(tok.encode(cont))
        expect = float(per_tok[-n:].sum())
        assert abs(ll - expect) < 1e-3
        expect_greedy = bool(
            (np.argmax(logp, -1)[-n:] == tgt[-n:]).all())
        assert greedy == expect_greedy

    def test_bucketing_bounds_compiles(self, tiny_lm):
        cfg, params, lm = tiny_lm
        reqs = [("a" * n, " done") for n in (1, 3, 5, 20, 33, 40, 70, 90)]
        out = lm.loglikelihood(reqs)
        assert len(out) == len(reqs)
        assert all(np.isfinite(ll) for ll, _ in out)
        # lengths 7..96 bucket into {32, 64, 128}: at most 3 programs
        assert len(lm._score_fns) <= 3

    def test_batching_matches_single(self, tiny_lm):
        cfg, params, lm = tiny_lm
        reqs = [("the cat", " sat"), ("a longer piece of context",
                                      " here"), ("x", " y")]
        batched = lm.loglikelihood(reqs)
        singles = [lm.loglikelihood([r])[0] for r in reqs]
        for (a, ga), (b, gb) in zip(batched, singles):
            assert abs(a - b) < 1e-3 and ga == gb

    def test_rolling(self, tiny_lm):
        cfg, params, lm = tiny_lm
        text = "some moderately long text " * 20  # > max_length tokens
        [total] = lm.loglikelihood_rolling([(text,)])
        assert np.isfinite(total) and total < 0


class TestGenerateUntil:
    def test_matches_unpadded_greedy_generate(self, tiny_lm):
        """The left-padded bucketed generation path must produce exactly
        the tokens of the plain unpadded greedy decoder."""
        cfg, params, lm = tiny_lm
        tok = tasks_local.ByteTokenizer()
        prompt = "abcde"
        ids = jnp.asarray([tok.encode(prompt)], jnp.int32)
        max_new = 8
        ref = gen.generate(params, cfg, ids, max_new_tokens=max_new)
        ref_text = tok.decode(np.asarray(ref[0, ids.shape[1]:]).tolist())
        [out] = lm.generate_until([(prompt, {"until": [],
                                             "max_gen_toks": max_new})])
        assert out == ref_text

    def test_stop_sequence(self, tiny_lm):
        cfg, params, lm = tiny_lm
        [full] = lm.generate_until([("q", {"until": [],
                                           "max_gen_toks": 6})])
        if len(full) >= 2:
            stop = full[1]
            [cut] = lm.generate_until([("q", {"until": [stop],
                                              "max_gen_toks": 6})])
            assert stop not in cut


class TestLocalTasks:
    def test_multiple_choice_runs(self, tiny_lm):
        cfg, params, lm = tiny_lm
        res = tasks_local.run_multiple_choice(
            lm, tasks_local.BUILTIN_MC_EXAMPLES)
        assert 0.0 <= res["acc"] <= 1.0
        assert res["n"] == len(tasks_local.BUILTIN_MC_EXAMPLES)


class TestCodeEval:
    def test_executor_pass_and_fail(self):
        prob = code_eval.BUILTIN_PROBLEMS[0]
        good = code_eval.build_program(prob, "    return a + b\n")
        bad = code_eval.build_program(prob, "    return a - b\n")
        assert code_eval.execute_candidate(good)["passed"]
        assert not code_eval.execute_candidate(bad)["passed"]

    def test_timeout(self):
        prob = code_eval.BUILTIN_PROBLEMS[0]
        loop = code_eval.build_program(
            prob, "    while True:\n        pass\n")
        res = code_eval.execute_candidate(loop, timeout=2.0)
        assert not res["passed"] and "timed out" in res["result"]

    def test_pass_at_k_estimator(self):
        assert code_eval.pass_at_k(1, 1, 1) == 1.0
        assert code_eval.pass_at_k(1, 0, 1) == 0.0
        assert abs(code_eval.pass_at_k(4, 2, 2) - (1 - comb_frac())) < 1e-9

    def test_oracle_generator_scores_one(self):
        solutions = {
            "builtin/0": "    return a + b\n",
            "builtin/1": "    return n % 2 == 0\n",
            "builtin/2": "    return max(a, b, c)\n",
            "builtin/3": "    return s[::-1]\n",
        }
        calls = []

        def oracle(prompt):
            for p in code_eval.BUILTIN_PROBLEMS:
                if p["prompt"] == prompt:
                    calls.append(p["task_id"])
                    return solutions[p["task_id"]] + "\ndef next_fn():\n"
            raise AssertionError("unknown prompt")

        res = code_eval.evaluate_code(oracle)
        assert res["pass@1"] == 1.0
        assert len(calls) == len(code_eval.BUILTIN_PROBLEMS)

    def test_model_route_end_to_end(self, tiny_lm):
        """The full generate->execute->pass@k route runs with a real
        (random-init) model; a random model scores 0 but the pipeline must
        complete and log sane numbers."""
        cfg, params, lm = tiny_lm
        res = code_eval.run_code_tasks(lm, ["builtin"], max_gen_toks=8)
        assert 0.0 <= res["builtin"]["pass@1"] <= 1.0
        assert res["builtin"]["n_problems"] == len(
            code_eval.BUILTIN_PROBLEMS)


def comb_frac():
    from math import comb
    return comb(2, 2) / comb(4, 2)


class TestProtocolEdgeCases:
    def test_empty_continuation_scores_zero(self, tiny_lm):
        cfg, params, lm = tiny_lm
        [(ll, greedy)] = lm.loglikelihood([("some context", "")])
        assert ll == 0.0 and greedy is True

    def test_max_gen_toks_exceeding_max_length(self, tiny_lm):
        cfg, params, lm = tiny_lm
        [out] = lm.generate_until([("hello", {"until": [],
                                              "max_gen_toks": 100000})])
        assert isinstance(out, str)
