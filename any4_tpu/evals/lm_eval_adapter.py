"""lm-evaluation-harness adapter (network/install-gated).

The reference's primary NLP-task route is ``lm_eval.simple_evaluate`` over
an HFLM (eval.py:297-321). This adapter exposes our functional JAX models as
an ``lm_eval.api.model.LM`` so the same task suite runs against quantized
TPU inference. The harness is not installable in the zero-egress build
container, so everything imports lazily and callers should catch
:class:`LmEvalUnavailable`.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


class LmEvalUnavailable(RuntimeError):
    pass


def _require_lm_eval():
    try:
        import lm_eval  # noqa: F401
        return lm_eval
    except ImportError as e:
        raise LmEvalUnavailable(
            "lm-eval is not installed in this environment") from e


def make_lm(params, cfg, tokenizer, batch_size: int = 1,
            max_length: int = 2048, forward_fn=None):
    """Build an lm_eval LM wrapping our functional model."""
    lm_eval = _require_lm_eval()
    import jax
    import jax.numpy as jnp
    from lm_eval.api.model import LM

    from ..models import generate as gen
    from ..models import llama

    fwd = forward_fn or llama.forward

    class JaxLM(LM):
        def __init__(self):
            super().__init__()
            self.tokenizer = tokenizer

        def loglikelihood(self, requests):
            out = []
            for req in requests:
                context, continuation = req.args
                ctx_ids = tokenizer.encode(context)
                cont_ids = tokenizer.encode(continuation)
                ids = jnp.asarray(
                    (ctx_ids + cont_ids)[-max_length:], jnp.int32)[None]
                logits, _ = fwd(params, cfg, ids)
                logp = jax.nn.log_softmax(
                    logits[0, :-1].astype(jnp.float32), axis=-1)
                tgt = np.asarray(ids[0, 1:])
                lp = np.asarray(
                    jnp.take_along_axis(logp, jnp.asarray(tgt)[:, None],
                                        axis=1))[:, 0]
                ncont = min(len(cont_ids), len(tgt))
                cont_lp = float(lp[-ncont:].sum())
                greedy = bool(
                    (np.asarray(jnp.argmax(logp, -1))[-ncont:]
                     == tgt[-ncont:]).all())
                out.append((cont_lp, greedy))
            return out

        def loglikelihood_rolling(self, requests):
            out = []
            for req in requests:
                (text,) = req.args
                ids = tokenizer.encode(text)
                total = 0.0
                for s in range(0, max(len(ids) - 1, 1), max_length):
                    chunk = jnp.asarray(ids[s:s + max_length + 1],
                                        jnp.int32)[None]
                    if chunk.shape[1] < 2:
                        continue
                    logits, _ = fwd(params, cfg, chunk)
                    logp = jax.nn.log_softmax(
                        logits[0, :-1].astype(jnp.float32), axis=-1)
                    tgt = np.asarray(chunk[0, 1:])
                    total += float(np.asarray(jnp.take_along_axis(
                        logp, jnp.asarray(tgt)[:, None], axis=1)).sum())
                out.append((total,))
            return out

        def generate_until(self, requests):
            out = []
            for req in requests:
                context, kwargs = req.args
                ids = jnp.asarray(
                    tokenizer.encode(context)[-max_length:],
                    jnp.int32)[None]
                until = kwargs.get("until", [])
                max_new = kwargs.get("max_gen_toks", 128)
                toks = gen.generate(params, cfg, ids,
                                    max_new_tokens=max_new)
                text = tokenizer.decode(
                    np.asarray(toks[0, ids.shape[1]:]).tolist())
                for stop in until:
                    idx = text.find(stop)
                    if idx >= 0:
                        text = text[:idx]
                out.append(text)
            return out

    return JaxLM()


def simple_evaluate(params, cfg, tokenizer, tasks: List[str],
                    limit: Optional[int] = None, **kwargs) -> Dict:
    """Run lm_eval.simple_evaluate against the wrapped model."""
    lm_eval = _require_lm_eval()
    lm = make_lm(params, cfg, tokenizer, **kwargs)
    return lm_eval.simple_evaluate(model=lm, tasks=tasks, limit=limit)
