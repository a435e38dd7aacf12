"""Perplexity evaluation over token streams.

Two evaluators, mirroring the reference's two perplexity paths:

- :func:`eval_perplexity_chunked`: GPTQ-style fixed-seqlen NLL -- concatenate
  the corpus, split into ``[seqlen]`` chunks, average token NLL
  (reference data_gptq.py:195-220 ``llama_eval``).
- :func:`eval_perplexity_stream`: streaming per-document NLL
  (reference data.py:37-130 ``eval_perplexity``): documents are chunked to
  ``seqlen`` and token-weighted.

Both take pre-tokenized ``input_ids`` so they are dataset/tokenizer-agnostic
(dataset loading lives in evals/datasets.py and is network-gated). All
forwards run at a single static shape (padding + masking), so XLA compiles
exactly one program.
"""
from __future__ import annotations

import functools
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama


@functools.partial(jax.jit, static_argnames=("cfg",))
def _chunk_nll(params: Dict, cfg, chunk: jax.Array, valid: jax.Array):
    """Masked next-token NLL. chunk: [b, T]; valid: [b] number of *target*
    positions to count (<= T-1). Returns (sum_nll, count)."""
    logits, _ = llama.forward(params, cfg, chunk)
    logits = logits[:, :-1].astype(jnp.float32)
    targets = chunk[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = (jnp.arange(nll.shape[1])[None, :] < valid[:, None])
    return jnp.sum(nll * mask), jnp.sum(valid)


def eval_perplexity_chunked(params: Dict, cfg, token_stream: np.ndarray,
                            seqlen: int = 2048, batch_size: int = 1,
                            max_chunks: Optional[int] = None,
                            progress: bool = False) -> float:
    """GPTQ-style fixed-seqlen perplexity over a flat token stream."""
    tokens = np.asarray(token_stream).reshape(-1)
    nchunks = len(tokens) // seqlen
    if max_chunks is not None:
        nchunks = min(nchunks, max_chunks)
    assert nchunks > 0, "token stream shorter than one chunk"
    total_nll, total_cnt = 0.0, 0
    for start in range(0, nchunks, batch_size):
        b = min(batch_size, nchunks - start)
        chunk = tokens[start * seqlen:(start + b) * seqlen] \
            .reshape(b, seqlen).astype(np.int32)
        if b < batch_size:  # pad batch to keep the jitted shape static
            chunk = np.pad(chunk, ((0, batch_size - b), (0, 0)))
        valid = np.zeros((batch_size,), np.int32)
        valid[:b] = seqlen - 1
        nll, cnt = _chunk_nll(params, cfg, jnp.asarray(chunk),
                              jnp.asarray(valid))
        total_nll += float(nll)
        total_cnt += int(cnt)
        if progress:
            print(f"  ppl chunk {start + b}/{nchunks}: "
                  f"{math.exp(total_nll / total_cnt):.4f}", flush=True)
    return math.exp(total_nll / total_cnt)


def eval_perplexity_stream(params: Dict, cfg, sequences, seqlen: int = 2048,
                           max_samples: Optional[int] = None) -> float:
    """Streaming perplexity over per-document token sequences."""
    total_nll, total_cnt = 0.0, 0
    for i, seq in enumerate(sequences):
        if max_samples is not None and i >= max_samples:
            break
        seq = np.asarray(seq).reshape(-1)
        for s in range(0, max(len(seq) - 1, 0), seqlen):
            chunk = seq[s:s + seqlen + 1]
            valid = len(chunk) - 1
            if valid < 1:
                continue
            if len(chunk) < seqlen + 1:
                chunk = np.pad(chunk, (0, seqlen + 1 - len(chunk)))
            nll, cnt = _chunk_nll(
                params, cfg, jnp.asarray(chunk[None, :].astype(np.int32)),
                jnp.asarray([valid], np.int32))
            total_nll += float(nll)
            total_cnt += int(cnt)
    assert total_cnt > 0
    return math.exp(total_nll / total_cnt)
