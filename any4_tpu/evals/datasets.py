"""Dataset loaders for perplexity/eval tasks (network-gated).

Mirrors the reference's two dataset families:
- GPTQ-style fixed splits (wikitext-2, ptb, c4, pile) built by concatenating
  the raw corpus and tokenizing once (reference data_gptq.py:19-193);
- streaming HF datasets with per-task configs (reference data.py:13-35
  ``task_dataset_configs``).

This container has zero network egress, so every loader degrades gracefully:
if the dataset (or tokenizer) is unavailable locally, ``load_tokens`` raises
``DatasetUnavailable`` which callers may catch to skip the task. A synthetic
deterministic token stream is provided for plumbing tests and offline
development.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np


class DatasetUnavailable(RuntimeError):
    pass


@dataclass(frozen=True)
class DatasetConfig:
    path: str
    name: Optional[str] = None
    split: str = "test"
    field: str = "text"
    join: str = "\n\n"


# reference data_gptq.py:223-229 + data.py:13-35 (subset relevant to ppl)
task_dataset_configs: Dict[str, DatasetConfig] = {
    "wikitext-2": DatasetConfig("wikitext", "wikitext-2-raw-v1", "test"),
    "wikitext-103": DatasetConfig("wikitext", "wikitext-103-raw-v1", "test"),
    "ptb": DatasetConfig("ptb_text_only", "penn_treebank", "test",
                         field="sentence", join=" "),
    "c4": DatasetConfig("allenai/c4", "en", "validation"),
    "c4-new": DatasetConfig("allenai/c4", "en", "validation"),
    "pile": DatasetConfig("mit-han-lab/pile-val-backup", None, "validation"),
    "codeparrot": DatasetConfig("codeparrot/codeparrot-clean-valid", None,
                                "train", field="content"),
    "openwebtext": DatasetConfig("openwebtext", None, "train"),
    "lambada": DatasetConfig("lambada", None, "test"),
    "bookcorpus": DatasetConfig("bookcorpus", None, "train"),
    "tiny-shakespeare": DatasetConfig("tiny_shakespeare", None, "test"),
}


def load_text(task: str, max_chars: Optional[int] = None) -> str:
    cfg = task_dataset_configs.get(task)
    if cfg is None:
        raise ValueError(f"unknown task {task!r}; "
                         f"have {sorted(task_dataset_configs)}")
    try:
        from datasets import load_dataset
        ds = load_dataset(cfg.path, cfg.name, split=cfg.split)
    except Exception as e:  # offline / missing cache
        raise DatasetUnavailable(
            f"dataset {task!r} unavailable (offline?): {e}") from e
    parts = []
    total = 0
    for row in ds:
        t = row[cfg.field]
        parts.append(t)
        total += len(t)
        if max_chars is not None and total >= max_chars:
            break
    return cfg.join.join(parts)


def load_tokens(task: str, tokenizer, max_tokens: Optional[int] = None,
                max_chars: Optional[int] = None) -> np.ndarray:
    """Tokenize a task's corpus into one flat int32 stream (the GPTQ-style
    evaluator input). ``tokenizer`` is any object with ``encode`` or
    ``__call__`` returning input_ids."""
    text = load_text(task, max_chars=max_chars)
    if hasattr(tokenizer, "encode"):
        ids = tokenizer.encode(text)
    else:
        ids = tokenizer(text)["input_ids"]
    ids = np.asarray(ids, dtype=np.int32).reshape(-1)
    if max_tokens is not None:
        ids = ids[:max_tokens]
    return ids


def synthetic_tokens(vocab_size: int, n_tokens: int = 16384,
                     seed: int = 0) -> np.ndarray:
    """Deterministic Zipf-ish synthetic token stream for offline plumbing
    tests (not a language-model benchmark -- perplexities on this are only
    meaningful relative to each other)."""
    rng = np.random.RandomState(seed)
    # Zipfian-like distribution over the vocab with local repetition
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = 1.0 / ranks
    probs /= probs.sum()
    ids = rng.choice(vocab_size, size=n_tokens, p=probs)
    # inject local structure: repeat previous token 10% of the time
    rep = rng.rand(n_tokens) < 0.1
    for i in range(1, n_tokens):
        if rep[i]:
            ids[i] = ids[i - 1]
    return ids.astype(np.int32)


def get_calibration_loader(task: str, tokenizer, nsamples: int = 128,
                           seqlen: int = 2048, seed: int = 0) -> np.ndarray:
    """GPTQ-style calibration sampler (reference data_gptq.py get_loaders):
    draw ``nsamples`` random ``seqlen``-token excerpts from the task's train
    corpus with a fixed seed. Returns int32 [nsamples, seqlen]."""
    train_splits = {"wikitext-2": "train", "ptb": "train", "c4": "train",
                    "pile": "validation"}
    cfg = task_dataset_configs.get(task)
    if cfg is None:
        raise ValueError(f"unknown task {task!r}")
    from dataclasses import replace as _rep
    cfg = _rep(cfg, split=train_splits.get(task, "train"))
    try:
        from datasets import load_dataset
        ds = load_dataset(cfg.path, cfg.name, split=cfg.split)
    except Exception as e:
        raise DatasetUnavailable(
            f"dataset {task!r} unavailable (offline?): {e}") from e
    text = cfg.join.join(row[cfg.field] for row in ds)
    if hasattr(tokenizer, "encode"):
        ids = np.asarray(tokenizer.encode(text), np.int32)
    else:
        ids = np.asarray(tokenizer(text)["input_ids"], np.int32)
    rng = np.random.RandomState(seed)
    out = np.empty((nsamples, seqlen), np.int32)
    for i in range(nsamples):
        start = rng.randint(0, max(len(ids) - seqlen - 1, 1))
        out[i] = ids[start:start + seqlen]
    return out
