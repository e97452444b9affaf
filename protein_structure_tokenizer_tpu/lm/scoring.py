"""LM scoring: log-likelihood / perplexity of structure-token sequences.

Framework extension (the reference computes perplexity only as a training
metric): score existing token sequences under a trained GPT — rank
generated structures by model likelihood, filter sampling output, or
evaluate a corpus.  One full forward per batch (teacher forcing), pad
positions masked; the same next-token convention as the training loss
(runtime/train_lm.py:70-95).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from protein_structure_tokenizer_tpu.lm import gpt
from protein_structure_tokenizer_tpu.utils.params import Params


def frame_rows(
    rows: Sequence[np.ndarray], cfg: gpt.GptConfig, length: Optional[int] = None
) -> np.ndarray:
    """Frame raw structure-token rows as BOS + tokens + EOS, padded with
    PAD to a common ``length`` (default: longest row + 2, capped at the
    block size).  Rows longer than the block are truncated with a tail EOS
    so every row still ends in exactly one scored EOS."""
    cap = cfg.max_position_embeddings
    if length is not None and length > cap:
        # gpt.forward gathers RoPE tables with clip semantics past the block
        # — framing longer than the block would silently corrupt positions.
        raise ValueError(
            f"length={length} exceeds the model block "
            f"(max_position_embeddings={cap})"
        )
    length = length or min(cap, max((len(r) for r in rows), default=0) + 2)
    out = np.full((len(rows), length), cfg.pad_token_id, np.int32)
    out[:, 0] = cfg.bos_token_id
    for i, row in enumerate(rows):
        row = np.asarray(row, np.int32).reshape(-1)[: length - 2]
        out[i, 1 : 1 + row.size] = row
        out[i, 1 + row.size] = cfg.eos_token_id
    return out


def score_sequences(
    params: Params,
    cfg: gpt.GptConfig,
    tokens: jax.Array,  # (B, T) framed rows: BOS tokens EOS PAD...
    *,
    mesh=None,
) -> dict:
    """Per-row teacher-forced log-likelihood.

    Returns ``{"log_likelihood": (B,) sum of log p(target) over non-pad
    targets (EOS included), "num_scored": (B,), "perplexity": (B,)}``.
    Jittable; under a "model"-axis mesh the forward runs tensor-parallel.
    """
    inputs, targets = tokens[:, :-1], tokens[:, 1:]
    logits = gpt.forward(params, cfg, inputs, mesh=mesh)["logits"]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tok_logp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = (targets != cfg.pad_token_id).astype(jnp.float32)
    ll = (tok_logp * mask).sum(axis=-1)
    n = jnp.maximum(mask.sum(axis=-1), 1.0)
    return {
        "log_likelihood": ll,
        "num_scored": mask.sum(axis=-1),
        "perplexity": jnp.exp(-ll / n),
    }
