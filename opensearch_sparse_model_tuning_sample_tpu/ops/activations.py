"""Sparse-representation activation math as fused pure functions.

Parity targets (/root/reference/scripts/model/sparse_encoders.py):
  * masked max-pool over sequence + log1p(relu)        (:107-112)
  * L0-paper double log1p                              (:113-114)
  * relative-threshold pruning `prune_ratio`           (:115-119)
  * inference-free query encoding: binary bag of input
    tokens x relu(idf), special tokens zeroed          (:121-127)

All ops are elementwise/reduction chains XLA fuses into the producing matmul;
no Pallas needed here — the MLM-head matmul is the hot op and these ride its
epilogue.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def sparse_activation(
    logits: jax.Array,  # [B, L, V] fp32 MLM logits
    attention_mask: jax.Array,  # [B, L]
    use_l0: bool = False,
    prune_ratio: Optional[float] = None,
) -> jax.Array:
    """Masked max-pool over the sequence axis followed by saturating logs.

    Matches reference `_encode` exactly: masked positions are multiplied by 0
    (not -inf) before the max — relu then zeroes any all-negative outcome.
    """
    masked = logits * attention_mask[:, :, None].astype(logits.dtype)
    values = jnp.max(masked, axis=1)  # [B, V]
    values = jnp.log1p(jax.nn.relu(values))
    if use_l0:
        values = jnp.log1p(values)
    if prune_ratio is not None:
        thresh = jnp.max(values, axis=-1, keepdims=True) * prune_ratio
        values = values * (values > thresh)
    return values


def pooled_activation(
    pooled: jax.Array,  # [B, V] masked max-pooled logits (fp32)
    use_l0: bool = False,
    prune_ratio: Optional[float] = None,
) -> jax.Array:
    """The log/prune chain applied to already-pooled logits (the chunked
    max-pool head path, bert.mlm_maxpool)."""
    values = jnp.log1p(jax.nn.relu(pooled))
    if use_l0:
        values = jnp.log1p(values)
    if prune_ratio is not None:
        thresh = jnp.max(values, axis=-1, keepdims=True) * prune_ratio
        values = values * (values > thresh)
    return values


def inf_free_activation(
    input_ids: jax.Array,  # [B, L] int32
    idf_vector: jax.Array,  # [V] (learnable)
    special_token_mask: jax.Array,  # [V] bool — True at special-token ids
    vocab_size: int,
) -> jax.Array:
    """Inference-free query rep: binary bag-of-input-tokens x relu(idf).

    TPU note: built with one scatter (static shape) instead of advanced
    indexing; the scatter is tiny ([B, L] updates) next to the doc forward.
    """
    B = input_ids.shape[0]
    out = jnp.zeros((B, vocab_size), dtype=jnp.float32)
    b_idx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], input_ids.shape)
    out = out.at[b_idx, input_ids].set(1.0, mode="drop")
    out = jnp.where(special_token_mask[None, :], 0.0, out)
    return out * jax.nn.relu(idf_vector.astype(jnp.float32))[None, :]


def special_token_mask(special_token_ids: Sequence[int], vocab_size: int) -> jax.Array:
    mask = jnp.zeros((vocab_size,), dtype=bool)
    if len(special_token_ids):
        mask = mask.at[jnp.asarray(list(special_token_ids), dtype=jnp.int32)].set(True)
    return mask


def activation_count(reps: jax.Array) -> jax.Array:
    """Per-token activation counts for the FLOPS statistic
    (reference SparseEncoder count_tensor, sparse_encoders.py:178-179)."""
    return jnp.sum((reps > 0).astype(jnp.int32), axis=0)
