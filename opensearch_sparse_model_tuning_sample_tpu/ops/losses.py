"""Ranking losses as pure functions over global-batch representations.

Semantics parity with /root/reference/scripts/train/loss.py:7-110
(InfoNCE :80-107, KLDiv :18-43, MarginMSE :46-77), written for the pjit
global-batch formulation: reps arrive logically global ([B, V] queries,
[B*G, V] docs, G = docs per query with the positive first in each group —
collator layout, /root/reference/scripts/dataset/collator.py:146-152); when
batch dims are sharded over the mesh, XLA inserts the all-gathers the
reference performs by hand (utils.py:16-23), with the correct
gradient-scatter in the backward pass.

All score matmuls run in the compute dtype on the MXU with fp32 accumulation.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


def _scores_grouped(q_rep: jax.Array, d_rep: jax.Array) -> jax.Array:
    """Per-group scores [B, G]: each query against its own doc group."""
    B = q_rep.shape[0]
    G = d_rep.shape[0] // B
    d = d_rep.reshape(B, G, d_rep.shape[-1])
    return jnp.einsum("bgv,bv->bg", d, q_rep, preferred_element_type=jnp.float32)


def _scores_in_batch(q_rep: jax.Array, d_rep: jax.Array) -> jax.Array:
    """Full cross-score matrix [B, B*G] (global in-batch negatives)."""
    return jnp.dot(q_rep, d_rep.T, preferred_element_type=jnp.float32)


def infonce_loss(
    q_rep: jax.Array,
    d_rep: jax.Array,
    use_in_batch_negatives: bool = False,
    **_,
) -> jax.Array:
    """Cross-entropy over [positive | negatives] scores.

    Positives sit at stride G = d_rep.shape[0] // B (reference loss.py:89-91).
    """
    import numpy as np

    B = q_rep.shape[0]
    N = d_rep.shape[0]
    G = N // B
    # B/G are static shapes, so the positive/negative index sets are
    # trace-time constants (no dynamic gather under jit)
    pos_idx = np.arange(B) * G

    if use_in_batch_negatives:
        scores_all = _scores_in_batch(q_rep, d_rep)  # [B, N]
        scores_pos = scores_all[jnp.arange(B), jnp.asarray(pos_idx)][:, None]
        # negatives: every doc that is not a positive (any query's positive is
        # excluded for all rows, matching the reference mask, loss.py:94-98)
        neg_mask = np.ones((N,), bool)
        neg_mask[pos_idx] = False
        scores_neg = scores_all[:, np.nonzero(neg_mask)[0]]  # [B, N-B]
    else:
        grouped = _scores_grouped(q_rep, d_rep)  # [B, G]
        scores_pos = grouped[:, :1]
        scores_neg = grouped[:, 1:]

    scores = jnp.concatenate([scores_pos, scores_neg], axis=1)
    # CE with target = one-hot at column 0
    return jnp.mean(-jax.nn.log_softmax(scores, axis=1)[:, 0])


def kldiv_loss(
    q_rep: jax.Array,
    d_rep: jax.Array,
    teacher_scores: jax.Array,
    use_in_batch_negatives: bool = False,
    temperature: float = 1.0,
    **_,
) -> jax.Array:
    """Temperature-scaled KL(student || teacher) (reference loss.py:18-43)."""
    if use_in_batch_negatives:
        student = _scores_in_batch(q_rep, d_rep)
    else:
        student = _scores_grouped(q_rep, d_rep)
    log_p = jax.nn.log_softmax(student / temperature, axis=1)
    q = jax.nn.softmax(teacher_scores / temperature, axis=1)
    # sum(target * (log target - log pred)) over docs, mean over queries;
    # 0*log(0) := 0
    logq = jnp.where(q > 0, jnp.log(jnp.maximum(q, 1e-30)), 0.0)
    kl = jnp.sum(q * (logq - log_p), axis=1)
    return jnp.mean(kl)


def margin_mse_loss(
    q_rep: jax.Array,
    d_rep: jax.Array,
    teacher_scores: jax.Array,
    use_in_batch_negatives: bool = False,
    temperature: float = 1.0,
    **_,
) -> jax.Array:
    """MSE between student and teacher margins to doc 0 (loss.py:46-77)."""
    if use_in_batch_negatives:
        student = _scores_in_batch(q_rep, d_rep)
    else:
        student = _scores_grouped(q_rep, d_rep)
    student = student / temperature
    teacher = teacher_scores / temperature

    def margins(x):
        return x[:, :1] - x[:, 1:]

    return jnp.mean((margins(student) - margins(teacher)) ** 2)


@dataclass(frozen=True)
class LossSpec:
    """One configured ranking loss (reference SparseTrainingLoss + weight)."""

    kind: str
    weight: float = 1.0
    temperature: float = 1.0
    use_in_batch_negatives: bool = False

    def __call__(self, q_rep, d_rep, teacher_scores=None) -> jax.Array:
        fn = LOSS_FN_MAP[self.kind]
        return self.weight * fn(
            q_rep,
            d_rep,
            teacher_scores=teacher_scores,
            use_in_batch_negatives=self.use_in_batch_negatives,
            temperature=self.temperature,
        )


def _infonce_adapter(q_rep, d_rep, teacher_scores=None, **kw):
    return infonce_loss(q_rep, d_rep, **kw)


LOSS_FN_MAP = {
    "infonce": _infonce_adapter,
    "kldiv": kldiv_loss,
    "marginmse": margin_mse_loss,
}


def build_loss_specs(data_args) -> list[LossSpec]:
    """From config (reference train_ir.py:72-82)."""
    return [
        LossSpec(
            kind=t,
            weight=data_args.ranking_loss_weight,
            temperature=data_args.temperature,
            use_in_batch_negatives=data_args.use_in_batch_negatives,
        )
        for t in data_args.loss_types
    ]
