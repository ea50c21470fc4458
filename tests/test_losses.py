"""Ranking losses + FLOPS regularizer vs independent numpy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from opensearch_sparse_model_tuning_sample_tpu.ops import flops as flops_ops
from opensearch_sparse_model_tuning_sample_tpu.ops.losses import (
    LossSpec,
    infonce_loss,
    kldiv_loss,
    margin_mse_loss,
)

rng = np.random.default_rng(0)
B, G, V = 4, 3, 16  # 4 queries, 1 positive + 2 negatives each
Q = rng.normal(size=(B, V)).astype(np.float32)
D = rng.normal(size=(B * G, V)).astype(np.float32)
T = rng.normal(size=(B, G)).astype(np.float32)  # teacher scores (grouped)


def np_softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def grouped_scores(Q, D):
    return np.einsum("bgv,bv->bg", D.reshape(B, G, V), Q)


def test_infonce_grouped_oracle():
    scores = grouped_scores(Q, D)  # col 0 is the positive
    logp = np.log(np_softmax(scores, axis=1))
    expect = -logp[:, 0].mean()
    got = float(infonce_loss(jnp.asarray(Q), jnp.asarray(D)))
    assert got == pytest.approx(expect, rel=1e-5)


def test_infonce_in_batch_oracle():
    all_scores = Q @ D.T  # [B, B*G]
    pos_idx = np.arange(B) * G
    pos = all_scores[np.arange(B), pos_idx][:, None]
    neg_mask = np.ones(B * G, bool)
    neg_mask[pos_idx] = False
    scores = np.concatenate([pos, all_scores[:, neg_mask]], axis=1)
    expect = -np.log(np_softmax(scores, axis=1))[:, 0].mean()
    got = float(
        infonce_loss(jnp.asarray(Q), jnp.asarray(D), use_in_batch_negatives=True)
    )
    assert got == pytest.approx(expect, rel=1e-5)


@pytest.mark.parametrize("temp", [1.0, 4.0])
def test_kldiv_oracle(temp):
    student = grouped_scores(Q, D) / temp
    teacher = np_softmax(T / temp, axis=1)
    logp = student - np.log(np.exp(student).sum(axis=1, keepdims=True))
    kl = (teacher * (np.log(teacher) - logp)).sum(axis=1).mean()
    got = float(
        kldiv_loss(jnp.asarray(Q), jnp.asarray(D), jnp.asarray(T), temperature=temp)
    )
    assert got == pytest.approx(kl, rel=1e-4)


@pytest.mark.parametrize("temp", [1.0, 2.0])
def test_margin_mse_oracle(temp):
    student = grouped_scores(Q, D) / temp
    teacher = T / temp

    def margins(x):
        return x[:, :1] - x[:, 1:]

    expect = ((margins(student) - margins(teacher)) ** 2).mean()
    got = float(
        margin_mse_loss(jnp.asarray(Q), jnp.asarray(D), jnp.asarray(T), temperature=temp)
    )
    assert got == pytest.approx(expect, rel=1e-4)


def test_loss_spec_weight():
    base = float(infonce_loss(jnp.asarray(Q), jnp.asarray(D)))
    spec = LossSpec(kind="infonce", weight=2.5)
    assert float(spec(jnp.asarray(Q), jnp.asarray(D))) == pytest.approx(
        2.5 * base, rel=1e-6
    )


# ---------------------------------------------------------------------------
# FLOPS regularizer
# ---------------------------------------------------------------------------


def test_flops_value_oracle():
    rep = rng.normal(size=(6, V)).astype(np.float32)
    # group_num=2 -> [3, 2, V]; mean over axis 0 then square-sum
    expect = (np.abs(rep.reshape(3, 2, V)).mean(axis=0) ** 2).sum()
    got = float(flops_ops.flops_value(jnp.asarray(rep), group_num=2))
    assert got == pytest.approx(expect, rel=1e-5)


def test_flops_threshold_masks_short_docs():
    rep = np.zeros((2, V), dtype=np.float32)
    rep[0, :10] = 1.0  # doc with L0 = 10
    rep[1, :2] = 1.0  # doc with L0 = 2
    # threshold 5: only doc 0 pays
    got = float(flops_ops.flops_value(jnp.asarray(rep), 1, flops_threshold=5))
    expect = ((np.abs(rep) * np.array([[1.0], [0.0]])).reshape(2, 1, V).mean(0) ** 2).sum()
    assert got == pytest.approx(expect, rel=1e-5)


def test_lambda_quadratic_ramp():
    lam = lambda s: float(flops_ops.get_lambda(jnp.asarray(s), 0.08, 100))
    assert lam(0) == pytest.approx(0.08 * (1 / 100) ** 2)
    assert lam(49) == pytest.approx(0.08 * (50 / 100) ** 2)
    assert lam(100) == pytest.approx(0.08)
    assert lam(100000) == pytest.approx(0.08)


def test_lambda_none_and_zero():
    assert float(flops_ops.get_lambda(jnp.asarray(5), None, 100)) == 0.0
    assert float(flops_ops.get_lambda(jnp.asarray(5), 0.5, None)) == 0.5
