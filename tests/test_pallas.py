"""Pallas fused masked max-pool head — interpret-mode correctness on the CPU
mesh (compiled-mode parity is exercised on real TPU; see the perf note in
ops/pallas_maxpool.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from opensearch_sparse_model_tuning_sample_tpu.models import bert
from opensearch_sparse_model_tuning_sample_tpu.ops.pallas_maxpool import (
    maxpool_head,
    mlm_maxpool_pallas,
)


def test_maxpool_head_matches_reference_math():
    rng = np.random.default_rng(0)
    B, L, D, V = 4, 32, 128, 1024
    h = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    mask = jnp.asarray((rng.random((B, L)) > 0.3).astype(np.int32))
    W = jnp.asarray(rng.normal(size=(D, V)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(V,)).astype(np.float32))

    got = np.asarray(
        maxpool_head(h, mask, W, bias, tile_b=2, tile_v=256, chunk=8,
                     interpret=True)
    )
    logits = np.asarray(h) @ np.asarray(W) + np.asarray(bias)
    expect = (logits * np.asarray(mask)[:, :, None]).max(axis=1)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_maxpool_head_vocab_padding():
    """V=30592 (not a tile_v multiple) exercises the pad/slice path."""
    rng = np.random.default_rng(1)
    B, L, D, V = 2, 16, 64, 30592
    h = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    mask = jnp.ones((B, L), jnp.int32)
    W = jnp.asarray(rng.normal(size=(D, V)).astype(np.float32) * 0.05)
    bias = jnp.zeros((V,), jnp.float32)
    got = maxpool_head(h, mask, W, bias, tile_b=2, tile_v=512, chunk=16,
                       interpret=True)
    assert got.shape == (B, V)
    expect = (np.asarray(h) @ np.asarray(W)).max(axis=1)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-4, atol=1e-4)


def test_mlm_maxpool_pallas_matches_scan_head(tiny_model):
    tok = tiny_model.tokenizer
    f = tok(
        ["pallas fused head check", "a different longer sentence here"],
        max_length=32, pad_to=32,
    )
    ids, mask = jnp.asarray(f["input_ids"]), jnp.asarray(f["attention_mask"])
    hidden = bert.encode_hidden(
        tiny_model.params["bert"], tiny_model.cfg, ids, mask
    )
    ref = bert.mlm_maxpool(tiny_model.params["bert"], tiny_model.cfg, hidden, mask)
    got = mlm_maxpool_pallas(
        tiny_model.params["bert"], tiny_model.cfg, hidden, mask, interpret=True
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)
