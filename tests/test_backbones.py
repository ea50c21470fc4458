"""Non-BERT backbone layouts: RoBERTa and DistilBERT MLM imports.

The reference hosts ANY HuggingFace MaskedLM architecture through
AutoModelForMaskedLM (/root/reference/scripts/model/sparse_encoders.py:57-59)
and its tokenizer through AutoTokenizer (:60). These tests pin the native
JAX importer's parity for the two biggest non-BERT MLM families against
torch oracles built locally (random-init tiny configs — no network).
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from opensearch_sparse_model_tuning_sample_tpu.models import (
    bert,
    hf_import,
    sparse_encoder as se,
)
from opensearch_sparse_model_tuning_sample_tpu.models.tokenizer import (
    ByteLevelBPETokenizer,
    load_tokenizer,
)

torch = pytest.importorskip("torch")
import transformers  # noqa: E402


def _fp32_cfg(cfg):
    return bert.BertConfig(
        **{
            **{f.name: getattr(cfg, f.name) for f in cfg.__dataclass_fields__.values()},
            "compute_dtype": jnp.float32,
        }
    )


def _rand_inputs(rng, B, L, vocab, pad_id, lens):
    """input_ids with real tokens then pad — both oracles must agree on
    padded rows for the comparison to mean anything."""
    ids = rng.integers(4, vocab, size=(B, L)).astype(np.int64)
    mask = np.zeros((B, L), dtype=np.int64)
    for i, n in enumerate(lens):
        ids[i, n:] = pad_id
        mask[i, :n] = 1
    return ids, mask


# ---------------------------------------------------------------------------
# RoBERTa
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def roberta_ckpt(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("roberta"))
    cfg = transformers.RobertaConfig(
        vocab_size=384,  # covers the test BPE tokenizer's id space too
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=40,
        type_vocab_size=1,
        pad_token_id=1,
        bos_token_id=0,
        eos_token_id=2,
    )
    torch.manual_seed(0)
    m = transformers.RobertaForMaskedLM(cfg)
    m.eval()
    m.save_pretrained(d)
    return d, m


def test_roberta_forward_matches_hf_torch(roberta_ckpt):
    """Full MLM logits parity vs torch RobertaForMaskedLM — covers the
    pad-offset position ids (create_position_ids_from_input_ids), the
    constant token-type row, eps=1e-5 LN, and the gelu-pinned LM head."""
    d, hf_model = roberta_ckpt
    cfg, params, _ = hf_import.load_checkpoint(d)
    assert cfg.model_type == "roberta"
    assert cfg.position_style == "from_pad_offset"

    rng = np.random.default_rng(0)
    ids, mask = _rand_inputs(rng, B=3, L=12, vocab=384, pad_id=1, lens=[12, 7, 4])
    with torch.no_grad():
        t_logits = hf_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()

    j_logits = np.asarray(
        bert.apply(
            params,
            _fp32_cfg(cfg),
            jnp.asarray(ids.astype(np.int32)),
            jnp.asarray(mask.astype(np.int32)),
        )
    )[:, :, : cfg.vocab_size]
    sel = mask.astype(bool)
    np.testing.assert_allclose(j_logits[sel], t_logits[sel], atol=2e-4, rtol=1e-3)


def test_roberta_export_roundtrip_through_torch(roberta_ckpt, tmp_path):
    """our import -> save_checkpoint -> AutoModelForMaskedLM reload: the
    exported dir must produce the same torch logits as the original (the
    reference's checkpoint-{step} eval-loop contract, trainer.py:37-49)."""
    d, hf_model = roberta_ckpt
    cfg, params, _ = hf_import.load_checkpoint(d)

    class _Tok:  # save_checkpoint only touches tokenizer.save_pretrained
        def save_pretrained(self, out):
            pass

    model = se.SparseEncoderModel(
        cfg=cfg,
        params={"bert": params, "idf_vector": jnp.ones((cfg.vocab_size,))},
        tokenizer=_Tok(),
        _special_mask=np.zeros((cfg.vocab_size,), np.float32),
    )
    out = str(tmp_path / "export")
    hf_import.save_checkpoint(model, out)
    re = transformers.AutoModelForMaskedLM.from_pretrained(out)
    re.eval()

    rng = np.random.default_rng(1)
    ids, mask = _rand_inputs(rng, B=2, L=10, vocab=384, pad_id=1, lens=[10, 6])
    with torch.no_grad():
        a = hf_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()
        b = re(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()
    np.testing.assert_allclose(a, b, atol=1e-5)


# ---------------------------------------------------------------------------
# DistilBERT
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def distilbert_ckpt(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("distilbert"))
    cfg = transformers.DistilBertConfig(
        vocab_size=64,
        dim=32,
        n_layers=2,
        n_heads=2,
        hidden_dim=64,
        max_position_embeddings=32,
        pad_token_id=0,
    )
    torch.manual_seed(0)
    m = transformers.DistilBertForMaskedLM(cfg)
    m.eval()
    m.save_pretrained(d)
    return d, m


def test_distilbert_forward_matches_hf_torch(distilbert_ckpt):
    """Full MLM logits parity vs torch DistilBertForMaskedLM — covers the
    q_lin/k_lin/v_lin/sa_layer_norm/ffn renames, the missing token-type
    table, and the vocab_transform/vocab_projector head."""
    d, hf_model = distilbert_ckpt
    cfg, params, _ = hf_import.load_checkpoint(d)
    assert cfg.model_type == "distilbert"
    assert cfg.use_token_type is False

    rng = np.random.default_rng(2)
    ids, mask = _rand_inputs(rng, B=3, L=11, vocab=64, pad_id=0, lens=[11, 8, 3])
    with torch.no_grad():
        t_logits = hf_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()

    j_logits = np.asarray(
        bert.apply(
            params,
            _fp32_cfg(cfg),
            jnp.asarray(ids.astype(np.int32)),
            jnp.asarray(mask.astype(np.int32)),
        )
    )[:, :, : cfg.vocab_size]
    sel = mask.astype(bool)
    np.testing.assert_allclose(j_logits[sel], t_logits[sel], atol=2e-4, rtol=1e-3)


def test_distilbert_export_roundtrip_through_torch(distilbert_ckpt, tmp_path):
    d, hf_model = distilbert_ckpt
    cfg, params, _ = hf_import.load_checkpoint(d)

    class _Tok:
        def save_pretrained(self, out):
            pass

    model = se.SparseEncoderModel(
        cfg=cfg,
        params={"bert": params, "idf_vector": jnp.ones((cfg.vocab_size,))},
        tokenizer=_Tok(),
        _special_mask=np.zeros((cfg.vocab_size,), np.float32),
    )
    out = str(tmp_path / "export")
    hf_import.save_checkpoint(model, out)
    re = transformers.AutoModelForMaskedLM.from_pretrained(out)
    re.eval()

    rng = np.random.default_rng(3)
    ids, mask = _rand_inputs(rng, B=2, L=9, vocab=64, pad_id=0, lens=[9, 5])
    with torch.no_grad():
        a = hf_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()
        b = re(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()
    np.testing.assert_allclose(a, b, atol=1e-5)


# ---------------------------------------------------------------------------
# Byte-level BPE tokenizer (RoBERTa family)
# ---------------------------------------------------------------------------

_BPE_CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "sparse retrieval with learned representations",
    "tensor processing units multiply matrices quickly",
    "a byte level tokenizer handles any utf-8 input",
    "numbers like 12345 and symbols #@! are split",
    "Ein schneller brauner Fuchs springt",
]


@pytest.fixture(scope="module")
def bpe_files(tmp_path_factory):
    tokenizers = pytest.importorskip("tokenizers")
    d = str(tmp_path_factory.mktemp("bpe"))
    trainer_tok = tokenizers.ByteLevelBPETokenizer()
    trainer_tok.train_from_iterator(
        _BPE_CORPUS * 4,
        vocab_size=320,
        min_frequency=1,
        special_tokens=["<s>", "<pad>", "</s>", "<unk>", "<mask>"],
    )
    trainer_tok.save_model(d)
    return os.path.join(d, "vocab.json"), os.path.join(d, "merges.txt")


def test_bpe_tokenizer_matches_hf_roberta_tokenizer(bpe_files):
    """Token-id parity with transformers.RobertaTokenizer over the same
    vocab/merges, including unicode, punctuation runs, numerals, and
    whitespace edge cases."""
    vocab_json, merges_txt = bpe_files
    oracle = transformers.RobertaTokenizer(vocab_json, merges_txt)
    ours = ByteLevelBPETokenizer.from_files(vocab_json, merges_txt)

    cases = [
        "the quick brown fox",
        " leading space",
        "trailing space ",
        "punctuation, and. more! #@!",
        "numbers 12345 and 6.78",
        "unicode: naïve café — em-dash … ellipsis",
        "emoji 🦊 and CJK 漢字 pass through bytes",
        "",
        "tabs\tand\nnewlines",
        "MixedCASE words",
    ]
    for text in cases:
        want = oracle(text)["input_ids"]
        got = ours.encode_ids(text, max_length=512)
        assert got == want, f"mismatch on {text!r}: {got} vs {want}"


def test_bpe_tokenizer_truncation_and_padding(bpe_files):
    vocab_json, merges_txt = bpe_files
    ours = ByteLevelBPETokenizer.from_files(vocab_json, merges_txt)
    long = "the quick brown fox jumps over the lazy dog " * 50
    ids = ours.encode_ids(long, max_length=16)
    assert len(ids) == 16
    assert ids[0] == ours.bos_id and ids[-1] == ours.eos_id

    f = ours([long, "fox"], max_length=16, pad_to=16)
    assert f["input_ids"].shape == (2, 16)
    assert f["attention_mask"][0].sum() == 16
    row1 = f["attention_mask"][1].sum()
    assert f["input_ids"][1, row1:].tolist() == [ours.pad_id] * (16 - row1)


def test_bpe_tokenizer_save_roundtrip(bpe_files, tmp_path):
    vocab_json, merges_txt = bpe_files
    ours = ByteLevelBPETokenizer.from_files(vocab_json, merges_txt)
    out = str(tmp_path / "tok")
    ours.save_pretrained(out)
    re = load_tokenizer(out)
    assert isinstance(re, ByteLevelBPETokenizer)
    text = "roundtrip of the saved tokenizer"
    assert re.encode_ids(text, 64) == ours.encode_ids(text, 64)


def test_tokenizer_json_bpe_parity(bpe_files, tmp_path):
    """A RoBERTa-layout dir shipping ONLY tokenizer.json must load natively,
    in both the legacy "a b" string and the new [a, b] pair merge formats."""
    import json

    vocab_json, merges_txt = bpe_files
    ours = ByteLevelBPETokenizer.from_files(vocab_json, merges_txt)
    merges = [
        " ".join(m)
        for m, _ in sorted(ours.bpe_ranks.items(), key=lambda kv: kv[1])
    ]
    d = tmp_path / "fastbpe"
    d.mkdir()
    text = "the quick brown fox, naïve café 🦊"
    for m in (merges, [m.split(" ") for m in merges]):
        blob = {"model": {"type": "BPE", "vocab": ours.vocab, "merges": m}}
        (d / "tokenizer.json").write_text(json.dumps(blob, ensure_ascii=False))
        t2 = load_tokenizer(str(d))
        assert isinstance(t2, ByteLevelBPETokenizer)
        assert t2.encode_ids(text, 64) == ours.encode_ids(text, 64)


# ---------------------------------------------------------------------------
# End-to-end: roberta-layout checkpoint + BPE tokenizer through build_model
# ---------------------------------------------------------------------------


def test_build_model_roberta_dir_end_to_end(roberta_ckpt, bpe_files, tmp_path):
    """A RoBERTa-layout checkpoint dir (weights + vocab.json/merges.txt +
    idf.json) builds a working SparseEncoderModel: encode_doc matches the
    reference `_encode` math on torch logits, and the inf-free query path
    zeroes the BPE special tokens."""
    d, hf_model = roberta_ckpt
    vocab_json, merges_txt = bpe_files
    tok = ByteLevelBPETokenizer.from_files(vocab_json, merges_txt)
    # model vocab (384) covers the tokenizer's id space (~320); build_model
    # reconciles the idf vector to the model vocab
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(ckpt)
    for f in os.listdir(d):
        os.link(os.path.join(d, f), os.path.join(ckpt, f))
    tok.save_pretrained(ckpt)
    with open(os.path.join(ckpt, "idf.json"), "w") as f:
        json.dump({"<s>": 0.5}, f)

    model = se.build_model(model_name_or_path=ckpt)
    assert model.cfg.model_type == "roberta"
    assert isinstance(model.tokenizer, ByteLevelBPETokenizer)

    enc = se.get_batch_encoder(model, max_length=16, seq_buckets=[16])
    texts = ["the quick brown fox", "sparse retrieval"]
    reps = enc.encode_batch(texts)
    assert reps.shape == (2, model.cfg.vocab_size)
    assert (reps >= 0).all()

    # oracle: reference _encode on torch logits (max-pool * mask, log1p relu)
    f = model.tokenizer(texts, max_length=16, pad_to=16)
    with torch.no_grad():
        logits = hf_model(
            input_ids=torch.tensor(f["input_ids"].astype(np.int64)),
            attention_mask=torch.tensor(f["attention_mask"].astype(np.int64)),
        ).logits.numpy()
    pooled = np.max(logits * f["attention_mask"][:, :, None], axis=1)
    want = np.log1p(np.maximum(pooled, 0.0))
    np.testing.assert_allclose(reps, want, atol=2e-3, rtol=1e-2)

    # inf-free path: special tokens contribute nothing
    q = enc.encode_batch(["fox"], inf_free=True)
    for sid in model.tokenizer.special_token_ids:
        assert q[0, sid] == 0.0


# ---------------------------------------------------------------------------
# Teachers: the non-BERT layouts now host natively (no torch fallback)
# ---------------------------------------------------------------------------


def test_distilbert_teacher_hosts_natively(distilbert_ckpt, tmp_path):
    """A DistilBERT-layout dense teacher imports into the native JAX path
    (kind='dense', params on device) instead of falling back to the torch
    host path — and its CLS embedding matches torch."""
    from opensearch_sparse_model_tuning_sample_tpu.train.teachers import (
        build_teacher,
        dense_teacher_rep,
    )

    d, hf_model = distilbert_ckpt
    ckpt = str(tmp_path / "teacher")
    os.makedirs(ckpt)
    for f in os.listdir(d):
        os.link(os.path.join(d, f), os.path.join(ckpt, f))
    with open(os.path.join(ckpt, "vocab.txt"), "w") as f:
        f.write("[PAD]\n[UNK]\n[CLS]\n[SEP]\n[MASK]\n")
        for i in range(5, 64):
            f.write(f"tok{i}\n")

    t = build_teacher("dense", ckpt, pooling="cls")
    assert t.kind == "dense" and t.host_model is None

    rng = np.random.default_rng(7)
    ids, mask = _rand_inputs(rng, B=2, L=8, vocab=64, pad_id=0, lens=[8, 5])
    got = np.asarray(
        dense_teacher_rep(
            t.params, _fp32_cfg(t.cfg), jnp.asarray(ids.astype(np.int32)),
            jnp.asarray(mask.astype(np.int32)), pooling="cls",
        )
    )
    with torch.no_grad():
        hidden = hf_model.distilbert(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state
        want = torch.nn.functional.normalize(hidden[:, 0], p=2, dim=1).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
