"""Teacher ensemble: normalization oracle, rep semantics, kd-ensemble train
step, precomputed-embedding teacher, explicit collectives."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opensearch_sparse_model_tuning_sample_tpu.core.config import (
    DataArguments,
    ModelArguments,
    TrainingArguments,
)
from opensearch_sparse_model_tuning_sample_tpu.core.mesh import make_mesh
from opensearch_sparse_model_tuning_sample_tpu.train.teachers import (
    Teacher,
    TeacherEnsemble,
    build_teacher,
    dense_teacher_rep,
    minmax_normalize,
    sparse_teacher_rep,
)
from opensearch_sparse_model_tuning_sample_tpu.train.trainer import Trainer


def test_minmax_normalize_oracle():
    s = jnp.array([[1.0, 3.0, 2.0], [-1.0, 0.0, 1.0]])
    out = np.asarray(minmax_normalize(s))
    expect0 = (np.array([1.0, 3.0, 2.0]) - 1.0) / (2.0 + 1e-6)
    np.testing.assert_allclose(out[0], expect0, rtol=1e-5)
    assert out[1].min() == pytest.approx(0.0, abs=1e-6)
    assert out[1].max() == pytest.approx(1.0, abs=1e-3)


@pytest.fixture(scope="module")
def sparse_teacher():
    return build_teacher("sparse", "tiny", seed=11)


@pytest.fixture(scope="module")
def dense_teacher():
    return build_teacher("dense", "tiny", seed=12)


def feats(tok, texts, L=16):
    f = tok(texts, max_length=L, pad_to=L)
    return {
        "input_ids": jnp.asarray(f["input_ids"]),
        "attention_mask": jnp.asarray(f["attention_mask"]),
    }


def test_sparse_teacher_zeroes_special_tokens(sparse_teacher):
    f = feats(sparse_teacher.tokenizer, ["hello world"])
    rep = np.asarray(
        sparse_teacher_rep(
            sparse_teacher.params, sparse_teacher.cfg,
            jnp.asarray(sparse_teacher.special_mask),
            f["input_ids"], f["attention_mask"],
        )
    )
    for sid in sparse_teacher.tokenizer.special_token_ids:
        assert rep[0, sid] == 0.0
    assert rep.shape[-1] == sparse_teacher.cfg.vocab_size


def test_dense_teacher_is_normalized(dense_teacher):
    f = feats(dense_teacher.tokenizer, ["a", "two words"])
    rep = np.asarray(
        dense_teacher_rep(
            dense_teacher.params, dense_teacher.cfg,
            f["input_ids"], f["attention_mask"],
        )
    )
    np.testing.assert_allclose(np.linalg.norm(rep, axis=1), 1.0, rtol=1e-5)


def test_ensemble_scores_shape_and_scale(sparse_teacher, dense_teacher):
    ens = TeacherEnsemble([sparse_teacher, dense_teacher], score_scale=30.0)
    tok = sparse_teacher.tokenizer
    B, G = 2, 3
    qf = feats(tok, ["q one", "q two"])
    df = feats(tok, [f"doc {i}" for i in range(B * G)])
    scores = np.asarray(ens.get_scores([qf, qf], [df, df]))
    assert scores.shape == (B, G)
    # per-teacher scores are min-max normalized to [0,1], averaged, x30
    assert scores.min() >= 0.0 and scores.max() <= 30.0 + 1e-3


def test_remote_teacher_uses_batch_embeddings():
    t = Teacher(kind="remote", model_id="store:whatever")
    ens = TeacherEnsemble([t], score_scale=10.0)
    q = {"embeddings": jnp.asarray(np.eye(2, 4, dtype=np.float32))}
    d = {"embeddings": jnp.asarray(np.ones((4, 4), np.float32))}
    scores = np.asarray(ens.get_scores([q], [d]))
    assert scores.shape == (2, 2)


def test_kd_ensemble_train_step(tiny_model, tmp_path):
    """Full kd-ensemble path inside the jitted train step."""
    ma = ModelArguments(inf_free=True)
    da = DataArguments(
        loss_types=["kldiv"], use_in_batch_negatives=False,
        flops_d_lambda=0.01, flops_d_T=10,
        kd_ensemble_teacher_kwargs={"types": ["sparse"], "model_ids": ["tiny"]},
    )
    ta = TrainingArguments(output_dir=str(tmp_path), max_steps=3,
                           warmup_steps=1, learning_rate=1e-3, save_strategy="no")
    from opensearch_sparse_model_tuning_sample_tpu.train.teachers import build_ensemble

    ens = build_ensemble(da.kd_ensemble_teacher_kwargs, da.use_in_batch_negatives)
    trainer = Trainer(tiny_model, ma, da, ta, teacher_ensemble=ens, mesh=make_mesh(1))
    tok = tiny_model.tokenizer
    B, G, L = 2, 2, 16
    qf = tok(["q a", "q b"], max_length=L, pad_to=L)
    df = tok([f"d {i}" for i in range(B * G)], max_length=L, pad_to=L)
    t_qf = ens.teachers[0].tokenizer(["q a", "q b"], max_length=L, pad_to=L)
    t_df = ens.teachers[0].tokenizer(
        [f"d {i}" for i in range(B * G)], max_length=L, pad_to=L
    )
    batch = {
        "q_input_ids": qf["input_ids"],
        "q_attention_mask": qf["attention_mask"],
        "d_input_ids": df["input_ids"],
        "d_attention_mask": df["attention_mask"],
        "teacher_q": [
            {"input_ids": t_qf["input_ids"], "attention_mask": t_qf["attention_mask"]}
        ],
        "teacher_d": [
            {"input_ids": t_df["input_ids"], "attention_mask": t_df["attention_mask"]}
        ],
    }
    m = trainer.train_step(batch)
    assert np.isfinite(float(m["ranking_loss"]))
    # teacher params must be untouched by the update
    before = np.asarray(ens.teachers[0].params["mlm_head"]["bias"])
    trainer.train_step(batch)
    np.testing.assert_array_equal(
        before, np.asarray(ens.teachers[0].params["mlm_head"]["bias"])
    )


# ------------------------------------------------- foreign-layout teachers


VOCAB_WORDS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
               "hello", "world", "dense", "teacher", "foreign", "layout",
               "a", "b", "c", "query", "doc"]


def _write_vocab(path):
    with open(path, "w") as f:
        f.write("\n".join(VOCAB_WORDS) + "\n")


@pytest.fixture(scope="module")
def foreign_bert_dir(tmp_path_factory):
    """A torch-produced BERT checkpoint with a FOREIGN layout: relu act,
    non-default eps, dense dump (AutoModel — no MLM head at all). The class
    of checkpoint VERDICT r2 said hit a wall."""
    torch = pytest.importorskip("torch")
    import transformers

    d = str(tmp_path_factory.mktemp("foreign_bert"))
    _write_vocab(f"{d}/vocab.txt")
    cfg = transformers.BertConfig(
        vocab_size=len(VOCAB_WORDS), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, hidden_act="relu",
        layer_norm_eps=1e-5, max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = transformers.BertModel(cfg)
    model.eval()
    model.save_pretrained(d)
    tok = transformers.BertTokenizerFast(vocab_file=f"{d}/vocab.txt")
    tok.save_pretrained(d)
    return d


def test_foreign_layout_dense_teacher_parity(foreign_bert_dir):
    """relu + custom eps + no-MLM-head + mean pooling imports natively and
    matches the torch AutoModel forward (reference dense teacher semantics,
    bi_encoder_wrapper.py:38-59, generalized with mean pooling)."""
    torch = pytest.importorskip("torch")
    import transformers

    t = build_teacher("dense", foreign_bert_dir, pooling="mean")
    assert t.kind == "dense", "BERT-family layout must import natively"
    assert t.cfg.hidden_act == "relu" and t.cfg.layer_norm_eps == 1e-5

    texts = ["hello world", "dense teacher foreign layout"]
    f = feats(t.tokenizer, texts, L=12)
    rep = np.asarray(dense_teacher_rep(
        t.params, t.cfg, f["input_ids"], f["attention_mask"], pooling="mean",
    ))
    np.testing.assert_allclose(np.linalg.norm(rep, axis=1), 1.0, rtol=1e-4)

    hf_model = transformers.AutoModel.from_pretrained(foreign_bert_dir)
    hf_model.eval()
    with torch.no_grad():
        out = hf_model(
            input_ids=torch.tensor(np.asarray(f["input_ids"], np.int64)),
            attention_mask=torch.tensor(np.asarray(f["attention_mask"], np.int64)),
        ).last_hidden_state
        m = torch.tensor(np.asarray(f["attention_mask"], np.float32)).unsqueeze(-1)
        want = (out * m).sum(1) / m.sum(1)
        want = torch.nn.functional.normalize(want, p=2, dim=1).numpy()
    np.testing.assert_allclose(rep, want, atol=2e-2)  # bf16 teacher compute

    # cls pooling is a genuinely different rep
    rep_cls = np.asarray(dense_teacher_rep(
        t.params, t.cfg, f["input_ids"], f["attention_mask"], pooling="cls",
    ))
    assert not np.allclose(rep, rep_cls)


def test_mean_pooling_hand_oracle(dense_teacher):
    from opensearch_sparse_model_tuning_sample_tpu.models import bert

    f = feats(dense_teacher.tokenizer, ["hello world", "a"], L=8)
    hidden = np.asarray(bert.encode_hidden(
        dense_teacher.params, dense_teacher.cfg,
        f["input_ids"], f["attention_mask"], deterministic=True,
    ), dtype=np.float32)
    m = np.asarray(f["attention_mask"], np.float32)[:, :, None]
    want = (hidden * m).sum(1) / m.sum(1)
    want = want / np.linalg.norm(want, axis=1, keepdims=True)
    got = np.asarray(dense_teacher_rep(
        dense_teacher.params, dense_teacher.cfg,
        f["input_ids"], f["attention_mask"], pooling="mean",
    ))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_non_bert_architecture_falls_back_to_torch_host(tmp_path):
    """A non-BERT-family HF checkpoint (electra here; distilbert/roberta now
    import natively) cannot import natively but must load as a torch host
    teacher and produce ensemble scores — the reference hosts arbitrary
    AutoModel architectures (config_kd.yaml's gte-large-en-v1.5)."""
    torch = pytest.importorskip("torch")
    import transformers

    d = str(tmp_path / "electra")
    import os

    os.makedirs(d)
    _write_vocab(f"{d}/vocab.txt")
    cfg = transformers.ElectraConfig(
        vocab_size=len(VOCAB_WORDS), embedding_size=32, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(1)
    transformers.ElectraModel(cfg).save_pretrained(d)
    transformers.ElectraTokenizerFast(vocab_file=f"{d}/vocab.txt").save_pretrained(d)

    t = build_teacher("dense", d, pooling="cls")
    assert t.kind == "hf" and t.host_model is not None

    ens = TeacherEnsemble([t], score_scale=30.0)
    assert ens.has_host
    batch = {
        "teacher_q": [{"texts": ("hello world", "query doc")}],
        "teacher_d": [{"texts": tuple(f"doc {w}" for w in "a b c a b c".split())}],
    }
    batch = ens.host_precompute(batch)
    q_emb = batch["teacher_q"][0]["embeddings"]
    assert q_emb.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(q_emb, axis=1), 1.0, rtol=1e-5)
    scores = np.asarray(ens.get_scores(batch["teacher_q"], batch["teacher_d"]))
    assert scores.shape == (2, 3)
    assert np.isfinite(scores).all()

    # parity with direct torch: CLS + L2 norm (reference DenseModel)
    hf_model = transformers.AutoModel.from_pretrained(d)
    hf_model.eval()
    tok = transformers.AutoTokenizer.from_pretrained(d)
    with torch.no_grad():
        f = tok(["hello world", "query doc"], padding=True, return_tensors="pt")
        want = hf_model(**f).last_hidden_state[:, 0]
        want = torch.nn.functional.normalize(want, p=2, dim=1).numpy()
    np.testing.assert_allclose(q_emb, want, atol=1e-5)


def test_unmappable_checkpoint_error_names_keys(tmp_path):
    """A bert-typed config with an alien state dict must fail with the exact
    missing keys, not a bare KeyError."""
    import json

    from safetensors.numpy import save_file

    from opensearch_sparse_model_tuning_sample_tpu.models import hf_import

    d = tmp_path / "alien"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({
        "model_type": "bert", "vocab_size": 16, "hidden_size": 8,
        "num_hidden_layers": 1, "num_attention_heads": 2,
        "intermediate_size": 16,
    }))
    save_file(
        {"encoder.blocks.0.attn.qkv.weight": np.zeros((8, 24), np.float32)},
        str(d / "model.safetensors"),
    )
    with pytest.raises(hf_import.UnsupportedArchitecture) as e:
        hf_import.load_checkpoint(str(d))
    msg = str(e.value)
    assert "bert.embeddings.word_embeddings.weight" in msg
    assert "encoder.blocks" in msg  # names what IS there


def test_host_teacher_in_full_train_loop(tmp_path):
    """End-to-end: collator derives the host-teacher spec from the ensemble,
    raw texts ride the batch, the trainer swaps them for embeddings pre-jit,
    and the kldiv step runs."""
    torch = pytest.importorskip("torch")
    import os

    import transformers

    from opensearch_sparse_model_tuning_sample_tpu.data.collator import build_collator
    from opensearch_sparse_model_tuning_sample_tpu.models import sparse_encoder as se

    d = str(tmp_path / "electra2")
    os.makedirs(d)
    _write_vocab(f"{d}/vocab.txt")
    cfg = transformers.ElectraConfig(
        vocab_size=len(VOCAB_WORDS), embedding_size=16, hidden_size=16,
        num_hidden_layers=1, num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(2)
    transformers.ElectraModel(cfg).save_pretrained(d)
    transformers.ElectraTokenizerFast(vocab_file=f"{d}/vocab.txt").save_pretrained(d)

    model = se.build_model(arch="tiny", idf_path="assets/idf.npz", seed=0)
    ma = ModelArguments(inf_free=True)
    da = DataArguments(
        loss_types=["kldiv"], flops_d_lambda=0.01, flops_d_T=10,
        kd_ensemble_teacher_kwargs={"types": ["dense"], "model_ids": [d]},
    )
    ta = TrainingArguments(output_dir=str(tmp_path / "out"), max_steps=2,
                           warmup_steps=1, save_strategy="no")
    from opensearch_sparse_model_tuning_sample_tpu.train.teachers import build_ensemble

    ens = build_ensemble(da.kd_ensemble_teacher_kwargs, False, max_length=32)
    assert ens.teachers[0].kind == "hf"
    collator = build_collator(
        "kd", model.tokenizer, 32, seq_buckets=[16],
        teacher_ensemble=ens,
    )
    rows = [("hello world", ["doc a", "doc b"], [1.0, 0.5]),
            ("query doc", ["doc c", "doc a"], [0.9, 0.1])]
    batch = collator(rows)
    assert batch["teacher_q"][0]["texts"] == ("hello world", "query doc")
    trainer = Trainer(model, ma, da, ta, teacher_ensemble=ens, mesh=make_mesh(1))
    m = trainer.train_step(batch)
    assert np.isfinite(float(m["ranking_loss"]))


def test_merged_topk_collective(mesh8):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from opensearch_sparse_model_tuning_sample_tpu.parallel.collectives import (
        merged_topk,
    )

    B, k, n = 2, 3, 8
    rng = np.random.default_rng(0)
    scores = rng.normal(size=(n * B, k)).astype(np.float32)  # sharded layout
    idx = rng.integers(0, 1000, size=(n * B, k)).astype(np.int32)

    def fn(s, i):
        return merged_topk(s, i, k)

    out_s, out_i = jax.jit(
        shard_map(
            fn, mesh=mesh8, in_specs=(P("data"), P("data")),
            out_specs=(P(), P()), check_vma=False,
        )
    )(scores, idx)
    # oracle: concat shards per row
    s3 = scores.reshape(n, B, k)
    i3 = idx.reshape(n, B, k)
    for b in range(B):
        cat_s = s3[:, b].reshape(-1)
        cat_i = i3[:, b].reshape(-1)
        order = np.argsort(-cat_s)[:k]
        np.testing.assert_allclose(np.asarray(out_s)[b], cat_s[order], rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(out_i)[b], cat_i[order])
