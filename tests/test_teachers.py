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
