"""Train-step tests: loss decreases, sharded == single-device gradients
(the differentiable-all-gather parity the reference relies on,
SURVEY.md §5/§7e), teacher-score plumbing, checkpoint/resume."""

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
from opensearch_sparse_model_tuning_sample_tpu.models import sparse_encoder as se
from opensearch_sparse_model_tuning_sample_tpu.ops.losses import build_loss_specs
from opensearch_sparse_model_tuning_sample_tpu.train.trainer import (
    Trainer,
    make_optimizer,
    make_train_step,
)

TEXTS = [
    "the capital of france is paris",
    "machine learning on tensor processing units",
    "sparse retrieval uses inverted indexes",
    "bert computes contextual token representations",
    "the eiffel tower is in paris france",
    "tpus have a systolic matrix multiply unit",
    "an inverted index maps terms to documents",
    "transformers use self attention layers",
]


def make_batch(model, B=4, G=2, Lq=16, Ld=24, with_scores=False, seed=0):
    r = np.random.default_rng(seed)
    tok = model.tokenizer
    qs = [TEXTS[i % len(TEXTS)] for i in range(B)]
    docs = [TEXTS[(i * 3 + j) % len(TEXTS)] for i in range(B) for j in range(G)]
    qf = tok(qs, max_length=Lq, pad_to=Lq)
    df = tok(docs, max_length=Ld, pad_to=Ld)
    batch = {
        "q_input_ids": qf["input_ids"],
        "q_attention_mask": qf["attention_mask"],
        "d_input_ids": df["input_ids"],
        "d_attention_mask": df["attention_mask"],
    }
    if with_scores:
        batch["scores"] = r.normal(size=(B, G)).astype(np.float32)
    return batch


def make_args(**over):
    ma = ModelArguments(inf_free=True, idf_requires_grad=False, arch="tiny")
    da = DataArguments(loss_types=["infonce"], use_in_batch_negatives=True,
                       flops_d_lambda=0.01, flops_d_T=10)
    ta = TrainingArguments(output_dir=over.pop("output_dir", "/tmp/test_run"),
                           max_steps=20, warmup_steps=2, learning_rate=1e-3,
                           logging_steps=1000, save_strategy="no", seed=0)
    for k, v in over.items():
        for args in (ma, da, ta):
            if hasattr(args, k):
                setattr(args, k, v)
    return ma, da, ta


def test_infonce_train_loss_decreases(tiny_model, tmp_path):
    ma, da, ta = make_args(output_dir=str(tmp_path))
    trainer = Trainer(tiny_model, ma, da, ta, mesh=make_mesh(1))
    batch = make_batch(tiny_model)
    losses = [float(trainer.train_step(batch)["ranking_loss"]) for _ in range(15)]
    assert losses[-1] < losses[0], losses


def test_idf_frozen_when_not_trainable(tiny_model, tmp_path):
    ma, da, ta = make_args(output_dir=str(tmp_path))
    trainer = Trainer(tiny_model, ma, da, ta, mesh=make_mesh(1))
    idf_before = np.asarray(trainer.state.params["idf_vector"]).copy()
    trainer.train_step(make_batch(tiny_model))
    np.testing.assert_array_equal(
        idf_before, np.asarray(trainer.state.params["idf_vector"])
    )


def test_idf_trains_with_own_lr(tiny_model, tmp_path):
    ma, da, ta = make_args(output_dir=str(tmp_path))
    ma.idf_requires_grad = True
    da.idf_lr = 1e-2
    trainer = Trainer(tiny_model, ma, da, ta, mesh=make_mesh(1))
    idf_before = np.asarray(trainer.state.params["idf_vector"]).copy()
    for _ in range(3):
        trainer.train_step(make_batch(tiny_model))
    idf_after = np.asarray(trainer.state.params["idf_vector"])
    assert not np.array_equal(idf_before, idf_after)


def test_kldiv_uses_dataset_scores(tiny_model, tmp_path):
    ma, da, ta = make_args(output_dir=str(tmp_path))
    da.loss_types = ["kldiv"]
    da.use_in_batch_negatives = False
    trainer = Trainer(tiny_model, ma, da, ta, mesh=make_mesh(1))
    m = trainer.train_step(make_batch(tiny_model, with_scores=True))
    assert np.isfinite(float(m["ranking_loss"]))


def test_sharded_step_matches_single_device(tiny_model, mesh8, tmp_path):
    """The core DP-parity property: a step over the 8-device mesh produces
    the same parameters as the same global batch on one device."""
    ma, da, ta = make_args(output_dir=str(tmp_path))
    batch = make_batch(tiny_model, B=8, G=2)

    t1 = Trainer(tiny_model, ma, da, ta, mesh=make_mesh(1))
    t8 = Trainer(tiny_model, ma, da, ta, mesh=mesh8)
    m1 = t1.train_step(batch)
    m8 = t8.train_step(batch)
    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=2e-5
    )
    p1 = jax.device_get(t1.state.params["bert"]["mlm_head"]["bias"])
    p8 = jax.device_get(t8.state.params["bert"]["mlm_head"]["bias"])
    np.testing.assert_allclose(p1, p8, atol=2e-6)


def test_flops_loss_ramps(tiny_model, tmp_path):
    ma, da, ta = make_args(output_dir=str(tmp_path))
    da.flops_d_lambda = 1.0
    da.flops_d_T = 100
    trainer = Trainer(tiny_model, ma, da, ta, mesh=make_mesh(1))
    batch = make_batch(tiny_model)
    m0 = trainer.train_step(batch)
    m1 = trainer.train_step(batch)
    # lambda grows quadratically -> flops_loss contribution grows
    assert float(m1["flops_loss"]) > float(m0["flops_loss"]) * 0.5


def test_save_and_restore_train_state(tiny_model, tmp_path):
    ma, da, ta = make_args(output_dir=str(tmp_path))
    trainer = Trainer(tiny_model, ma, da, ta, mesh=make_mesh(1))
    trainer.train_step(make_batch(tiny_model))
    trainer.save_train_state()
    step_after_one = int(trainer.state.step)

    trainer2 = Trainer(tiny_model, ma, da, ta, mesh=make_mesh(1))
    trainer2.restore_train_state()
    assert int(trainer2.state.step) == step_after_one
    np.testing.assert_allclose(
        jax.device_get(trainer.state.params["bert"]["mlm_head"]["bias"]),
        jax.device_get(trainer2.state.params["bert"]["mlm_head"]["bias"]),
    )


def test_checkpoint_dir_layout(tiny_model, tmp_path):
    import os

    ma, da, ta = make_args(output_dir=str(tmp_path))
    ta.save_strategy = "steps"
    ta.save_steps = 2
    trainer = Trainer(tiny_model, ma, da, ta, mesh=make_mesh(1))
    trainer.train(iter([make_batch(tiny_model)] * 4), max_steps=4)
    for step in (2, 4):
        d = os.path.join(str(tmp_path), f"checkpoint-{step}")
        assert os.path.exists(os.path.join(d, "model.safetensors"))
        assert os.path.exists(os.path.join(d, "config.json"))
        assert os.path.exists(os.path.join(d, "vocab.txt"))


def test_loss_moving_average_updates_every_step(tiny_model, tmp_path):
    """The 0.99-decay ranking-loss moving average is carried in device state
    and updated EVERY step (reference trainer.py:120-122), not just on
    logging steps."""
    ma, da, ta = make_args(output_dir=str(tmp_path))
    trainer = Trainer(tiny_model, ma, da, ta, mesh=make_mesh(1))
    expected = 0.0
    for i in range(4):
        m = trainer.train_step(make_batch(tiny_model, seed=i))
        expected = 0.99 * expected + 0.01 * float(m["ranking_loss"])
        assert float(m["ranking_loss_ma"]) == pytest.approx(expected, rel=1e-5)


def test_donate_state_flag_respected(tiny_model, tmp_path):
    """donate_state=False keeps the previous state buffers alive (no donation
    error when reusing them)."""
    ma, da, ta = make_args(output_dir=str(tmp_path))
    ta.donate_state = False
    trainer = Trainer(tiny_model, ma, da, ta, mesh=make_mesh(1))
    prev = trainer.state
    trainer.train_step(make_batch(tiny_model))
    # donated buffers raise on use; undonated ones stay readable
    _ = float(jnp.sum(prev.params["idf_vector"]))


def test_step_pins_batch_sharding(tiny_model, mesh8, tmp_path):
    """With explicit in_shardings, a host batch lands sharded over `data` and
    the updated state stays replicated."""
    ma, da, ta = make_args(output_dir=str(tmp_path))
    ta.dp_size = 8
    trainer = Trainer(tiny_model, ma, da, ta, mesh=mesh8)
    m = trainer.train_step(make_batch(tiny_model, B=8, G=2))
    assert np.isfinite(float(m["loss"]))
    # params replicated on all 8 devices
    sh = trainer.state.params["idf_vector"].sharding
    assert sh.is_fully_replicated


def test_remat_layers_matches_non_remat_gradients(tmp_path):
    """cfg.remat (per-layer jax.checkpoint) must be a pure memory/FLOPs
    trade: losses and gradients identical to the stored-activation step.
    (Needed to train bert-large-class students on one 16G chip — the 335M
    student at the l0 recipe shape OOMs without it, TPU job j46.)"""
    ma, da, ta = make_args(output_dir=str(tmp_path))
    results = []
    for remat in (False, True):
        model = se.build_model(arch="tiny", remat=remat,
                               idf_path="assets/idf.npz")
        assert model.cfg.remat is remat
        trainer = Trainer(model, ma, da, ta, mesh=make_mesh(1))
        batch = make_batch(model)
        m = trainer.train_step(batch)
        results.append(
            (float(m["ranking_loss"]),
             jax.tree_util.tree_leaves(trainer.state.params))
        )
    (l0, p0), (l1, p1) = results
    assert l0 == pytest.approx(l1, rel=1e-6)
    for a, b in zip(p0, p1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=1e-7)


def test_grad_accum_matches_big_batch(tmp_path):
    """gradient_accumulation_steps=A over microbatches of b must reproduce
    the single big-batch (A*b) step exactly when the loss decomposes per
    sample (infonce without in-batch negatives, flops off, dropout off,
    fp32): HF semantics — microbatch losses averaged == big-batch mean.
    (VERDICT r3 item 8; HF TrainingArguments surface the reference
    inherits, /root/reference/scripts/args.py:6.)"""
    results = []
    for accum in (1, 4):
        import dataclasses

        model = se.build_model(arch="tiny", idf_path="assets/idf.npz",
                               seed=0, compute_dtype=jnp.float32)
        model.cfg = dataclasses.replace(
            model.cfg, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        )
        ma, da, ta = make_args(
            output_dir=str(tmp_path / f"a{accum}"),
            use_in_batch_negatives=False, flops_d_lambda=0.0,
            gradient_accumulation_steps=accum,
        )
        trainer = Trainer(model, ma, da, ta, mesh=make_mesh(1))
        batch = make_batch(model, B=8, G=2)
        m = trainer.train_step(batch)
        results.append(
            (float(m["ranking_loss"]), float(m["avg_doc_length"]),
             jax.tree_util.tree_leaves(
                 jax.device_get(trainer.state.params)))
        )
    (l0, adl0, p0), (l1, adl1, p1) = results
    assert l0 == pytest.approx(l1, rel=1e-5)
    assert adl0 == pytest.approx(adl1, rel=1e-5)  # metrics averaged
    for a, b in zip(p0, p1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_grad_accum_trains_and_validates(tiny_model, tmp_path):
    # with in-batch negatives + flops on, accumulation still trains (each
    # microbatch computes its OWN in-batch negatives/FLOPS, the documented
    # HF-parity semantics) and a non-divisible batch fails loudly
    ma, da, ta = make_args(output_dir=str(tmp_path),
                           gradient_accumulation_steps=2)
    trainer = Trainer(tiny_model, ma, da, ta, mesh=make_mesh(1))
    batch = make_batch(tiny_model, B=8, G=2)
    losses = [float(trainer.train_step(batch)["ranking_loss"])
              for _ in range(10)]
    assert losses[-1] < losses[0], losses
    assert int(trainer.state.step) == 10  # one optimizer step per call
    with pytest.raises(ValueError, match="not divisible"):
        trainer.train_step(make_batch(tiny_model, B=3, G=2))
