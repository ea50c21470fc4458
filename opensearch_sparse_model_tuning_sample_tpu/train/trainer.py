"""Training orchestration: one jitted, mesh-sharded train step + host loop.

Replaces the reference's HF-Trainer subclass
(/root/reference/scripts/train/trainer.py:52-218) with the idiomatic JAX
design:

  * the entire step — teacher forwards, student q/d forwards, FLOPS/L0
    regularizer with its quadratic lambda ramp, ranking losses, AdamW update —
    is ONE jitted function over a global batch whose leading dims are sharded
    over the mesh's `data` axis; XLA inserts the all-gathers the reference
    does by hand (gather_rep, utils.py:16-23) and the backward scatter makes
    each device contribute exactly its local-slice gradient, so the
    DP-vs-DDP xnum_processes loss rescale (trainer.py:139-141) disappears;
  * optimizer state is donated (no HBM copy per step);
  * the learnable IDF vector gets its own LR via optax.multi_transform
    (reference train_ir.py:85-101);
  * checkpoints export in the HF `checkpoint-{step}` layout for eval-loop
    parity (trainer.py:145-156) plus an orbax train-state for exact resume
    (which the reference cannot do).
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS, make_mesh
from ..models import hf_import, sparse_encoder as se
from ..ops import flops as flops_ops
from ..ops.losses import LossSpec, build_loss_specs
from .teachers import TeacherEnsemble

logger = logging.getLogger(__name__)


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array  # scalar int32
    loss_ma: jax.Array  # scalar f32: 0.99-decay ranking-loss moving average

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step, self.loss_ma), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


def linear_warmup_linear_decay(lr: float, warmup_steps: int, total_steps: int):
    """HF get_linear_schedule_with_warmup equivalent (train_ir.py:103-107)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.maximum(warmup_steps, 1)
        wu = step / warm
        decay = jnp.maximum(
            0.0, (total_steps - step) / jnp.maximum(total_steps - warmup_steps, 1)
        )
        return lr * jnp.where(step < warmup_steps, wu, decay)

    return schedule


def make_optimizer(model_args, data_args, training_args) -> optax.GradientTransformation:
    sched = linear_warmup_linear_decay(
        training_args.learning_rate, training_args.warmup_steps, training_args.max_steps
    )
    # torch AdamW defaults; weight decay on ALL params (the reference builds
    # AdamW over model.parameters() directly, train_ir.py:86-90)
    base = optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8,
                       weight_decay=training_args.weight_decay)

    if not model_args.idf_requires_grad:
        idf_tx = optax.set_to_zero()  # frozen (requires_grad=False parity)
    elif data_args.idf_lr is not None:
        idf_sched = linear_warmup_linear_decay(
            data_args.idf_lr, training_args.warmup_steps, training_args.max_steps
        )
        idf_tx = optax.adamw(idf_sched, b1=0.9, b2=0.999, eps=1e-8,
                             weight_decay=training_args.weight_decay)
    else:
        idf_tx = base

    def label_fn(params):
        return {"bert": jax.tree_util.tree_map(lambda _: "bert", params["bert"]),
                "idf_vector": "idf"}

    tx = optax.multi_transform({"bert": base, "idf": idf_tx}, label_fn)
    if training_args.max_grad_norm:
        clip = optax.clip_by_global_norm(training_args.max_grad_norm)
        if not model_args.idf_requires_grad:
            # a frozen param must not contribute to the clipping norm (torch
            # parity: requires_grad=False params have grad None); zero the
            # idf gradient BEFORE the global-norm clip, not only at update
            clip = optax.chain(
                optax.masked(
                    optax.set_to_zero(),
                    lambda params: {
                        "bert": jax.tree_util.tree_map(lambda _: False, params["bert"]),
                        "idf_vector": True,
                    },
                ),
                clip,
            )
        tx = optax.chain(clip, tx)
    return tx


def make_train_step(
    model: se.SparseEncoderModel,
    loss_specs: List[LossSpec],
    model_args,
    data_args,
    tx: optax.GradientTransformation,
    teacher_ensemble: Optional[TeacherEnsemble] = None,
    mesh=None,
    donate_state: bool = True,
    accum_steps: int = 1,
) -> Callable:
    """Build the jitted train step.

    Batch layout (all leading dims globally sized, sharded over `data`):
      q_input_ids/q_attention_mask   [B, Lq]
      d_input_ids/d_attention_mask   [B*G, Ld]
      scores (optional)              [B, G] teacher scores from the dataset
      teacher_q / teacher_d (opt)    per-teacher feature dicts (kd-ensemble)

    With `accum_steps` A > 1 every leaf instead carries a leading
    microbatch axis [A, ...] (sharded over `data` on axis 1): the step
    scans the A microbatches, averaging gradients before ONE optimizer
    update (HF gradient_accumulation_steps semantics — each microbatch
    computes its own loss, incl. in-batch negatives and the FLOPS
    statistic over the microbatch, exactly as the reference's HF Trainer
    would). Peak activation memory is bounded by one microbatch; the
    lambda ramp sees the optimizer step count, not microbatches.
    """
    cfg = model.cfg
    special_mask = jnp.asarray(model.special_mask)
    inf_free = model_args.inf_free
    use_l0 = model_args.use_l0
    prune_ratio = model_args.prune_ratio
    needs_teacher_scores = any(s.kind in ("kldiv", "marginmse") for s in loss_specs)

    def loss_fn(params, batch, step, rng, teacher_params):
        # ---- teacher scores (frozen forwards or dataset-provided) ----
        teacher_scores = batch.get("scores")
        if teacher_ensemble is not None:
            teacher_scores = teacher_ensemble.get_scores(
                batch["teacher_q"], batch["teacher_d"],
                params_list=teacher_params,
            )
        if needs_teacher_scores and teacher_scores is None:
            raise ValueError("kldiv/marginmse losses need teacher scores")

        # ---- student forwards ----
        rng_d, rng_q = jax.random.split(rng)
        d_rep = se.encode_doc(
            params, cfg, batch["d_input_ids"], batch["d_attention_mask"],
            use_l0=use_l0, prune_ratio=prune_ratio,
            deterministic=False, rng=rng_d,
        )
        if inf_free:
            q_rep = se.encode_query_inf_free(
                params, cfg, batch["q_input_ids"], special_mask
            )
        else:
            q_rep = se.encode_doc(
                params, cfg, batch["q_input_ids"], batch["q_attention_mask"],
                use_l0=use_l0, prune_ratio=prune_ratio,
                deterministic=False, rng=rng_q,
            )

        # ---- FLOPS/L0 regularizer with quadratic lambda ramp ----
        group_num = d_rep.shape[0] // q_rep.shape[0]
        d_flops = flops_ops.flops_value(
            d_rep, group_num, flops_threshold=data_args.flops_threshold
        )
        flops_loss = d_flops * flops_ops.get_lambda(
            step, data_args.flops_d_lambda, data_args.flops_d_T
        )
        if not inf_free and data_args.flops_q_lambda:
            q_flops = flops_ops.flops_value(q_rep)
            flops_loss = flops_loss + q_flops * flops_ops.get_lambda(
                step, data_args.flops_q_lambda, data_args.flops_q_T
            )

        # ---- ranking losses ----
        ranking_loss = 0.0
        for spec in loss_specs:
            ranking_loss = ranking_loss + spec(q_rep, d_rep, teacher_scores)

        loss = ranking_loss + flops_loss
        nonzero_mask = d_rep > 0
        nnz = jnp.sum(nonzero_mask)
        metrics = {
            "loss": loss,
            "ranking_loss": ranking_loss,
            "d_flops": d_flops,
            "flops_loss": flops_loss,
            "avg_doc_length": nnz / d_rep.shape[0],
            "nonzero_mean": jnp.sum(jnp.where(nonzero_mask, d_rep, 0.0))
            / jnp.maximum(nnz, 1),
            "nonzero_max": jnp.max(d_rep),
        }
        return loss, metrics

    def train_step(state: TrainState, batch, rng, teacher_params):
        # derive the per-step dropout rng on device from the base key + step
        # (no host-side split/transfer per step)
        rng = jax.random.fold_in(rng, state.step)
        if accum_steps <= 1:
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, state.step, rng, teacher_params
            )
        else:
            # microbatch scan: forward+backward per [A]-sliced microbatch,
            # gradients averaged, ONE update below. scan rematerializes per
            # iteration, so activations live for one microbatch at a time.
            def body(g_acc, xs):
                mb, i = xs
                (_, m), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, mb, state.step,
                    jax.random.fold_in(rng, i), teacher_params,
                )
                return jax.tree_util.tree_map(jnp.add, g_acc, g), m
            g_sum, m_stack = jax.lax.scan(
                body,
                jax.tree_util.tree_map(jnp.zeros_like, state.params),
                (batch, jnp.arange(accum_steps, dtype=jnp.int32)),
            )
            inv = 1.0 / accum_steps
            grads = jax.tree_util.tree_map(lambda g: g * inv, g_sum)
            metrics = {
                k: (jnp.max(v) if k == "nonzero_max" else jnp.mean(v))
                for k, v in m_stack.items()
            }
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # every-step moving average on device (reference trainer.py:120-122
        # updates it each step; keeping it in the carried state preserves that
        # observable without a per-step host sync)
        loss_ma = 0.99 * state.loss_ma + 0.01 * metrics["ranking_loss"]
        metrics["ranking_loss_ma"] = loss_ma
        return TrainState(new_params, new_opt, state.step + 1, loss_ma), metrics

    donate = (0,) if donate_state else ()
    # teacher params cross the jit boundary as a (replicated) ARGUMENT, not
    # as closure constants: constants are re-lowered per compiled executable
    # (one per seq-bucket combination) and sit outside donation/sharding
    # control. The same device pytree is passed on every call, so there is
    # no per-step transfer.
    t_params = (
        jax.tree_util.tree_map(jnp.asarray, teacher_ensemble.frozen_params)
        if teacher_ensemble is not None
        else ()
    )
    if mesh is None:
        jitted = jax.jit(train_step, donate_argnums=donate)
        return lambda state, batch, rng: jitted(state, batch, rng, t_params)

    # pin the layout: state replicated, batch sharded over `data`, rng +
    # teacher params replicated — a mis-placed input is resharded/rejected
    # here rather than silently replicated (sharding prefixes broadcast
    # over the pytrees). With accumulation the microbatch axis leads and
    # the batch dim (axis 1) shards.
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(
        mesh, P(None, DATA_AXIS) if accum_steps > 1 else P(DATA_AXIS)
    )
    jitted = jax.jit(
        train_step,
        in_shardings=(repl, shard, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=donate,
    )
    return lambda state, batch, rng: jitted(state, batch, rng, t_params)


class Trainer:
    """Host-side loop: data -> device, step, log, checkpoint.

    Mirrors the observable behavior of the reference SparseModelTrainer
    (moving-average ranking loss with 0.99 decay + periodic health stats,
    trainer.py:57,120-137; checkpoint-{step} saves, :145-156).
    """

    def __init__(
        self,
        model: se.SparseEncoderModel,
        model_args,
        data_args,
        training_args,
        loss_specs: Optional[List[LossSpec]] = None,
        teacher_ensemble: Optional[TeacherEnsemble] = None,
        mesh=None,
    ):
        self.model = model
        self.model_args = model_args
        self.data_args = data_args
        self.args = training_args
        self.loss_specs = loss_specs or build_loss_specs(data_args)
        self.teacher_ensemble = teacher_ensemble
        self.mesh = mesh if mesh is not None else make_mesh(training_args.dp_size)
        self.tx = make_optimizer(model_args, data_args, training_args)
        # own a copy: the jitted step donates the state, which would
        # invalidate the caller's (model's) param arrays otherwise
        init_params = jax.tree_util.tree_map(jnp.array, model.params)
        self.state = TrainState(
            params=init_params,
            opt_state=self.tx.init(model.params),
            step=jnp.asarray(0, jnp.int32),
            loss_ma=jnp.asarray(0.0, jnp.float32),
        )
        self.accum_steps = max(
            1, int(getattr(training_args, "gradient_accumulation_steps", 1))
        )
        self._step_fn = make_train_step(
            model, self.loss_specs, model_args, data_args, self.tx,
            teacher_ensemble=teacher_ensemble, mesh=self.mesh,
            donate_state=training_args.donate_state,
            accum_steps=self.accum_steps,
        )
        # rbg PRNG for dropout: ~20 ms/step cheaper than threefry on the
        # config_l0 shape (377M attention-probs dropout bits/step on v5e);
        # counter-based and fold_in-compatible like threefry
        self._rng = jax.random.key(training_args.seed, impl="rbg")

    # ------------------------------------------------------------------
    def _place(self, batch):
        shard = NamedSharding(
            self.mesh,
            P(None, DATA_AXIS) if self.accum_steps > 1 else P(DATA_AXIS),
        )
        if jax.process_count() > 1:
            # multi-process (torchrun-analog) run: this process's batch is
            # its LOCAL shard of the global batch; assemble the global array
            # without any cross-host data movement
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    shard, np.asarray(x)
                ),
                batch,
            )
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), shard), batch
        )

    def train_step(self, batch) -> Dict[str, float]:
        # torch host teachers (arbitrary HF architectures) run pre-jit on
        # their raw texts; their reps enter the step as plain arrays
        if self.teacher_ensemble is not None and self.teacher_ensemble.has_host:
            batch = self.teacher_ensemble.host_precompute(batch)
        if self.accum_steps > 1:
            # slice the loader's [A*b, ...] batch into A microbatches on the
            # host: doc rows are query-major, so a plain leading-dim split
            # keeps each query's group with it (collator layout)
            A = self.accum_steps

            def to_micro(x):
                x = np.asarray(x)
                if x.shape[0] % A:
                    raise ValueError(
                        f"batch leading dim {x.shape[0]} not divisible by "
                        f"gradient_accumulation_steps={A}"
                    )
                return x.reshape(A, x.shape[0] // A, *x.shape[1:])

            batch = jax.tree_util.tree_map(to_micro, batch)
        # the step fn folds the step count into this base key on device
        batch = self._place(batch)
        self.state, metrics = self._step_fn(self.state, batch, self._rng)
        return metrics

    def train(self, batch_iter, max_steps: Optional[int] = None):
        max_steps = max_steps or self.args.max_steps
        t0 = time.time()
        step = start_step = int(self.state.step)
        last_saved = -1
        profiling = False
        for batch in batch_iter:
            if step >= max_steps:
                break
            # jax.profiler trace of steps [2, 7) when profile_dir is set —
            # the tracing/profiling hook the reference lacks (SURVEY.md §5)
            if self.args.profile_dir and step == 2 and not profiling:
                jax.profiler.start_trace(self.args.profile_dir)
                profiling = True
            metrics = self.train_step(batch)
            if profiling and step >= 6:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                profiling = False
                logger.info("profiler trace written to %s", self.args.profile_dir)
            step += 1
            if step % self.args.logging_steps == 0 or step == 1:
                m = {k: float(v) for k, v in metrics.items()}
                dt = time.time() - t0
                logger.info(
                    "Step %d. ranking loss moving avg:%.5f, d_flops: %.4f, "
                    "flops_loss: %.5f avg doc length: %.1f nonzero mean/max: "
                    "%.4f/%.4f (%.2f steps/s)",
                    step, m["ranking_loss_ma"], m["d_flops"],
                    m["flops_loss"], m["avg_doc_length"], m["nonzero_mean"],
                    m["nonzero_max"], (step - start_step) / max(dt, 1e-9),
                )
            if (
                self.args.save_strategy == "steps"
                and self.args.save_steps
                and step % self.args.save_steps == 0
            ):
                self.save_checkpoint(step)
                last_saved = step
        if profiling:  # run ended inside the trace window: close the trace
            jax.profiler.stop_trace()
            logger.info("profiler trace written to %s", self.args.profile_dir)
        if self.args.save_strategy != "no" and last_saved != step:
            self.save_checkpoint(step)
        return self.state

    # ------------------------------------------------------------------
    def save_checkpoint(self, step: int):
        if jax.process_index() != 0:
            return  # main-process-only save (reference trainer.py:145-147)
        out = os.path.join(self.args.output_dir, f"checkpoint-{step}")
        self.model.params = jax.device_get(self.state.params)
        hf_import.save_checkpoint(self.model, out)
        logger.info("Saving model checkpoint to %s", out)

    def save_train_state(self, path: Optional[str] = None):
        """Full resumable state via orbax (optimizer + step), beyond what the
        reference can resume. Multi-process: EVERY rank must call this —
        orbax's save contains an internal cross-process barrier
        (sync_global_processes) and elects the writer itself; a rank-0-only
        guard here deadlocks the caller."""
        import orbax.checkpoint as ocp

        path = path or os.path.join(os.path.abspath(self.args.output_dir), "train_state")
        ckpt = ocp.StandardCheckpointer()
        ckpt.save(
            path,
            {
                "params": jax.device_get(self.state.params),
                "opt_state": jax.device_get(self.state.opt_state),
                "step": int(self.state.step),
                "loss_ma": float(self.state.loss_ma),
            },
            force=True,
        )
        ckpt.wait_until_finished()

    def restore_train_state(self, path: Optional[str] = None):
        import orbax.checkpoint as ocp

        path = path or os.path.join(os.path.abspath(self.args.output_dir), "train_state")
        ckpt = ocp.StandardCheckpointer()
        target = {
            "params": jax.device_get(self.state.params),
            "opt_state": jax.device_get(self.state.opt_state),
            "step": 0,
            "loss_ma": 0.0,
        }
        try:
            restored = ckpt.restore(path, target=target)
        except Exception:
            # train_state dirs saved before loss_ma existed lack that leaf;
            # restore the old tree shape and default the moving average
            target.pop("loss_ma")
            restored = ckpt.restore(path, target=target)
            restored["loss_ma"] = 0.0
        self.state = TrainState(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=jnp.asarray(restored["step"], jnp.int32),
            loss_ma=jnp.asarray(restored["loss_ma"], jnp.float32),
        )
