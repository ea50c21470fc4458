"""Teacher ensembles for knowledge distillation (kd-ensemble).

Parity with /root/reference/scripts/train/bi_encoder_wrapper.py:
  * sparse bi-encoder teacher: MLM max-pool log1p with special-token columns
    zeroed (:12-35);
  * dense bi-encoder teacher: CLS embedding, L2-normalized (:38-59);
  * precomputed ("remote") teacher: embeddings fetched by id from a store
    (:62-88) — here a local mmap store (train/embedding_store.py) instead of
    DynamoDB;
  * per-teacher min-max score normalization per query row, ensemble mean,
    x score_scale (:133-146).

TPU-first: teachers are frozen param pytrees whose forwards run *inside* the
same jitted train step as the student (stop_gradient'd), so teacher compute
shares the MXU pipeline and the batch sharding; no separate no_grad context
or device juggling is needed.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import bert
from ..models.bert import BertConfig
from ..models.tokenizer import WordPieceTokenizer
from ..ops.activations import sparse_activation


@dataclass
class Teacher:
    kind: str  # "sparse" | "dense" | "remote"
    cfg: Optional[BertConfig] = None
    params: Any = None  # frozen pytree for sparse/dense; None for remote
    tokenizer: Optional[WordPieceTokenizer] = None
    special_mask: Optional[np.ndarray] = None  # [V] bool, sparse teacher only
    model_id: Optional[str] = None


def sparse_teacher_rep(params, cfg: BertConfig, special_mask, input_ids, attention_mask):
    """MLM logits -> masked max-pool -> log1p(relu), special tokens zeroed."""
    logits = bert.apply(params, cfg, input_ids, attention_mask, deterministic=True)
    rep = sparse_activation(logits, attention_mask)[:, : cfg.vocab_size]
    return jnp.where(special_mask[None, :], 0.0, rep)


def dense_teacher_rep(params, cfg: BertConfig, input_ids, attention_mask):
    """CLS embedding, L2-normalized."""
    hidden = bert.encode_hidden(params, cfg, input_ids, attention_mask, deterministic=True)
    cls = hidden[:, 0, :].astype(jnp.float32)
    return cls / jnp.linalg.norm(cls, axis=-1, keepdims=True).clip(1e-12)


def teacher_rep(
    teacher: Teacher, features: Dict[str, jax.Array], params: Any = None
) -> jax.Array:
    """`params` overrides teacher.params: the train step passes the teacher
    pytrees through the jit boundary as arguments, so they are traced inputs
    (shardable, single HBM copy) rather than per-executable constants."""
    if params is None:
        params = teacher.params
    if teacher.kind == "sparse":
        return sparse_teacher_rep(
            params,
            teacher.cfg,
            jnp.asarray(teacher.special_mask),
            features["input_ids"],
            features["attention_mask"],
        )
    if teacher.kind == "dense":
        return dense_teacher_rep(
            params, teacher.cfg, features["input_ids"], features["attention_mask"]
        )
    if teacher.kind == "remote":
        # precomputed embeddings arrive in the batch (prefetched host-side)
        return features["embeddings"].astype(jnp.float32)
    raise KeyError(teacher.kind)


def minmax_normalize(score: jax.Array) -> jax.Array:
    """Per-query-row min-max normalization (bi_encoder_wrapper.py:133-137) —
    what makes heterogeneous teachers ensemble-able."""
    mx = jnp.max(score, axis=1, keepdims=True)
    mn = jnp.min(score, axis=1, keepdims=True)
    return (score - mn) / (mx - mn + 1e-6)


class TeacherEnsemble:
    """Configured ensemble; `get_scores` runs inside the jitted train step.

    Reference BiEncoderWrapper.get_scores_batch (bi_encoder_wrapper.py:117-146).
    """

    def __init__(
        self,
        teachers: List[Teacher],
        score_scale: float = 30.0,
        use_in_batch_negatives: bool = False,
    ):
        assert len(teachers) > 0
        self.teachers = teachers
        self.score_scale = score_scale
        self.use_in_batch_negatives = use_in_batch_negatives

    def get_scores(
        self,
        q_features_list: List[Dict[str, jax.Array]],
        d_features_list: List[Dict[str, jax.Array]],
        params_list: Optional[List[Any]] = None,
    ) -> jax.Array:
        assert len(q_features_list) == len(self.teachers)
        if params_list is None:
            params_list = [None] * len(self.teachers)
        scores = 0.0
        for teacher, qf, df, tp in zip(
            self.teachers, q_features_list, d_features_list, params_list
        ):
            q_rep = teacher_rep(teacher, qf, tp)
            d_rep = teacher_rep(teacher, df, tp)
            if self.use_in_batch_negatives:
                score = jnp.dot(q_rep, d_rep.T, preferred_element_type=jnp.float32)
            else:
                B = q_rep.shape[0]
                G = d_rep.shape[0] // B
                score = jnp.einsum(
                    "bgv,bv->bg",
                    d_rep.reshape(B, G, -1),
                    q_rep,
                    preferred_element_type=jnp.float32,
                )
            scores = scores + minmax_normalize(score)
        scores = scores / len(self.teachers)
        return jax.lax.stop_gradient(scores * self.score_scale)

    @property
    def frozen_params(self):
        """Pytree of all teacher params (pass through the jit boundary)."""
        return [t.params for t in self.teachers]


def build_teacher(kind: str, model_id: str, seed: int = 1) -> Teacher:
    """Construct one teacher from a local checkpoint dir or an arch preset.

    Offline-first: `model_id` may be (a) a directory in our/HF checkpoint
    layout, (b) an arch preset name ("mini", "base", ...) for random-init
    teachers (tests/benchmarks), or (c) "store:<path>" for precomputed
    embeddings.
    """
    import os

    if kind == "remote" or model_id.startswith("store:"):
        return Teacher(kind="remote", model_id=model_id)

    from ..models import hf_import
    from ..ops.activations import special_token_mask

    tokenizer = WordPieceTokenizer.from_pretrained(
        model_id if os.path.isdir(model_id) else None
    )
    if os.path.isdir(model_id):
        cfg, params, _ = hf_import.load_checkpoint(model_id)
    else:
        cfg = bert.config_from_preset(model_id, vocab_size=tokenizer.vocab_size)
        params = bert.init(jax.random.PRNGKey(seed), cfg)

    smask = None
    if kind == "sparse":
        smask = np.asarray(
            special_token_mask(tokenizer.special_token_ids, cfg.vocab_size)
        )
    return Teacher(
        kind=kind,
        cfg=cfg,
        params=params,
        tokenizer=tokenizer,
        special_mask=smask,
        model_id=model_id,
    )


def build_ensemble(kd_kwargs: Dict[str, Any], use_in_batch_negatives: bool) -> "TeacherEnsemble":
    """From the kd_ensemble_teacher_kwargs config dict
    (reference trainer.py:158-167; config_kd.yaml:18-22)."""
    types = kd_kwargs["types"]
    model_ids = kd_kwargs["model_ids"]
    assert len(types) == len(model_ids) and len(types) > 0
    teachers = [build_teacher(t, m, seed=10 + i) for i, (t, m) in enumerate(zip(types, model_ids))]
    return TeacherEnsemble(
        teachers,
        score_scale=kd_kwargs.get("score_scale", 30),
        use_in_batch_negatives=use_in_batch_negatives,
    )
