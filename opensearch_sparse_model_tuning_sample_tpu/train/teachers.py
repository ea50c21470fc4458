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
from ..models.tokenizer import WordPieceTokenizer, load_tokenizer
from ..ops.activations import pooled_activation


@dataclass
class Teacher:
    kind: str  # "sparse" | "dense" | "remote" | "hf" (torch host)
    cfg: Optional[BertConfig] = None
    params: Any = None  # frozen pytree for sparse/dense; None for remote/hf
    tokenizer: Optional[WordPieceTokenizer] = None
    special_mask: Optional[np.ndarray] = None  # [V] bool, sparse teacher only
    model_id: Optional[str] = None
    # dense pooling: "cls" (reference DenseModel.get_dense_embedding,
    # bi_encoder_wrapper.py:43-48) or "mean" (sentence-transformers masked
    # mean — many dense bi-encoder checkpoints need it)
    pooling: str = "cls"
    host_model: Any = None  # torch module for kind="hf" (runs pre-jit on CPU)
    host_kind: str = "dense"  # what the host model computes: dense|sparse


def sparse_teacher_rep(params, cfg: BertConfig, special_mask, input_ids, attention_mask):
    """MLM masked max-pool -> log1p(relu), special tokens zeroed.

    Uses the chunked head (bert.mlm_maxpool) like the student path: the
    naive bert.apply would materialize [B, L, V] fp32 logits inside the
    train step (~1 GB per base-size teacher forward at B*G=32, L=256) for
    a tensor that is immediately max-reduced; the scan keeps peak HBM at
    [B, chunk, V]. Math is identical (masked x0 max-pool) and the teacher
    is stop_gradient'd, so no backward residuals differ."""
    hidden = bert.encode_hidden(
        params, cfg, input_ids, attention_mask, deterministic=True
    )
    pooled = bert.mlm_maxpool(params, cfg, hidden, attention_mask, chunk=256)
    rep = pooled_activation(pooled)[:, : cfg.vocab_size]
    return jnp.where(special_mask[None, :], 0.0, rep)


def dense_teacher_rep(params, cfg: BertConfig, input_ids, attention_mask,
                      pooling: str = "cls"):
    """Pooled sentence embedding, L2-normalized. pooling="cls" is the
    reference semantics (bi_encoder_wrapper.py:43-48); "mean" is the masked
    token mean (sentence-transformers convention)."""
    hidden = bert.encode_hidden(params, cfg, input_ids, attention_mask, deterministic=True)
    if pooling == "mean":
        m = attention_mask[:, :, None].astype(jnp.float32)
        pooled = jnp.sum(hidden.astype(jnp.float32) * m, axis=1) / jnp.clip(
            jnp.sum(m, axis=1), 1e-9, None
        )
    elif pooling == "cls":
        pooled = hidden[:, 0, :].astype(jnp.float32)
    else:
        raise ValueError(f"unknown pooling {pooling!r} (use 'cls' or 'mean')")
    return pooled / jnp.linalg.norm(pooled, axis=-1, keepdims=True).clip(1e-12)


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
            params, teacher.cfg, features["input_ids"],
            features["attention_mask"], pooling=teacher.pooling,
        )
    if teacher.kind in ("remote", "hf"):
        # precomputed embeddings arrive in the batch (remote: prefetched from
        # the store; hf: computed pre-jit by the torch host model)
        return features["embeddings"].astype(jnp.float32)
    raise KeyError(teacher.kind)


class HostTeacherModel:
    """Torch-CPU host for teacher checkpoints whose architecture the native
    JAX importer cannot map (the reference hosts arbitrary architectures via
    AutoModel(ForMaskedLM), bi_encoder_wrapper.py:19-20, 53-55 — e.g.
    config_kd.yaml's gte-large-en-v1.5). The forward runs on host per batch,
    BEFORE the jitted step; only the [B, H]/[B, V] rep crosses to the TPU.

    Offline-first: loads from a local checkpoint dir with local_files_only.
    trust_remote_code is intentionally False (zero-egress environment; remote
    modeling code cannot be fetched anyway) — architectures shipped inside
    transformers all work."""

    def __init__(self, model_dir: str, kind: str = "dense",
                 pooling: str = "cls", max_length: int = 512):
        import torch
        import transformers

        self._torch = torch
        self.kind = kind
        self.pooling = pooling
        self.max_length = max_length
        self.tokenizer = transformers.AutoTokenizer.from_pretrained(
            model_dir, local_files_only=True
        )
        if kind == "sparse":
            self.model = transformers.AutoModelForMaskedLM.from_pretrained(
                model_dir, local_files_only=True
            )
            self.special_ids = sorted(
                {
                    self.tokenizer.convert_tokens_to_ids(t)
                    for t in self.tokenizer.special_tokens_map.values()
                    if isinstance(t, str)
                }
            )
        else:
            self.model = transformers.AutoModel.from_pretrained(
                model_dir, local_files_only=True
            )
        self.model.eval()

    def encode(self, texts) -> np.ndarray:
        t = self._torch
        with t.no_grad():
            f = self.tokenizer(
                list(texts), padding=True, truncation=True,
                max_length=self.max_length, return_tensors="pt",
            )
            out = self.model(**f)
            if self.kind == "sparse":
                # reference BiSparseModel.forward (bi_encoder_wrapper.py:28-35)
                logits = out[0]
                values = (logits * f["attention_mask"].unsqueeze(-1)).max(dim=1).values
                values = t.log1p(t.relu(values))
                values[:, self.special_ids] = 0
                return values.float().numpy()
            # reference DenseModel.get_dense_embedding (:43-48) + mean option
            hidden = out[0]
            if self.pooling == "mean":
                m = f["attention_mask"].unsqueeze(-1).float()
                pooled = (hidden * m).sum(dim=1) / m.sum(dim=1).clamp(min=1e-9)
            else:
                pooled = hidden[:, 0]
            pooled = t.nn.functional.normalize(pooled, p=2, dim=1)
            return pooled.float().numpy()


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

    @property
    def has_host(self) -> bool:
        return any(t.kind == "hf" for t in self.teachers)

    def host_precompute(self, batch: Dict) -> Dict:
        """Run torch host teachers on the raw texts the collator attached,
        replacing their {"texts"} features with {"embeddings"} (the same
        shape contract as remote teachers). Called pre-jit by the trainer."""
        if not self.has_host:
            return batch
        out = dict(batch)
        for key in ("teacher_q", "teacher_d"):
            feats = list(batch.get(key) or [])
            for i, t in enumerate(self.teachers):
                if t.kind == "hf" and i < len(feats) and "texts" in feats[i]:
                    feats[i] = {"embeddings": t.host_model.encode(feats[i]["texts"])}
            out[key] = feats
        return out


def _build_host_teacher(kind: str, model_id: str, pooling: str,
                        max_length: int) -> Teacher:
    import logging

    host_kind = "sparse" if kind == "sparse" else "dense"
    host = HostTeacherModel(model_id, kind=host_kind, pooling=pooling,
                            max_length=max_length)
    logging.getLogger(__name__).info(
        "teacher %s hosted on torch CPU (%s, pooling=%s)",
        model_id, host_kind, pooling,
    )
    return Teacher(kind="hf", model_id=model_id, pooling=pooling,
                   host_model=host, host_kind=host_kind)


def build_teacher(kind: str, model_id: str, seed: int = 1,
                  pooling: str = "cls", max_length: int = 512) -> Teacher:
    """Construct one teacher from a local checkpoint dir or an arch preset.

    Offline-first: `model_id` may be (a) a directory in our/HF checkpoint
    layout, (b) an arch preset name ("mini", "base", ...) for random-init
    teachers (tests/benchmarks), or (c) "store:<path>" for precomputed
    embeddings.

    Architecture resolution for checkpoint dirs (reference parity: the
    reference's AutoModel path accepts ANY architecture,
    bi_encoder_wrapper.py:19-20, 53-55):
      1. BERT-family layouts import natively (JAX forward inside the jitted
         step) — any hidden size/eps/act, tied/untied decoder, no-MLM-head
         dense dumps, cls or mean pooling.
      2. kind="hf", or a non-BERT architecture under kind sparse/dense,
         loads through transformers on host CPU (HostTeacherModel); its reps
         enter the step as precomputed embeddings.
    """
    import os

    if kind == "remote" or model_id.startswith("store:"):
        return Teacher(kind="remote", model_id=model_id)
    if kind == "hf":
        return _build_host_teacher("dense", model_id, pooling, max_length)

    from ..models import hf_import
    from ..ops.activations import special_token_mask

    if os.path.isdir(model_id):
        # FileNotFoundError / ValueError cover tokenizer layouts we don't
        # host natively (e.g. an exotic tokenizer.json): the reference's
        # AutoModel/AutoTokenizer path accepts any architecture, so such
        # dirs must still work via the torch host fallback rather than
        # crash. Both causes stay visible in the combined error below.
        try:
            cfg, params, _ = hf_import.load_checkpoint(model_id)
            tokenizer = load_tokenizer(model_id)
        except (
            hf_import.UnsupportedArchitecture, FileNotFoundError, ValueError
        ) as e:
            try:
                return _build_host_teacher(kind, model_id, pooling, max_length)
            except Exception as host_err:
                raise ValueError(
                    f"teacher {model_id!r} loads neither natively "
                    f"({e}) nor via the torch host path ({host_err})"
                ) from e
    else:
        tokenizer = WordPieceTokenizer.from_pretrained(None)
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
        pooling=pooling,
    )


def build_ensemble(
    kd_kwargs: Dict[str, Any],
    use_in_batch_negatives: bool,
    max_length: int = 512,
) -> "TeacherEnsemble":
    """From the kd_ensemble_teacher_kwargs config dict
    (reference trainer.py:158-167; config_kd.yaml:18-22). TPU extension:
    an optional parallel `pooling` list selects cls/mean per dense teacher."""
    types = kd_kwargs["types"]
    model_ids = kd_kwargs["model_ids"]
    poolings = kd_kwargs.get("pooling") or ["cls"] * len(types)
    assert len(types) == len(model_ids) and len(types) > 0
    assert len(poolings) == len(types), "pooling list must parallel types"
    teachers = [
        build_teacher(t, m, seed=10 + i, pooling=p, max_length=max_length)
        for i, (t, m, p) in enumerate(zip(types, model_ids, poolings))
    ]
    return TeacherEnsemble(
        teachers,
        score_scale=kd_kwargs.get("score_scale", 30),
        use_in_batch_negatives=use_in_batch_negatives,
    )
