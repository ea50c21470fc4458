"""Sparse encoder: BERT-MLM backbone -> vocab-space sparse representations.

Functional equivalent of the reference `SparseModel` / `SparseEncoder` /
`SparsePostProcessor` (/root/reference/scripts/model/sparse_encoders.py:42-181),
re-designed TPU-first:

  * params are one pytree {"bert": ..., "idf_vector": [V]} so the whole model
    (incl. the learnable IDF vector, reference :86-95) differentiates and
    shards as a unit;
  * `encode_doc` / `encode_query_inf_free` are pure functions jitted inside
    the train step — no nn.Module state;
  * batch encoding for ingest/search jits once per (batch, seq-bucket) shape
    and accumulates the FLOPS count statistic on device.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, replace as dc_replace
from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import bert
from .bert import BertConfig
from .tokenizer import WordPieceTokenizer, load_idf_weights, load_tokenizer
from ..ops.activations import (
    activation_count,
    inf_free_activation,
    pooled_activation,
    special_token_mask,
)
from ..utils.shapes import next_pow2  # noqa: F401 — also a public re-export


@dataclass
class SparseEncoderModel:
    """Bundle of config + params + tokenizer (host-side convenience object).

    The math lives in module-level pure functions; this class only carries
    static metadata into them.
    """

    cfg: BertConfig
    params: Dict[str, Any]  # {"bert": pytree, "idf_vector": [V] f32}
    tokenizer: WordPieceTokenizer
    use_l0: bool = False
    prune_ratio: Optional[float] = None
    idf_requires_grad: bool = False
    _special_mask: Any = None

    def __post_init__(self):
        if self._special_mask is None:
            self._special_mask = np.asarray(
                special_token_mask(self.tokenizer.special_token_ids, self.cfg.vocab_size)
            )

    @property
    def vocab_size(self) -> int:
        return self.cfg.vocab_size

    @property
    def special_mask(self) -> np.ndarray:
        return self._special_mask


# ---------------------------------------------------------------------------
# Pure encode functions (used inside the jitted train/eval steps)
# ---------------------------------------------------------------------------


def encode_doc(
    params: Dict[str, Any],
    cfg: BertConfig,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    use_l0: bool = False,
    prune_ratio: Optional[float] = None,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    head_chunk: int = 256,
) -> jax.Array:
    """Full forward: MLM logits -> masked max-pool -> log1p(relu) [-> log1p]
    [-> prune]. Output [B, vocab_size] fp32 (padded vocab columns dropped).

    Reference `_encode` (sparse_encoders.py:107-119). TPU-first: the head
    runs chunked over the sequence (bert.mlm_maxpool) so the [B, L, V]
    logits tensor is never materialized in HBM.
    """
    hidden = bert.encode_hidden(
        params["bert"], cfg, input_ids, attention_mask,
        deterministic=deterministic, rng=rng,
    )
    pooled = bert.mlm_maxpool(
        params["bert"], cfg, hidden, attention_mask, chunk=head_chunk
    )
    rep = pooled_activation(pooled, use_l0=use_l0, prune_ratio=prune_ratio)
    return rep[:, : cfg.vocab_size]


def encode_query_inf_free(
    params: Dict[str, Any],
    cfg: BertConfig,
    input_ids: jax.Array,
    special_mask: jax.Array,
) -> jax.Array:
    """Inference-free query encoding (reference `_encode_inf_free`,
    sparse_encoders.py:121-127): no transformer forward at all."""
    return inf_free_activation(
        input_ids, params["idf_vector"], special_mask, cfg.vocab_size
    )


def encode(
    params,
    cfg,
    input_ids,
    attention_mask,
    special_mask,
    inf_free: bool,
    use_l0: bool = False,
    prune_ratio: Optional[float] = None,
    deterministic: bool = True,
    rng=None,
):
    """Dispatch mirroring reference `SparseModel.forward` (:100-105).
    `inf_free` is a Python static — two jitted variants, no lax.cond."""
    if inf_free:
        return encode_query_inf_free(params, cfg, input_ids, special_mask)
    return encode_doc(
        params, cfg, input_ids, attention_mask, use_l0, prune_ratio,
        deterministic, rng,
    )


# ---------------------------------------------------------------------------
# Host-side batch encoder (ingest / search path)
# ---------------------------------------------------------------------------


def sparse_embedding_to_query(
    token_weight_map: Dict[str, float],
    field_name: str = "text_sparse",
    query_prune: float = 0,
) -> Dict:
    """OpenSearch `neural_sparse` query-body builder — compatibility shim for
    users migrating from the reference (sparse_encoders.py:184-194) who still
    hit an external OpenSearch cluster; the native path is
    `SparseIndex.search_tokens`."""
    if query_prune > 0:
        thresh = max(token_weight_map.values()) * query_prune
        token_weight_map = {
            t: w for t, w in token_weight_map.items() if w > thresh
        }
    return {"neural_sparse": {field_name: {"query_tokens": token_weight_map}}}


def sparse_to_token_weight_dicts(
    reps: np.ndarray, tokenizer: WordPieceTokenizer
) -> List[Dict[str, float]]:
    """Dense [B, V] -> list of {token: weight} maps (nonzero entries only).

    Equivalent of reference SparsePostProcessor (sparse_encoders.py:130-150)
    without its sentinel-at-index-0 trick: plain per-row nonzero extraction.
    """
    out = []
    for row in reps:
        (idx,) = np.nonzero(row)
        out.append({tokenizer.convert_id_to_token(i): float(row[i]) for i in idx})
    return out


class BatchEncoder:
    """Tokenize -> jitted forward -> sparse reps; accumulates per-token
    activation counts for the FLOPS statistic.

    Reference `SparseEncoder` (sparse_encoders.py:153-181). TPU-first: the
    forward jits once per sequence bucket; counts accumulate on device and
    only transfer at `count()`.
    """

    def __init__(
        self,
        model: SparseEncoderModel,
        max_length: int = 512,
        seq_buckets: Optional[List[int]] = None,
        do_count: bool = True,
    ):
        self.model = model
        self.max_length = max_length
        self.seq_buckets = sorted(
            b for b in (seq_buckets or [64, 128, 256, 512]) if b <= max_length
        ) or [max_length]
        if self.seq_buckets[-1] < max_length:
            self.seq_buckets.append(max_length)
        self.do_count = do_count
        self.reset_count()
        self._special_mask_dev = jnp.asarray(model.special_mask)

        cfg = model.cfg
        self._doc_fwd = jax.jit(
            partial(
                encode_doc, cfg=cfg, use_l0=model.use_l0, prune_ratio=model.prune_ratio
            )
        )
        self._q_fwd = jax.jit(partial(encode_query_inf_free, cfg=cfg))

        # ingest fast path: forward + on-device top-k sparsification. Avoids
        # shipping dense [B, V] reps to the host (the transfer, not the TPU,
        # bounds ingest throughput) and replaces the host-side per-doc
        # nonzero/argsort with one lax.top_k.
        def _doc_fwd_topk(params, input_ids, attention_mask, k):
            rep = encode_doc(
                params, cfg, input_ids, attention_mask,
                use_l0=model.use_l0, prune_ratio=model.prune_ratio,
            )
            # count the FULL rep's activations (reference SparseEncoder
            # counts every rep>0 entry, sparse_encoders.py:178-179) — the
            # top-k truncation below is an index storage decision and must
            # not change the FLOPS/d_length statistic
            count = (rep > 0).sum(axis=0).astype(jnp.int32)
            vals, idx = jax.lax.top_k(rep, k)
            active = vals > 0
            vals = jnp.where(active, vals, 0.0)
            idx = jnp.where(active, idx, 0).astype(jnp.int32)
            return idx, vals, count

        self._doc_fwd_topk = jax.jit(_doc_fwd_topk, static_argnames=("k",))

        # chunk path: MANY batches in one dispatch (lax.map over the stacked
        # [nb, rows, L] batch axis) with ids+mask as ONE packed upload and
        # the activation count fused in. A per-batch encode loop pays ~5
        # host RPCs per batch (2 uploads, forward, count, accumulate) at
        # ~30 ms each over a tunnelled runtime — the chunk path pays 2 for
        # the whole chunk.
        def _chunk_fwd(params, packed, special_mask, n_valid, inf_free, nb):
            L = packed.shape[-1]
            ids = packed[0].reshape(nb, -1, L)
            mask = packed[1].reshape(nb, -1, L)

            def one(args):
                i, m = args
                if inf_free:
                    return encode_query_inf_free(
                        params=params, cfg=cfg, input_ids=i,
                        special_mask=special_mask,
                    )
                return encode_doc(
                    params, cfg, i, m,
                    use_l0=model.use_l0, prune_ratio=model.prune_ratio,
                )

            reps = jax.lax.map(one, (ids, mask))  # [nb, rows, V]
            reps = reps.reshape(-1, reps.shape[-1])
            valid = (jnp.arange(reps.shape[0]) < n_valid)[:, None]
            count = jnp.sum((reps > 0) & valid, axis=0).astype(jnp.int32)
            return reps, count

        self._chunk_fwd = jax.jit(
            _chunk_fwd, static_argnames=("inf_free", "nb")
        )

        # ingest chunk path: MANY batches in one dispatch, each batch
        # forward + on-device top-k, counts fused and row-validity-masked.
        # Cuts the per-batch H2D uploads + dispatch RPCs of the async
        # per-batch path to one per chunk (the windowed resolve already
        # amortized the D2H side).
        def _chunk_fwd_topk(params, packed, n_valid, k, nb):
            L = packed.shape[-1]
            ids = packed[0].reshape(nb, -1, L)
            mask = packed[1].reshape(nb, -1, L)
            rows = ids.shape[1]

            def one(args):
                i, m, b = args
                rep = encode_doc(
                    params, cfg, i, m,
                    use_l0=model.use_l0, prune_ratio=model.prune_ratio,
                )
                valid = ((b * rows + jnp.arange(rows)) < n_valid)[:, None]
                count = jnp.sum((rep > 0) & valid, axis=0).astype(jnp.int32)
                vals, idx = jax.lax.top_k(rep, k)
                active = vals > 0
                vals = jnp.where(active, vals, 0.0)
                idx = jnp.where(active, idx, 0).astype(jnp.int32)
                return idx, vals, count

            idxs, valss, counts = jax.lax.map(
                one, (ids, mask, jnp.arange(nb, dtype=jnp.int32))
            )
            return (
                idxs.reshape(-1, idxs.shape[-1]),
                valss.reshape(-1, valss.shape[-1]),
                jnp.sum(counts, axis=0),
            )

        self._chunk_fwd_topk = jax.jit(
            _chunk_fwd_topk, static_argnames=("k", "nb")
        )

    def _pack_chunk(self, texts: List[str], rows: int):
        """Tokenize a chunk, pad its batch count up to a power of two, and
        pack ids+mask into ONE [2, nb*rows, L] upload. Returns
        (packed device array, n_valid, nb_pow2). Shared by the chunked
        encode paths so the pad/pack logic has exactly one definition."""
        feats = self.model.tokenizer.encode_bucketed(
            texts, self.max_length, self.seq_buckets
        )
        ids, mask = feats["input_ids"], feats["attention_mask"]
        n = ids.shape[0]
        nb_pow2 = next_pow2(-(-n // rows))
        pad = nb_pow2 * rows - n
        if pad:
            ids = np.concatenate([ids, np.zeros((pad, ids.shape[1]), ids.dtype)])
            mask = np.concatenate(
                [mask, np.zeros((pad, mask.shape[1]), mask.dtype)]
            )
        return jnp.asarray(np.stack([ids, mask])), n, nb_pow2

    def encode_chunk_device(
        self, texts: List[str], inf_free: bool = False, rows: int = 256
    ):
        """Encode a large chunk of texts with two host round trips total.

        Returns (reps [nb*rows, V] device array, n_valid): rows beyond
        n_valid are padding (zero-id encodes) the caller must ignore. The
        batch count pads up to a power of two so tail chunks reuse a
        bounded set of compiled shapes."""
        packed, n, nb_pow2 = self._pack_chunk(texts, rows)
        reps, count = self._chunk_fwd(
            self.model.params, packed, self._special_mask_dev, n,
            inf_free=inf_free, nb=nb_pow2,
        )
        if self.do_count:
            self._accum_count(count)
            self._n_encoded += n
        return reps, n

    def reset_count(self):
        self.count_tensor = np.zeros((self.model.vocab_size,), dtype=np.int64)
        self._n_encoded = 0

    # activation counts accumulate ON DEVICE (a pure async add per batch)
    # and flush to the host only when read: the per-batch
    # np.asarray(activation_count) otherwise costs a blocking ~30 ms sync
    # per encode call over the tunnelled runtime. int32 is safe: per-token
    # counts are bounded by the corpus size (« 2^31).
    @property
    def count_tensor(self) -> np.ndarray:
        if self._count_dev is not None:
            self._count_host = self._count_host + np.asarray(
                self._count_dev, dtype=np.int64
            )
            self._count_dev = None
        return self._count_host

    @count_tensor.setter
    def count_tensor(self, value):
        self._count_host = np.asarray(value, dtype=np.int64)
        self._count_dev = None

    def _accum_count(self, count_dev):
        self._count_dev = (
            count_dev if self._count_dev is None else self._count_dev + count_dev
        )

    def encode_batch(self, texts: List[str], inf_free: bool = False) -> np.ndarray:
        return np.asarray(self.encode_batch_device(texts, inf_free=inf_free))

    def encode_batch_device(self, texts: List[str], inf_free: bool = False):
        """Like encode_batch but returns the device array (no D2H transfer —
        feed straight into the index's search path)."""
        feats = self.model.tokenizer.encode_bucketed(
            texts, self.max_length, self.seq_buckets
        )
        ids = jnp.asarray(feats["input_ids"])
        mask = jnp.asarray(feats["attention_mask"])
        if inf_free:
            reps = self._q_fwd(
                params=self.model.params, input_ids=ids,
                special_mask=self._special_mask_dev,
            )
        else:
            reps = self._doc_fwd(
                params=self.model.params, input_ids=ids, attention_mask=mask
            )
        if self.do_count:
            self._accum_count(activation_count(reps))
            self._n_encoded += len(texts)
        return reps

    def encode_chunk_sparse_async(
        self, texts: List[str], l_max: int = 256, rows: int = 256
    ):
        """Dispatch a CHUNK of texts through the ingest fast path as ONE
        device call (one packed ids+mask upload, lax.map over `rows`-sized
        batches, top-k + validity-masked counts fused). Returns
        ((idx, vals, count) device arrays, n_valid); resolve with
        `resolve_chunk_sparse`. The chunk pads its batch count to a power of
        two so tail chunks reuse a bounded set of compiled shapes; note the
        whole chunk shares ONE seq bucket (the longest doc in the chunk
        decides), where the per-batch path buckets every `rows` docs."""
        packed, n, nb_pow2 = self._pack_chunk(texts, rows)
        handle = self._chunk_fwd_topk(
            self.model.params, packed, n,
            k=min(l_max, self.model.vocab_size), nb=nb_pow2,
        )
        return handle, n

    def resolve_chunk_sparse(self, handle, n_valid: int):
        """Fetch a chunk handle's (idx, vals) for its valid rows and fold the
        chunk's activation count into the device accumulator."""
        idx, vals, count = handle
        if self.do_count:
            self._accum_count(count)
            self._n_encoded += n_valid
        return np.asarray(idx)[:n_valid], np.asarray(vals)[:n_valid]

    def encode_batch_sparse_async(self, texts: List[str], l_max: int = 256):
        """Dispatch the ingest fast path without blocking: returns device
        arrays (idx, vals, count). Resolve with `resolve_sparse`. Lets the
        caller pipeline device compute against host-side index building."""
        feats = self.model.tokenizer.encode_bucketed(
            texts, self.max_length, self.seq_buckets
        )
        return self._doc_fwd_topk(
            self.model.params,
            jnp.asarray(feats["input_ids"]),
            jnp.asarray(feats["attention_mask"]),
            k=min(l_max, self.model.vocab_size),
        )

    def resolve_sparse(self, pending, n_texts: int):
        idx, vals, count = pending
        if self.do_count:
            self._accum_count(count)
            self._n_encoded += n_texts
        return np.asarray(idx), np.asarray(vals)

    def resolve_sparse_many(self, pendings, n_texts_list):
        """Resolve a WINDOW of async handles with one stacked host fetch per
        tensor kind (3 fetches total instead of 3 per handle). Per-fetch sync
        latency (~30 ms over a tunnelled runtime) otherwise dominates the
        mini encoder's ~24 ms/batch device time. Returns [(idx, vals), ...]
        in handle order."""
        if not pendings:
            return []
        if len(pendings) == 1:
            return [self.resolve_sparse(pendings[0], n_texts_list[0])]
        rows = [p[0].shape[0] for p in pendings]
        idx_all = np.asarray(jnp.concatenate([p[0] for p in pendings]))
        val_all = np.asarray(jnp.concatenate([p[1] for p in pendings]))
        if self.do_count:
            # stays in the device int dtype; window sums are far below
            # int32 range (<= window * batch docs per token)
            self._accum_count(jnp.sum(jnp.stack([p[2] for p in pendings]), axis=0))
            self._n_encoded += int(sum(n_texts_list))
        out = []
        off = 0
        for r in rows:
            out.append((idx_all[off : off + r], val_all[off : off + r]))
            off += r
        return out

    def encode_batch_sparse(self, texts: List[str], l_max: int = 256):
        """Ingest fast path: (token_idx [B, l_max], weights [B, l_max]) via
        on-device top-k; only ~l_max*8 bytes/doc cross the host boundary."""
        return self.resolve_sparse(
            self.encode_batch_sparse_async(texts, l_max), len(texts)
        )

    def encode(self, texts: List[str], inf_free: bool = False) -> List[Dict[str, float]]:
        reps = self.encode_batch(texts, inf_free=inf_free)
        return sparse_to_token_weight_dicts(reps, self.model.tokenizer)


def get_batch_encoder(
    model: SparseEncoderModel,
    max_length: int = 512,
    seq_buckets: Optional[List[int]] = None,
    do_count: bool = True,
    scope=None,
) -> BatchEncoder:
    """Memoized BatchEncoder per (model, shape config).

    Constructing a BatchEncoder builds fresh `jax.jit` wrappers, and every
    call through a fresh wrapper RE-TRACES the forward even when the XLA
    executable cache hits — measured 1.4 s per 512-query chunk vs 0.03 s
    through a reused encoder. Call sites that run once per dataset
    (eval search/ingest, mining) must reuse through this factory. Count
    state resets on reuse, matching a fresh encoder.

    `scope` discriminates callers that must NOT share count state within
    one process — e.g. in-process multi-rank harnesses pass (rank,
    world_size) so each simulated rank counts only its own shard."""
    key = (max_length, tuple(seq_buckets or ()), do_count, scope)
    cache = getattr(model, "_encoder_cache", None)
    if cache is None:
        cache = model._encoder_cache = {}
    enc = cache.get(key)
    if enc is None:
        enc = cache[key] = BatchEncoder(
            model, max_length=max_length, seq_buckets=seq_buckets,
            do_count=do_count,
        )
    else:
        enc.reset_count()
    return enc


# ---------------------------------------------------------------------------
# Construction
# ---------------------------------------------------------------------------


def build_model(
    model_name_or_path: Optional[str] = None,
    arch: Optional[str] = None,
    tokenizer_name: Optional[str] = None,
    idf_path: Optional[str] = None,
    idf_requires_grad: bool = False,
    prune_ratio: Optional[float] = None,
    preprocess_func: Optional[str] = None,
    use_l0: bool = False,
    inf_free: bool = True,
    seed: int = 0,
    param_dtype=jnp.float32,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
) -> SparseEncoderModel:
    """Factory mirroring reference `get_model` (utils.py:50-68).

    Resolution order for weights:
      1. local checkpoint dir (our orbax/safetensors layout or HF layout)
      2. random init from an `arch` preset (offline-first default: "mini")
    """
    from . import hf_import

    tokenizer = load_tokenizer(
        tokenizer_name or model_name_or_path, preprocess_func=preprocess_func
    )
    tokenizer.try_attach_native()  # C++ fast path for bulk ingest/search

    ckpt_dir = model_name_or_path if model_name_or_path and os.path.isdir(model_name_or_path) else None
    if ckpt_dir:
        cfg, bert_params, loaded_idf = hf_import.load_checkpoint(
            ckpt_dir, param_dtype=param_dtype, compute_dtype=compute_dtype
        )
    else:
        cfg = bert.config_from_preset(
            arch or "mini",
            vocab_size=tokenizer.vocab_size,
            param_dtype=param_dtype,
            compute_dtype=compute_dtype,
        )
        bert_params = bert.init(jax.random.PRNGKey(seed), cfg)
        loaded_idf = None
    # training-time knob, not a checkpoint property: applies to loaded
    # checkpoints too (see bert.BertConfig.remat)
    if cfg.remat != remat:
        cfg = dc_replace(cfg, remat=remat)

    if loaded_idf is not None and idf_path is None:
        idf = loaded_idf
    else:
        idf = load_idf_weights(
            idf_path if (inf_free and idf_path) else None, tokenizer
        )

    # vocab reconciliation (reference TokenizerWithProcessing resets its
    # vocab size when the backbone embedding table differs,
    # sparse_encoders.py:61-84): the checkpoint's vocab wins; idf is
    # truncated / zero-padded to it so special_mask and the inf-free path
    # stay correctly sized.
    idf = np.asarray(idf, dtype=np.float32)
    if idf.shape[0] != cfg.vocab_size:
        import logging

        logging.getLogger(__name__).warning(
            "tokenizer vocab (%d) != model vocab (%d); resizing idf to the "
            "model's (reference sparse_encoders.py:61-84)",
            idf.shape[0], cfg.vocab_size,
        )
        resized = np.zeros((cfg.vocab_size,), np.float32)
        m = min(idf.shape[0], cfg.vocab_size)
        resized[:m] = idf[:m]
        idf = resized

    params = {"bert": bert_params, "idf_vector": jnp.asarray(idf, dtype=jnp.float32)}
    return SparseEncoderModel(
        cfg=cfg,
        params=params,
        tokenizer=tokenizer,
        use_l0=use_l0,
        prune_ratio=prune_ratio,
        idf_requires_grad=idf_requires_grad,
    )


def from_model_args(model_args, seed: int = 0) -> SparseEncoderModel:
    return build_model(
        model_name_or_path=model_args.model_name_or_path,
        arch=getattr(model_args, "arch", None),
        tokenizer_name=model_args.tokenizer_name,
        idf_path=model_args.idf_path,
        idf_requires_grad=model_args.idf_requires_grad,
        prune_ratio=model_args.prune_ratio,
        preprocess_func=model_args.preprocess_func,
        use_l0=model_args.use_l0,
        inf_free=model_args.inf_free,
        seed=seed,
        param_dtype=jnp.dtype(model_args.param_dtype),
        compute_dtype=jnp.dtype(model_args.compute_dtype),
        remat=getattr(model_args, "remat", False),
    )
