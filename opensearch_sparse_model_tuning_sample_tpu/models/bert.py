"""Functional BERT-for-Masked-LM backbone.

TPU-first design notes:
  * Pure functions over an explicit parameter pytree (`init` / `apply`), the
    idiomatic pjit style: the whole train step jits as one XLA program and the
    batch axis shards over the mesh with zero code changes.
  * bf16 compute / fp32 params by default (MXU-native), fp32 logits out.
  * The vocab axis is padded up to a multiple of 128 so the MLM-head matmul
    tiles exactly onto the 128x128 MXU; padded columns are masked to zero in
    the encoder ops downstream.
  * No data-dependent control flow; all shapes static.

Behavioral parity target: HF `AutoModelForMaskedLM` BERT as used by the
reference sparse encoder (/root/reference/scripts/model/sparse_encoders.py:57-59,
107-114): we must reproduce `backbone(**features)[0]` i.e. the MLM logits
[B, L, V] bit-for-bit in fp32 given imported HF weights.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    hidden_act: str = "gelu"  # "gelu" (exact) | "gelu_new" (tanh) | "relu"
    pad_token_id: int = 0
    # --- HF layout-family knobs (the reference hosts any AutoModelForMaskedLM
    # architecture, sparse_encoders.py:57-59; these three cover the BERT /
    # RoBERTa / DistilBERT families natively) ---
    model_type: str = "bert"  # "bert" | "roberta" | "distilbert"
    # "absolute": positions 0..L-1 (BERT/DistilBERT). "from_pad_offset":
    # RoBERTa's create_position_ids_from_input_ids — cumsum over non-pad
    # positions, offset by pad_token_id, pads pinned to pad_token_id.
    position_style: str = "absolute"
    # DistilBERT has no token-type embeddings at all; RoBERTa keeps a
    # (constant) type-0 row that still adds into the embedding sum.
    use_token_type: bool = True
    # RoBERTa's LM head applies gelu regardless of hidden_act; None = follow
    # hidden_act (BERT/DistilBERT semantics).
    head_act: Optional[str] = None
    # --- TPU knobs ---
    vocab_pad_multiple: int = 128
    # rematerialize each transformer layer in the backward pass
    # (jax.checkpoint): trades ~one extra forward of FLOPs for dropping the
    # per-layer activation residuals. OFF for the reference model sizes
    # (<=167M trains comfortably); required to TRAIN bert-large students at
    # the recipe batch shapes on one 16G v5e (without it the 335M student at
    # 40 docs x L256 needs 16.2G HBM — measured OOM, job j46).
    remat: bool = False
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16

    @property
    def padded_vocab_size(self) -> int:
        return round_up(self.vocab_size, self.vocab_pad_multiple)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


# Architecture presets sized after the model families the reference recipes
# exercise (doc-v2-mini ~ BERT-mini; distill ~ DistilBERT-size 6L;
# base ~ bert-base / co-condenser-marco, configs/config_l0.yaml:5).
PRESETS = {
    "tiny": dict(hidden_size=128, num_hidden_layers=2, num_attention_heads=2,
                 intermediate_size=512),
    "mini": dict(hidden_size=256, num_hidden_layers=4, num_attention_heads=4,
                 intermediate_size=1024),
    "small": dict(hidden_size=512, num_hidden_layers=4, num_attention_heads=8,
                  intermediate_size=2048),
    "distill": dict(hidden_size=768, num_hidden_layers=6, num_attention_heads=12,
                    intermediate_size=3072),
    "base": dict(hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
                 intermediate_size=3072),
    # bert-large scale (~335M) — the size class of the reference kd recipe's
    # dense teacher (configs/config_kd.yaml:19 names gte-large-en-v1.5)
    "large": dict(hidden_size=1024, num_hidden_layers=24,
                  num_attention_heads=16, intermediate_size=4096),
}


def config_from_preset(name: str, **overrides) -> BertConfig:
    if name not in PRESETS:
        raise KeyError(f"unknown arch preset {name!r}; have {sorted(PRESETS)}")
    kw = dict(PRESETS[name])
    kw.update(overrides)
    return BertConfig(**kw)


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _dense_init(key, in_dim, out_dim, dtype, stddev=0.02):
    kk, _ = jax.random.split(key)
    return {
        "kernel": (jax.random.normal(kk, (in_dim, out_dim)) * stddev).astype(dtype),
        "bias": jnp.zeros((out_dim,), dtype),
    }


def _ln_init(dim, dtype):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def init(key: jax.Array, cfg: BertConfig) -> Dict[str, Any]:
    """Random-init parameter pytree (HF-equivalent structure, padded vocab)."""
    keys = jax.random.split(key, 8 + cfg.num_hidden_layers)
    d, dt = cfg.hidden_size, cfg.param_dtype
    pv = cfg.padded_vocab_size

    word = jax.random.normal(keys[0], (pv, d)) * 0.02
    # zero the padded rows so padded vocab ids can never leak signal
    word = word.at[cfg.vocab_size :].set(0.0)

    params = {
        "embeddings": {
            "word_embeddings": word.astype(dt),
            "position_embeddings": (
                jax.random.normal(keys[1], (cfg.max_position_embeddings, d)) * 0.02
            ).astype(dt),
            "token_type_embeddings": (
                jax.random.normal(keys[2], (cfg.type_vocab_size, d)) * 0.02
            ).astype(dt),
            "layer_norm": _ln_init(d, dt),
        },
        "encoder": {"layers": []},
        "mlm_head": {
            "transform": _dense_init(keys[3], d, d, dt),
            "layer_norm": _ln_init(d, dt),
            # decoder kernel is tied to word embeddings; only a bias here
            "bias": jnp.zeros((pv,), dt),
        },
    }
    for i in range(cfg.num_hidden_layers):
        k = jax.random.split(keys[8 + i], 6)
        params["encoder"]["layers"].append(
            {
                "attention": {
                    "query": _dense_init(k[0], d, d, dt),
                    "key": _dense_init(k[1], d, d, dt),
                    "value": _dense_init(k[2], d, d, dt),
                    "output": _dense_init(k[3], d, d, dt),
                    "layer_norm": _ln_init(d, dt),
                },
                "ffn": {
                    "intermediate": _dense_init(k[4], d, cfg.intermediate_size, dt),
                    "output": _dense_init(k[5], cfg.intermediate_size, d, dt),
                    "layer_norm": _ln_init(d, dt),
                },
            }
        )
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _layer_norm(x, p, eps):
    # LN in fp32 for numerical parity with HF, then cast back
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _dense(x, p, compute_dtype):
    y = jnp.dot(
        x.astype(compute_dtype),
        p["kernel"].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    # bias-add in the compute dtype (torch autocast semantics: the matmul
    # accumulates fp32 on the MXU but emits bf16, and the bias adds in
    # bf16); identical to the fp32 path when compute_dtype is fp32
    return y.astype(compute_dtype) + p["bias"].astype(compute_dtype)


def _gelu(x):
    # HF BERT uses exact (erf) GELU, computed in the ambient dtype — torch
    # autocast runs GELU in bf16 too; the fp32 parity path (compute_dtype
    # fp32) is unchanged
    return jax.nn.gelu(x, approximate=False)


def _act_by_name(x, name: str):
    # the checkpoint's hidden_act: silently using gelu for a relu model
    # would compute wrong outputs with no error (config_from_hf_json
    # rejects unknown names at import time)
    if name == "gelu":
        return _gelu(x)
    if name in ("gelu_new", "gelu_pytorch_tanh", "gelu_approx"):
        return jax.nn.gelu(x, approximate=True)
    if name == "relu":
        return jax.nn.relu(x)
    raise ValueError(f"unsupported hidden_act {name!r}")


def _act(x, cfg):
    return _act_by_name(x, cfg.hidden_act)


def _head_act(x, cfg):
    # RoBERTa's RobertaLMHead hardcodes gelu even when hidden_act differs;
    # BERT/DistilBERT heads follow the body activation
    return _act_by_name(x, cfg.head_act or cfg.hidden_act)


def _dropout(x, rate, rng, deterministic):
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def _attention(x, mask_bias, p, cfg, rng, deterministic):
    B, L, D = x.shape
    H, hd = cfg.num_attention_heads, cfg.head_dim
    cd = cfg.compute_dtype

    def proj(name):
        return _dense(x, p[name], cd).reshape(B, L, H, hd)

    q, k, v = proj("query"), proj("key"), proj("value")
    # [B, H, L, L] logits in fp32 on MXU
    logits = jnp.einsum("blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32)
    logits = logits / math.sqrt(hd)
    logits = logits + mask_bias  # [B, 1, 1, L] additive -inf mask
    probs = jax.nn.softmax(logits, axis=-1).astype(cd)
    if not deterministic:
        rng, sub = jax.random.split(rng)
        probs = _dropout(probs, cfg.attention_probs_dropout_prob, sub, deterministic)
    ctx = jnp.einsum("bhlm,bmhd->blhd", probs, v, preferred_element_type=jnp.float32)
    ctx = ctx.astype(cd).reshape(B, L, D)
    out = _dense(ctx, p["output"], cd)
    if not deterministic:
        rng, sub = jax.random.split(rng)
        out = _dropout(out, cfg.hidden_dropout_prob, sub, deterministic)
    return _layer_norm(x + out, p["layer_norm"], cfg.layer_norm_eps)


def _ffn(x, p, cfg, rng, deterministic):
    cd = cfg.compute_dtype
    h = _act(_dense(x, p["intermediate"], cd), cfg)
    out = _dense(h, p["output"], cd)
    if not deterministic:
        out = _dropout(out, cfg.hidden_dropout_prob, rng, deterministic)
    return _layer_norm(x + out, p["layer_norm"], cfg.layer_norm_eps)


def encode_hidden(
    params,
    cfg: BertConfig,
    input_ids: jax.Array,  # [B, L] int32
    attention_mask: jax.Array,  # [B, L] int32/bool
    token_type_ids: Optional[jax.Array] = None,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Transformer stack -> final hidden states [B, L, D] (compute dtype)."""
    B, L = input_ids.shape
    emb = params["embeddings"]
    cd = cfg.compute_dtype

    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    if cfg.position_style == "from_pad_offset":
        # RoBERTa create_position_ids_from_input_ids: pads sit at
        # pad_token_id, real tokens count up from pad_token_id + 1
        not_pad = (input_ids != cfg.pad_token_id).astype(jnp.int32)
        pos_ids = jnp.cumsum(not_pad, axis=1) * not_pad + cfg.pad_token_id
    else:
        pos_ids = jnp.arange(L, dtype=jnp.int32)[None, :]

    # embedding gathers + adds in the compute dtype: the fp32 gather/add/cast
    # round trip costs ~1 ms/step at the config_l0 recipe shape (interleaved
    # A/B, round 3); the next op is an fp32 LayerNorm, which bounds the
    # rounding to one bf16 quantization of the three-table sum. fp32 compute
    # (the parity/eval mode) is unchanged.
    x = emb["word_embeddings"].astype(cd)[input_ids] + emb[
        "position_embeddings"
    ].astype(cd)[pos_ids]
    if cfg.use_token_type:
        x = x + emb["token_type_embeddings"].astype(cd)[token_type_ids]
    x = _layer_norm(x, emb["layer_norm"], cfg.layer_norm_eps)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if not deterministic:
        rng, sub = jax.random.split(rng)
        x = _dropout(x, cfg.hidden_dropout_prob, sub, deterministic)

    # additive attention bias: 0 where attended, large-negative where masked
    mask_bias = jnp.where(
        attention_mask[:, None, None, :] > 0, 0.0, jnp.finfo(jnp.float32).min
    ).astype(jnp.float32)

    def one_layer(x, layer, r1, r2):
        x = _attention(x, mask_bias, layer["attention"], cfg, r1, deterministic)
        return _ffn(x, layer["ffn"], cfg, r2, deterministic)

    if cfg.remat:
        # drop per-layer residuals in the backward pass (see BertConfig.remat)
        one_layer = jax.checkpoint(one_layer)
    for i, layer in enumerate(params["encoder"]["layers"]):
        rng, r1, r2 = jax.random.split(rng, 3)
        x = one_layer(x, layer, r1, r2)
    return x


def _decoder_weight(params):
    """[padded_V, D] decoder matrix: the word embeddings when tied (the
    default), or the checkpoint's own decoder for untied HF imports."""
    p = params["mlm_head"]
    return p["decoder"] if "decoder" in p else params["embeddings"]["word_embeddings"]


def mlm_logits(params, cfg: BertConfig, hidden: jax.Array) -> jax.Array:
    """MLM head: transform + LN + (tied or untied) decoder
    -> [B, L, padded_V] fp32."""
    p = params["mlm_head"]
    cd = cfg.compute_dtype
    h = _head_act(_dense(hidden, p["transform"], cd), cfg)
    h = _layer_norm(h, p["layer_norm"], cfg.layer_norm_eps)
    logits = jnp.dot(
        h.astype(cd),
        _decoder_weight(params).astype(cd).T,
        preferred_element_type=jnp.float32,
    )
    return logits + p["bias"].astype(jnp.float32)


def mlm_maxpool(
    params,
    cfg: BertConfig,
    hidden: jax.Array,  # [B, L, D]
    attention_mask: jax.Array,  # [B, L]
    chunk: int = 64,
) -> jax.Array:
    """Masked max-pool of MLM logits over the sequence axis WITHOUT ever
    materializing the [B, L, V] logits tensor.

    The sparse encoder only needs max_l(logits[b, l, v] * mask[b, l])
    (reference sparse_encoders.py:108-111). Scanning the head over L-chunks
    keeps peak memory at [B, chunk, V] and carries just the running max
    [B, V] — ~L/chunk less HBM traffic than the naive head, and the backward
    pass rematerializes chunks instead of storing full logits.
    """
    p = params["mlm_head"]
    cd = cfg.compute_dtype
    B, L, D = hidden.shape
    # largest divisor of L not above `chunk` (gcd is wrong for that: e.g.
    # gcd(96, 64)=32 but 48 divides 96; gcd(510, 64)=2 would scan 255 steps)
    chunk = max(c for c in range(1, min(chunk, L) + 1) if L % c == 0)
    h = _head_act(_dense(hidden, p["transform"], cd), cfg)
    h = _layer_norm(h, p["layer_norm"], cfg.layer_norm_eps)
    wT = _decoder_weight(params).astype(cd).T
    bias = p["bias"].astype(jnp.float32)
    mask = attention_mask.astype(jnp.float32)

    hc = jnp.moveaxis(h.reshape(B, L // chunk, chunk, D), 1, 0)
    mc = jnp.moveaxis(mask.reshape(B, L // chunk, chunk), 1, 0)

    def body(m, xs):
        h_chunk, m_chunk = xs
        logits = (
            jnp.dot(h_chunk.astype(cd), wT, preferred_element_type=jnp.float32)
            + bias
        )
        masked = logits * m_chunk[:, :, None]
        return jnp.maximum(m, jnp.max(masked, axis=1)), None

    init = jnp.full((B, wT.shape[-1]), -jnp.inf, jnp.float32)
    pooled, _ = jax.lax.scan(body, init, (hc, mc))
    return pooled


def apply(
    params,
    cfg: BertConfig,
    input_ids,
    attention_mask,
    token_type_ids=None,
    deterministic: bool = True,
    rng=None,
) -> jax.Array:
    """Full MLM forward -> fp32 logits [B, L, padded_V].

    Equivalent to the reference's `self.backbone(**kwargs)[0]`
    (sparse_encoders.py:108) with the vocab axis padded to the MXU tile.
    """
    hidden = encode_hidden(
        params, cfg, input_ids, attention_mask, token_type_ids, deterministic, rng
    )
    return mlm_logits(params, cfg, hidden)


def count_params(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
