"""Pallas TPU kernel: masked max-pool of MLM logits, fused with the head
matmul.

The sparse-encoder inference hot op is max_l(mask[b,l] * (h[b,l,:] @ W[:,v]
+ bias[v])) (reference semantics sparse_encoders.py:108-111). The XLA path
(bert.mlm_maxpool) scans L-chunks; this kernel tiles (batch x vocab) on the
grid and runs the L reduction entirely in VMEM against an fp32 running max —
logits never exist in HBM at any granularity.

Formulation trick: the mask multiply and the bias add are folded into the
matmul itself —
    masked[b,l,v] = (m*h)[b,l,:] @ W[:,v] + m[b,l] * bias[v]
so with h' = concat(h * m, m) and W' = concat(W, bias row), the kernel body
is a pure MXU matmul followed by a VPU max. No mask ref, no lane-unaligned
slices.

Forward-only (ingest/search path); training keeps the differentiable scan
head.

Measured on v5e (mini, B=256, L=128): this kernel 7.8ms vs the XLA scan
formulation 6.3ms — XLA's fusion wins for this shape, so bert.mlm_maxpool
remains the production path and this kernel is kept as the tested Pallas
alternative (and the template for future fused epilogues).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(h_ref, w_ref, out_ref, *, L: int, chunk: int):
    """Grid: (B_tiles, V_tiles).

    h_ref  [TILE_B, L, D']  mask-premultiplied hidden + mask column (compute dtype)
    w_ref  [D', TILE_V]     decoder + bias row (compute dtype)
    out_ref[TILE_B, TILE_V] f32 masked max over L
    """
    tile_b = h_ref.shape[0]
    tile_v = w_ref.shape[1]

    def body(i, acc):
        h_chunk = h_ref[:, pl.ds(i * chunk, chunk), :]  # [TILE_B, chunk, D']
        logits = jax.lax.dot_general(
            h_chunk,
            w_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TILE_B, chunk, TILE_V] — already mask-scaled and bias-added
        return jnp.maximum(acc, jnp.max(logits, axis=1))

    acc0 = jnp.full((tile_b, tile_v), -jnp.inf, jnp.float32)
    out_ref[:] = jax.lax.fori_loop(0, L // chunk, body, acc0)


def maxpool_head(
    h: jax.Array,  # [B, L, D] transformed hidden states (post head-LN)
    mask: jax.Array,  # [B, L]
    wT: jax.Array,  # [D, V_pad] tied decoder (embedding table transposed)
    bias: jax.Array,  # [V_pad]
    tile_b: int = 64,
    tile_v: int = 512,
    chunk: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """Fused masked max-pool head -> [B, V_pad] fp32."""
    B, L, D = h.shape
    V = wT.shape[1]
    cd = h.dtype

    # fold mask + bias into the contraction (see module docstring); pad the
    # extra row up to the sublane tile
    d_extra = 8
    m = mask.astype(cd)
    h_aug = jnp.concatenate(
        [h * m[:, :, None], m[:, :, None],
         jnp.zeros((B, L, d_extra - 1), cd)], axis=-1,
    )
    w_aug = jnp.concatenate(
        [wT.astype(cd), bias.astype(cd)[None, :],
         jnp.zeros((d_extra - 1, V), cd)], axis=0,
    )

    v_pad = -V % tile_v
    if v_pad:  # pad the vocab axis up to the tile grid; sliced off below
        w_aug = jnp.pad(w_aug, ((0, 0), (0, v_pad)))
    V_t = V + v_pad
    if B % tile_b != 0:
        tile_b = 1
    if L % chunk != 0:
        chunk = 1

    Dp = D + d_extra
    grid = (B // tile_b, V_t // tile_v)
    out = pl.pallas_call(
        functools.partial(_kernel, L=L, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, L, Dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, tile_v), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, tile_v), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, V_t), jnp.float32),
        interpret=interpret,
    )(h_aug, w_aug)
    return out[:, :V] if v_pad else out


def mlm_maxpool_pallas(params, cfg, hidden, attention_mask, interpret=False):
    """Drop-in for bert.mlm_maxpool using the fused kernel (forward-only)."""
    from ..models.bert import _dense, _gelu, _layer_norm

    p = params["mlm_head"]
    cd = cfg.compute_dtype
    h = _gelu(_dense(hidden, p["transform"], cd))
    h = _layer_norm(h, p["layer_norm"], cfg.layer_norm_eps)
    wT = params["embeddings"]["word_embeddings"].astype(cd).T
    return maxpool_head(
        h.astype(cd), attention_mask, wT, p["bias"], interpret=interpret
    )
