"""Collective helpers over the device mesh.

The reference's entire custom comm surface is `gather_rep` — an all-gather
along the batch dim where backward flows only through the local slice
(/root/reference/scripts/utils.py:16-23) — plus barriers and a DP loss
rescale. On TPU none of that needs hand-writing: the train step is jitted
over a mesh with the batch dim sharded, and XLA inserts all-gathers whose
transpose is exactly the local-slice gradient scatter the reference splices
by hand.

These helpers exist for the places that want *explicit* collectives
(shard_map regions like the index's top-k merge) and for tests that pin the
gradient semantics.
"""

from __future__ import annotations

import inspect
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.mesh import DATA_AXIS


def all_gather_batch(x: jax.Array, axis_name: str = DATA_AXIS) -> jax.Array:
    """Inside shard_map: gather shards along the leading (batch) dim.

    Differentiable: the VJP is a psum-scatter, i.e. each device receives the
    gradient of its own slice — the semantics the reference builds manually
    with the gather-then-splice idiom.
    """
    return jax.lax.all_gather(x, axis_name, tiled=True)


def merged_topk(
    scores: jax.Array,  # [B, k] local top-k scores
    indices: jax.Array,  # [B, k] local top-k global indices
    k: int,
    axis_name: str = DATA_AXIS,
) -> Tuple[jax.Array, jax.Array]:
    """Inside shard_map: merge per-shard top-k into global top-k (one
    all-gather + re-top_k). Used by the index's sharded search."""
    n = jax.lax.axis_size(axis_name)
    all_s = jax.lax.all_gather(scores, axis_name)  # [n, B, k]
    all_i = jax.lax.all_gather(indices, axis_name)
    B = scores.shape[0]
    cat_s = jnp.moveaxis(all_s, 0, 1).reshape(B, n * k)
    cat_i = jnp.moveaxis(all_i, 0, 1).reshape(B, n * k)
    s, sel = jax.lax.top_k(cat_s, k)
    i = jnp.take_along_axis(cat_i, sel, axis=1)
    return s, i


def global_batch_fn(
    fn, mesh: Mesh, *, replicated_out: bool = True, n_args: Optional[int] = None
):
    """Wrap `fn(global_arrays...) -> out` so each shard-mapped instance sees
    the gathered global batch (explicit-collective alternative to jitting
    over sharded inputs). Pass `n_args` for callables whose positional arity
    `inspect.signature` cannot see (some builtins/C extensions)."""
    if n_args is None:
        # __code__.co_argcount breaks for functools.partial / jitted
        # callables and over-counts defaulted args; signature() handles all
        # Python callables
        params = inspect.signature(fn).parameters.values()
        if any(p.kind == p.VAR_POSITIONAL for p in params):
            raise TypeError(
                "global_batch_fn needs an explicit n_args for *args callables"
            )
        n_args = sum(
            p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
            for p in params
        )

    def inner(*shards):
        gathered = tuple(all_gather_batch(s) for s in shards)
        return fn(*gathered)

    return shard_map(
        inner,
        mesh=mesh,
        in_specs=tuple(P(DATA_AXIS) for _ in range(n_args)),
        out_specs=P() if replicated_out else P(DATA_AXIS),
        check_vma=False,
    )
