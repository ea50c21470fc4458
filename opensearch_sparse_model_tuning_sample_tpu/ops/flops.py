"""FLOPS / L0 activation regularizers + quadratic lambda warmup.

Parity with /root/reference/scripts/train/trainer.py:61-79:
  * flops_value: Sum_j (mean_i |w_ij|)^2 over the *global* batch, reshaped
    to [N, group, V] so same-query docs form one group (:61-66);
  * flops_threshold variant: only docs whose L0 length exceeds the threshold
    pay the penalty (:67-73, the arXiv 2504.14839 trick);
  * get_lambda: lambda * ((step+1)/T)^2 until step >= T (:75-79).

Pure functions of (reps, step) — the step-dependent lambda is traced, so one
compiled train step serves all steps.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def flops_value(
    representation: jax.Array,  # [N_total, V] (global batch)
    group_num: int = 1,
    flops_threshold: Optional[int] = None,
) -> jax.Array:
    rep = jnp.abs(
        representation.reshape(-1, group_num, representation.shape[-1])
    )  # [N, G, V]
    if flops_threshold is None:
        return jnp.sum(jnp.mean(rep, axis=0) ** 2)
    doc_length = jnp.sum((rep > 0).astype(jnp.float32), axis=2)  # [N, G] (L0 norm)
    mask = (doc_length > flops_threshold).astype(jnp.float32)[:, :, None]
    return jnp.sum(jnp.mean(mask * rep, axis=0) ** 2)


def get_lambda(step: jax.Array, lambda_value: float, lambda_T: float) -> jax.Array:
    """Quadratic ramp: lambda * ((step+1)/T)^2, capped at lambda from step T."""
    if lambda_value is None or lambda_value == 0:
        return jnp.asarray(0.0)
    if lambda_T is None or lambda_T <= 0:
        return jnp.asarray(lambda_value)
    step = step.astype(jnp.float32)
    ramp = lambda_value * ((step + 1.0) / lambda_T) ** 2
    return jnp.where(step >= lambda_T, lambda_value, ramp)
