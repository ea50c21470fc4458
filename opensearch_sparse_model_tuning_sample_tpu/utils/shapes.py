"""Static-shape bucketing helpers (jax-free; importable from CLI startup
paths that defer jax)."""

from __future__ import annotations


def next_pow2(n: int) -> int:
    """Smallest power of two >= n (>= 1). Compiled-shape bucketing: padding
    counts up to a pow2 bounds the set of shapes XLA ever compiles
    (CLAUDE.md invariant: one compile per bucket/shape)."""
    p = 1
    while p < n:
        p *= 2
    return p
