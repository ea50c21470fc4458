"""Pickle-backed function cache (reference scripts/dataset/data_utils.py:14-28
`@cached` — used there to cache NanoBEIR downloads; here for any expensive
pure loader)."""

from __future__ import annotations

import functools
import os
import pickle


def cache_dir() -> str:
    d = os.environ.get(
        "OSSMT_CACHE_DIR", os.path.join(os.path.expanduser("~"), "cache_dir")
    )
    os.makedirs(d, exist_ok=True)
    return d


def cached(func):
    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        key = f"{func.__name__}_{args}_{kwargs}"
        path = os.path.join(cache_dir(), key)
        if os.path.exists(path):
            with open(path, "rb") as f:
                return pickle.load(f)
        result = func(*args, **kwargs)
        with open(path, "wb") as f:
            pickle.dump(result, f)
        return result

    return wrapper
