"""Shared helpers for duplex tests/benchmarks: normalized random reads and
valid diagonal alignment envelopes (the maximum.accumulate / last-upper
clamp dance lives here once)."""

import numpy as np


def random_data(T, A1, seed):
    rng = np.random.RandomState(seed)
    x = rng.rand(T, A1).astype(np.float32)
    return x / np.linalg.norm(x, ord=2, axis=1, keepdims=True)


def diag_env(T1, T2, w):
    """Monotone diagonal banded envelope of half-width ``w``, fixed up to
    satisfy the reference validity rules (lo monotone, lo <= last upper,
    lo < hi)."""
    env = np.zeros((T1, 2), np.int64)
    for i in range(T1):
        c = int(i * T2 / T1)
        env[i, 0] = max(0, c - w)
        env[i, 1] = min(T2, c + w + 1)
    env[:, 0] = np.maximum.accumulate(env[:, 0])
    last = 0
    for i in range(T1):
        env[i, 0] = min(env[i, 0], last)
        env[i, 1] = max(env[i, 1], env[i, 0] + 1)
        last = max(last, env[i, 1])
    return env
