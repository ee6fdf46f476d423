"""Phred quality encoding.

Reference semantics (/root/reference/src/search.rs:31-36)::

    let max = 1e-4;
    let p = if 1.0 - prob < max { max } else { 1.0 - prob };
    let q = -10.0 * p.log10() * qscale + qbias;
    char::from_u32(q.round() as u32 + 33)

Notes on exactness:
 - all arithmetic is f32;
 - ``f32::round`` rounds half away from zero;
 - ``as u32`` saturates negative values to 0 (so q < -0.5 maps to '!');
 - the 1e-4 floor caps the default-scale score at Q40 ('I').

Both a NumPy (host, used by the single-read parity API) and a jax.numpy
(device, used by batched pipelines) implementation are provided; they are
bit-identical for f32 inputs because only mul/add/log10/round are involved
and log10 is correctly rounded on both paths for these magnitudes.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def phred_int_np(prob: np.ndarray, qscale: float, qbias: float) -> np.ndarray:
    """Rounded phred integer (without the +33 ASCII offset), NumPy f32."""
    prob = np.asarray(prob, dtype=np.float32)
    p = np.float32(1.0) - prob
    p = np.where(p < np.float32(1e-4), np.float32(1e-4), p)
    q = np.float32(-10.0) * np.log10(p) * np.float32(qscale) + np.float32(qbias)
    # round half away from zero, then saturate negatives at 0 (Rust `as u32`)
    r = np.sign(q) * np.floor(np.abs(q) + np.float32(0.5))
    r = np.maximum(r, np.float32(0.0))
    return r.astype(np.uint32)


def phred_int(prob: jnp.ndarray, qscale, qbias) -> jnp.ndarray:
    """Rounded phred integer (without the +33 ASCII offset), device f32."""
    prob = prob.astype(jnp.float32)
    p = jnp.float32(1.0) - prob
    p = jnp.where(p < jnp.float32(1e-4), jnp.float32(1e-4), p)
    q = jnp.float32(-10.0) * jnp.log10(p) * jnp.float32(qscale) + jnp.float32(qbias)
    r = jnp.sign(q) * jnp.floor(jnp.abs(q) + jnp.float32(0.5))
    r = jnp.maximum(r, jnp.float32(0.0))
    return r.astype(jnp.uint32)


def phred_char(prob: float, qscale: float = 1.0, qbias: float = 0.0) -> str:
    """Single-probability convenience matching reference `phred` exactly."""
    return chr(int(phred_int_np(np.float32(prob), qscale, qbias)) + 33)
