"""CRF (conditional random field) decoders: greedy and prefix beam search.

Reference semantics: /root/reference/src/search.rs:385-423 (`crf_greedy_search`)
and src/search.rs:38-157 (`crf_beam_search`).  Input is a 3-D tensor
``[T, n_state, n_labels]`` plus ``init_state [n_state]``.  Each hypothesis
carries a transition state; a blank keeps it, emitting label ``l`` (0-based)
moves it to ``(state * n_base) % n_state + l`` with ``n_base = n_labels - 1``
(src/search.rs:97, 414).

The beam variant reuses the flattened-tree step machinery from ops/beam.py.
Unlike plain CTC there is no repeat-collapse branch — every label goes to the
child node — so the candidate grid is ``[K, 1+A]`` and a node receives at
most two candidates per step (blank + the unique arrival), which the merge's
two accumulation passes cover with room to spare.  The state is a pure
function of the node's label sequence (same recurrence for every path), so
keeping the head's state on merge is exact.

The greedy variant is inherently sequential (the next frame's row depends on
the state after this frame's emission), so it runs as a thin ``lax.scan``
with a per-frame ``[n_state, A]`` row gather; ``vmap`` over reads supplies
the parallelism.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import errors
from .beam import (
    BeamCarry,
    _allocate_nodes,
    _finish_step,
    _init_carry,
    _merge_select,
    _traceback,
)
from .phred import phred_int


@functools.partial(jax.jit, static_argnames=())
def crf_greedy_device(probs: jnp.ndarray, init_state: jnp.ndarray, length, qscale, qbias):
    """Greedy CRF decode of one (possibly padded) read.

    Args:
      probs: [T, S, A+1] f32; init_state: [S] f32.

    Returns dict: tokens [T] i32 (1-based label rows), path [T] i32,
      qints [T] u32, n scalar.
    """
    T, S, A1 = probs.shape
    n_base = A1 - 1

    state0 = jnp.argmax(init_state).astype(jnp.int32)

    def step(state, xs):
        p, t = xs  # p: [S, A+1]
        row = jnp.take(p, state, axis=0)  # [A+1]
        label = jnp.argmax(row).astype(jnp.int32)  # first max, as reference
        prob = jnp.max(row)
        active = t < length
        emit = active & (label > 0)
        new_state = jnp.where(
            emit, (state * n_base) % S + (label - 1), state
        ).astype(jnp.int32)
        return new_state, (emit, label, prob)

    xs = (probs, jnp.arange(T, dtype=jnp.int32))
    _, (emit, labels, pvals) = jax.lax.scan(step, state0, xs)

    n = jnp.sum(emit.astype(jnp.int32))
    frame = jnp.arange(T, dtype=jnp.int32)
    order = jnp.argsort(jnp.where(emit, frame, jnp.int32(T)), stable=True)
    path = jnp.where(jnp.arange(T) < n, order, 0).astype(jnp.int32)
    tokens = jnp.take(labels, path)
    emit_pvals = jnp.take(pvals, path)
    qints = phred_int(emit_pvals, qscale, qbias)
    return {"tokens": tokens, "path": path, "qints": qints, "pvals": emit_pvals, "n": n}


def _crf_beam_step(carry: BeamCarry, xs, *, A, S, K, N, length, threshold):
    """One step of CRF prefix beam search (src/search.rs:62-142)."""
    (p, t) = xs  # p: [S, A+1]
    active = (t < length) & (carry.err == errors.OK)

    prow = jnp.take(p, jnp.clip(carry.state, 0, S - 1), axis=0)  # [K, A+1]
    p0 = prow[:, 0]
    plab = prow[:, 1:]  # [K, A]

    rows = jnp.clip(carry.node + 1, 0, N)
    c = jnp.take(carry.child, rows, axis=0)  # [K, A]

    pushed_lab = carry.valid[:, None] & ~(plab < threshold)
    needs_new = pushed_lab & (c < 0)

    new_id, parent, label, time, child, n_nodes, overflow = _allocate_nodes(
        carry, needs_new, t, active, N, A, K
    )
    nid = jnp.where(c >= 0, c, new_id)

    lg = carry.lab + carry.gap
    lbl_idx = jnp.arange(A, dtype=jnp.int32)

    # ---- analytic merge (src/search.rs:62-120).  A node receives at most
    # blank from the tip sitting on it (gap field) and ONE arrival from
    # the unique tip on its parent (label field) — a node's CRF state is a
    # deterministic function of its label path, so node id remains the
    # merge key and the plane is duplicate-free without a sort.
    push_b = carry.valid & (p0 > threshold)
    gap_tip = jnp.where(push_b, lg * p0, jnp.float32(0))

    m_arr = lg[:, None] * plab  # [K, A]
    push_arr = pushed_lab & (nid >= 0)
    state_l = ((carry.state[:, None] * A) % S + lbl_idx[None, :]).astype(jnp.int32)

    tgt = jnp.where(push_arr, nid, -9)
    eq = (tgt[None, :, :] == carry.node[:, None, None]) & carry.valid[
        :, None, None
    ]  # [K tips, K, A]
    recv = jnp.sum(jnp.where(eq, m_arr[None, :, :], 0.0), axis=(1, 2))
    recv_any = jnp.any(eq, axis=(1, 2))
    matched = jnp.any(eq, axis=0)

    tip_valid = push_b | recv_any

    node_all = jnp.concatenate([carry.node, nid.reshape(-1)])
    lab_all = jnp.concatenate([recv, m_arr.reshape(-1)])
    gap_all = jnp.concatenate([gap_tip, jnp.zeros((K * A,), jnp.float32)])
    valid_all = jnp.concatenate(
        [tip_valid, (push_arr & ~matched).reshape(-1)]
    )
    state_all = jnp.concatenate([carry.state, state_l.reshape(-1)])

    merged = _merge_select(node_all, lab_all, gap_all, state_all, valid_all, K)
    node_n, state_n, lab_n, gap_n, valid_n, err = _finish_step(
        carry, merged, overflow, active
    )

    return (
        BeamCarry(
            node_n, state_n, lab_n, gap_n, valid_n, parent, label, time, child, n_nodes, err
        ),
        None,
    )


@functools.partial(jax.jit, static_argnames=("beam_size", "max_nodes"))
def crf_beam_search_device(
    probs: jnp.ndarray,
    init_state: jnp.ndarray,
    length,
    beam_cut_threshold,
    *,
    beam_size: int,
    max_nodes: int,
):
    """CRF prefix beam search on one (possibly padded) read.

    The initial beam entry mirrors src/search.rs:54-59:
    label_prob = max(init_state), gap_prob = init_state[0],
    state = argmax(init_state).

    Returns dict: labels_rev [T] i32 (0-based), times_rev [T] i32, count, err.
    """
    T, S, A1 = probs.shape
    A = A1 - 1
    K = beam_size
    N = max_nodes

    carry = _init_carry(
        K, N, A, jnp.max(init_state), init_state[0], jnp.argmax(init_state)
    )
    xs = (probs, jnp.arange(T, dtype=jnp.int32))
    step = functools.partial(
        _crf_beam_step,
        A=A,
        S=S,
        K=K,
        N=N,
        length=jnp.asarray(length, jnp.int32),
        threshold=jnp.asarray(beam_cut_threshold, jnp.float32),
    )
    carry, _ = jax.lax.scan(step, carry, xs)

    labels_rev, times_rev, count = _traceback(
        carry.node[0], carry.parent, carry.label, carry.time, T
    )
    return {
        "labels_rev": labels_rev,
        "times_rev": times_rev,
        "count": count,
        "err": carry.err,
    }
