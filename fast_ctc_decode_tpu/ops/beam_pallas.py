"""Pallas TPU kernel for CTC prefix beam search — the speed-of-light path.

Same algorithm and semantics as ops/beam_fast.py (hash-identity beam,
analytic merge, (max, min-id) top-K, position-coded node ids — see that
module's docstring for the exactness contract vs the reference
/root/reference/src/search.rs:159-301), but the whole T-loop runs inside
one fused kernel:

 - The scan in beam_fast.py issues ~250 XLA ops per timestep from a while
   loop; at ~2-3 us of dispatch/fusion-boundary cost per op the decode is
   op-bound, not compute- or bandwidth-bound.  Here every per-step value
   is a VMEM-resident (8/16/40, B_TILE) vector register, so a step is a
   few hundred back-to-back VPU issues with zero HBM traffic.

 - Layout: reads ride the 128-wide lane axis (B_TILE lanes per program),
   beam slots ride sublanes (K=5 padded to 8).  Posteriors stream in
   pre-transposed as [T, A+1, B] blocks of TB steps (Pallas double-buffers
   the DMA); the only outputs are the [T, KP, B] per-step beam-id log (for
   traceback), the final best id, and the per-read status code.

 - Grid = (B/B_TILE, T/TB); the T axis is the innermost (sequential on
   TPU), with beam state persisting in scratch across T blocks and
   re-initialized at block 0.

The traceback over the id log stays in XLA (ops/beam_fast.py's
_traceback_positional) — it is O(T) tiny gathers per read and a fraction
of the decode cost.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import errors
from .beam_fast import _traceback_positional

_I32_MAX = np.iinfo(np.int32).max
NEG_INF = np.float32(-np.inf)
POS_INF = np.float32(np.inf)

# int32 hashing: bit-identical to beam_fast's uint32 lanes (wrapping mul,
# xor, logical shift) — Mosaic prefers int vectors.
_SEED1 = np.int32(np.uint32(0x9E3779B9).view(np.int32))
_SEED2 = np.int32(np.uint32(0x85EBCA6B).view(np.int32))


def _u(x):
    return np.uint32(x).astype(np.int32)


def _mix_i32(h, lbl, mult_u, add_u):
    # (lbl * mult + add) folded host-side in uint32 wraparound; lbl static
    c = np.uint32((int(lbl) * int(mult_u) + int(add_u)) & 0xFFFFFFFF)
    mult = _u(mult_u)
    z = h ^ c.astype(np.int32)
    z = z * mult
    return z ^ jax.lax.shift_right_logical(z, np.int32(16))


def _mix1_i32(h, lbl):
    return _mix_i32(h, lbl, 0xC2B2AE35, 0x165667B1)


def _mix2_i32(h, lbl):
    return _mix_i32(h, lbl, 0x27D4EB2F, 0x9E3779B1)


def _beam_kernel(
    thr_ref,  # SMEM (1, 1) f32
    probs_ref,  # VMEM (TB, A1, Bt) f32
    len_ref,  # VMEM (1, Bt) i32
    ids_out_ref,  # VMEM (TB, KP, Bt) i32
    fin_ref,  # VMEM (1, Bt) i32
    err_out_ref,  # VMEM (1, Bt) i32
    # scratch
    lab_ref,  # (KP, Bt) f32
    gap_ref,  # (KP, Bt) f32
    h1_ref,  # (KP, Bt) i32
    h2_ref,  # (KP, Bt) i32
    ll_ref,  # (KP, Bt) i32  last label (-1 root)
    id_ref,  # (KP, Bt) i32  (-1 root, -2 empty)
    va_ref,  # (KP, Bt) i32  validity 0/1
    er_ref,  # (1, Bt) i32
    *,
    K: int,
    KP: int,
    A: int,
    TB: int,
    collapse: bool,
):
    j = pl.program_id(1)
    Bt = len_ref.shape[1]
    KA = np.int32(K * A)

    @pl.when(j == 0)
    def _init():
        row0 = jax.lax.broadcasted_iota(jnp.int32, (KP, Bt), 0) == 0
        lab_ref[:] = jnp.zeros((KP, Bt), jnp.float32)
        gap_ref[:] = jnp.where(row0, 1.0, 0.0).astype(jnp.float32)
        h1_ref[:] = jnp.where(row0, _SEED1, 0).astype(jnp.int32)
        h2_ref[:] = jnp.where(row0, _SEED2, 0).astype(jnp.int32)
        ll_ref[:] = jnp.full((KP, Bt), -1, jnp.int32)
        id_ref[:] = jnp.where(row0, -1, -2).astype(jnp.int32)
        va_ref[:] = jnp.where(row0, 1, 0).astype(jnp.int32)
        er_ref[:] = jnp.zeros((1, Bt), jnp.int32)

    thr = thr_ref[0, 0]
    lens = len_ref[:]  # (1, Bt)
    slot = jax.lax.broadcasted_iota(jnp.int32, (KP, Bt), 0)
    in_beam = slot < K

    def step(jt, _):
        t = j * TB + jt  # scalar i32
        err = er_ref[:]
        active = (t < lens) & (err == 0)  # (1, Bt)

        lab = lab_ref[:]
        gap = gap_ref[:]
        h1 = h1_ref[:]
        h2 = h2_ref[:]
        lastlab = ll_ref[:]
        idv = id_ref[:]
        valid = (va_ref[:] != 0) & in_beam

        # log the expanding beam's ids for traceback
        ids_out_ref[jt] = idv

        row = probs_ref[jt]  # (A1, Bt)
        p0 = row[0:1, :]  # (1, Bt)
        lg = lab + gap
        gap_pos = gap > 0.0

        # ---- per-label expansion pieces ----
        pl_rows = [row[1 + a : 2 + a, :] for a in range(A)]  # (1, Bt) each
        th1 = [_mix1_i32(h1, a) for a in range(A)]
        th2 = [_mix2_i32(h2, a) for a in range(A)]
        pushed = [valid & ~(pl_rows[a] < thr) for a in range(A)]
        if collapse:
            is_rep = [lastlab == a for a in range(A)]
        else:
            is_rep = [jnp.zeros((KP, Bt), bool) for _ in range(A)]
        m_ext = [
            jnp.where(is_rep[a], gap, lg) * pl_rows[a] for a in range(A)
        ]

        # ---- matching: extension (i, a) targets tip jj iff its child hash
        # equals jj's own hash (beam_fast.py) ----
        match = [[None] * K for _ in range(A)]
        matched = [jnp.zeros((KP, Bt), bool) for _ in range(A)]
        for jj in range(K):
            hj1 = h1[jj : jj + 1, :]
            hj2 = h2[jj : jj + 1, :]
            llj = lastlab[jj : jj + 1, :]
            vj = valid[jj : jj + 1, :]
            for a in range(A):
                m = (th1[a] == hj1) & (th2[a] == hj2) & (llj == a) & vj
                match[a][jj] = m
                matched[a] = matched[a] | m

        push_ext = [
            pushed[a] & (~is_rep[a] | matched[a] | gap_pos) for a in range(A)
        ]

        # recv[jj]: the unique arrival into tip jj (sum over the match mask).
        # validity rides as int32 — Mosaic cannot concatenate i1 vregs.
        recv_rows = []
        recv_any_rows = []
        for jj in range(K):
            acc = jnp.zeros((1, Bt), jnp.float32)
            any_ = jnp.zeros((1, Bt), jnp.int32)
            for a in range(A):
                sel = match[a][jj] & push_ext[a]
                acc = acc + jnp.sum(
                    jnp.where(sel, m_ext[a], 0.0), axis=0, keepdims=True
                )
                any_ = jnp.maximum(
                    any_,
                    jnp.max(jnp.where(sel, 1, 0), axis=0, keepdims=True),
                )
            recv_rows.append(acc)
            recv_any_rows.append(any_)
        pad = [jnp.zeros((1, Bt), jnp.float32)] * (KP - K)

        recv = jnp.concatenate(recv_rows + pad, axis=0)  # (KP, Bt)
        recv_any = (
            jnp.concatenate(
                recv_any_rows + [jnp.zeros((1, Bt), jnp.int32)] * (KP - K),
                axis=0,
            )
            != 0
        )

        # ---- stay / blank ----
        if collapse:
            p_stay = jnp.zeros((KP, Bt), jnp.float32)
            for a in range(A):
                p_stay = p_stay + jnp.where(lastlab == a, pl_rows[a], 0.0)
            stay_push = valid & (lastlab >= 0) & ~(p_stay < thr)
            stay_lab = jnp.where(stay_push, lab * p_stay, 0.0)
        else:
            stay_push = jnp.zeros((KP, Bt), bool)
            stay_lab = jnp.zeros((KP, Bt), jnp.float32)

        blank_push = valid & (p0 > thr)
        blank_gap = jnp.where(blank_push, lg * p0, 0.0)

        tip_lab = stay_lab + recv
        tip_gap = blank_gap
        tip_valid = blank_push | stay_push | recv_any

        # ---- candidate table: rows 0..K-1 = tips, rows K+a*K+k = fresh
        # extensions, concatenated into single (CR, Bt) arrays so each
        # selection pass is one tall vector op instead of per-block loops
        def key_of(v, tot):
            return jnp.where(
                v, jnp.where(jnp.isnan(tot), POS_INF, tot + 0.0), NEG_INF
            )

        base_id = t * KA
        tip_tot = tip_lab + tip_gap

        # concat whole (KP, Bt) blocks — Mosaic mishandles odd-sublane
        # slices; the pad rows (k >= K) carry key = -inf and never win
        def catk(tip_arr, fresh_arrs):
            return jnp.concatenate([tip_arr] + list(fresh_arrs), axis=0)

        fvs = [push_ext[a] & ~matched[a] & in_beam for a in range(A)]
        c_key = catk(
            key_of(tip_valid, tip_tot),
            [key_of(fvs[a], jnp.where(fvs[a], m_ext[a], 0.0)) for a in range(A)],
        )  # (CR, Bt), CR = K*(A+1)
        c_lab = catk(
            tip_lab, [jnp.where(fvs[a], m_ext[a], 0.0) for a in range(A)]
        )
        zero_kp = jnp.zeros((KP, Bt), jnp.float32)
        c_gap = catk(tip_gap, [zero_kp] * A)
        fresh_k_id = slot * np.int32(A)  # k*A per row
        c_id = catk(
            idv, [base_id + fresh_k_id + np.int32(a) for a in range(A)]
        )
        c_h1 = catk(h1, th1)
        c_h2 = catk(h2, th2)
        c_ll = catk(
            lastlab, [jnp.full((KP, Bt), a, jnp.int32) for a in range(A)]
        )
        c_tot = c_lab + c_gap

        # error flags (reference NaN semantics: >= 2 candidates compared)
        c_valid = c_key > NEG_INF  # (NaN totals map to +inf, so this holds)
        cnt = jnp.sum(jnp.where(c_valid, 1, 0), axis=0, keepdims=True)
        nanv = jnp.max(
            jnp.where(c_valid & jnp.isnan(c_tot), 1, 0), axis=0, keepdims=True
        )
        nan_flag = (cnt >= 2) & (nanv != 0)
        empty_flag = cnt == 0

        # ---- top-K selection: K rounds of (max, tie -> min id) ----
        sel_rows = []  # per round: (valid, [lab, gap, id, h1, h2, lastlab])
        top = None
        for _ in range(K):
            mx = jnp.max(c_key, axis=0, keepdims=True)
            slot_valid = mx > NEG_INF
            at = c_key == mx
            sid = jnp.min(
                jnp.where(at, c_id, _I32_MAX), axis=0, keepdims=True
            )
            chosen = at & (c_id == sid)

            def pick(arr, z):
                return jnp.sum(
                    jnp.where(chosen, arr, z), axis=0, keepdims=True
                )

            acc = [
                pick(c_lab, 0.0),
                pick(c_gap, 0.0),
                pick(c_id, 0),
                pick(c_h1, 0),
                pick(c_h2, 0),
                pick(c_ll, 0),
            ]
            if top is None:
                top = pick(c_tot, 0.0)  # pre-normalization top score
            c_key = jnp.where(chosen, NEG_INF, c_key)
            sel_rows.append((slot_valid, acc))

        # ---- write back the next beam, gated on `active` ----
        step_err = jnp.where(
            nan_flag,
            errors.INCOMPARABLE_VALUES,
            jnp.where(empty_flag, errors.RAN_OUT_OF_BEAM, errors.OK),
        ).astype(jnp.int32)
        er_ref[:] = jnp.where(
            err > 0, err, jnp.where(active, step_err, 0)
        ).astype(jnp.int32)

        for r in range(K):
            slot_valid, acc = sel_rows[r]
            g = lambda new, old: jnp.where(active, new, old)
            rs = slice(r, r + 1)
            # true division — reciprocal-multiply rounds differently and
            # would break bit-parity with the scan engine / the reference
            lab_ref[rs, :] = g(
                jnp.where(slot_valid, acc[0] / top, 0.0), lab_ref[rs, :]
            )
            gap_ref[rs, :] = g(
                jnp.where(slot_valid, acc[1] / top, 0.0), gap_ref[rs, :]
            )
            id_ref[rs, :] = g(
                jnp.where(slot_valid, acc[2], -2), id_ref[rs, :]
            )
            h1_ref[rs, :] = g(acc[3], h1_ref[rs, :])
            h2_ref[rs, :] = g(acc[4], h2_ref[rs, :])
            ll_ref[rs, :] = g(acc[5], ll_ref[rs, :])
            va_ref[rs, :] = g(
                jnp.where(slot_valid, 1, 0).astype(jnp.int32), va_ref[rs, :]
            )
        return 0

    jax.lax.fori_loop(0, TB, step, 0)
    fin_ref[:] = id_ref[0:1, :]
    err_out_ref[:] = er_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("beam_size", "collapse_repeats", "block_t", "block_b", "interpret"),
)
def beam_search_pallas_batch(
    probs: jnp.ndarray,  # [B, T, A+1] f32
    lengths: jnp.ndarray,  # [B] i32
    beam_cut_threshold,
    *,
    beam_size: int,
    collapse_repeats: bool = True,
    block_t: int = 32,
    block_b: int = 256,
    interpret: bool = False,
):
    """Fused-kernel batched beam search; beam_fast output contract."""
    B, T, A1 = probs.shape
    A = A1 - 1
    K = beam_size
    KP = max(-(-K // 8) * 8, 8)
    TB = min(block_t, max(T, 1))
    Bt = min(block_b, max(B, 1))

    Tp = -(-T // TB) * TB
    Bp = -(-B // Bt) * Bt
    probs_p = jnp.pad(probs, ((0, Bp - B), (0, Tp - T), (0, 0)))
    lens_p = jnp.pad(
        jnp.asarray(lengths, jnp.int32), (0, Bp - B)
    ).reshape(1, Bp)
    probs_t = jnp.transpose(probs_p, (1, 2, 0))  # [Tp, A1, Bp]
    thr = jnp.asarray(beam_cut_threshold, jnp.float32).reshape(1, 1)

    grid = (Bp // Bt, Tp // TB)
    kernel = functools.partial(
        _beam_kernel, K=K, KP=KP, A=A, TB=TB, collapse=collapse_repeats
    )
    ids_log, fin, err = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((TB, A1, Bt), lambda i, j: (j, 0, i)),
                pl.BlockSpec((1, Bt), lambda i, j: (0, i)),
            ],
            out_specs=[
                pl.BlockSpec((TB, KP, Bt), lambda i, j: (j, 0, i)),
                pl.BlockSpec((1, Bt), lambda i, j: (0, i)),
                pl.BlockSpec((1, Bt), lambda i, j: (0, i)),
            ],
            scratch_shapes=[
                pltpu.VMEM((KP, Bt), jnp.float32),
                pltpu.VMEM((KP, Bt), jnp.float32),
                pltpu.VMEM((KP, Bt), jnp.int32),
                pltpu.VMEM((KP, Bt), jnp.int32),
                pltpu.VMEM((KP, Bt), jnp.int32),
                pltpu.VMEM((KP, Bt), jnp.int32),
                pltpu.VMEM((KP, Bt), jnp.int32),
                pltpu.VMEM((1, Bt), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Tp, KP, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        ],
        interpret=interpret,
    )(thr, probs_t, lens_p)

    # traceback in XLA over the id log (per read: [T, K])
    ids_btk = jnp.transpose(ids_log[:T, :K, :B], (2, 0, 1))  # [B, T, K]
    fin_b = fin[0, :B]
    err_b = err[0, :B]

    trace = jax.vmap(
        lambda i0, ids: _traceback_positional(i0, ids, T, K, A)
    )
    labels_rev, times_rev, count = trace(fin_b, ids_btk)
    return {
        "labels_rev": labels_rev,
        "times_rev": times_rev,
        "count": count,
        "err": err_b,
    }
