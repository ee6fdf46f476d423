"""Pallas TPU kernel for banded 2-D duplex pair-consensus beam search.

The fused-kernel throughput path for the fast (slot-band) duplex engine —
the "banded Pallas dynamic-programming kernel" of the build plan (SURVEY.md
§7 step 5).  Same slot semantics as ops/duplex_fast.py's window-relative
mode (bands ride beam slots, re-derived prefixes rebuild over the current
window — see that module's exactness contract vs the reference
/root/reference/src/duplex.rs:443-650), but the whole T1 loop runs inside
one kernel with every band resident in VMEM:

 - **Layout**: reads ride the 128-wide lane axis (Bt lanes per program),
   beam slots ride sublanes (K padded to 8), and each slot's banded forward
   DP over network_2 ("SecondaryProbs", duplex.rs:151-210) is a [KP, W, Bt]
   VMEM block in window-relative columns (col = t2 - (lo_t - 1)).

 - **Sequential cell DP, vectorized across slots x reads.**  The XLA engine
   computes band builds with an O(log W)-depth associative scan — 4
   logsumexps per 2x2 log-affine composition, W log W of them per
   candidate.  Here the reference's first-order recurrence
   (duplex.rs:229-247) runs *sequentially* over cells — 2 logsumexps per
   cell, a ~14x work reduction — with each cell an elementwise op over all
   candidates and all Bt reads at once.  Sequential cells also evaluate the
   logsumexps in the reference's own order (the associative regrouping does
   not), so band values are bit-faithful to the recurrence.

 - **Shared envelope as scalar prefetch.**  The envelope rows (lo, hi) and
   the per-step window slide are scalar-prefetched, so every window index
   in the kernel is a scalar: band slides are predicated static shifts,
   l2/root rows are dynamic-start VMEM slices, and cell loops run exactly
   their true trip count (`lax.fori_loop` with data-dependent bounds)
   instead of a padded maximum.  Batches with per-pair envelopes fall back
   to the XLA engine (parallel/pipeline.py picks).

 - **Extension rides the cell loop.**  When the envelope's upper bound
   grows, live slots extend their bands parent-before-child
   (duplex.rs:490-522).  A per-cell loop linearizes that dependency for
   free: a child's cell t2 reads its parent's cell t2-1, which every live
   parent wrote on the *previous* iteration — all K slots extend in
   lockstep, with a K x K hash-match refresh of per-slot parent-value
   registers each cell.  Frozen (out-of-beam) parents are correct by
   construction: their copies' [pboff, pbend) masks return zero beyond the
   frozen end, exactly like the reference's ``SecondaryProbs::get``.

 - **Select first, rebuild after.**  Candidate scores need each fresh
   candidate's band *maximum* (prob_2_max), not the band: a first cell pass
   computes running maxima for all K*A extensions without storing cells.
   After top-K selection, only the <=K chosen fresh candidates' bands are
   rebuilt (a second cell pass over [KP, Bt] rows) — cheaper than
   materializing and then gathering all K*A candidate bands.

Everything else (hash prefix identity, analytic merge, (max, min-id)
selection with explicit validity so zero-probability hypotheses survive,
error semantics) matches ops/duplex_fast.py.  The traceback over the
per-step beam-id log stays in XLA (ops/beam_fast._traceback_scan_batch).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import errors
from .beam_fast import _traceback_scan_batch
from .beam_pallas import (
    _SEED1,
    _SEED2,
    _mix1_i32,
    _mix2_i32,
    _mix_c_plane,
    _mix_plane,
    _u,
)

_I32_MAX = np.iinfo(np.int32).max
NEG = np.float32(-np.inf)
POS_INF = np.float32(np.inf)
A1P = 8  # l2 rows are padded to 8 per timestep for aligned dynamic slices


def _ls_add(a, b):
    """LogSpace + (logsumexp), reference operand ordering (duplex.rs:42-63).

    Deliberately NOT imported from duplex_fast: that module's NEG is a
    module-level jnp constant, which Mosaic rejects as a captured const
    inside Pallas kernels (np.float32 here)."""
    cond = a <= b
    big = jnp.where(cond, b, a)
    small = jnp.where(cond, a, b)
    return jnp.where(small == NEG, big, big + jnp.log1p(jnp.exp(small - big)))


def _ls_max(m, t):
    """LogSpace::max — NaN in ``t`` never replaces ``m`` (duplex.rs:33-39)."""
    return jnp.where(m < t, t, m)


def _duplex_kernel(
    # scalar prefetch
    lo_ref, hi_ref, d_ref,  # SMEM [Tp] i32
    # inputs
    thr_ref,  # SMEM (1, 1) f32 log threshold
    l1_ref,  # VMEM (TB, A1P, Bt) f32
    l2_ref,  # VMEM (T2*A1P pad, Bt) f32 rows = t2*A1P + a
    rg_ref,  # VMEM (Rr pad, Bt) f32 root gap; row i = value at cell i-1
    len_ref,  # VMEM (1, Bt) i32
    # outputs
    ids_out_ref,  # VMEM (TB, KP, Bt) i32
    fin_ref,  # VMEM (1, Bt) i32
    err_out_ref,  # VMEM (1, Bt) i32
    # scratch
    blab_ref, bgap_ref,  # (KP, W, Bt) f32 own bands
    pblab_ref, pbgap_ref,  # (KP, W, Bt) f32 parent band copies
    nlab_ref, ngap_ref, npblab_ref, npbgap_ref,  # (KP, W, Bt) f32 temps
    p1l_ref, p1g_ref, p2m_ref,  # (KP, Bt) f32
    id_ref, h1_ref, h2_ref, ph1_ref, ph2_ref,  # (KP, Bt) i32
    ll_ref, pll_ref, va_ref, pr_ref,  # (KP, Bt) i32
    bo_ref, be_ref, pbo_ref, pbe_ref,  # (KP, Bt) i32 band windows (abs t2)
    er_ref,  # (1, Bt) i32
    lu_ref,  # SMEM (1,) i32 last_upper (shared-envelope replay)
    *,
    K: int,
    KP: int,
    A: int,
    TB: int,
    W: int,
    D: int,
    collapse: bool,
    needs_ext: bool,
):
    j = pl.program_id(1)
    Bt = len_ref.shape[1]
    KA = K * A
    KAP = max(-(-KA // 8) * 8, 8)
    thr = thr_ref[0, 0]

    # static (k, a) decomposition of the [KAP, Bt] candidate plane
    row_i = jax.lax.broadcasted_iota(jnp.int32, (KAP, Bt), 0)
    k_of_r = row_i // np.int32(A)
    a_of_r = row_i % np.int32(A)
    cand_in = row_i < KA
    slot_kp = jax.lax.broadcasted_iota(jnp.int32, (KP, Bt), 0)
    in_beam = slot_kp < K

    @pl.when(j == 0)
    def _init():
        row0 = slot_kp == 0
        for r in (blab_ref, bgap_ref, pblab_ref, pbgap_ref):
            r[:] = jnp.full((KP, W, Bt), NEG)
        p1l_ref[:] = jnp.full((KP, Bt), NEG)
        p1g_ref[:] = jnp.where(row0, 0.0, NEG).astype(jnp.float32)
        p2m_ref[:] = jnp.where(row0, 0.0, NEG).astype(jnp.float32)
        id_ref[:] = jnp.where(row0, -1, -2).astype(jnp.int32)
        h1_ref[:] = jnp.where(row0, _SEED1, 0).astype(jnp.int32)
        h2_ref[:] = jnp.where(row0, _SEED2, 0).astype(jnp.int32)
        ph1_ref[:] = jnp.zeros((KP, Bt), jnp.int32)
        ph2_ref[:] = jnp.zeros((KP, Bt), jnp.int32)
        ll_ref[:] = jnp.full((KP, Bt), -1, jnp.int32)
        pll_ref[:] = jnp.full((KP, Bt), -2, jnp.int32)
        va_ref[:] = jnp.where(row0, 1, 0).astype(jnp.int32)
        pr_ref[:] = jnp.zeros((KP, Bt), jnp.int32)
        for r in (bo_ref, be_ref, pbo_ref, pbe_ref):
            r[:] = jnp.zeros((KP, Bt), jnp.int32)
        er_ref[:] = jnp.zeros((1, Bt), jnp.int32)
        lu_ref[0] = 0

    def l2row(t2):
        """[A1P, Bt] log-prob rows of network_2 at (scalar) cell t2."""
        return l2_ref[pl.ds(t2 * np.int32(A1P), A1P), :]

    def rootval(t2):
        """[1, Bt] root band gap value at (scalar) cell t2 (rg row t2+1)."""
        return rg_ref[pl.ds(t2 + 1, 1), :]

    def expand_k(x_kp, fill=0):
        """[KP, Bt] per-tip values -> [KAP, Bt] per-candidate (k, a) rows."""
        out = jnp.full((KAP, Bt), fill, x_kp.dtype)
        for k in range(K):
            out = jnp.where(k_of_r == k, x_kp[k : k + 1, :], out)
        return out

    def band_col(ref, col):
        """[KP, Bt] band values at (scalar) window column ``col``."""
        return ref[:, pl.ds(col, 1), :][:, 0, :]

    def step(jt, _):
        t = j * TB + jt
        lo = lo_ref[t]
        hi = hi_ref[t]
        d = d_ref[t]
        wb = lo - 1
        lastup = lu_ref[0]

        lens = len_ref[:]
        err = er_ref[:]
        in_range = t < lens
        env_bad = (lo >= hi) | (lo > lastup)
        active = in_range & (err == 0)

        ids_out_ref[jt] = id_ref[:]

        @pl.when(env_bad)
        def _env_err():
            er_ref[:] = jnp.where(
                in_range & (err == 0), errors.INVALID_ENVELOPE, err
            ).astype(jnp.int32)

        @pl.when(jnp.logical_not(env_bad))
        def _body():
            _run_step(jt, t, lo, hi, d, wb, lastup, active)
            # assignment, not running max: the XLA engine sets
            # last_upper = hi, so a dipping-then-recovering upper bound
            # must re-extend from the dipped value (the recomputation of
            # already-present cells is idempotent — pure DP)
            lu_ref[0] = hi

        return 0

    def _run_step(jt, t, lo, hi, d, wb, lastup, active):
        # ---- slide ----
        if D > 0:
            for s in range(1, D + 1):

                @pl.when(d == s)
                def _slide(s=s):
                    for r in (blab_ref, bgap_ref, pblab_ref, pbgap_ref):
                        shifted = jnp.concatenate(
                            [r[:, s:, :], jnp.full((KP, s, Bt), NEG)], axis=1
                        )
                        r[:] = jnp.where(active[None, :, :], shifted, r[:])

        valid = (va_ref[:] != 0) & in_beam
        nonroot = valid & (id_ref[:] != -1)

        # ---- extension ----
        if needs_ext:

            @pl.when(hi > lastup)
            def _extend():
                llv = ll_ref[:]
                off = bo_ref[:]
                gate = nonroot & active
                do_disc = gate & (lo > off)
                off2 = jnp.where(do_disc, lo - 1, off).astype(jnp.int32)
                colt2 = wb + jax.lax.broadcasted_iota(
                    jnp.int32, (KP, W, Bt), 1
                )
                in_win = (colt2 >= jnp.maximum(lo, off2)[:, None, :]) & (
                    colt2 < jnp.minimum(hi, be_ref[:])[:, None, :]
                )
                tot_row = _ls_add(blab_ref[:], bgap_ref[:])
                tot_row = jnp.where(in_win & ~jnp.isnan(tot_row), tot_row, NEG)
                p2m_ref[:] = jnp.where(
                    do_disc, jnp.max(tot_row, axis=1), p2m_ref[:]
                )
                bo_ref[:] = jnp.where(do_disc, off2, off)

                h1v, h2v = h1_ref[:], h2_ref[:]
                is_root_par = pr_ref[:] != 0
                par_live = [
                    (ph1_ref[:] == h1v[k : k + 1, :])
                    & (ph2_ref[:] == h2v[k : k + 1, :])
                    & nonroot[k : k + 1, :]
                    & nonroot
                    & ~is_root_par
                    for k in range(K)
                ]
                any_live = jnp.zeros((KP, Bt), bool)
                for k in range(K):
                    any_live = any_live | par_live[k]

                start = lastup
                c0 = jnp.maximum(start - 1 - wb, 0)
                has_last = nonroot & (be_ref[:] > bo_ref[:])
                last_lab = jnp.where(has_last, band_col(blab_ref, c0), NEG)
                last_gap = jnp.where(has_last, band_col(bgap_ref, c0), NEG)
                pv0 = start - 1
                p_ok = (pv0 >= pbo_ref[:]) & (pv0 < pbe_ref[:]) & ~is_root_par
                par_lab = jnp.where(p_ok, band_col(pblab_ref, c0), NEG)
                par_gap = jnp.where(
                    is_root_par,
                    rootval(pv0),
                    jnp.where(p_ok, band_col(pbgap_ref, c0), NEG),
                )
                # extension's repeat flag is raw parent/child label equality,
                # NOT gated on collapse_repeats — the reference passes
                # `label(parent) == Some(label)` unconditionally
                # (duplex.rs:510-511), unlike build time where the repeat
                # branch only exists under collapse (duplex.rs:539-553)
                is_rep = pll_ref[:] == llv

                last_tot = _ls_add(last_lab, last_gap)

                def ext_cell(c2, st):
                    # carry (lab, tot): see build_cell
                    last_lab, last_tot, par_lab, par_gap, p2m = st
                    row = l2row(c2)
                    p0 = row[0:1, :]
                    p_lbl = jnp.zeros((KP, Bt), jnp.float32)
                    for a in range(A):
                        p_lbl = jnp.where(
                            llv == a, row[1 + a : 2 + a, :], p_lbl
                        )
                    base = jnp.where(
                        is_rep, par_gap, _ls_add(par_lab, par_gap)
                    )
                    gap_n = last_tot + p0
                    lab_n = p_lbl + _ls_add(last_lab, base)
                    col = c2 - wb
                    cur_l = blab_ref[:, pl.ds(col, 1), :]
                    cur_g = bgap_ref[:, pl.ds(col, 1), :]
                    blab_ref[:, pl.ds(col, 1), :] = jnp.where(
                        gate[:, None, :], lab_n[:, None, :], cur_l
                    )
                    bgap_ref[:, pl.ds(col, 1), :] = jnp.where(
                        gate[:, None, :], gap_n[:, None, :], cur_g
                    )
                    tot_n = _ls_add(lab_n, gap_n)
                    p2m = jnp.where(gate, _ls_max(p2m, tot_n), p2m)
                    last_lab = jnp.where(gate, lab_n, last_lab)
                    last_tot = jnp.where(gate, tot_n, last_tot)
                    npl = jnp.full((KP, Bt), NEG)
                    npg = jnp.full((KP, Bt), NEG)
                    for k in range(K):
                        npl = jnp.where(par_live[k], lab_n[k : k + 1, :], npl)
                        npg = jnp.where(par_live[k], gap_n[k : k + 1, :], npg)
                    frz_ok = (c2 >= pbo_ref[:]) & (c2 < pbe_ref[:])
                    fl = jnp.where(frz_ok, band_col(pblab_ref, c2 - wb), NEG)
                    fg = jnp.where(frz_ok, band_col(pbgap_ref, c2 - wb), NEG)
                    par_lab = jnp.where(any_live, npl, fl)
                    par_gap = jnp.where(
                        is_root_par,
                        rootval(c2),
                        jnp.where(any_live, npg, fg),
                    )
                    return (last_lab, last_tot, par_lab, par_gap, p2m)

                out = jax.lax.fori_loop(
                    start, hi, ext_cell,
                    (last_lab, last_tot, par_lab, par_gap, p2m_ref[:]),
                )
                p2m_ref[:] = jnp.where(gate, out[4], p2m_ref[:])
                be_ref[:] = jnp.where(gate, hi, be_ref[:])

                for k in range(K):
                    m = par_live[k] & active
                    m3 = m[:, None, :]
                    pblab_ref[:] = jnp.where(
                        m3, blab_ref[k : k + 1, :, :], pblab_ref[:]
                    )
                    pbgap_ref[:] = jnp.where(
                        m3, bgap_ref[k : k + 1, :, :], pbgap_ref[:]
                    )
                    pbo_ref[:] = jnp.where(m, bo_ref[k : k + 1, :], pbo_ref[:])
                    pbe_ref[:] = jnp.where(m, be_ref[k : k + 1, :], pbe_ref[:])

        # ---- expansion ----
        p1row = l1_ref[jt]  # (A1P, Bt)
        p0r = p1row[0:1, :]
        p1l, p1g = p1l_ref[:], p1g_ref[:]
        p1tot = _ls_add(p1l, p1g)
        h1v, h2v = h1_ref[:], h2_ref[:]
        llv = ll_ref[:]
        tip_root = id_ref[:] == -1

        plab_r = jnp.zeros((KAP, Bt), jnp.float32)
        for a in range(A):
            plab_r = jnp.where(a_of_r == a, p1row[1 + a : 2 + a, :], plab_r)
        valid_r = (expand_k(va_ref[:]) != 0) & cand_in
        pushed = valid_r & jnp.logical_not(plab_r < thr)
        if collapse:
            is_rep_r = expand_k(llv, -9) == a_of_r
        else:
            is_rep_r = jnp.zeros((KAP, Bt), bool)
        h1e, h2e = expand_k(h1v), expand_k(h2v)
        # per-row mix-constant planes (bit-identical to the per-label
        # where/mix sweep — ops/beam_pallas._mix_c_plane) and the
        # label/validity terms folded into the first hash compare (same
        # ~2^-64 false-match budget as the double-hash test — see
        # beam_pallas._beam_kernel2's match)
        th1 = _mix_plane(h1e, _mix_c_plane(a_of_r, 0xC2B2AE35, 0x165667B1),
                         0xC2B2AE35)
        th2 = _mix_plane(h2e, _mix_c_plane(a_of_r, 0x27D4EB2F, 0x9E3779B1),
                         0x27D4EB2F)
        LC = _u(0x61C88647)
        th1f = th1 ^ (a_of_r * LC)
        phl1 = jnp.where(valid, h1v ^ (llv * LC), _u(0x5D5D5D5D))

        match = []
        matched = jnp.zeros((KAP, Bt), bool)
        for jj in range(K):
            m = (th1f == phl1[jj : jj + 1, :]) & (
                th2 == h2v[jj : jj + 1, :]
            )
            match.append(m)
            matched = matched | m

        p1g_e = expand_k(p1g)
        m_ext = jnp.where(is_rep_r, p1g_e, expand_k(p1tot)) + plab_r
        push_ext = pushed & (
            jnp.logical_not(is_rep_r) | matched | (p1g_e > NEG)
        )

        recv = jnp.full((KP, Bt), NEG)
        recv_any = jnp.zeros((KP, Bt), bool)
        nan_arr = jnp.zeros((KP, Bt), bool)
        for jj in range(K):
            sel_m = match[jj] & push_ext
            arr = jnp.max(jnp.where(sel_m, m_ext, NEG), axis=0, keepdims=True)
            got = jnp.any(sel_m, axis=0, keepdims=True)
            has_nan = jnp.any(
                sel_m & jnp.isnan(m_ext), axis=0, keepdims=True
            )
            row = slot_kp == jj
            recv = jnp.where(row & got, arr, recv)
            recv_any = recv_any | (row & got)
            nan_arr = nan_arr | (row & has_nan)
        recv = jnp.where(nan_arr, np.float32(np.nan), recv)

        if collapse:
            p_stay = jnp.zeros((KP, Bt), jnp.float32)
            for a in range(A):
                p_stay = jnp.where(llv == a, p1row[1 + a : 2 + a, :], p_stay)
            stay_push = valid & (llv >= 0) & jnp.logical_not(p_stay < thr)
            stay_lab = jnp.where(stay_push, p1l + p_stay, NEG)
        else:
            stay_push = jnp.zeros((KP, Bt), bool)
            stay_lab = jnp.full((KP, Bt), NEG)

        blank_push = valid & (p0r > thr)
        blank_gap = jnp.where(blank_push, p1tot + p0r, NEG)
        tip_lab = _ls_add(stay_lab, recv)
        tip_gap = blank_gap
        tip_valid = blank_push | stay_push | recv_any

        fresh_valid = push_ext & jnp.logical_not(matched)
        fresh_id = t * np.int32(KA) + k_of_r * np.int32(A) + a_of_r

        # ---- pass 1: fresh candidates' band maxima ----
        bo_v, be_v = bo_ref[:], be_ref[:]
        root_e = expand_k(tip_root.astype(jnp.int32)) != 0

        def build_cell(c2, st):
            # carry (lab, tot) instead of (lab, gap): gap(c) only ever feeds
            # tot(c) = lsadd(lab, gap), which doubles as the next cell's
            # "last_probs.probability()" — one logsumexp per cell saved
            last_lab, last_tot, p2m = st
            row = l2row(c2)
            p0c = row[0:1, :]
            plc = jnp.zeros((KAP, Bt), jnp.float32)
            for a in range(A):
                plc = jnp.where(a_of_r == a, row[1 + a : 2 + a, :], plc)
            pv = c2 - 1
            t_lab = band_col(blab_ref, pv - wb)
            t_gap = band_col(bgap_ref, pv - wb)
            t_ok = (pv >= bo_v) & (pv < be_v)
            # per-tip [KP, Bt] logsumexp, then one expand to [KAP, Bt]
            p_lab = jnp.where(t_ok & ~tip_root, t_lab, NEG)
            p_gap = jnp.where(t_ok, t_gap, NEG)
            p_tot = _ls_add(p_lab, p_gap)
            rv = rootval(pv)
            par_gap = jnp.where(root_e, rv, expand_k(p_gap, NEG))
            par_tot = jnp.where(root_e, rv, expand_k(p_tot, NEG))
            base = jnp.where(is_rep_r, par_gap, par_tot)
            gap_n = last_tot + p0c
            lab_n = plc + _ls_add(last_lab, base)
            tot = _ls_add(lab_n, gap_n)
            p2m = jnp.maximum(p2m, jnp.where(jnp.isnan(tot), NEG, tot))
            return (lab_n, tot, p2m)

        # loop-carry init must be data-dependent: Mosaic assigns constant
        # inits a replicated layout that cannot be relaid to the computed
        # body values' layout ("Invalid relayout ... replicated in
        # destination but not in source")
        neg_r = jnp.where(row_i >= -1 - t, NEG, plab_r)  # == NEG everywhere
        _, _, p2m_new = jax.lax.fori_loop(
            lo, hi, build_cell, (neg_r, neg_r, neg_r)
        )

        # ---- candidate table + selection ----
        tip_score = _ls_add(tip_lab, tip_gap) + p2m_ref[:]
        fresh_score = m_ext + p2m_new
        c_tot = jnp.concatenate([tip_score, fresh_score])
        c_valid = jnp.concatenate([tip_valid, fresh_valid])
        c_id = jnp.concatenate([id_ref[:], fresh_id])
        key = jnp.where(
            c_valid,
            jnp.where(jnp.isnan(c_tot), POS_INF, c_tot + 0.0),
            NEG,
        )

        cnt = jnp.sum(jnp.where(c_valid, 1, 0), axis=0, keepdims=True)
        nanv = jnp.max(
            jnp.where(c_valid & jnp.isnan(c_tot), 1, 0), axis=0, keepdims=True
        )
        nan_flag = (cnt >= 2) & (nanv != 0)
        empty_flag = cnt == 0

        # field extraction is split by region — the chosen row is a tip
        # (rows 0..KP-1) or fresh (rows KP..): tip fields reduce 8 rows,
        # fresh fields come from the position-coded id, the scalar window
        # bounds, or the *parent tip's* row via the derived source-slot
        # mask — no concatenated field planes, no expand_k fresh halves
        m_ext_v = jnp.where(fresh_valid, m_ext, np.float32(0))
        tip_root_i = tip_root.astype(jnp.int32)
        tKA = t * np.int32(KA)

        sel = []
        remaining = c_valid
        for _ in range(K):
            kk = jnp.where(remaining, key, NEG)
            mx = jnp.max(kk, axis=0, keepdims=True)
            slot_ok = jnp.any(remaining, axis=0, keepdims=True)
            at = remaining & (kk == mx)
            sid = jnp.min(jnp.where(at, c_id, _I32_MAX), axis=0, keepdims=True)
            chosen = at & (c_id == sid)
            ch_t = chosen[:KP]
            ch_f = chosen[KP:]
            isf = slot_ok & (sid >= tKA)

            def pt(arr, z):
                return jnp.sum(
                    jnp.where(ch_t, arr, z), axis=0, keepdims=True
                )

            def pf(arr, z):
                return jnp.sum(
                    jnp.where(ch_f, arr, z), axis=0, keepdims=True
                )

            src_f = pf(k_of_r, 0)  # source tip slot of a fresh choice
            src_mask = (slot_kp == src_f) & isf

            def ps(arr):
                return jnp.sum(
                    jnp.where(src_mask, arr, 0), axis=0, keepdims=True
                )

            vals = {
                "id": jnp.where(slot_ok, sid, 0),
                "h1": pt(h1v, 0) + pf(th1, 0),
                "h2": pt(h2v, 0) + pf(th2, 0),
                "ph1": pt(ph1_ref[:], 0) + ps(h1v),
                "ph2": pt(ph2_ref[:], 0) + ps(h2v),
                "ll": jnp.where(
                    slot_ok, jnp.where(sid < 0, -1, sid % np.int32(A)), 0
                ),
                "pll": pt(pll_ref[:], 0) + ps(llv),
                "pr": pt(pr_ref[:], 0) + ps(tip_root_i),
                "p1l": pt(tip_lab, np.float32(0)) + pf(m_ext_v, np.float32(0)),
                "p1g": jnp.where(isf, NEG, pt(tip_gap, np.float32(0))),
                "p2m": pt(p2m_ref[:], np.float32(0))
                + pf(p2m_new, np.float32(0)),
                "bo": jnp.where(isf, lo, pt(bo_v, 0)),
                "be": jnp.where(isf, hi, pt(be_v, 0)),
                "pbo": pt(pbo_ref[:], 0) + ps(bo_v),
                "pbe": pt(pbe_ref[:], 0) + ps(be_v),
                "src": jnp.where(slot_ok, jnp.where(isf, src_f, K), 0),
                "isf": isf.astype(jnp.int32),
                "ok": slot_ok,
                "chosen_tip": ch_t,
            }
            sel.append(vals)
            remaining = remaining & jnp.logical_not(chosen)

        def stack_i(name):
            out = jnp.zeros((KP, Bt), jnp.int32)
            for r in range(K):
                out = jnp.where(slot_kp == r, sel[r][name], out)
            return out

        def stack_f(name):
            out = jnp.zeros((KP, Bt), jnp.float32)
            for r in range(K):
                out = jnp.where(slot_kp == r, sel[r][name], out)
            return out

        v_k = jnp.zeros((KP, Bt), bool)
        for r in range(K):
            v_k = v_k | ((slot_kp == r) & sel[r]["ok"])

        new_id = stack_i("id")
        new_fresh = stack_i("isf") != 0
        ni = {n: stack_i(n) for n in
              ("h1", "h2", "ph1", "ph2", "ll", "pll", "pr",
               "bo", "be", "pbo", "pbe", "src")}
        new_p1l, new_p1g, new_p2m = (
            stack_f("p1l"), stack_f("p1g"), stack_f("p2m")
        )

        # ---- band relocation: temp <- gathered tips / rebuilt fresh ----
        # own bands: NEG-filled, then tip-chosen slots copy their tip row
        # (fresh slots' windows [lo, hi) are fully rebuilt below, and every
        # band read elsewhere is masked by [boff, bend), so stale content
        # outside the window is never observed).  Parent copies: tip-chosen
        # slots keep their pb row, fresh slots take their source tip's own
        # band — one fused select per (slot, tip) pair, accumulated in
        # registers and written once per destination row.
        for r in range(K):
            rs = slice(r, r + 1)
            ct = sel[r]["chosen_tip"]  # (KP, Bt) over old tip rows
            is_f = sel[r]["isf"] != 0  # (1, Bt)
            src_k = sel[r]["src"]  # (1, Bt)
            acc_l = jnp.full((1, W, Bt), NEG)
            acc_g = jnp.full((1, W, Bt), NEG)
            acc_pl = jnp.full((1, W, Bt), NEG)
            acc_pg = jnp.full((1, W, Bt), NEG)
            for k in range(K):
                mt = (ct[k : k + 1, :] & ~is_f)[:, None, :]
                mf = ((src_k == k) & is_f)[:, None, :]
                acc_l = jnp.where(mt, blab_ref[k : k + 1], acc_l)
                acc_g = jnp.where(mt, bgap_ref[k : k + 1], acc_g)
                acc_pl = jnp.where(
                    mt, pblab_ref[k : k + 1],
                    jnp.where(mf, blab_ref[k : k + 1], acc_pl),
                )
                acc_pg = jnp.where(
                    mt, pbgap_ref[k : k + 1],
                    jnp.where(mf, bgap_ref[k : k + 1], acc_pg),
                )
            nlab_ref[rs] = acc_l
            ngap_ref[rs] = acc_g
            npblab_ref[rs] = acc_pl
            npbgap_ref[rs] = acc_pg

        # rebuild fresh slots' own bands (second cell pass, [KP, Bt] rows)
        fr = new_fresh & v_k
        sl_lbl = ni["ll"]
        sl_src = ni["src"]
        if collapse:
            sl_isrep = ni["pll"] == sl_lbl
        else:
            sl_isrep = jnp.zeros((KP, Bt), bool)
        sl_root = jnp.zeros((KP, Bt), bool)
        for k in range(K):
            sl_root = sl_root | ((sl_src == k) & tip_root[k : k + 1, :])

        def rebuild_cell(c2, st):
            last_lab, last_tot = st
            row = l2row(c2)
            p0c = row[0:1, :]
            plc = jnp.zeros((KP, Bt), jnp.float32)
            for a in range(A):
                plc = jnp.where(sl_lbl == a, row[1 + a : 2 + a, :], plc)
            pv = c2 - 1
            t_lab = band_col(blab_ref, pv - wb)
            t_gap = band_col(bgap_ref, pv - wb)
            par_lab = jnp.full((KP, Bt), NEG)
            par_gap = jnp.full((KP, Bt), NEG)
            for k in range(K):
                hit = sl_src == k
                okk = (pv >= bo_v[k : k + 1, :]) & (pv < be_v[k : k + 1, :])
                par_lab = jnp.where(
                    hit & okk & ~tip_root[k : k + 1, :],
                    t_lab[k : k + 1, :],
                    par_lab,
                )
                par_gap = jnp.where(
                    hit & okk, t_gap[k : k + 1, :], par_gap
                )
            par_gap = jnp.where(sl_root, rootval(pv), par_gap)
            par_lab = jnp.where(sl_root, NEG, par_lab)
            base = jnp.where(sl_isrep, par_gap, _ls_add(par_lab, par_gap))
            gap_n = last_tot + p0c
            lab_n = plc + _ls_add(last_lab, base)
            tot_n = _ls_add(lab_n, gap_n)
            col = c2 - wb
            cl = nlab_ref[:, pl.ds(col, 1), :]
            cg = ngap_ref[:, pl.ds(col, 1), :]
            g3 = fr[:, None, :]
            nlab_ref[:, pl.ds(col, 1), :] = jnp.where(
                g3, lab_n[:, None, :], cl
            )
            ngap_ref[:, pl.ds(col, 1), :] = jnp.where(
                g3, gap_n[:, None, :], cg
            )
            return (lab_n, tot_n)

        neg_kp = jnp.where(slot_kp >= -1 - t, NEG, new_p1l)  # == NEG everywhere
        jax.lax.fori_loop(lo, hi, rebuild_cell, (neg_kp, neg_kp))

        # ---- error + write-back, gated on active ----
        step_err = jnp.where(
            nan_flag,
            errors.INCOMPARABLE_VALUES,
            jnp.where(empty_flag, errors.RAN_OUT_OF_BEAM, errors.OK),
        ).astype(jnp.int32)
        err0 = er_ref[:]
        er_ref[:] = jnp.where(
            err0 > 0, err0, jnp.where(active, step_err, 0)
        ).astype(jnp.int32)

        g = lambda new, old: jnp.where(active, new, old)
        id_ref[:] = g(jnp.where(v_k, new_id, -2).astype(jnp.int32), id_ref[:])
        for name, ref in (
            ("h1", h1_ref), ("h2", h2_ref), ("ph1", ph1_ref),
            ("ph2", ph2_ref), ("ll", ll_ref), ("pll", pll_ref),
            ("pr", pr_ref), ("bo", bo_ref), ("be", be_ref),
            ("pbo", pbo_ref), ("pbe", pbe_ref),
        ):
            ref[:] = g(ni[name].astype(jnp.int32), ref[:])
        p1l_ref[:] = g(jnp.where(v_k, new_p1l, NEG), p1l_ref[:])
        p1g_ref[:] = g(jnp.where(v_k, new_p1g, NEG), p1g_ref[:])
        p2m_ref[:] = g(jnp.where(v_k, new_p2m, NEG), p2m_ref[:])
        va_ref[:] = g(jnp.where(v_k, 1, 0).astype(jnp.int32), va_ref[:])
        a3 = active[None, :, :]
        blab_ref[:] = jnp.where(a3, nlab_ref[:], blab_ref[:])
        bgap_ref[:] = jnp.where(a3, ngap_ref[:], bgap_ref[:])
        pblab_ref[:] = jnp.where(a3, npblab_ref[:], pblab_ref[:])
        pbgap_ref[:] = jnp.where(a3, npbgap_ref[:], pbgap_ref[:])

    jax.lax.fori_loop(0, TB, step, 0)
    fin_ref[:] = id_ref[0:1, :]
    err_out_ref[:] = er_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "beam_size", "collapse_repeats", "W", "D", "needs_ext",
        "block_t", "block_b", "interpret",
    ),
)
def duplex_pallas_batch(
    l1: jnp.ndarray,  # [B, T1, A+1] f32 log probs
    l2: jnp.ndarray,  # [B, T2, A+1] f32 log probs
    root_gap: jnp.ndarray,  # [B, Wr] f32
    lo: jnp.ndarray,  # [T1] i32 (shared envelope)
    hi: jnp.ndarray,  # [T1] i32
    threshold_log,
    lengths: jnp.ndarray,  # [B] i32
    *,
    beam_size: int,
    collapse_repeats: bool,
    W: int,
    D: int,
    needs_ext: bool,
    block_t: int = 32,
    block_b: int = 0,
    interpret: bool = False,
):
    """Fused banded duplex decode for a batch sharing one envelope;
    duplex_fast_batch output contract (labels_rev / count / err).

    ``block_b=0`` (default) picks the widest lane block whose VMEM
    footprint (8 band buffers + the resident l2/root blocks) fits the
    ~12 MB budget — 256 lanes for typical banded workloads, which is
    ~30% faster per read than 128."""
    B, T1, A1 = l1.shape
    A = A1 - 1
    T2 = l2.shape[1]
    K = beam_size
    KP = 8
    if not (1 <= K <= KP and K * A <= 24 and A1 <= A1P):
        raise ValueError("duplex_pallas supports beam_size<=8, beam*labels<=24")
    Wp = -(-W // 8) * 8
    TB = min(block_t, max(T1, 1))
    if block_b == 0:
        block_b = 64
        for cand in (256, 128):
            vmem = (8 * KP * Wp + T2 * A1P + T2 + Wp + 16) * cand * 4
            if vmem <= 12 * 2**20:
                block_b = cand
                break
    Bt = min(block_b, max(B, 1))
    Tp = -(-T1 // TB) * TB
    Bp = -(-B // Bt) * Bt

    lo = jnp.asarray(lo, jnp.int32)
    hi = jnp.asarray(hi, jnp.int32)
    wb = lo - 1
    d = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.diff(wb)])
    lo_p = jnp.pad(lo, (0, Tp - T1))
    hi_p = jnp.pad(hi, (0, Tp - T1), constant_values=1)
    d_p = jnp.pad(d, (0, Tp - T1))

    l1p = jnp.pad(l1, ((0, Bp - B), (0, Tp - T1), (0, A1P - A1)))
    l1t = jnp.transpose(l1p, (1, 2, 0))  # [Tp, A1P, Bp]
    l2t = jnp.transpose(
        jnp.pad(l2, ((0, Bp - B), (0, 0), (0, A1P - A1))), (1, 2, 0)
    ).reshape(T2 * A1P, Bp)
    # root rows padded so rootval(t2) = rg[t2+1] is always in bounds
    Wr = root_gap.shape[1]
    Rr = T2 + Wp + 2
    rgt = jnp.transpose(
        jnp.pad(
            jnp.asarray(root_gap, jnp.float32),
            ((0, Bp - B), (0, max(Rr - Wr, 0))),
            constant_values=NEG,
        )[:, :Rr],
        (1, 0),
    )
    Rrp = -(-Rr // 8) * 8
    rgt = jnp.pad(rgt, ((0, Rrp - Rr), (0, 0)), constant_values=NEG)

    lens_p = jnp.pad(jnp.asarray(lengths, jnp.int32), (0, Bp - B)).reshape(
        1, Bp
    )
    thr = jnp.asarray(threshold_log, jnp.float32).reshape(1, 1)

    grid = (Bp // Bt, Tp // TB)
    kernel = functools.partial(
        _duplex_kernel,
        K=K, KP=KP, A=A, TB=TB, W=Wp, D=int(D),
        collapse=collapse_repeats, needs_ext=needs_ext,
    )
    band = lambda: pltpu.VMEM((KP, Wp, Bt), jnp.float32)
    kpf = lambda: pltpu.VMEM((KP, Bt), jnp.float32)
    kpi = lambda: pltpu.VMEM((KP, Bt), jnp.int32)
    ids_log, fin, err = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1), lambda i, j, *_: (0, 0), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec((TB, A1P, Bt), lambda i, j, *_: (j, 0, i)),
                pl.BlockSpec((T2 * A1P, Bt), lambda i, j, *_: (0, i)),
                pl.BlockSpec((Rrp, Bt), lambda i, j, *_: (0, i)),
                pl.BlockSpec((1, Bt), lambda i, j, *_: (0, i)),
            ],
            out_specs=[
                pl.BlockSpec((TB, KP, Bt), lambda i, j, *_: (j, 0, i)),
                pl.BlockSpec((1, Bt), lambda i, j, *_: (0, i)),
                pl.BlockSpec((1, Bt), lambda i, j, *_: (0, i)),
            ],
            scratch_shapes=[
                band(), band(), band(), band(),
                band(), band(), band(), band(),
                kpf(), kpf(), kpf(),
                kpi(), kpi(), kpi(), kpi(), kpi(),
                kpi(), kpi(), kpi(), kpi(),
                kpi(), kpi(), kpi(), kpi(),
                pltpu.VMEM((1, Bt), jnp.int32),
                pltpu.SMEM((1,), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Tp, KP, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        ],
        interpret=interpret,
    )(lo_p, hi_p, d_p, thr, l1t, l2t, rgt, lens_p)

    labels_rev, _, count = _traceback_scan_batch(
        fin[0, :B], ids_log[:T1, :, :B], T1, K, A
    )
    return {"labels_rev": labels_rev, "count": count, "err": err[0, :B]}
