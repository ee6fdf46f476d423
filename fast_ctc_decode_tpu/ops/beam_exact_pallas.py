"""Pallas TPU kernel for BIT-EXACT 1D CTC prefix beam search.

The exact tree engine (ops/beam.py) reproduces the reference
(/root/reference/src/search.rs:159-301) including node-id allocation
order, tie-breaks, and per-label emit times — but its `lax.scan` carry
drags the whole ``[N] parent/label/time`` + ``[N+1, A]`` child table
through HBM twice per timestep, capping it at tens of reads/s batched.
This kernel is the same semantics with the tree resident ON-CHIP:

 - **One read per grid program.**  The suffix tree (parent/label/time
   arrays + dense child table) lives in SMEM and is read/written with
   ordinary scalar indexing; per-step allocation runs as a branch-free
   scalar sweep in the reference's exact ``add_node`` order (tip-major,
   labels ascending — ops/beam.py `_allocate_nodes_core`).

 - **Merge/selection on (32, 1) columns** exactly as in the fused
   exact-duplex kernel (ops/duplex_exact_pallas.py `_merge_select`):
   rows 0..7 are beam tips, rows 8..8+K*A the extension candidates; the
   analytic merge (a node receives at most blank + stay + one arrival,
   ops/beam.py:252-288) folds with masked reductions, selection is K
   rounds of (max total, tie -> min node id), and the scalar side gets
   one packed int extraction per slot.

 - **Posteriors ride SMEM** as a flat (T*8,) row copy: the sweep reads
   the A+1 scalars it needs per step; vector columns are built by
   scalar-broadcast selects (scalar->vector is free; it is the
   vector->scalar direction that stalls the scalar pipeline).

Outputs match beam_search_device: labels_rev/times_rev (deepest-first),
count, err; reads that exceed ``max_nodes`` return NODE_OVERFLOW and
the caller re-runs them on the XLA engine (whose budget is the true
worst case), exactly like the duplex pipeline's overflow path.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import errors

NEG_INF = np.float32(-np.inf)
POS_INF = np.float32(np.inf)
_I32_MAX = np.iinfo(np.int32).max
A1P = 8  # posterior rows padded to 8 lanes
NODE_CAP = 32766  # packed beam word carries node+2 in 15 bits
DEFAULT_KERNEL_NODES = 12288  # ~1.7x the ~7k nodes a T=1000 read allocates


def exact_pallas_ok(beam_size: int, n_labels: int) -> bool:
    """Eligibility for the fused kernel's static (32, 1) entry space."""
    return beam_size <= 8 and beam_size * n_labels <= 24


def _c11(x):
    return jnp.full((1, 1), x)


def _exact_beam_kernel(
    *refs,
    K: int,
    A: int,
    S: int,
    T: int,
    N: int,
    TL: int,
    collapse: bool,
    crf: bool,
):
    """Shared kernel body; see the module docstring.

    Plain refs:  scal, thr, ps(SMEM flat rows), out, <scratch>
    CRF refs:    scal, thr, l1(VMEM [T*S, A1P] rows), init(SMEM [S]),
                 out, <scratch>
    Scratch: par/lab/tim/child SMEM tables, bm_node/valid/gp/state,
    misc, beamf (VMEM (32, 8): lanes 0=lab 1=gap).
    """
    if crf:
        (scal_ref, thr_ref, l1_ref, init_ref, out_ref,
         par_s, lab_s, tim_s, child_s,
         bm_node, bm_valid, bm_gp, bm_state, misc, beamf_ref) = refs
    else:
        (scal_ref, thr_ref, ps_ref, out_ref,
         par_s, lab_s, tim_s, child_s,
         bm_node, bm_valid, bm_gp, bm_state, misc, beamf_ref) = refs
    KA = K * A
    lane_out = jax.lax.broadcasted_iota(jnp.int32, (1, TL), 1)
    sub_e = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0)
    a_of_e = (sub_e - 8) % np.int32(A)
    k_of_e = (sub_e - 8) // np.int32(A)
    is_tip_e = sub_e < 8

    length = scal_ref[0, 0, 0]
    thr = thr_ref[0, 0]

    # ---- init: beam scalars + counters (tree tables need no init: a
    # child lookup is validated against parent/label, sound on garbage
    # because children are unique — see ops/duplex_exact_pallas.py) ----
    if crf:
        # beam init from init_state max/argmax (src/search.rs:54-59;
        # first max wins ties, as jnp.argmax)
        best = init_ref[0, 0, 0]
        arg = jnp.int32(0)
        for s in range(1, S):
            v = init_ref[0, 0, s]
            better = v > best
            arg = jnp.where(better, s, arg)
            best = jnp.where(better, v, best)
        init_lab, init_gap = best, init_ref[0, 0, 0]
    else:
        init_lab, init_gap, arg = np.float32(0.0), np.float32(1.0), 0
    for k in range(K):
        bm_node[k] = jnp.int32(-1) if k == 0 else jnp.int32(-2)
        bm_valid[k] = jnp.int32(1 if k == 0 else 0)
        bm_gp[k] = jnp.int32(1 if k == 0 else 0)
        bm_state[k] = jnp.where(k == 0, jnp.int32(arg), 0)
    row0_e = sub_e == 0
    beamf_ref[:, 0:1] = jnp.where(row0_e, init_lab, 0.0)  # lab
    beamf_ref[:, 1:2] = jnp.where(row0_e, init_gap, 0.0)  # gap
    misc[0] = jnp.int32(0)  # n_nodes
    misc[1] = jnp.int32(errors.OK)

    def child_of(n, a, n_nodes):
        """get_child with garbage-proof validation."""
        c = child_s[(n + 1) * np.int32(A) + a]
        cs = jnp.clip(c, 0, N - 1)
        ok = (c >= 0) & (c < n_nodes) & (par_s[cs] == n) & (lab_s[cs] == a)
        return jnp.where(ok, c, -1)

    def to_e(col32, fill):
        """tip values (rows 0..K of a (32,1) column) -> candidate rows."""
        out = jnp.full((32, 1), fill, col32.dtype)
        for k in range(K):
            out = jnp.where(k_of_e == k, col32[k : k + 1, :], out)
        return out

    def tips8_i(vals, fill=0):
        col = jnp.full((32, 1), fill, jnp.int32)
        for k in range(K):
            col = jnp.where(sub_e == k, vals[k], col)
        return col

    # ------------------------------------------------------------- step
    def step(t, _):
        err = misc[1]

        @pl.when((t < length) & (err == 0))
        def _do_step():
            n_nodes0 = misc[0]
            if crf:
                # per-tip probability rows probs[t, state_k, :] — scalar
                # dynamic VMEM row reads (state is an SMEM scalar here,
                # unlike the lanes=reads batch kernel's select tree)
                prow = [
                    l1_ref[
                        0,
                        pl.ds(
                            t * np.int32(S)
                            + jnp.clip(bm_state[k], 0, S - 1),
                            1,
                        ),
                        :,
                    ]
                    for k in range(K)
                ]
                p0_k = [prow[k][0, 0] for k in range(K)]
                plab_ka = [
                    [prow[k][0, a + 1] for a in range(A)] for k in range(K)
                ]
            else:
                base = t * np.int32(A1P)
                p0_s = ps_ref[0, 0, base]
                plab_s = [
                    ps_ref[0, 0, base + np.int32(a + 1)] for a in range(A)
                ]
                plab_ka = [plab_s] * K

            tip_lbl = []
            for k in range(K):
                n = bm_node[k]
                tl = jnp.where(n >= 0, lab_s[jnp.clip(n, 0, N - 1)], -1)
                tip_lbl.append(tl)

            # ---- scalar sweep: child lookups + ordered allocation ----
            # (reference add_node order: tip-major, labels ascending)
            ovf = jnp.int32(0) == jnp.int32(1)
            cand_id = [None] * KA
            for k in range(K):
                n = bm_node[k]
                vld_k = bm_valid[k] != 0
                gp_k = bm_gp[k] != 0
                for a in range(A):
                    idx = k * A + a
                    pushed = vld_k & jnp.logical_not(plab_ka[k][a] < thr)
                    if collapse and not crf:
                        is_rep_s = tip_lbl[k] == a
                        gate = jnp.logical_not(is_rep_s) | gp_k
                    else:
                        gate = jnp.int32(1) != 0
                    c = child_of(n, jnp.int32(a), n_nodes0)
                    needs_new = pushed & (c < 0) & gate
                    nn = misc[0]
                    can = needs_new & (nn < N)
                    ovf = ovf | (needs_new & (nn >= N))
                    # branch-free allocation: non-allocating candidates
                    # write to the dump rows (node N / child row N+1)
                    ci = jnp.where(
                        can,
                        (n + 1) * np.int32(A) + np.int32(a),
                        np.int32((N + 1) * A + a),
                    )
                    child_s[ci] = nn
                    nw = jnp.where(can, nn, np.int32(N))
                    par_s[nw] = n
                    lab_s[nw] = jnp.int32(a)
                    tim_s[nw] = t
                    misc[0] = nn + can.astype(jnp.int32)
                    cand_id[idx] = jnp.where(c >= 0, c, jnp.where(can, nn, -1))

            # ---- vector columns ----
            lab8 = beamf_ref[:, 0:1]
            gap8 = beamf_ref[:, 1:2]
            lg8 = lab8 + gap8
            valid8 = tips8_i([bm_valid[k] for k in range(K)]) != 0
            node8 = tips8_i([bm_node[k] for k in range(K)], fill=-2)
            tiplbl8 = tips8_i(tip_lbl, fill=-9)

            plab_c = jnp.full((32, 1), NEG_INF)
            if crf:
                for k in range(K):
                    for a in range(A):
                        plab_c = jnp.where(
                            (k_of_e == k) & (a_of_e == a),
                            plab_ka[k][a],
                            plab_c,
                        )
                st8 = tips8_i([bm_state[k] for k in range(K)])
                stf_c = (
                    (to_e(st8, 0) * np.int32(A)) % np.int32(S) + a_of_e
                ).astype(jnp.int32)
                p0_8 = jnp.zeros((32, 1), jnp.float32)
                for k in range(K):
                    p0_8 = jnp.where(sub_e == k, p0_k[k], p0_8)
            else:
                for a in range(A):
                    plab_c = jnp.where(a_of_e == a, plab_s[a], plab_c)
                st8 = jnp.zeros((32, 1), jnp.int32)
                stf_c = jnp.zeros((32, 1), jnp.int32)
                p0_8 = jnp.full((32, 1), p0_s)
            cid_c = jnp.full((32, 1), -1, jnp.int32)
            for idx in range(KA):
                cid_c = jnp.where(sub_e == idx + 8, cand_id[idx], cid_c)

            lab_c = to_e(lab8, 0.0)
            gap_c = to_e(gap8, 0.0)
            lg_c = to_e(lg8, 0.0)
            valid_c = to_e(valid8.astype(jnp.int32), 0) != 0
            pushed_c = valid_c & jnp.logical_not(plab_c < thr)
            if collapse and not crf:
                isrep_c = to_e(tiplbl8, -9) == a_of_e
            else:
                isrep_c = jnp.zeros((32, 1), bool)

            # candidate masses (ops/beam.py:264): fork keeps only the gap
            # field of a repeat, arrival takes lab+gap (CRF: always lg,
            # ops/crf.py m_arr)
            m_nid_c = jnp.where(isrep_c, gap_c, lg_c) * plab_c
            push_nid_c = pushed_c & (cid_c >= 0)

            # ---- analytic merge on the tips rows ----
            push_b8 = valid8 & (p0_8 > thr)
            gap_tip8 = jnp.where(push_b8, lg8 * p0_8, 0.0)

            # stay: the tip's own-label mass (plain collapse only)
            if collapse and not crf:
                stay_plab8 = jnp.full((32, 1), NEG_INF)
                for a in range(A):
                    stay_plab8 = jnp.where(
                        tiplbl8 == a, plab_s[a], stay_plab8
                    )
                push_stay8 = (
                    valid8
                    & (tiplbl8 >= 0)
                    & jnp.logical_not(stay_plab8 < thr)
                )
                stay8 = jnp.where(push_stay8, lab8 * stay_plab8, 0.0)
            else:
                push_stay8 = jnp.zeros((32, 1), bool)
                stay8 = jnp.zeros((32, 1), jnp.float32)

            recv8 = jnp.zeros((32, 1), jnp.float32)
            hit8 = jnp.zeros((32, 1), jnp.int32)
            matched_c = jnp.zeros((32, 1), bool)
            for j in range(K):
                # invalid tips match nothing via a poisoned node id (-3
                # never equals a candidate id >= 0 — exact, not a hash
                # budget), and tip rows carry cid_c = -1 so push_nid_c
                # already excludes them
                n_j = jnp.where(bm_valid[j] != 0, bm_node[j], -3)
                sel = push_nid_c & (cid_c == n_j)
                row = sub_e == j
                acc = jnp.sum(
                    jnp.where(sel, m_nid_c, 0.0), axis=0, keepdims=True
                )
                got = jnp.max(
                    jnp.where(sel, 1, 0), axis=0, keepdims=True
                )
                recv8 = jnp.where(row, acc, recv8)
                hit8 = jnp.where(row, got, hit8)
                matched_c = matched_c | sel

            lab_tip8 = stay8 + recv8
            tip_valid8 = push_b8 | push_stay8 | (hit8 != 0)

            # ---- fused (32, 1) candidate table ----
            fresh_c = push_nid_c & jnp.logical_not(matched_c)
            valid32 = (
                jnp.where(
                    is_tip_e,
                    tip_valid8.astype(jnp.int32),
                    fresh_c.astype(jnp.int32),
                )
                != 0
            )
            col_id = jnp.where(is_tip_e, node8, cid_c)
            col_l = jnp.where(is_tip_e, lab_tip8, m_nid_c)
            col_g = jnp.where(is_tip_e, gap_tip8, 0.0)
            col_st = jnp.where(is_tip_e, st8, stf_c)
            total32 = col_l + col_g
            isn = jnp.isnan(total32)
            col_key = jnp.where(
                valid32,
                jnp.where(isn, POS_INF, total32 + 0.0),
                NEG_INF,
            )
            cnt = jnp.sum(
                jnp.where(valid32, 1, 0), axis=0, keepdims=True
            )[0, 0]
            any_nan = (
                jnp.max(
                    jnp.where(valid32 & isn, 1, 0), axis=0, keepdims=True
                )[0, 0]
                != 0
            )
            nan_flag = (cnt >= 2) & any_nan
            empty_flag = cnt == 0

            # ---- top-K: (total desc, tie -> min node id) ----
            nb_node = jnp.full((32, 1), -2, jnp.int32)
            nb_valid = jnp.zeros((32, 1), jnp.int32)
            nb_state = jnp.zeros((32, 1), jnp.int32)
            nb_lab = jnp.zeros((32, 1), jnp.float32)
            nb_gap = jnp.zeros((32, 1), jnp.float32)
            top = None
            for r in range(K):
                mx = jnp.max(col_key, axis=0, keepdims=True)  # (1, 1)
                okv = mx > NEG_INF
                at = col_key == mx
                sid = jnp.min(
                    jnp.where(at, col_id, _I32_MAX), axis=0, keepdims=True
                )
                chosen = at & (col_id == sid)

                def pick_f(colv):
                    return jnp.sum(
                        jnp.where(chosen, colv, 0.0), axis=0, keepdims=True
                    )

                def pick_i(colv):
                    return jnp.sum(
                        jnp.where(chosen, colv, 0), axis=0, keepdims=True
                    )

                if top is None:
                    top = pick_f(total32)
                rowr = sub_e == r
                sel_ok = rowr & okv
                nb_node = jnp.where(sel_ok, sid, nb_node)
                nb_valid = jnp.where(sel_ok, 1, nb_valid)
                if crf:
                    nb_state = jnp.where(sel_ok, pick_i(col_st), nb_state)
                nb_lab = jnp.where(sel_ok, pick_f(col_l), nb_lab)
                nb_gap = jnp.where(sel_ok, pick_f(col_g), nb_gap)
                col_key = jnp.where(chosen, NEG_INF, col_key)

            # renormalize by the top total (true division — reference
            # src/search.rs:278-282); invalid slots store literal 0
            okp = nb_valid != 0
            nb_lab = jnp.where(okp, nb_lab / top, 0.0)
            nb_gap = jnp.where(okp, nb_gap / top, 0.0)
            beamf_ref[:, 0:1] = nb_lab
            beamf_ref[:, 1:2] = nb_gap

            gpbit = (nb_gap > 0.0).astype(jnp.int32)
            packed = (
                ((nb_node + 2) & np.int32(0x7FFF))
                | (nb_valid << np.int32(15))
                | (gpbit << np.int32(16))
                | (nb_state << np.int32(17))
            )
            for k in range(K):
                pk = packed[k : k + 1, 0:1][0, 0]
                bm_node[k] = (pk & np.int32(0x7FFF)) - 2
                bm_valid[k] = jax.lax.shift_right_logical(pk, np.int32(15)) & 1
                bm_gp[k] = jax.lax.shift_right_logical(pk, np.int32(16)) & 1
                bm_state[k] = jax.lax.shift_right_logical(pk, np.int32(17))

            step_err = jnp.where(
                ovf,
                errors.NODE_OVERFLOW,
                jnp.where(
                    nan_flag,
                    errors.INCOMPARABLE_VALUES,
                    jnp.where(empty_flag, errors.RAN_OUT_OF_BEAM, errors.OK),
                ),
            )
            misc[1] = jnp.where(
                misc[1] > 0, misc[1], step_err
            ).astype(jnp.int32)

        return 0

    jax.lax.fori_loop(0, T, step, 0, unroll=False)

    # ------------------------------------------------------- traceback
    labs = jnp.full((1, TL), -1, jnp.int32)
    tims = jnp.full((1, TL), -1, jnp.int32)

    def tcond(st):
        return st[0] >= 0

    def tbody(st):
        cur, i, labs, tims = st
        cc = jnp.clip(cur, 0, N - 1)
        labs = jnp.where(lane_out == i, lab_s[cc], labs)
        tims = jnp.where(lane_out == i, tim_s[cc], tims)
        return (par_s[cc], i + 1, labs, tims)

    cur0, count0, labs, tims = jax.lax.while_loop(
        tcond, tbody, (bm_node[0], jnp.int32(0), labs, tims)
    )
    labs = jnp.where(lane_out == np.int32(TL - 2), count0, labs)
    labs = jnp.where(lane_out == np.int32(TL - 1), misc[1], labs)
    out_ref[0, 0:1, :] = labs
    out_ref[0, 1:2, :] = tims


@functools.partial(
    jax.jit,
    static_argnames=("beam_size", "collapse_repeats", "max_nodes", "interpret"),
)
def beam_search_exact_pallas_batch(
    probs,  # [B, T, A+1] f32
    lengths,  # [B] i32
    beam_cut_threshold,
    *,
    beam_size: int,
    collapse_repeats: bool = True,
    max_nodes: int,
    interpret: bool = False,
):
    """Bit-exact tree-engine decode, one read per grid program.

    Same outputs as ops.beam.beam_search_device_batch; reads that exceed
    ``max_nodes`` return err=NODE_OVERFLOW (re-run them on the XLA
    engine).  Requires beam_size <= 8, beam_size*n_labels <= 24 and
    max_nodes <= 32766 (the packed beam word carries node+2 in 15 bits).
    """
    B, T, A1 = probs.shape
    A = A1 - 1
    K = beam_size
    if K > 8 or K * A > 24:
        raise ValueError(
            "beam_exact_pallas supports beam_size <= 8, beam*labels <= 24"
        )
    N = int(max_nodes)
    if N > 32766:
        raise ValueError("beam_exact_pallas supports max_nodes <= 32766")
    TL = -(-(T + 2) // 128) * 128

    f32 = jnp.float32
    probs_p = jnp.pad(
        jnp.asarray(probs, f32), ((0, 0), (0, 0), (0, A1P - A1))
    )
    scal = jnp.stack(
        [jnp.asarray(lengths, jnp.int32)]
        + [jnp.zeros((B,), jnp.int32)] * 7,
        axis=1,
    )
    thr = jnp.asarray(beam_cut_threshold, f32).reshape(1, 1)

    kernel = functools.partial(
        _exact_beam_kernel,
        K=K, A=A, S=1, T=T, N=N, TL=TL, collapse=collapse_repeats,
        crf=False,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 1, T * A1P), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=pl.BlockSpec((1, 2, TL), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 2, TL), jnp.int32),
        scratch_shapes=_scratch(N, A),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        scal.reshape(B, 1, 8),
        thr,
        probs_p.reshape(B, 1, T * A1P),
    )
    return {
        "labels_rev": out[:, 0, :T],
        "times_rev": out[:, 1, :T],
        "count": out[:, 0, TL - 2],
        "err": out[:, 0, TL - 1],
    }


def _scratch(N, A):
    return [
        pltpu.SMEM((N + 1,), jnp.int32),  # parent
        pltpu.SMEM((N + 1,), jnp.int32),  # label
        pltpu.SMEM((N + 1,), jnp.int32),  # time
        pltpu.SMEM(((N + 2) * A,), jnp.int32),  # child table
        pltpu.SMEM((8,), jnp.int32),  # bm_node
        pltpu.SMEM((8,), jnp.int32),  # bm_valid
        pltpu.SMEM((8,), jnp.int32),  # bm_gp
        pltpu.SMEM((8,), jnp.int32),  # bm_state
        pltpu.SMEM((8,), jnp.int32),  # misc
        pltpu.VMEM((32, 8), jnp.float32),  # beamf
    ]


@functools.partial(
    jax.jit,
    static_argnames=("beam_size", "max_nodes", "interpret"),
)
def crf_beam_search_exact_pallas_batch(
    probs,  # [B, T, S, A+1] f32
    init_states,  # [B, S] f32
    lengths,  # [B] i32
    beam_cut_threshold,
    *,
    beam_size: int,
    max_nodes: int,
    interpret: bool = False,
):
    """CRF variant (reference src/search.rs:38-157): same bit-exact tree
    semantics as ops.crf.crf_beam_search_device, per-tip probability rows
    fetched by scalar dynamic VMEM indexing.  Requires S <= 32768 on top
    of the plain kernel's limits (state rides the packed beam word)."""
    B, T, S, A1 = probs.shape
    A = A1 - 1
    K = beam_size
    if K > 8 or K * A > 24:
        raise ValueError(
            "beam_exact_pallas supports beam_size <= 8, beam*labels <= 24"
        )
    if S > 32768:
        raise ValueError("crf exact pallas supports <= 32768 states")
    N = int(max_nodes)
    if N > 32766:
        raise ValueError("beam_exact_pallas supports max_nodes <= 32766")
    TL = -(-(T + 2) // 128) * 128

    f32 = jnp.float32
    probs_p = jnp.pad(
        jnp.asarray(probs, f32), ((0, 0), (0, 0), (0, 0), (0, A1P - A1))
    )
    scal = jnp.stack(
        [jnp.asarray(lengths, jnp.int32)]
        + [jnp.zeros((B,), jnp.int32)] * 7,
        axis=1,
    )
    thr = jnp.asarray(beam_cut_threshold, f32).reshape(1, 1)

    kernel = functools.partial(
        _exact_beam_kernel,
        K=K, A=A, S=S, T=T, N=N, TL=TL, collapse=False, crf=True,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, T * S, A1P), lambda i: (i, 0, 0)),
            pl.BlockSpec(
                (1, 1, S), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=pl.BlockSpec((1, 2, TL), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 2, TL), jnp.int32),
        scratch_shapes=_scratch(N, A),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        scal.reshape(B, 1, 8),
        thr,
        probs_p.reshape(B, T * S, A1P),
        jnp.asarray(init_states, f32).reshape(B, 1, S),
    )
    return {
        "labels_rev": out[:, 0, :T],
        "times_rev": out[:, 1, :T],
        "count": out[:, 0, TL - 2],
        "err": out[:, 0, TL - 1],
    }
