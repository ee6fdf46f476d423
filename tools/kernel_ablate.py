"""Ablation timing of the fused 1D beam kernel's step phases.

Compiles semantically-WRONG kernel variants with individual phases
stubbed out to attribute step time: candidate expansion, hash mixes,
matching+recv, NaN/count error flags, selection rounds, id-log write.
Results guide optimization; nothing here is used by the library.

Usage: python tools/kernel_ablate.py [B] [T] [iters]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fast_ctc_decode_tpu import errors
from fast_ctc_decode_tpu.ops.beam_pallas import (
    NEG_INF,
    POS_INF,
    _I32_MAX,
    _SEED1,
    _SEED2,
    _mix1_i32,
    _mix2_i32,
)


def _kernel(
    thr_ref, probs_ref, len_ref, ids_out_ref, fin_ref, err_out_ref,
    lab_ref, gap_ref, h1_ref, h2_ref, ll_ref, id_ref, va_ref, er_ref,
    *, K, KP, A, TB, collapse, ablate,
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
    lens = len_ref[:]
    slot = jax.lax.broadcasted_iota(jnp.int32, (KP, Bt), 0)
    in_beam = slot < K
    KAP = max(-(-KA // 8) * 8, 8)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (KAP, Bt), 0)
    k_of_r = row_i // np.int32(A)
    a_of_r = row_i % np.int32(A)
    cand_in = row_i < KA

    def expand_k(x_kp, fill=0):
        out = jnp.full((KAP, Bt), fill, x_kp.dtype)
        for k in range(K):
            out = jnp.where(k_of_r == k, x_kp[k : k + 1, :], out)
        return out

    def step(jt, _):
        t = j * TB + jt
        err = er_ref[:]
        active = (t < lens) & (err == 0)

        lab = lab_ref[:]
        gap = gap_ref[:]
        h1 = h1_ref[:]
        h2 = h2_ref[:]
        lastlab = ll_ref[:]
        idv = id_ref[:]
        valid = (va_ref[:] != 0) & in_beam

        if "idlog" not in ablate:
            ids_out_ref[jt] = idv

        row = probs_ref[jt]
        p0 = row[0:1, :]
        lg = lab + gap

        plab_r = jnp.zeros((KAP, Bt), jnp.float32)
        for a in range(A):
            plab_r = jnp.where(a_of_r == a, row[1 + a : 2 + a, :], plab_r)
        if "mix" in ablate:
            th1 = expand_k(h1)
            th2 = expand_k(h2)
        else:
            h1e, h2e = expand_k(h1), expand_k(h2)
            th1 = jnp.zeros((KAP, Bt), jnp.int32)
            th2 = jnp.zeros((KAP, Bt), jnp.int32)
            for a in range(A):
                th1 = jnp.where(a_of_r == a, _mix1_i32(h1e, a), th1)
                th2 = jnp.where(a_of_r == a, _mix2_i32(h2e, a), th2)
        valid_r = (expand_k(va_ref[:]) != 0) & cand_in
        pushed = valid_r & ~(plab_r < thr)
        if collapse:
            is_rep_r = expand_k(lastlab, -9) == a_of_r
        else:
            is_rep_r = jnp.zeros((KAP, Bt), bool)
        gap_e = expand_k(gap)
        m_ext = jnp.where(is_rep_r, gap_e, expand_k(lg)) * plab_r

        if "match" in ablate:
            matched = jnp.zeros((KAP, Bt), bool)
            push_ext = pushed
            recv = jnp.zeros((KP, Bt), jnp.float32)
            recv_any = jnp.zeros((KP, Bt), bool)
        else:
            match = []
            matched = jnp.zeros((KAP, Bt), bool)
            for jj in range(K):
                m = (
                    (th1 == h1[jj : jj + 1, :])
                    & (th2 == h2[jj : jj + 1, :])
                    & (a_of_r == lastlab[jj : jj + 1, :])
                    & valid[jj : jj + 1, :]
                )
                match.append(m)
                matched = matched | m
            push_ext = pushed & (~is_rep_r | matched | (gap_e > 0.0))
            recv = jnp.zeros((KP, Bt), jnp.float32)
            recv_any = jnp.zeros((KP, Bt), bool)
            for jj in range(K):
                sel = match[jj] & push_ext
                acc = jnp.sum(
                    jnp.where(sel, m_ext, 0.0), axis=0, keepdims=True
                )
                got = jnp.any(sel, axis=0, keepdims=True)
                rmask = slot == jj
                recv = jnp.where(rmask, acc, recv)
                recv_any = recv_any | (rmask & got)

        if collapse:
            p_stay = jnp.zeros((KP, Bt), jnp.float32)
            for a in range(A):
                p_stay = p_stay + jnp.where(
                    lastlab == a, row[1 + a : 2 + a, :], 0.0
                )
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

        def key_of(v, tot):
            return jnp.where(
                v, jnp.where(jnp.isnan(tot), POS_INF, tot + 0.0), NEG_INF
            )

        fresh_valid = push_ext & ~matched
        fresh_id = t * KA + k_of_r * np.int32(A) + a_of_r
        tip_tot = tip_lab + tip_gap
        m_ext_v = jnp.where(fresh_valid, m_ext, 0.0)
        c_key = jnp.concatenate(
            [key_of(tip_valid, tip_tot), key_of(fresh_valid, m_ext_v)]
        )
        c_id = jnp.concatenate([idv, fresh_id])

        if "err" in ablate:
            nan_flag = jnp.zeros((1, Bt), bool)
            empty_flag = jnp.zeros((1, Bt), bool)
        else:
            c_valid = c_key > NEG_INF
            cnt = jnp.sum(jnp.where(c_valid, 1, 0), axis=0, keepdims=True)
            nanv = jnp.max(
                jnp.where(tip_valid & jnp.isnan(tip_tot), 1, 0),
                axis=0, keepdims=True,
            ) | jnp.max(
                jnp.where(fresh_valid & jnp.isnan(m_ext), 1, 0),
                axis=0, keepdims=True,
            )
            nan_flag = (cnt >= 2) & (nanv != 0)
            empty_flag = cnt == 0

        nrounds = 1 if "rounds" in ablate else K
        sel_rows = []
        top = None
        key = c_key
        for _ in range(nrounds):
            mx = jnp.max(key, axis=0, keepdims=True)
            slot_valid = mx > NEG_INF
            at = key == mx
            sid = jnp.min(
                jnp.where(at, c_id, _I32_MAX), axis=0, keepdims=True
            )
            chosen = at & (c_id == sid)
            ch_t = chosen[:KP]
            ch_f = chosen[KP:]

            def pick_t(arr, z):
                return jnp.sum(
                    jnp.where(ch_t, arr, z), axis=0, keepdims=True
                )

            def pick_f(arr, z):
                return jnp.sum(
                    jnp.where(ch_f, arr, z), axis=0, keepdims=True
                )

            sel_id = jnp.where(slot_valid, sid, -2)
            sel_ll = jnp.where(sid < 0, -1, sid % np.int32(A))
            sel_lab = pick_t(tip_lab, 0.0) + pick_f(m_ext_v, 0.0)
            sel_gap = pick_t(tip_gap, 0.0)
            if "hpick" in ablate:
                nh1 = sel_id * 7
                nh2 = sel_id * 13
            else:
                nh1 = pick_t(h1, 0) + pick_f(th1, 0)
                nh2 = pick_t(h2, 0) + pick_f(th2, 0)
            acc = [sel_lab, sel_gap, sel_id, nh1, nh2, sel_ll]
            if top is None:
                top = sel_lab + sel_gap
            key = jnp.where(chosen, NEG_INF, key)
            sel_rows.append((slot_valid, acc))

        step_err = jnp.where(
            nan_flag,
            errors.INCOMPARABLE_VALUES,
            jnp.where(empty_flag, errors.RAN_OUT_OF_BEAM, errors.OK),
        ).astype(jnp.int32)
        er_ref[:] = jnp.where(
            err > 0, err, jnp.where(active, step_err, 0)
        ).astype(jnp.int32)

        for r in range(len(sel_rows)):
            slot_valid, acc = sel_rows[r]
            g = lambda new, old: jnp.where(active, new, old)
            rs = slice(r, r + 1)
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

    jax.lax.fori_loop(0, TB, step, 0, unroll=TB if TB <= 8 else 1)
    fin_ref[:] = id_ref[0:1, :]
    err_out_ref[:] = er_ref[:]


@functools.partial(
    jax.jit, static_argnames=("beam_size", "block_t", "block_b", "ablate")
)
def run_ablate(probs, lengths, thr, *, beam_size, block_t=40, block_b=256,
               ablate=""):
    B, T, A1 = probs.shape
    A = A1 - 1
    K = beam_size
    KP = 8
    TB = block_t
    Bt = block_b
    assert T % TB == 0 and B % Bt == 0
    probs_t = jnp.transpose(probs.reshape(B, T * A1), (1, 0)).reshape(
        T, A1, B
    )
    lens = jnp.asarray(lengths, jnp.int32).reshape(1, B)
    thr2 = jnp.asarray(thr, jnp.float32).reshape(1, 1)
    kernel = functools.partial(
        _kernel, K=K, KP=KP, A=A, TB=TB, collapse=True,
        ablate=tuple(ablate.split(",")) if ablate else (),
    )
    ids_log, fin, err = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B // Bt, T // TB),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
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
            jax.ShapeDtypeStruct((T, KP, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
    )(thr2, probs_t, lens)
    return {"fin": fin, "err": err}


def _force(out):
    leaf = min(jax.tree_util.tree_leaves(out), key=lambda x: x.size)
    return np.asarray(leaf).ravel()[:1]


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    rng = np.random.RandomState(42)
    probs = rng.rand(B, T, 5).astype(np.float32)
    probs /= np.linalg.norm(probs, ord=2, axis=-1, keepdims=True)
    lengths = np.full((B,), T, np.int32)
    dev = jax.devices()[0]
    pd = jax.device_put(probs, dev)
    ld = jax.device_put(lengths, dev)
    thr = np.float32(0.1)

    base = None
    for ab in ("", "idlog", "mix", "match", "err", "rounds", "hpick",
               "match,mix", "rounds,err"):
        fn = functools.partial(run_ablate, pd, ld, thr, beam_size=5,
                               ablate=ab)
        out = fn()
        _force(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        _force(out)
        dt = (time.perf_counter() - t0) / iters
        if base is None:
            base = dt
        print(f"ablate={ab or 'none':12s} {dt*1e3:8.2f} ms  "
              f"delta {-(dt-base)*1e3:+7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
