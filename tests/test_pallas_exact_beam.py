"""Fused 1D exact-tree kernel (ops/beam_exact_pallas.py) vs the XLA
exact engine (ops/beam.py): bit parity on labels, times (emit-time
path semantics), counts, and error codes.

The XLA engine is the validated reference-semantics spec (full oracle
crosscheck matrix, tests/test_oracle_crosscheck.py); the kernel must
reproduce it bit-for-bit including node-id tie-breaks and the
re-derivation path times the hash engines deviate on.
"""

import numpy as np
import jax
import pytest

from fast_ctc_decode_tpu.ops import beam as beam_exact
from fast_ctc_decode_tpu.ops import beam_exact_pallas as bxp

INTERP = jax.default_backend() != "tpu"


def _run_both(x, lens, thr, beam_size, collapse, kernel_nodes=None):
    B, T, A1 = x.shape
    N = beam_exact.default_max_nodes(T, beam_size, A1 - 1)
    o1 = jax.device_get(
        beam_exact.beam_search_device_batch(
            x, lens, np.float32(thr), beam_size=beam_size,
            collapse_repeats=collapse, max_nodes=N,
        )
    )
    o2 = jax.device_get(
        bxp.beam_search_exact_pallas_batch(
            x, lens, np.float32(thr), beam_size=beam_size,
            collapse_repeats=collapse,
            max_nodes=kernel_nodes or min(N, bxp.NODE_CAP),
            interpret=INTERP,
        )
    )
    return o1, o2


def _assert_equal(o1, o2, ctx=""):
    B = len(o1["err"])
    for b in range(B):
        e1, e2 = int(o1["err"][b]), int(o2["err"][b])
        assert e1 == e2, (ctx, b, e1, e2)
        c1, c2 = int(o1["count"][b]), int(o2["count"][b])
        assert c1 == c2, (ctx, b, c1, c2)
        assert list(o1["labels_rev"][b][:c1]) == list(
            o2["labels_rev"][b][:c2]
        ), (ctx, b)
        assert list(o1["times_rev"][b][:c1]) == list(
            o2["times_rev"][b][:c2]
        ), (ctx, b)


@pytest.mark.parametrize("collapse", [True, False])
@pytest.mark.parametrize("thr", [0.0, 0.1])
def test_random_parity(collapse, thr):
    rng = np.random.RandomState(11)
    for T in (1, 3, 24, 60):
        B = 4
        x = rng.rand(B, T, 5).astype(np.float32)
        x /= np.linalg.norm(x, axis=2, keepdims=True)
        lens = rng.randint(1, T + 1, size=B).astype(np.int32)
        _assert_equal(*_run_both(x, lens, thr, 5, collapse), ctx=(T, thr))


def test_tie_heavy_and_uniform():
    rng = np.random.RandomState(3)
    B, T = 4, 40
    x = (rng.rand(B, T, 5) > 0.5).astype(np.float32) * 0.9 + 0.05
    lens = np.full(B, T, np.int32)
    _assert_equal(*_run_both(x, lens, 0.0, 5, True), ctx="ties")
    x2 = np.full((B, T, 5), 0.05, np.float32)
    # threshold prunes every candidate -> RanOutOfBeam parity
    _assert_equal(*_run_both(x2, lens, 0.1, 5, True), ctx="uniform-prune")


def test_nan_parity():
    rng = np.random.RandomState(5)
    B, T = 3, 16
    x = rng.rand(B, T, 5).astype(np.float32)
    x[0, 4, 2] = np.nan
    x[1, 0, 0] = np.nan
    lens = np.full(B, T, np.int32)
    o1, o2 = _run_both(x, lens, 0.0, 5, True)
    _assert_equal(o1, o2, ctx="nan")
    assert int(o1["err"][0]) != 0


def test_overflow_flag():
    rng = np.random.RandomState(9)
    B, T = 2, 40
    x = rng.rand(B, T, 5).astype(np.float32)
    lens = np.full(B, T, np.int32)
    o2 = jax.device_get(
        bxp.beam_search_exact_pallas_batch(
            x, lens, np.float32(0.0), beam_size=5, collapse_repeats=True,
            max_nodes=8, interpret=INTERP,
        )
    )
    assert all(int(e) != 0 for e in o2["err"])


def test_crf_random_parity():
    from fast_ctc_decode_tpu.ops import crf as crf_ops

    rng = np.random.RandomState(17)
    for T, S in ((1, 4), (12, 16), (30, 8)):
        B = 3
        x = rng.rand(B, T, S, 5).astype(np.float32)
        x /= x.sum(axis=-1, keepdims=True)
        init = rng.rand(B, S).astype(np.float32)
        init /= init.sum(axis=1, keepdims=True)
        lens = rng.randint(1, T + 1, size=B).astype(np.int32)
        N = beam_exact.default_max_nodes(T, 5, 4)
        o2 = jax.device_get(
            bxp.crf_beam_search_exact_pallas_batch(
                x, init, lens, np.float32(0.0), beam_size=5,
                max_nodes=min(N, bxp.NODE_CAP), interpret=INTERP,
            )
        )
        for b in range(B):
            o1 = jax.device_get(
                crf_ops.crf_beam_search_device(
                    x[b], init[b], np.int32(lens[b]), np.float32(0.0),
                    beam_size=5, max_nodes=N,
                )
            )
            c1, c2 = int(o1["count"]), int(o2["count"][b])
            assert int(o1["err"]) == int(o2["err"][b]), (T, S, b)
            assert c1 == c2, (T, S, b)
            assert list(o1["labels_rev"][:c1]) == list(
                o2["labels_rev"][b][:c2]
            ), (T, S, b)
            assert list(o1["times_rev"][:c1]) == list(
                o2["times_rev"][b][:c2]
            ), (T, S, b)


def test_crf_batch_decoder_exact_engine():
    """BatchCrfBeamDecoder(engine='exact') matches the single-read XLA
    exact engine's sequences."""
    from fast_ctc_decode_tpu.ops import crf as crf_ops
    from fast_ctc_decode_tpu.parallel.pipeline import BatchCrfBeamDecoder

    rng = np.random.RandomState(21)
    B, T, S = 8, 14, 8  # multiple of the 8-device test mesh
    x = rng.rand(B, T, S, 5).astype(np.float32)
    x /= x.sum(axis=-1, keepdims=True)
    init = rng.rand(B, S).astype(np.float32)
    init /= init.sum(axis=1, keepdims=True)
    lens = np.full(B, T, np.int32)
    dec = BatchCrfBeamDecoder(
        "NACGT", T=T, n_state=S, beam_size=5, engine="exact"
    )
    out = dec.decode(x, init, lens)
    for b, (seq, path, err) in enumerate(out):
        assert err == 0
        o1 = jax.device_get(
            crf_ops.crf_beam_search_device(
                x[b], init[b], np.int32(T), np.float32(0.0),
                beam_size=5,
                max_nodes=beam_exact.default_max_nodes(T, 5, 4),
            )
        )
        c = int(o1["count"])
        want = "".join("ACGT"[l] for l in list(o1["labels_rev"][:c])[::-1])
        assert seq == want, (b, seq, want)


def test_pipeline_overflow_fallback():
    """BatchBeamDecoder(engine='exact') must return complete results even
    when the fused kernel's node budget overflows (XLA re-run path).
    Off-TPU the decoder never selects the kernel; exercise the splice
    logic directly through decode_arrays semantics instead."""
    from fast_ctc_decode_tpu.parallel.pipeline import BatchBeamDecoder

    rng = np.random.RandomState(2)
    B, T = 8, 24
    x = rng.rand(B, T, 5).astype(np.float32)
    x /= np.linalg.norm(x, axis=2, keepdims=True)
    lens = np.full(B, T, np.int32)
    dec = BatchBeamDecoder(
        "NACGT", T=T, beam_size=5, beam_cut_threshold=0.1, engine="exact"
    )
    out = dec.decode(x, lens)
    for b, (seq, path, err) in enumerate(out):
        assert err == 0
        o1 = jax.device_get(
            beam_exact.beam_search_device(
                x[b], np.int32(T), np.float32(0.1), beam_size=5,
                collapse_repeats=True,
                max_nodes=beam_exact.default_max_nodes(T, 5, 4),
            )
        )
        c = int(o1["count"])
        want = "".join(
            "ACGT"[l] for l in list(o1["labels_rev"][:c])[::-1]
        )
        assert seq == want, (b, seq, want)
