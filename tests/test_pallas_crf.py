"""CRF beam Pallas kernel vs the XLA fast engine (interpret mode): must be
bit-identical (same hash-identity semantics, same linear-domain arithmetic,
same renormalization)."""

import numpy as np
import pytest

from fast_ctc_decode_tpu.ops import beam_fast, beam_pallas
from fast_ctc_decode_tpu.parallel.pipeline import BatchCrfBeamDecoder


def _assert_same(po, xo, B):
    for b in range(B):
        assert int(po["err"][b]) == int(xo["err"][b]), b
        assert int(po["count"][b]) == int(xo["count"][b]), b
        n = int(po["count"][b])
        assert np.array_equal(
            np.asarray(po["labels_rev"][b])[:n],
            np.asarray(xo["labels_rev"][b])[:n],
        ), b
        assert np.array_equal(
            np.asarray(po["times_rev"][b])[:n],
            np.asarray(xo["times_rev"][b])[:n],
        ), b


class TestCrfPallasParity:
    @pytest.mark.parametrize("S,thr", [(8, 0.02), (64, 0.0), (16, 0.0)])
    def test_bit_identical_vs_fast(self, S, thr):
        rng = np.random.RandomState(S)
        B, T, A1, K = 3, 20, 5, 5
        probs = rng.rand(B, T, S, A1).astype(np.float32)
        probs /= probs.sum(-1, keepdims=True)
        inits = rng.rand(B, S).astype(np.float32)
        lens = np.array([T, T - 5, T], np.int32)
        po = beam_pallas.crf_beam_search_pallas_batch(
            probs, inits, lens, np.float32(thr), beam_size=K,
            block_t=8, block_b=8, interpret=True,
        )
        xo = beam_fast.crf_beam_search_fast_batch(
            probs, inits, lens, np.float32(thr), beam_size=K
        )
        _assert_same(po, xo, B)

    def test_small_alphabet_wide_beam(self):
        rng = np.random.RandomState(7)
        B, T, S, A1, K = 2, 16, 4, 3, 8
        probs = rng.rand(B, T, S, A1).astype(np.float32)
        probs /= probs.sum(-1, keepdims=True)
        inits = rng.rand(B, S).astype(np.float32)
        lens = np.full((B,), T, np.int32)
        po = beam_pallas.crf_beam_search_pallas_batch(
            probs, inits, lens, np.float32(0.0), beam_size=K,
            block_t=8, block_b=8, interpret=True,
        )
        xo = beam_fast.crf_beam_search_fast_batch(
            probs, inits, lens, np.float32(0.0), beam_size=K
        )
        _assert_same(po, xo, B)

    def test_batch_decoder_pallas_engine(self):
        rng = np.random.RandomState(9)
        B, T, S, A1 = 8, 18, 8, 5
        probs = rng.rand(B, T, S, A1).astype(np.float32)
        probs /= probs.sum(-1, keepdims=True)
        inits = rng.rand(B, S).astype(np.float32)
        lens = np.full((B,), T, np.int32)
        dp = BatchCrfBeamDecoder("NACGT", T=T, n_state=S, engine="pallas")
        df = BatchCrfBeamDecoder("NACGT", T=T, n_state=S, engine="fast")
        assert dp.decode(probs, inits, lens) == df.decode(probs, inits, lens)


class TestNonPow2States:
    def test_s9_matches_fast(self):
        # S=9 (3-base CRF): the select tree pads the state axis to 16;
        # regression for a trace-time crash on non-power-of-two n_state
        rng = np.random.RandomState(11)
        B, T, S, A1, K = 2, 14, 9, 4, 5
        probs = rng.rand(B, T, S, A1).astype(np.float32)
        probs /= probs.sum(-1, keepdims=True)
        inits = rng.rand(B, S).astype(np.float32)
        lens = np.full((B,), T, np.int32)
        po = beam_pallas.crf_beam_search_pallas_batch(
            probs, inits, lens, np.float32(0.0), beam_size=K,
            block_t=8, block_b=8, interpret=True,
        )
        xo = beam_fast.crf_beam_search_fast_batch(
            probs, inits, lens, np.float32(0.0), beam_size=K
        )
        _assert_same(po, xo, B)
