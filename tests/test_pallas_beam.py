"""The Pallas fused beam kernel must be bit-identical to the scan engine
(ops/beam_fast.py) — same hashes, same merge, same selection, same errors.
On CPU these run in interpreter mode (slow), so shapes stay small; the TPU
benchmark exercises the compiled kernel at scale.
"""

import numpy as np
import pytest

from fast_ctc_decode_tpu import errors
from fast_ctc_decode_tpu.ops import beam_fast, beam_pallas


def rand_batch(B, T, A1, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.rand(B, T, A1).astype(np.float32)
    return x / np.linalg.norm(x, ord=2, axis=-1, keepdims=True)


def run_both(probs, lengths, thr, beam_size=5, collapse=True, **pk):
    ref = beam_fast.beam_search_fast_batch(
        probs, lengths, np.float32(thr),
        beam_size=beam_size, collapse_repeats=collapse,
    )
    got = beam_pallas.beam_search_pallas_batch(
        probs, lengths, np.float32(thr),
        beam_size=beam_size, collapse_repeats=collapse,
        interpret=True, **pk,
    )
    return ref, got


def assert_same(ref, got):
    for k in ("labels_rev", "times_rev", "count", "err"):
        assert np.array_equal(np.asarray(ref[k]), np.asarray(got[k])), k


class TestPallasBitParity:
    def test_ragged_batch(self):
        probs = rand_batch(4, 40, 5, seed=1)
        lengths = np.array([40, 23, 7, 40], np.int32)
        assert_same(*run_both(probs, lengths, 0.1))

    def test_block_boundaries(self):
        # T not a multiple of block_t, B not a multiple of block_b
        probs = rand_batch(3, 37, 5, seed=2)
        lengths = np.full((3,), 37, np.int32)
        ref, got = run_both(
            probs, lengths, 0.1, block_t=16, block_b=128
        )
        assert_same(ref, got)

    def test_collapse_off_and_thr0(self):
        probs = rand_batch(2, 30, 4, seed=3)
        lengths = np.full((2,), 30, np.int32)
        assert_same(*run_both(probs, lengths, 0.0, beam_size=3, collapse=False))

    def test_nan_and_empty_beam_errors(self):
        probs = rand_batch(3, 20, 5, seed=4)
        probs[1, 5, 2] = np.nan
        probs[2] = 0.01  # all under the cut
        lengths = np.full((3,), 20, np.int32)
        ref, got = run_both(probs, lengths, 0.19)
        assert_same(ref, got)
        errs = np.asarray(got["err"])
        assert errs[1] == errors.INCOMPARABLE_VALUES
        assert errs[2] == errors.RAN_OUT_OF_BEAM


@pytest.mark.parametrize("beam_size", [8, 12, 16])
def test_pallas_wide_beams(beam_size):
    # beam sizes spanning multiple sublane tiles (KP = 8, 16)
    probs = rand_batch(3, 30, 5, seed=5)
    lengths = np.full((3,), 30, np.int32)
    assert_same(*run_both(probs, lengths, 0.0, beam_size=beam_size))
