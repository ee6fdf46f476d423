"""Crosschecks for the fast (hash-identity) beam engine — ops/beam_fast.py.

The fast engine's contract is *sequence* equality with the reference
``beam_search``/``crf_beam_search`` (see the beam_fast module docstring for
the three measure-zero exceptions); ``path`` entries may report a later
creation time for prefixes that were pruned and re-derived, so paths are
checked for structural validity, not equality (the exact-tree engine in
ops/beam.py owns bit-exact path parity — tests/test_oracle_crosscheck.py).
"""

import numpy as np
import pytest

import oracle
from fast_ctc_decode_tpu import errors
from fast_ctc_decode_tpu.ops import beam_fast


def rand_probs(rng, T, A1):
    p = rng.rand(T, A1).astype(np.float32)
    p /= np.linalg.norm(p, ord=2, axis=-1, keepdims=True)
    return p


def decode_fast(p, beam_size=5, thr=0.1, collapse=True, length=None):
    T = p.shape[0]
    out = beam_fast.beam_search_fast_device(
        p,
        np.int32(T if length is None else length),
        np.float32(thr),
        beam_size=beam_size,
        collapse_repeats=collapse,
    )
    return {k: np.asarray(v) for k, v in out.items()}


def to_seq_path(out, alphabet="NACGT"):
    n = int(out["count"])
    labels_rev = out["labels_rev"][:n]
    times_rev = out["times_rev"][:n]
    seq = "".join(alphabet[int(l) + 1] for l in labels_rev[::-1])
    path = [int(t) for t in times_rev[::-1]]
    return seq, path


class TestFastBeamVsOracle:
    @pytest.mark.parametrize("T,thr", [(25, 0.1), (100, 0.1), (50, 0.0)])
    def test_sequences_match_oracle(self, T, thr):
        rng = np.random.RandomState(11)
        for i in range(25):
            p = rand_probs(rng, T, 5)
            out = decode_fast(p, thr=thr)
            assert int(out["err"]) == errors.OK
            seq, path = to_seq_path(out)
            oseq, _ = oracle.beam_search(p, "NACGT", 5, thr)
            assert seq == oseq, f"read {i}"
            # structural path checks: sorted, in range, one per label
            assert len(path) == len(seq)
            assert all(0 <= t < T for t in path)
            assert path == sorted(path)

    def test_collapse_false_matches_oracle(self):
        rng = np.random.RandomState(3)
        for _ in range(10):
            p = rand_probs(rng, 40, 5)
            out = decode_fast(p, collapse=False)
            seq, _ = to_seq_path(out)
            oseq, _ = oracle.beam_search(
                p, "NACGT", 5, 0.1, collapse_repeats=False
            )
            assert seq == oseq

    def test_small_alphabet_and_beam(self):
        rng = np.random.RandomState(5)
        for _ in range(10):
            p = rand_probs(rng, 30, 3)
            out = decode_fast(p, beam_size=3, thr=0.0)
            seq, _ = to_seq_path(out, alphabet="NAB")
            oseq, _ = oracle.beam_search(p, "NAB", 3, 0.0)
            assert seq == oseq

    def test_wide_beam_exceeds_candidates(self):
        # beam_size > number of live hypotheses: underfull beam every step
        rng = np.random.RandomState(9)
        p = rand_probs(rng, 20, 4)
        out = decode_fast(p, beam_size=16, thr=0.0)
        seq, _ = to_seq_path(out, alphabet="NABC")
        oseq, _ = oracle.beam_search(p, "NABC", 16, 0.0)
        assert seq == oseq


class TestFastBeamErrors:
    def test_nan_input_incomparable(self):
        rng = np.random.RandomState(0)
        p = rand_probs(rng, 20, 5)
        p[7, 2] = np.nan
        out = decode_fast(p, thr=0.1)
        assert int(out["err"]) == errors.INCOMPARABLE_VALUES

    def test_threshold_empties_beam(self):
        # all probabilities below the cut: nothing is ever pushed
        p = np.full((10, 5), 0.01, np.float32)
        out = decode_fast(p, thr=0.19)
        assert int(out["err"]) == errors.RAN_OUT_OF_BEAM

    def test_error_does_not_poison_batch(self):
        rng = np.random.RandomState(1)
        good = rand_probs(rng, 20, 5)
        bad = good.copy()
        bad[3, 1] = np.nan
        probs = np.stack([good, bad, good])
        lengths = np.full((3,), 20, np.int32)
        out = beam_fast.beam_search_fast_batch(
            probs, lengths, np.float32(0.1), beam_size=5
        )
        errs = np.asarray(out["err"])
        assert errs[0] == errors.OK
        assert errs[1] == errors.INCOMPARABLE_VALUES
        assert errs[2] == errors.OK
        ref = decode_fast(good)
        assert to_seq_path(ref)[0] == to_seq_path(
            {k: np.asarray(v)[0] for k, v in out.items()}
        )[0]


class TestFastBeamBatch:
    def test_batch_matches_single_and_padding(self):
        rng = np.random.RandomState(2)
        T = 60
        reads = [rand_probs(rng, t, 5) for t in (60, 37, 12)]
        probs = np.zeros((3, T, 5), np.float32)
        lengths = np.zeros((3,), np.int32)
        for i, r in enumerate(reads):
            probs[i, : r.shape[0]] = r
            lengths[i] = r.shape[0]
        out = beam_fast.beam_search_fast_batch(
            probs, lengths, np.float32(0.1), beam_size=5
        )
        for i, r in enumerate(reads):
            single = decode_fast(r)
            got = {k: np.asarray(v)[i] for k, v in out.items()}
            assert int(got["err"]) == errors.OK
            assert to_seq_path(got) == to_seq_path(single), f"read {i}"
            oseq, _ = oracle.beam_search(r, "NACGT", 5, 0.1)
            assert to_seq_path(got)[0] == oseq


class TestFastCrfBeam:
    def test_crf_sequences_match_oracle(self):
        rng = np.random.RandomState(13)
        S, A1 = 16, 5
        for _ in range(10):
            T = 30
            p = rng.rand(T, S, A1).astype(np.float32)
            p /= p.sum(axis=-1, keepdims=True)
            init = rng.rand(S).astype(np.float32)
            out = beam_fast.crf_beam_search_fast_device(
                p, init, np.int32(T), np.float32(0.0), beam_size=5
            )
            out = {k: np.asarray(v) for k, v in out.items()}
            assert int(out["err"]) == errors.OK
            seq, _ = to_seq_path(out)
            oseq, _ = oracle.crf_beam_search(p, init, "NACGT", 5, 0.0)
            assert seq == oseq
