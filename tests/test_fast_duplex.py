"""Crosschecks for the fast duplex engine — ops/duplex_fast.py.

With the default full-range envelope the fast engine is sequence-exact vs
the reference semantics (see the module docstring); the oracle crosschecks
here mirror tests/test_duplex_crosscheck.py but drive the fast engine
explicitly.  For banded envelopes the engine rebuilds re-derived prefixes'
bands over the current window (documented deviation), so banded coverage
uses strong-signal data where the consensus is unambiguous, plus the
engine-selection logic itself.
"""

import numpy as np
import pytest

import oracle
from fast_ctc_decode_tpu import beam_search_duplex, crf_beam_search_duplex
from fast_ctc_decode_tpu.ops import duplex_fast


def random_data(samples, width, seed):
    rng = np.random.RandomState(seed)
    x = rng.rand(samples, width).astype(np.float32)
    return x / np.linalg.norm(x, ord=2, axis=1, keepdims=True)


def one_hot_posteriors(labels, A1, T_per=2, noise=0.02, seed=0):
    """Near-one-hot posteriors emitting `labels` with blanks in between."""
    rng = np.random.RandomState(seed)
    rows = []
    for l in labels:
        rows.append(l + 1)
        rows.append(0)
    x = np.full((len(rows), A1), noise, np.float32)
    for i, r in enumerate(rows):
        x[i, r] = 1.0 - noise * (A1 - 1)
    return x + rng.rand(len(rows), A1).astype(np.float32) * 1e-4


class TestFastDuplexFullRange:
    @pytest.mark.parametrize("seed", range(4))
    def test_matches_oracle_default_envelope(self, seed):
        p1 = random_data(25, 4, seed)
        p2 = random_data(28, 4, seed + 50)
        got = beam_search_duplex(
            p1, p2, "NACG", beam_size=5, beam_cut_threshold=0.0, engine="fast"
        )
        want = oracle.beam_search_duplex(p1, p2, "NACG", beam_size=5)
        assert got == want

    def test_threshold_and_collapse_off(self):
        p1 = random_data(20, 5, 200)
        p2 = random_data(22, 5, 250)
        got = beam_search_duplex(
            p1, p2, "NACGT", beam_size=5, beam_cut_threshold=0.1, engine="fast"
        )
        want = oracle.beam_search_duplex(
            p1, p2, "NACGT", beam_size=5, beam_cut_threshold=0.1
        )
        assert got == want
        got = beam_search_duplex(
            p1, p2, "NACGT", beam_size=5, collapse_repeats=False, engine="fast"
        )
        want = oracle.beam_search_duplex(
            p1, p2, "NACGT", beam_size=5, collapse_repeats=False
        )
        assert got == want

    def test_auto_engine_is_fast_for_default_envelope(self):
        from fast_ctc_decode_tpu.api import _pick_duplex_engine

        T1, T2 = 10, 12
        env = np.stack(
            [np.zeros(T1, np.int64), np.full(T1, T2, np.int64)], axis=1
        )
        assert _pick_duplex_engine(None, env, T2) == "fast"
        banded = env.copy()
        banded[:, 1] = np.minimum(np.arange(T1) + 3, T2)
        banded[0, 1] = 3
        assert _pick_duplex_engine(None, banded, T2) == "exact"

    def test_crf_fast_matches_exact_engine(self):
        # the exact-tree engine is the yardstick here; it is itself
        # crosschecked against oracle.crf_beam_search_duplex in
        # test_crf_duplex_crosscheck.py
        rng = np.random.RandomState(7)
        T1, T2, S, A1 = 12, 14, 4, 4
        n1 = rng.rand(T1, S, A1).astype(np.float32)
        n1 /= n1.sum(-1, keepdims=True)
        n2 = rng.rand(T2, S, A1).astype(np.float32)
        n2 /= n2.sum(-1, keepdims=True)
        i1 = rng.rand(S).astype(np.float32)
        i2 = rng.rand(S).astype(np.float32)
        got = crf_beam_search_duplex(n1, i1, n2, i2, "NACG", engine="fast")
        want = crf_beam_search_duplex(n1, i1, n2, i2, "NACG", engine="exact")
        assert got == want


class TestFastDuplexBanded:
    def test_strong_signal_banded(self):
        # unambiguous consensus: both nets emit the same sequence; a banded
        # envelope around the diagonal must recover it exactly
        labels = [0, 1, 2, 0, 2, 1, 0]
        p1 = one_hot_posteriors(labels, 4, seed=1)
        p2 = one_hot_posteriors(labels, 4, seed=2)
        T1, T2 = p1.shape[0], p2.shape[0]
        env = np.zeros((T1, 2), np.int64)
        for i in range(T1):
            c = int(i * T2 / T1)
            env[i, 0] = max(0, c - 3)
            env[i, 1] = min(T2, c + 4)
        got = beam_search_duplex(p1, p2, "NACG", envelope=env, engine="fast")
        want = "".join("ACG"[l] for l in labels)
        assert got == want
        # and the exact engine agrees on strong-signal data
        exact = beam_search_duplex(p1, p2, "NACG", envelope=env, engine="exact")
        assert exact == want

    def test_invalid_envelope_fast(self):
        p1 = random_data(10, 3, 7)
        p2 = random_data(10, 3, 8)
        env = np.zeros((10, 2), np.int64)
        env[:, 1] = 10
        env[5, 0] = 6
        env[5, 1] = 4  # lower >= upper
        with pytest.raises(RuntimeError, match="Invalid envelope values"):
            beam_search_duplex(p1, p2, "NAB", envelope=env, engine="fast")

    def test_degenerate_envelope_every_step_invalid(self):
        """An envelope with hi <= lo at EVERY step (so the global max width
        is non-positive) must raise the reference error, not crash the
        host-side buffer sizing with a negative shape."""
        p1 = random_data(4, 3, 7)
        p2 = random_data(4, 3, 8)
        for env in (
            np.array([[5, 2]] * 4, np.int64),  # hi < lo, constant
            np.array([[0, 0]] * 4, np.int64),  # hi == lo == 0
            np.array([[2, 2]] * 4, np.int64),  # hi == lo > 0
        ):
            for eng in ("fast", "exact", None):
                with pytest.raises(
                    RuntimeError, match="Invalid envelope values"
                ):
                    beam_search_duplex(
                        p1, p2, "NAB", envelope=env, engine=eng
                    )


class TestFastDuplexBatch:
    def test_batch_matches_single(self):
        B, T1, T2, A1 = 3, 15, 17, 4
        l1s, l2s, rgs = [], [], []
        nets = []
        for i in range(B):
            n1 = random_data(T1, A1, 300 + i)
            n2 = random_data(T2, A1, 400 + i)
            nets.append((n1, n2))
            with np.errstate(divide="ignore"):
                l1s.append(np.log(n1).astype(np.float32))
                l2s.append(np.log(n2).astype(np.float32))
                rgs.append(
                    np.concatenate(
                        [
                            [np.float32(0.0)],
                            np.cumsum(l2s[-1][:, 0], dtype=np.float32),
                        ]
                    ).astype(np.float32)
                )
        env = np.stack([np.zeros(T1, np.int64), np.full(T1, T2, np.int64)], 1)
        lo = np.tile(env[:, 0].astype(np.int32), (B, 1))
        hi = np.tile(env[:, 1].astype(np.int32), (B, 1))
        W, Wr = T2 + 1, T2 + 1
        out = duplex_fast.duplex_fast_batch(
            np.stack(l1s),
            np.stack(l2s),
            np.stack(rgs),
            lo,
            hi,
            np.float32(-np.inf),
            np.zeros(B, np.int32),
            np.full(B, T1, np.int32),
            beam_size=5,
            collapse_repeats=True,
            W=W,
            Wr=Wr,
            Wext=1,
            needs_ext=False,
            crf=False,
        )
        for i in range(B):
            n = int(out["count"][i])
            labels_rev = np.asarray(out["labels_rev"][i])[:n]
            seq = "".join("ACG"[int(l)] for l in labels_rev[::-1])
            want = beam_search_duplex(
                nets[i][0], nets[i][1], "NACG", engine="fast"
            )
            assert seq == want, i


class TestReviewRegressions:
    def test_auto_engine_moving_window_is_exact(self):
        # advancing lower bound + constant upper bound: the fast engine's
        # band rebuilds deviate from the reference, so auto must pick exact
        from fast_ctc_decode_tpu.api import _pick_duplex_engine

        T1, T2 = 20, 24
        env = np.zeros((T1, 2), np.int64)
        env[:, 1] = T2
        for i in range(T1):
            env[i, 0] = max(0, (i * T2) // T1 - 2)
        assert _pick_duplex_engine(None, env, T2) == "exact"
        for seed in (4, 11):
            p1 = random_data(T1, 4, seed)
            p2 = random_data(T2, 4, seed + 60)
            auto = beam_search_duplex(p1, p2, "NACG", envelope=env)
            exact = beam_search_duplex(
                p1, p2, "NACG", envelope=env, engine="exact"
            )
            assert auto == exact

    def test_zero_probability_rows_survive_fast_engine(self):
        # a -inf log score is a legitimate hypothesis; the fast top-K must
        # not treat it as an empty slot (reference keeps zero-prob entries)
        p1 = random_data(8, 4, 7)
        p2 = random_data(8, 4, 8)
        p1[3, :] = 0.0  # masked frame
        f = beam_search_duplex(p1, p2, "NACG", engine="fast")
        e = beam_search_duplex(p1, p2, "NACG", engine="exact")
        assert f == e


class TestCrfRelWindow:
    def test_crf_constant_offset_window_matches_exact(self):
        # a constant non-full window rides the window-relative kernel path
        # (monotone lo, not static) and is sequence-exact vs the tree
        # engine (the window never moves, so rebuilt bands == reused bands)
        rng = np.random.RandomState(17)
        T1, T2, S, A1 = 14, 16, 4, 4
        n1 = rng.rand(T1, S, A1).astype(np.float32)
        n1 /= n1.sum(-1, keepdims=True)
        n2 = rng.rand(T2, S, A1).astype(np.float32)
        n2 /= n2.sum(-1, keepdims=True)
        i1 = rng.rand(S).astype(np.float32)
        i2 = rng.rand(S).astype(np.float32)
        env = np.zeros((T1, 2), np.int64)
        env[:, 1] = 12  # constant window [0, 12) with hi < T2: rel path
        ep = duplex_fast._prep_envelope_fast(env, T2)
        assert ep.rel_window and not ep.static_window
        got = crf_beam_search_duplex(
            n1, i1, n2, i2, "NACG", envelope=env, engine="fast"
        )
        want = crf_beam_search_duplex(
            n1, i1, n2, i2, "NACG", envelope=env, engine="exact"
        )
        assert got == want

    def test_crf_moving_banded_strong_signal(self):
        # moving windows follow slot-rebuild semantics; on unambiguous
        # consensus data the decoded sequence must still match the exact
        # engine's
        labels = [0, 1, 2, 0, 2]
        A1 = 4
        S = 4
        rows = []
        for l in labels:
            rows.append(l + 1)
            rows.append(0)
        T = len(rows)
        net = np.full((T, S, A1), 0.02, np.float32)
        for i, r in enumerate(rows):
            net[i, :, r] = 1.0 - 0.02 * (A1 - 1)
        net /= net.sum(-1, keepdims=True)
        init = np.ones((S,), np.float32) / S
        env = np.zeros((T, 2), np.int64)
        for i in range(T):
            env[i, 0] = max(0, i - 3)
            env[i, 1] = min(T, i + 4)
        env[:, 0] = np.maximum.accumulate(env[:, 0])
        last = 0
        for i in range(T):
            env[i, 0] = min(env[i, 0], last)
            env[i, 1] = max(env[i, 1], env[i, 0] + 1)
            last = max(last, env[i, 1])
        got = crf_beam_search_duplex(
            net, init, net, init, "NACG", envelope=env, engine="fast"
        )
        want = crf_beam_search_duplex(
            net, init, net, init, "NACG", envelope=env, engine="exact"
        )
        assert got == want == "".join("ACG"[l] for l in labels)
