"""Pallas banded duplex kernel vs the XLA fast engine (interpret mode).

The kernel implements the slot-band fast-engine semantics (sequence-level),
with band values evaluated in the reference's sequential order.  Sequences
must match the XLA fast engine on randomized posteriors across envelope
shapes; the kernel refuses per-pair-envelope batches (host routes those to
the XLA engine).
"""

import numpy as np
import pytest

from fast_ctc_decode_tpu.ops import duplex_fast, duplex_pallas


from duplex_helpers import diag_env, random_data  # noqa: E402


def full_env(T1, T2):
    env = np.zeros((T1, 2), np.int64)
    env[:, 1] = T2
    return env


def run_both(n1, n2, env, K=5, thr=-np.inf, collapse=True, lengths=None):
    """Returns ([(seq, err)] pallas, [(seq, err)] xla) for a stacked batch."""
    B, T1, A1 = n1.shape
    T2 = n2.shape[1]
    ep = duplex_fast._prep_envelope_fast(env, T2)
    with np.errstate(divide="ignore"):
        l1 = np.log(n1).astype(np.float32)
        l2 = np.log(n2).astype(np.float32)
    rg = np.full((B, ep.Wr), -np.inf, np.float32)
    rg[:, 0] = 0.0
    rg[:, 1:] = np.cumsum(l2[:, : ep.Wr - 1, 0], axis=1)
    if lengths is None:
        lengths = np.full((B,), T1, np.int32)

    po = duplex_pallas.duplex_pallas_batch(
        l1, l2, rg, ep.lo, ep.hi, np.float32(thr), lengths,
        beam_size=K, collapse_repeats=collapse, W=ep.W, D=ep.D,
        needs_ext=ep.needs_ext, block_t=8, block_b=8, interpret=True,
    )
    lob = np.tile(ep.lo, (B, 1))
    hib = np.tile(ep.hi, (B, 1))
    xo = duplex_fast.duplex_fast_batch(
        l1, l2, rg, lob, hib, np.float32(thr), np.zeros(B, np.int32),
        lengths,
        beam_size=K, collapse_repeats=collapse, W=ep.W, Wr=ep.Wr,
        Wext=ep.Wext, needs_ext=ep.needs_ext, crf=False,
        static_window=ep.static_window, rel_window=ep.rel_window, D=ep.D,
    )

    def unpack(out):
        res = []
        for b in range(B):
            n = int(out["count"][b])
            labs = np.asarray(out["labels_rev"][b])[:n]
            res.append(
                ("".join("ACGT"[int(l)] for l in labs[::-1]), int(out["err"][b]))
            )
        return res

    return unpack(po), unpack(xo)


class TestPallasDuplexParity:
    @pytest.mark.parametrize("seed", range(3))
    def test_banded_diag(self, seed):
        T1, T2 = 16, 18
        n1 = np.stack([random_data(T1, 4, seed * 10 + i) for i in range(3)])
        n2 = np.stack(
            [random_data(T2, 4, 500 + seed * 10 + i) for i in range(3)]
        )
        got, want = run_both(n1, n2, diag_env(T1, T2, 3))
        assert got == want

    def test_banded_with_threshold(self):
        T1, T2 = 14, 16
        n1 = np.stack([random_data(T1, 4, 70 + i) for i in range(2)])
        n2 = np.stack([random_data(T2, 4, 80 + i) for i in range(2)])
        got, want = run_both(
            n1, n2, diag_env(T1, T2, 4), thr=float(np.log(np.float32(0.1)))
        )
        assert got == want

    def test_collapse_off(self):
        T1, T2 = 12, 12
        n1 = random_data(T1, 4, 90)[None]
        n2 = random_data(T2, 4, 91)[None]
        got, want = run_both(n1, n2, diag_env(T1, T2, 3), collapse=False)
        assert got == want

    def test_full_range(self):
        T1, T2 = 10, 11
        n1 = random_data(T1, 4, 95)[None]
        n2 = random_data(T2, 4, 96)[None]
        got, want = run_both(n1, n2, full_env(T1, T2))
        assert got == want

    def test_ragged_lengths(self):
        T1, T2 = 14, 15
        n1 = np.stack([random_data(T1, 4, 100 + i) for i in range(2)])
        n2 = np.stack([random_data(T2, 4, 110 + i) for i in range(2)])
        lengths = np.array([T1, T1 - 5], np.int32)
        got, want = run_both(
            n1, n2, diag_env(T1, T2, 3), lengths=lengths
        )
        assert got == want

    def test_wider_beam_small_alphabet(self):
        T1, T2 = 12, 13
        n1 = random_data(T1, 3, 120)[None]
        n2 = random_data(T2, 3, 121)[None]
        got, want = run_both(n1, n2, diag_env(T1, T2, 3), K=8)
        assert got == want

    def test_invalid_envelope_status(self):
        T1, T2 = 10, 10
        n1 = random_data(T1, 4, 130)[None]
        n2 = random_data(T2, 4, 131)[None]
        env = diag_env(T1, T2, 2)
        env[6, 0] = env[6, 1]  # lower >= upper mid-decode
        env[6, 1] = env[6, 0] + 0
        ep = duplex_fast._prep_envelope_fast(env, T2)
        with np.errstate(divide="ignore"):
            l1 = np.log(n1).astype(np.float32)
            l2 = np.log(n2).astype(np.float32)
        rg = np.full((1, ep.Wr), -np.inf, np.float32)
        rg[:, 0] = 0.0
        rg[:, 1:] = np.cumsum(l2[:, : ep.Wr - 1, 0], axis=1)
        po = duplex_pallas.duplex_pallas_batch(
            l1, l2, rg, ep.lo, ep.hi, np.float32(-np.inf),
            np.array([T1], np.int32),
            beam_size=5, collapse_repeats=True, W=ep.W, D=ep.D,
            needs_ext=ep.needs_ext, block_t=8, block_b=8, interpret=True,
        )
        from fast_ctc_decode_tpu import errors

        assert int(po["err"][0]) == errors.INVALID_ENVELOPE

    def test_zero_probability_rows_survive(self):
        # -inf log scores are legitimate hypotheses (explicit validity)
        T1, T2 = 10, 11
        n1 = random_data(T1, 4, 140)
        n1[4, :] = 0.0
        n2 = random_data(T2, 4, 141)
        got, want = run_both(n1[None], n2[None], diag_env(T1, T2, 4))
        assert got == want


class TestDippingUpperBound:
    def test_hi_dips_then_recovers(self):
        # last_upper must follow the XLA engine's assignment semantics
        # (carry.last_upper = hi), not a running max: a dipping upper
        # bound must re-extend from the dipped value
        T1, T2 = 12, 12
        env = np.zeros((T1, 2), np.int64)
        his = [4, 6, 8, 8, 6, 6, 9, 10, 11, 12, 12, 12]
        los = [0, 0, 1, 2, 2, 3, 3, 4, 5, 6, 6, 7]
        env[:, 0] = los
        env[:, 1] = his
        n1 = random_data(T1, 4, 77)[None]
        n2 = random_data(T2, 4, 78)[None]
        got, want = run_both(n1, n2, env)
        assert got == want
