"""Cross-check the duplex device kernel against the NumPy oracle, including
banded envelopes that exercise the band-extension path (the default full
envelope never triggers extension — duplex.rs:490-522).
"""

import numpy as np
import pytest

import oracle

from fast_ctc_decode_tpu import beam_search_duplex


def random_data(samples, width, seed):
    rng = np.random.RandomState(seed)
    x = rng.rand(samples, width).astype(np.float32)
    return x / np.linalg.norm(x, ord=2, axis=1, keepdims=True)


@pytest.mark.parametrize("seed", range(4))
def test_duplex_matches_oracle_default_envelope(seed):
    p1 = random_data(25, 4, seed)
    p2 = random_data(28, 4, seed + 50)
    got = beam_search_duplex(p1, p2, "NACG", beam_size=5, beam_cut_threshold=0.0)
    want = oracle.beam_search_duplex(p1, p2, "NACG", beam_size=5)
    assert got == want


@pytest.mark.parametrize("seed", range(4))
def test_duplex_matches_oracle_banded_envelope(seed):
    T1, T2 = 30, 34
    p1 = random_data(T1, 4, seed + 100)
    p2 = random_data(T2, 4, seed + 150)
    env = np.zeros((T1, 2), np.int64)
    for i in range(T1):
        env[i, 0] = max(0, int(i * T2 / T1) - 4)
        env[i, 1] = min(T2, int(i * T2 / T1) + 5)
    got = beam_search_duplex(p1, p2, "NACG", envelope=env, beam_size=5)
    want = oracle.beam_search_duplex(p1, p2, "NACG", envelope=env, beam_size=5)
    assert got == want


@pytest.mark.parametrize("seed", range(2))
def test_duplex_with_threshold_matches_oracle(seed):
    p1 = random_data(20, 5, seed + 200)
    p2 = random_data(22, 5, seed + 250)
    got = beam_search_duplex(p1, p2, "NACGT", beam_size=5, beam_cut_threshold=0.1)
    want = oracle.beam_search_duplex(
        p1, p2, "NACGT", beam_size=5, beam_cut_threshold=0.1
    )
    assert got == want


def test_duplex_invalid_envelope():
    p1 = random_data(10, 3, 7)
    p2 = random_data(10, 3, 8)
    env = np.zeros((10, 2), np.int64)
    env[:, 1] = 10
    env[5, 0] = 6
    env[5, 1] = 4  # lower >= upper
    with pytest.raises(RuntimeError, match="Invalid envelope values"):
        beam_search_duplex(p1, p2, "NAB", envelope=env)


def test_duplex_collapse_off_matches_oracle():
    p1 = random_data(18, 4, 300)
    p2 = random_data(18, 4, 301)
    got = beam_search_duplex(p1, p2, "NACG", beam_size=5, collapse_repeats=False)
    want = oracle.beam_search_duplex(
        p1, p2, "NACG", beam_size=5, collapse_repeats=False
    )
    assert got == want
