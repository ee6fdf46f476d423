"""CRF duplex crosschecks against the NumPy oracle (src/duplex.rs:652-834).

CRF state spaces must satisfy S = n_base**k (the reference's transition
``(state * n_base) % n_state + label`` indexes out of bounds otherwise),
so fixtures use S=16 with a 4-base alphabet.

The banded cases exercise the CRF band-extension path, whose recurrence
has *no* repeat branch and uses the beam entry's post-emission state
(duplex.rs:290-336, 711-731) — both quirks are oracle-pinned here.
"""

import numpy as np
import pytest

import oracle
from fast_ctc_decode_tpu import crf_beam_search_duplex

S, A1 = 16, 5
AL = "NACGT"


def mk(T, seed):
    r = np.random.RandomState(seed)
    x = r.rand(T, S, A1).astype(np.float32)
    return x / x.sum(-1, keepdims=True)


def inits(seed):
    return np.random.RandomState(seed).rand(S).astype(np.float32)


@pytest.mark.parametrize("seed", range(4))
def test_full_range_both_engines(seed):
    T1, T2 = 15, 17
    n1, n2 = mk(T1, seed), mk(T2, seed + 50)
    i1, i2 = inits(seed + 100), inits(seed + 150)
    want = oracle.crf_beam_search_duplex(n1, i1, n2, i2, AL)
    assert crf_beam_search_duplex(n1, i1, n2, i2, AL, engine="fast") == want
    assert crf_beam_search_duplex(n1, i1, n2, i2, AL, engine="exact") == want


@pytest.mark.parametrize("seed", range(4))
def test_banded_exact_engine(seed):
    T1, T2 = 18, 20
    env = np.zeros((T1, 2), np.int64)
    for i in range(T1):
        c = int(i * T2 / T1)
        env[i, 0] = max(0, c - 4)
        env[i, 1] = min(T2, c + 5)
    n1, n2 = mk(T1, seed + 200), mk(T2, seed + 250)
    i1, i2 = inits(seed + 300), inits(seed + 350)
    want = oracle.crf_beam_search_duplex(n1, i1, n2, i2, AL, envelope=env)
    got = crf_beam_search_duplex(
        n1, i1, n2, i2, AL, envelope=env, engine="exact"
    )
    assert got == want


def test_with_threshold():
    T1, T2 = 12, 14
    n1, n2 = mk(T1, 500), mk(T2, 501)
    i1, i2 = inits(502), inits(503)
    want = oracle.crf_beam_search_duplex(
        n1, i1, n2, i2, AL, beam_cut_threshold=0.05
    )
    got = crf_beam_search_duplex(
        n1, i1, n2, i2, AL, beam_cut_threshold=0.05, engine="fast"
    )
    assert got == want
