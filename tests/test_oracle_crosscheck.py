"""Cross-check the device kernels against the NumPy oracle (tests/oracle.py),
which re-implements the reference semantics operation-for-operation in f32.
Random L2-row-normalized matrices follow the reference test generator
(tests/test_decode.py:15-17).
"""

import numpy as np
import pytest

import oracle

from fast_ctc_decode_tpu import beam_search, crf_beam_search, viterbi_search


def random_data(samples, width, seed):
    rng = np.random.RandomState(seed)
    x = rng.rand(samples, width).astype(np.float32)
    return x / np.linalg.norm(x, ord=2, axis=1, keepdims=True)


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("threshold", [0.0, 0.1])
def test_beam_matches_oracle(seed, threshold):
    probs = random_data(60, 5, seed)
    got = beam_search(probs, "NACGT", 5, threshold)
    want = oracle.beam_search(probs, "NACGT", 5, threshold)
    assert got == want


@pytest.mark.parametrize("seed", range(4))
def test_beam_no_collapse_matches_oracle(seed):
    probs = random_data(50, 4, seed + 100)
    got = beam_search(probs, "NACG", 5, 0.05, collapse_repeats=False)
    want = oracle.beam_search(probs, "NACG", 5, 0.05, collapse_repeats=False)
    assert got == want


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("beam_size", [1, 3, 12])
def test_beam_sizes_match_oracle(seed, beam_size):
    probs = random_data(40, 5, seed + 200)
    got = beam_search(probs, "NACGT", beam_size, 0.0)
    want = oracle.beam_search(probs, "NACGT", beam_size, 0.0)
    assert got == want


@pytest.mark.parametrize("seed", range(4))
def test_crf_beam_matches_oracle(seed):
    rng = np.random.RandomState(seed + 300)
    T, S, A1 = 30, 4, 5
    probs = rng.rand(T, S, A1).astype(np.float32)
    probs /= probs.sum(axis=-1, keepdims=True)
    init = rng.rand(S).astype(np.float32)
    got = crf_beam_search(probs, init, "NACGT", 5, 0.01)
    want = oracle.crf_beam_search(probs, init, "NACGT", 5, 0.01)
    assert got == want


@pytest.mark.parametrize("seed", range(4))
def test_viterbi_matches_reference_semantics(seed):
    """Oracle-free sequential re-implementation of viterbi for cross-check."""
    probs = random_data(80, 5, seed + 400)
    alphabet = "NACGT"
    got_seq, got_path = viterbi_search(probs, alphabet, qstring=True)

    # sequential reference walk (src/search.rs:341-380)
    F = np.float32
    seq, qual, path = "", "", []
    last_label, tot, cnt = None, F(0.0), 0
    for idx in range(probs.shape[0]):
        label = int(np.argmax(probs[idx]))
        prob = probs[idx, label]
        if label != 0 and last_label != label:
            if cnt > 0:
                from fast_ctc_decode_tpu.ops.phred import phred_int_np

                q = int(phred_int_np(F(tot / F(cnt)), 1.0, 0.0))
                qual += chr(q + 33)
                tot, cnt = F(0.0), 0
            seq += alphabet[label]
            path.append(idx)
        if label != 0:
            tot = F(tot + prob)
            cnt += 1
        last_label = label
    if cnt > 0:
        from fast_ctc_decode_tpu.ops.phred import phred_int_np

        q = int(phred_int_np(F(tot / F(cnt)), 1.0, 0.0))
        qual += chr(q + 33)

    assert got_seq == seq + qual
    assert got_path == path
