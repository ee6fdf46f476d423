"""Contract tests: fixtures ported from the reference test suite
(/root/reference/tests/test_decode.py and the Rust unit tests in
src/search.rs:425-601).  These must match the reference bit-for-bit.
"""

import numpy as np
import pytest

from fast_ctc_decode_tpu import (
    beam_search,
    beam_search_duplex,
    crf_beam_search,
    crf_greedy_search,
    viterbi_search,
)

ALPHABET = "NACGT"


def random_data(samples=100, alphabet=ALPHABET, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.rand(samples, len(alphabet)).astype(np.float32)
    return x / np.linalg.norm(x, ord=2, axis=1, keepdims=True)


# ------------------------------------------------------------ 1D beam search


class TestBeamSearch:
    def test_beam_search(self):
        seq, path = beam_search(random_data(), ALPHABET, 5, 0.1)
        assert len(seq) == len(path)
        assert len(set(seq)) == len(ALPHABET) - 1

    def test_beam_search_list(self):
        seq, path = beam_search(random_data(), list(ALPHABET), 5, 0.1)
        assert len(seq) == len(path)

    def test_beam_search_tuple(self):
        seq, path = beam_search(random_data(), tuple(ALPHABET), 5, 0.1)
        assert len(seq) == len(path)

    def test_beam_search_named_args(self):
        seq, path = beam_search(
            network_output=random_data(),
            alphabet=ALPHABET,
            beam_size=5,
            beam_cut_threshold=0.1,
        )
        assert len(seq) == len(path)

    def test_beam_search_not_enough_args(self):
        with pytest.raises(TypeError):
            beam_search(random_data())

    def test_beam_search_defaults(self):
        seq, path = beam_search(random_data(), ALPHABET)
        assert len(seq) == len(path)
        assert len(set(seq)) == len(ALPHABET) - 1

    def test_zero_beam_size(self):
        with pytest.raises(ValueError):
            beam_search(random_data(), ALPHABET, 0, 0.1)

    def test_zero_beam_cut_threshold(self):
        seq, path = beam_search(random_data(), ALPHABET, 5, 0.0)
        assert len(seq) == len(path)

    def test_negative_beam_cut_threshold(self):
        with pytest.raises(ValueError):
            beam_search(random_data(), ALPHABET, 5, -0.1)

    def test_beam_cut_threshold_boundary(self):
        with pytest.raises(ValueError):
            beam_search(random_data(), ALPHABET, 5, 1.0 / len(ALPHABET))

    def test_high_beam_cut_threshold(self):
        with pytest.raises(ValueError):
            beam_search(random_data(), ALPHABET, 5, 1.1)

    def test_mismatched_alphabet_short(self):
        with pytest.raises(ValueError):
            beam_search(random_data(), "NAGC", 5, 0.1)

    def test_mismatched_alphabet_long(self):
        with pytest.raises(ValueError):
            beam_search(random_data(), "NAGCTX", 5, 0.1)

    def test_nans(self):
        probs = random_data()
        probs.fill(np.nan)
        with pytest.raises(RuntimeError, match="Failed to compare values"):
            beam_search(probs, ALPHABET)

    def test_beam_search_short_alphabet(self):
        alphabet = "NAG"
        seq, path = beam_search(random_data(alphabet=alphabet), alphabet, 5, 0.1)
        assert len(seq) == len(path)
        assert len(set(seq)) == len(alphabet) - 1

    def test_beam_search_long_alphabet(self):
        alphabet = "NABCDEFGHIJK"
        seq, path = beam_search(
            random_data(2000, alphabet=alphabet), alphabet, 5, beam_cut_threshold=0.0
        )
        assert len(seq) == len(path)
        assert len(set(seq)) == len(alphabet) - 1

    def test_beam_search_path(self):
        w = 5000
        x = np.zeros((w, len(ALPHABET)), np.float32)
        x[:, 0] = 0.5
        emit = np.arange(0, w, len(ALPHABET) - 1)
        for base, pos in enumerate(emit):
            x[pos, base % 4 + 1] = 1.0
        seq, path = beam_search(x, ALPHABET, 5, 0.1)
        np.testing.assert_array_equal(emit, path)
        assert len(seq) == len(path)

    def test_repeat_sequence_path(self):
        w = 20
        x = np.zeros((w, len(ALPHABET)), np.float32)
        x[:, 0] = 0.5
        expected_path = [6, 13, 18]
        for idx in expected_path:
            x[idx, 0] = 0.0
            x[idx, 1] = 1.0
        seq, path = beam_search(x, ALPHABET, 5, 0.1)
        assert seq == "AAA"
        assert path == expected_path

    def test_repeat_sequence_path_with_multi_char_alpha(self):
        w = 20
        alphabet = ["N", "AAA", "CCC", "GGG", "TTTT"]
        x = np.zeros((w, len(alphabet)), np.float32)
        x[:, 0] = 0.5
        alphabet_idx = 1
        expected_path = [6, 13, 18]
        for idx in expected_path:
            x[idx, 0] = 0.0
            x[idx, alphabet_idx] = 1.0
            alphabet_idx += 1
        seq, path = beam_search(x, alphabet, 5, 0.1)
        assert seq == "AAACCCGGG"
        assert path == expected_path

    def test_repeat_sequence_path_with_spread_probs(self):
        w = 20
        x = np.zeros((w, len(ALPHABET)), np.float32)
        x[:, 0] = 0.5
        spread = 3
        expected_path = [6, 13, 18]
        for idx in expected_path:
            x[idx : idx + spread, 0] = 0.0
            x[idx : idx + spread, 1] = 1.0
        seq, path = beam_search(x, ALPHABET, 5, 0.1)
        assert seq == "AAA"
        assert path == expected_path

    def test_rust_fixture_collapse_variants(self):
        """src/search.rs:557-601 (test_viterbi_blank_bounds beam assertions)."""
        x = np.array(
            [
                [0.6, 0.2, 0.2],
                [0.6, 0.2, 0.2],
                [0.0, 0.4, 0.6],
                [0.0, 0.3, 0.7],
                [0.3, 0.3, 0.4],
                [0.4, 0.3, 0.3],
                [0.4, 0.3, 0.3],
                [0.3, 0.3, 0.4],
                [0.1, 0.4, 0.5],
                [0.1, 0.5, 0.4],
                [0.8, 0.1, 0.1],
                [0.1, 0.1, 0.8],
                [0.4, 0.3, 0.3],
            ],
            np.float32,
        )
        seq, _ = beam_search(x, "NAG", 5, 0.0, True)
        assert seq == "GAGAG"
        seq, _ = beam_search(x, "NAG", 5, 0.0, False)
        assert seq == "GGGAGAG"


# --------------------------------------------------------------- viterbi


class TestViterbiSearch:
    def test_random_data(self):
        seq, path = viterbi_search(random_data(), ALPHABET)
        assert len(seq) == len(path)
        assert len(set(seq)) == len(ALPHABET) - 1

    def test_random_data_qstring(self):
        seq, path = viterbi_search(random_data(), ALPHABET, qstring=True)
        assert len(seq) == len(path) * 2

    def test_not_enough_args(self):
        with pytest.raises(TypeError):
            viterbi_search(random_data())

    def test_alphabet_too_small(self):
        with pytest.raises(ValueError):
            viterbi_search(random_data(), "NACG")

    def test_alphabet_too_large(self):
        with pytest.raises(ValueError):
            viterbi_search(random_data(), "NACGTR")

    def test_path(self):
        w = 5000
        x = np.zeros((w, len(ALPHABET)), np.float32)
        x[:, 0] = 0.5
        emit = np.arange(0, w, len(ALPHABET) - 1)
        for base, pos in enumerate(emit):
            x[pos, base % 4 + 1] = 1.0
        seq, path = viterbi_search(x, ALPHABET)
        np.testing.assert_array_equal(emit, path)
        assert len(seq) == len(path)

    def test_repeat_sequence_path(self):
        w = 20
        x = np.zeros((w, len(ALPHABET)), np.float32)
        x[:, 0] = 0.5
        expected_path = [6, 13, 18]
        for idx in expected_path:
            x[idx, 0] = 0.0
            x[idx, 1] = 1.0
        seq, path = viterbi_search(x, ALPHABET)
        assert seq == "AAA"
        assert path == expected_path

    def test_repeat_sequence_path_with_qstring(self):
        w = 20
        x = np.zeros((w, len(ALPHABET)), np.float32)
        x[:, 0] = 0.5
        expected_path = [6, 13, 18]
        for idx in expected_path:
            x[idx, 0] = 0.0
            x[idx, 1] = 1.0
        seq, path = viterbi_search(x, ALPHABET, qstring=True)
        qual = seq[len(path) :]
        seq = seq[: len(path)]
        assert seq == "AAA"
        assert qual == "III"
        assert path == expected_path

    def test_mean_qscores(self):
        w = 20
        x = np.zeros((w, len(ALPHABET)), np.float32)
        x[:, 0] = 0.5
        x[3, 0] = 0.0
        x[3, 1] = 0.99
        x[4, 0] = 0.0
        x[4, 1] = 0.99
        x[6, 0] = 0.0
        x[6, 2] = 0.999
        x[7, 0] = 0.0
        x[7, 2] = 0.999
        x[9, 0] = 0.0
        x[9, 4] = 0.6
        x[10, 0] = 0.0
        x[10, 4] = 0.7
        x[11, 0] = 0.0
        x[11, 4] = 0.8
        x[13, 0] = 0.0
        x[13, 4] = 0.4
        x[14, 0] = 0.0
        x[14, 4] = 0.5
        x[15, 0] = 0.0
        x[15, 4] = 0.6
        seq, path = viterbi_search(x, ALPHABET, qstring=True)
        qual = seq[len(path) :]
        seq = seq[: len(path)]
        assert seq == "ACTT"
        assert qual == "5?&$"
        assert len(seq) == len(path)

    def test_multi_char_alphabet(self):
        w = 20
        alphabet = ["N", "AAA", "CCC", "GGG", "TTTT"]
        x = np.zeros((w, len(alphabet)), np.float32)
        x[:, 0] = 0.5
        alphabet_idx = 1
        expected_path = [6, 13, 18]
        for idx in expected_path:
            x[idx, 0] = 0.0
            x[idx, alphabet_idx] = 1.0
            alphabet_idx += 1
        seq, path = viterbi_search(x, alphabet)
        assert seq == "AAACCCGGG"
        assert path == expected_path

    def test_beam_off_path(self):
        x = np.array(
            [
                [0.7, 0.1, 0.2],
                [0.7, 0.1, 0.2],
                [0.2, 0.3, 0.5],
                [0.2, 0.2, 0.6],
                [0.3, 0.3, 0.4],
                [0.2, 0.2, 0.6],
                [0.2, 0.3, 0.5],
                [0.7, 0.1, 0.2],
                [0.7, 0.1, 0.2],
            ],
            np.float32,
        )
        seq, path = viterbi_search(x, "NAB")
        assert seq == "B"

    def test_rust_fixture_viterbi(self):
        """src/search.rs:527-554 (test_viterbi)."""
        x = np.array(
            [
                [0.0, 0.4, 0.6],
                [0.0, 0.3, 0.7],
                [0.3, 0.3, 0.4],
                [0.4, 0.3, 0.3],
                [0.4, 0.3, 0.3],
                [0.3, 0.3, 0.4],
                [0.1, 0.4, 0.5],
                [0.1, 0.5, 0.4],
                [0.8, 0.1, 0.1],
                [0.1, 0.1, 0.8],
            ],
            np.float32,
        )
        seq, starts = viterbi_search(x, "NAG", False, 1.0, 0.0, True)
        assert seq == "GGAG"
        assert starts == [0, 5, 7, 9]
        seq, starts = viterbi_search(x, "NAG", True, 1.0, 0.0, True)
        assert seq == "GGAG%$$("
        assert starts == [0, 5, 7, 9]

    def test_rust_fixture_viterbi_blank_bounds(self):
        """src/search.rs:557-595 (test_viterbi_blank_bounds)."""
        x = np.array(
            [
                [0.6, 0.2, 0.2],
                [0.6, 0.2, 0.2],
                [0.0, 0.4, 0.6],
                [0.0, 0.3, 0.7],
                [0.3, 0.3, 0.4],
                [0.4, 0.3, 0.3],
                [0.4, 0.3, 0.3],
                [0.3, 0.3, 0.4],
                [0.1, 0.4, 0.5],
                [0.1, 0.5, 0.4],
                [0.8, 0.1, 0.1],
                [0.1, 0.1, 0.8],
                [0.4, 0.3, 0.3],
            ],
            np.float32,
        )
        seq, starts = viterbi_search(x, "NAG", False, 1.0, 0.0, True)
        assert (seq, starts) == ("GGAG", [2, 7, 9, 11])
        seq, starts = viterbi_search(x, "NAG", True, 1.0, 0.0, True)
        assert (seq, starts) == ("GGAG%$$(", [2, 7, 9, 11])
        seq, starts = viterbi_search(x, "NAG", False, 1.0, 0.0, False)
        assert (seq, starts) == ("GGGGGAG", [2, 3, 4, 7, 8, 9, 11])
        seq, starts = viterbi_search(x, "NAG", True, 1.0, 0.0, False)
        assert (seq, starts) == ("GGGGGAG%&##$$(", [2, 3, 4, 7, 8, 9, 11])


# --------------------------------------------------------------------- CRF


class TestCRF:
    def crf_fixture(self):
        """src/search.rs:431-509 (crf_test_greedy), 7x4x5 tensor."""
        x = np.zeros((7, 4, 5), np.float32)
        x[0, 2, 0] = 1.0
        x[1, 2, 2] = 0.9
        x[2, 1, 4] = 0.7
        x[3, 3, 0] = 1.0
        x[4, 3, 1] = 0.99
        x[5, 0, 1] = 0.9
        x[6, 0, 3] = 0.999
        init = np.array([0.0, 0.0, 1.0, 0.0, 0.0], np.float32)
        return x, init

    def test_crf_greedy(self):
        x, init = self.crf_fixture()
        seq, path = crf_greedy_search(x, init, ALPHABET, False, 1.0, 0.0)
        assert seq == "CTAAG"
        assert path == [1, 2, 4, 5, 6]

    def test_crf_greedy_qstring(self):
        x, init = self.crf_fixture()
        seq, path = crf_greedy_search(x, init, ALPHABET, True, 1.0, 0.0)
        assert seq == "CTAAG+&5+?"
        assert path == [1, 2, 4, 5, 6]

    def test_crf_beam(self):
        x, init = self.crf_fixture()
        seq, path = crf_beam_search(x, init, ALPHABET, 5, 0.01)
        assert seq == "CTAAG"
        assert path == [1, 2, 4, 5, 6]


# ------------------------------------------------------------------ duplex


class TestDuplexBeamSearch:
    def test_nans(self):
        probs_1 = random_data(100)
        probs_2 = random_data(100, seed=1)
        probs_1.fill(np.nan)
        with pytest.raises(RuntimeError, match="Failed to compare values"):
            beam_search_duplex(probs_1, probs_2, ALPHABET)

    def test_identical_data(self):
        x = np.array(
            [
                [0.01, 0.98, 0.01],
                [0.01, 0.98, 0.01],
                [0.01, 0.98, 0.01],
                [0.01, 0.98, 0.01],
                [0.9, 0.05, 0.05],
                [0.7, 0.05, 0.35],
                [0.9, 0.05, 0.05],
                [0.01, 0.98, 0.01],
                [0.01, 0.98, 0.01],
                [0.01, 0.98, 0.01],
                [0.01, 0.01, 0.98],
                [0.01, 0.01, 0.98],
                [0.01, 0.01, 0.98],
                [0.01, 0.01, 0.98],
            ],
            np.float32,
        )
        seq = beam_search_duplex(x, x, "NAB")
        assert seq == "AAB"

    def test_disagreeing_data(self):
        x = np.array(
            [
                [0.01, 0.98, 0.01],
                [0.01, 0.34, 0.65],
                [0.01, 0.98, 0.01],
                [0.01, 0.01, 0.98],
            ],
            np.float32,
        )
        assert beam_search(x, "NAB")[0] == "ABAB"
        y = np.array(
            [
                [0.0, 1.0, 0.0],
                [0.0, 1.0, 0.0],
                [0.0, 1.0, 0.0],
                [0.0, 0.0, 1.0],
            ],
            np.float32,
        )
        assert beam_search_duplex(x, y, "NAB") == "AB"
