"""Corner-path hardening tests: NODE_OVERFLOW, native detokenizer parity,
qstring batching, multi-char-alphabet batch pipeline, engine guards."""

import numpy as np
import pytest

from fast_ctc_decode_tpu import beam_search, beam_search_duplex, errors
from fast_ctc_decode_tpu.native import build as native_build
from fast_ctc_decode_tpu.parallel.pipeline import (
    BatchBeamDecoder,
    BatchViterbiDecoder,
)


def rand_read(T, A1, seed):
    rng = np.random.RandomState(seed)
    x = rng.rand(T, A1).astype(np.float32)
    return x / np.linalg.norm(x, ord=2, axis=1, keepdims=True)


class TestNodeOverflow:
    def test_single_read_raises_node_overflow(self):
        # a busy random read allocates far more than 8 tree nodes
        x = rand_read(64, 5, 0)
        with pytest.raises(errors.SearchError, match="node budget") as ei:
            beam_search(x, "NACGT", 5, 0.0, max_nodes=8)
        assert ei.value.code == errors.NODE_OVERFLOW

    def test_ample_budget_matches_default(self):
        x = rand_read(64, 5, 1)
        assert beam_search(x, "NACGT", 5, 0.1, max_nodes=100_000) == beam_search(
            x, "NACGT", 5, 0.1, engine="exact"
        )

    def test_batch_overflow_does_not_poison_others(self):
        # one long busy read blows an 80-node budget; short reads do not.
        # per-read status codes must isolate the failure.
        reads = [rand_read(6, 5, 2), rand_read(64, 5, 3), rand_read(6, 5, 4)]
        T = 64
        probs = np.zeros((8, T, 5), np.float32)
        lengths = np.zeros((8,), np.int32)
        for i, r in enumerate(reads):
            probs[i, : r.shape[0]] = r
            lengths[i] = r.shape[0]
        dec = BatchBeamDecoder(
            "NACGT", T=T, beam_size=5, beam_cut_threshold=0.0,
            engine="exact", max_nodes=80,
        )
        res = dec.decode(probs, lengths)
        assert res[1][2] == errors.NODE_OVERFLOW and res[1][0] == ""
        for i in (0, 2):
            seq, path = beam_search(reads[i], "NACGT", 5, 0.0, engine="exact")
            assert res[i] == (seq, path, errors.OK)

    def test_overflow_err_survives_remaining_steps(self):
        # the frozen carry must keep reporting overflow, not resume decoding
        x = rand_read(200, 5, 5)
        with pytest.raises(errors.SearchError) as ei:
            beam_search(x, "NACGT", 5, 0.0, max_nodes=16)
        assert ei.value.code == errors.NODE_OVERFLOW


class TestEngineGuards:
    def test_max_nodes_plus_fast_engine_rejected(self):
        x = rand_read(16, 5, 0)
        with pytest.raises(ValueError, match="max_nodes requires"):
            beam_search(x, "NACGT", 5, 0.1, max_nodes=100, engine="fast")

    def test_duplex_max_nodes_forces_exact(self):
        # explicitly supplied max_nodes must not be silently ignored by the
        # fast engine: auto-select routes to exact (full-range envelope
        # would otherwise pick fast)
        x = rand_read(12, 5, 1)
        y = rand_read(12, 5, 2)
        a = beam_search_duplex(x, y, "NACGT", beam_size=5,
                               beam_cut_threshold=0.1, max_nodes=50_000)
        b = beam_search_duplex(x, y, "NACGT", beam_size=5,
                               beam_cut_threshold=0.1, engine="exact")
        assert a == b
        with pytest.raises(ValueError, match="max_nodes requires"):
            beam_search_duplex(x, y, "NACGT", beam_size=5,
                               beam_cut_threshold=0.1, max_nodes=10,
                               engine="fast")

    def test_fast_engine_opt_in_is_sequence_exact(self):
        x = rand_read(100, 5, 3)
        fast = beam_search(x, "NACGT", 5, 0.1, engine="fast")
        exact = beam_search(x, "NACGT", 5, 0.1)  # default: exact parity
        assert fast[0] == exact[0]


class TestNativeDetok:
    def test_cxx_matches_python_fallback(self):
        rng = np.random.RandomState(0)
        B, Tmax = 17, 23
        tokens = rng.randint(0, 4, size=(B, Tmax)).astype(np.int32)
        counts = rng.randint(0, Tmax + 1, size=(B,)).astype(np.int32)
        labels = ["A", "C", "G", "T"]
        for reverse in (True, False):
            got = native_build.detokenize_batch(tokens, counts, labels, reverse)
            exp = []
            for b in range(B):
                row = tokens[b, : counts[b]]
                if reverse:
                    row = row[::-1]
                exp.append("".join(labels[t] for t in row))
            assert got == exp

    def test_multichar_labels_fall_back(self):
        tokens = np.array([[0, 1, 2]], np.int32)
        counts = np.array([3], np.int32)
        labels = ["AAA", "CCC", "GGG"]
        assert native_build.detokenize_batch(tokens, counts, labels, False) == [
            "AAACCCGGG"
        ]

    def test_qstrings_batch_matches_python(self):
        rng = np.random.RandomState(1)
        B, Tmax = 9, 15
        qints = rng.randint(0, 60, size=(B, Tmax)).astype(np.uint32)
        counts = rng.randint(0, Tmax + 1, size=(B,)).astype(np.int32)
        got = native_build.qstrings_batch(qints, counts)
        exp = [
            "".join(chr(int(q) + 33) for q in qints[b, : counts[b]])
            for b in range(B)
        ]
        assert got == exp

    def test_qstrings_large_values_use_fallback(self):
        # values >= 94 would exceed printable ASCII in the C path
        qints = np.array([[200, 3]], np.uint32)
        counts = np.array([2], np.int32)
        got = native_build.qstrings_batch(qints, counts)
        assert got == [chr(233) + chr(36)]


class TestMultiCharAlphabetBatch:
    def test_batch_beam_multichar_alphabet(self):
        alphabet = ["N", "AAA", "CCC", "GGG", "TTT"]
        reads = [rand_read(20, 5, s) for s in range(8)]
        probs = np.stack(reads)
        lengths = np.full((8,), 20, np.int32)
        dec = BatchBeamDecoder(
            alphabet, T=20, beam_size=5, beam_cut_threshold=0.1, engine="fast"
        )
        res = dec.decode(probs, lengths)
        for r, read in zip(res, reads):
            seq, path = beam_search(read, alphabet, 5, 0.1, engine="fast")
            assert (r[0], r[1], r[2]) == (seq, path, 0)

    def test_batch_viterbi_qstring_matches_single(self):
        from fast_ctc_decode_tpu import viterbi_search

        reads = [rand_read(24, 5, 10 + s) for s in range(8)]
        probs = np.stack(reads)
        lengths = np.full((8,), 24, np.int32)
        dec = BatchViterbiDecoder("NACGT", T=24, qscale=0.9, qbias=0.1)
        res = dec.decode(probs, lengths, qstring=True)
        for (seq, path), read in zip(res, reads):
            exp_seq, exp_path = viterbi_search(
                read, "NACGT", qstring=True, qscale=0.9, qbias=0.1
            )
            assert (seq, path) == (exp_seq, exp_path)


class TestObservability:
    def test_pipeline_stage_metrics_and_logs(self, caplog):
        import logging

        from fast_ctc_decode_tpu.parallel.pipeline import decode_many
        from fast_ctc_decode_tpu.utils import profiling

        profiling.reset_metrics()
        reads = [rand_read(t, 5, 70 + i) for i, t in enumerate([12, 20, 9])]
        with caplog.at_level(logging.INFO, logger="fast_ctc_decode_tpu"):
            res = decode_many(reads, "NACGT", T=20, batch_size=8)
        assert len(res) == 3
        stages = profiling.METRICS.stages
        assert "beam.device" in stages and "beam.detok" in stages
        assert "decode_many.checkpoint" in stages
        assert profiling.METRICS.reads >= 3
        assert any("decode_many" in r.message for r in caplog.records)
