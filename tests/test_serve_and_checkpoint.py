"""Tests for the JSON decode service (C2 analog) and checkpoint/resume."""

import json
import os

import numpy as np

from fast_ctc_decode_tpu import beam_search, viterbi_search
from fast_ctc_decode_tpu.serve import decode_json, decode_request
from fast_ctc_decode_tpu.parallel.pipeline import decode_many


def rand_read(T, A1, seed):
    rng = np.random.RandomState(seed)
    x = rng.rand(T, A1).astype(np.float32)
    return x / np.linalg.norm(x, ord=2, axis=1, keepdims=True)


class TestServe:
    def test_beam_request_matches_api(self):
        x = rand_read(20, 5, 0)
        req = {
            "method": "beam_search",
            "posteriors": x.reshape(-1).tolist(),
            "shape": [20, 5],
            "alphabet": ["N", "A", "C", "G", "T"],
            "beam_size": 5,
            "beam_cut_threshold": 0.1,
        }
        out = decode_request(req)
        seq, starts = beam_search(x, "NACGT", 5, 0.1)
        assert out == {"seq": seq, "starts": starts}

    def test_viterbi_request_matches_api(self):
        # the reference wasm fixture matrix (tests/index.html:9-18)
        x = np.array(
            [
                [0.0, 0.4, 0.6], [0.0, 0.3, 0.7], [0.3, 0.3, 0.4],
                [0.4, 0.3, 0.3], [0.4, 0.3, 0.3], [0.3, 0.3, 0.4],
                [0.1, 0.4, 0.5], [0.1, 0.5, 0.4], [0.8, 0.1, 0.1],
                [0.1, 0.1, 0.8],
            ],
            np.float32,
        )
        req = {
            "method": "viterbi_search",
            "posteriors": x.reshape(-1).tolist(),
            "shape": [10, 3],
            "alphabet": ["N", "A", "G"],
        }
        out = decode_request(req)
        seq, starts = viterbi_search(x, "NAG")
        assert out["seq"] == seq == "GGAG"
        assert out["starts"] == starts

    def test_json_roundtrip_and_errors(self):
        x = rand_read(10, 5, 1)
        req = json.dumps(
            {
                "method": "beam_search",
                "posteriors": x.reshape(-1).tolist(),
                "shape": [10, 5],
                "alphabet": "NACGT",
            }
        )
        out = json.loads(decode_json(req))
        assert set(out) == {"seq", "starts"}
        # structured error instead of the reference wasm's "Error" string
        bad = json.loads(decode_json('{"method": "nope", "shape": [1, 2]}'))
        assert "error" in bad
        bad = json.loads(decode_json("not json"))
        assert "error" in bad


class TestDecodeMany:
    def test_resume_from_checkpoint(self, tmp_path):
        reads = [rand_read(t, 5, i) for i, t in enumerate([30, 17, 30, 9, 25])]
        ckpt = str(tmp_path / "run.json")

        full = decode_many(
            reads, "NACGT", beam_size=5, beam_cut_threshold=0.1,
            batch_size=16, checkpoint_path=None,
        )
        # simulate preemption: decode only the first batch, then resume
        partial = decode_many(
            reads[:2], "NACGT", beam_size=5, beam_cut_threshold=0.1,
            batch_size=16, checkpoint_path=ckpt,
        )
        # hack the cursor back into a mid-run state for the full read list
        with open(ckpt) as f:
            d = json.load(f)
        d["meta"]["n_reads"] = len(reads)
        with open(ckpt, "w") as f:
            json.dump(d, f)

        resumed = decode_many(
            reads, "NACGT", beam_size=5, beam_cut_threshold=0.1,
            batch_size=16, checkpoint_path=ckpt,
        )
        assert [r[0] for r in resumed] == [r[0] for r in full]
        # already-complete checkpoint returns without decoding
        again = decode_many(
            reads, "NACGT", beam_size=5, beam_cut_threshold=0.1,
            batch_size=16, checkpoint_path=ckpt,
        )
        assert [tuple(r) for r in again] == [tuple(r) for r in resumed]

    def test_mismatched_params_rejected(self, tmp_path):
        import pytest

        reads = [rand_read(10, 5, 0)]
        ckpt = str(tmp_path / "run.json")
        decode_many(reads, "NACGT", beam_size=5, checkpoint_path=ckpt)
        with pytest.raises(ValueError, match="different decode parameters"):
            decode_many(reads, "NACGT", beam_size=7, checkpoint_path=ckpt)


class TestWasmGoldens:
    """The reference's browser-test golden values (tests/fast_ctc_wasm.test.js:
    29-46 + tests/index.html:9-18), driven through the JSON service — the
    direct analog of the WASM entry points it exercises."""

    MATRIX = [
        [0.0, 0.4, 0.6], [0.0, 0.3, 0.7], [0.3, 0.3, 0.4],
        [0.4, 0.3, 0.3], [0.4, 0.3, 0.3], [0.3, 0.3, 0.4],
        [0.1, 0.4, 0.5], [0.1, 0.5, 0.4], [0.8, 0.1, 0.1],
        [0.1, 0.1, 0.8],
    ]

    def test_beam_golden(self):
        req = {
            "method": "beam_search",
            "posteriors": [x for row in self.MATRIX for x in row],
            "shape": [10, 3],
            "alphabet": ["N", "A", "G"],
            "beam_size": 5,
            "beam_cut_threshold": 0.1,
        }
        out = decode_request(req)
        assert out == {"seq": "GAGAG", "starts": [0, 1, 2, 4, 6]}

    def test_viterbi_golden(self):
        req = {
            "method": "viterbi_search",
            "posteriors": [x for row in self.MATRIX for x in row],
            "shape": [10, 3],
            "alphabet": ["N", "A", "G"],
        }
        out = decode_request(req)
        assert out == {"seq": "GGAG", "starts": [0, 5, 7, 9]}
