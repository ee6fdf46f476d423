"""Batched CRF-beam and duplex pipeline decoders on the CPU mesh."""

import numpy as np

import oracle
from fast_ctc_decode_tpu import beam_search_duplex, crf_beam_search
from fast_ctc_decode_tpu.parallel.pipeline import (
    BatchCrfBeamDecoder,
    BatchDuplexDecoder,
)


def test_batch_crf_beam_matches_oracle():
    rng = np.random.RandomState(21)
    B, T, S, A1 = 8, 25, 8, 5
    probs = rng.rand(B, T, S, A1).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)
    inits = rng.rand(B, S).astype(np.float32)
    lengths = np.full((B,), T, np.int32)
    lengths[3] = 11

    dec = BatchCrfBeamDecoder("NACGT", T=T, n_state=S, beam_size=5)
    res = dec.decode(probs, inits, lengths)
    assert len(res) == B
    for i in range(B):
        seq, path, err = res[i]
        assert err == 0
        oseq, _ = oracle.crf_beam_search(
            probs[i, : lengths[i]], inits[i], "NACGT", 5, 0.0
        )
        assert seq == oseq, i
        assert len(path) == len(seq) and path == sorted(path)
        # fast engine matches the single-read fast API too
        fseq, fpath = crf_beam_search(
            probs[i, : lengths[i]], inits[i], "NACGT", 5, 0.0, engine="fast"
        )
        assert (seq, path) == (fseq, fpath), i


def test_batch_duplex_matches_single():
    rng = np.random.RandomState(31)
    B, T1, T2, A1 = 4, 14, 16, 4

    def norm(x):
        return (x / np.linalg.norm(x, ord=2, axis=-1, keepdims=True)).astype(
            np.float32
        )

    n1 = norm(rng.rand(B, T1, A1))
    n2 = norm(rng.rand(B, T2, A1))
    dec = BatchDuplexDecoder("NACG", T1=T1, T2=T2, beam_size=5)
    res = dec.decode(n1, n2)
    for i in range(B):
        seq, err = res[i]
        assert err == 0
        want = beam_search_duplex(n1[i], n2[i], "NACG", engine="fast")
        assert seq == want, i
        oseq = oracle.beam_search_duplex(n1[i], n2[i], "NACG", beam_size=5)
        assert seq == oseq, i


def test_batch_crf_duplex_full_range_matches_oracle():
    """BatchCrfDuplexDecoder (auto -> fast engine on the default full-range
    envelope) vs the NumPy oracle and the single-read API."""
    from fast_ctc_decode_tpu import crf_beam_search_duplex
    from fast_ctc_decode_tpu.parallel.pipeline import BatchCrfDuplexDecoder

    rng = np.random.RandomState(41)
    B, T1, T2, S, A1 = 8, 12, 14, 16, 5

    def mk(shape, seed):
        r = np.random.RandomState(seed)
        x = r.rand(*shape).astype(np.float32)
        return x / x.sum(-1, keepdims=True)

    n1 = np.stack([mk((T1, S, A1), 100 + i) for i in range(B)])
    n2 = np.stack([mk((T2, S, A1), 200 + i) for i in range(B)])
    i1 = rng.rand(B, S).astype(np.float32)
    i2 = rng.rand(B, S).astype(np.float32)

    dec = BatchCrfDuplexDecoder("NACGT", T1=T1, T2=T2, n_state=S, beam_size=5)
    res = dec.decode(n1, i1, n2, i2)
    assert len(res) == B
    for i in range(B):
        seq, err = res[i]
        assert err == 0
        want = oracle.crf_beam_search_duplex(
            n1[i], i1[i], n2[i], i2[i], "NACGT", beam_size=5
        )
        assert seq == want, i
        api_seq = crf_beam_search_duplex(
            n1[i], i1[i], n2[i], i2[i], "NACGT", beam_size=5
        )
        assert seq == api_seq, i


def test_batch_crf_duplex_banded_auto_exact():
    """Moving-window envelopes route to the bit-exact tree engine
    (parity-first auto), matching the oracle on band-reuse semantics."""
    from duplex_helpers import diag_env
    from fast_ctc_decode_tpu.parallel.pipeline import BatchCrfDuplexDecoder

    B, T1, T2, S, A1 = 8, 12, 14, 16, 5
    rng = np.random.RandomState(51)

    def mk(shape, seed):
        r = np.random.RandomState(seed)
        x = r.rand(*shape).astype(np.float32)
        return x / x.sum(-1, keepdims=True)

    n1 = np.stack([mk((T1, S, A1), 300 + i) for i in range(B)])
    n2 = np.stack([mk((T2, S, A1), 400 + i) for i in range(B)])
    i1 = rng.rand(B, S).astype(np.float32)
    i2 = rng.rand(B, S).astype(np.float32)
    env = diag_env(T1, T2, 4)

    dec = BatchCrfDuplexDecoder("NACGT", T1=T1, T2=T2, n_state=S, beam_size=5)
    res = dec.decode(n1, i1, n2, i2, envelopes=env)
    for i in range(B):
        seq, err = res[i]
        assert err == 0
        want = oracle.crf_beam_search_duplex(
            n1[i], i1[i], n2[i], i2[i], "NACGT", env, beam_size=5
        )
        assert seq == want, i
