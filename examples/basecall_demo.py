"""End-to-end demo: batched basecalling-style decoding on synthetic reads.

Generates synthetic posteriors for known sequences (the shape a basecaller
network would emit), decodes them three ways — batched beam search over the
data mesh, batched viterbi, and duplex pair consensus — and reports
accuracy and throughput.

Run: python examples/basecall_demo.py [--reads N] [--T frames]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALPHABET = "NACGT"


def synth_read(rng, n_bases, frames_per_base=6, noise=0.04):
    """Posteriors for a random sequence: each base emits once among blanks."""
    seq = rng.randint(1, 5, n_bases)
    T = n_bases * frames_per_base
    x = rng.rand(T, 5).astype(np.float32) * noise
    x[:, 0] += 2.0  # blank-heavy background
    for i, b in enumerate(seq):
        x[i * frames_per_base, b] += 8.0
    x /= x.sum(axis=1, keepdims=True)
    return "".join(ALPHABET[b] for b in seq), x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=256)
    ap.add_argument("--T", type=int, default=300)
    args = ap.parse_args()

    import jax

    from fast_ctc_decode_tpu import beam_search_duplex
    from fast_ctc_decode_tpu.parallel.pipeline import (
        BatchBeamDecoder, BatchViterbiDecoder,
    )
    from fast_ctc_decode_tpu.utils.padding import pad_batch

    rng = np.random.RandomState(0)
    n_bases = args.T // 6
    truths, reads = zip(*(synth_read(rng, n_bases) for _ in range(args.reads)))
    probs, lengths = pad_batch(list(reads))
    print(f"{args.reads} reads x {probs.shape[1]} frames on {jax.devices()[0]}")

    # --- batched prefix beam search ---
    dec = BatchBeamDecoder(ALPHABET, T=probs.shape[1], beam_size=5,
                           beam_cut_threshold=0.1)
    t0 = time.perf_counter()
    results = dec.decode(probs, lengths)
    dt = time.perf_counter() - t0
    acc = np.mean([r[0] == t for r, t in zip(results, truths)])
    print(f"beam   : {acc:6.1%} exact reads, {args.reads/dt:8.0f} reads/s "
          f"(incl. compile on first call)")

    t0 = time.perf_counter()
    results = dec.decode(probs, lengths)
    dt = time.perf_counter() - t0
    print(f"beam   : warm pass            {args.reads/dt:8.0f} reads/s")

    # --- batched viterbi ---
    vit = BatchViterbiDecoder(ALPHABET, T=probs.shape[1])
    vres = vit.decode(probs, lengths)
    vres = vit.decode(probs, lengths)
    vacc = np.mean([r[0] == t for r, t in zip(vres, truths)])
    print(f"viterbi: {vacc:6.1%} exact reads")

    # --- duplex consensus of two noisy observations of the same sequence ---
    truth, p1 = synth_read(rng, 12, noise=0.15)
    _, p2 = synth_read(rng, 12, noise=0.15)
    # re-emit the SAME sequence in p2
    p2 = p1 * 0.0
    rng2 = np.random.RandomState(1)
    p2 += rng2.rand(*p1.shape).astype(np.float32) * 0.15
    p2[:, 0] += 2.0
    for i, ch in enumerate(truth):
        p2[i * 6, ALPHABET.index(ch)] += 8.0
    p2 /= p2.sum(axis=1, keepdims=True)
    consensus = beam_search_duplex(p1, p2, ALPHABET)
    print(f"duplex : truth {truth} -> consensus {consensus} "
          f"({'exact' if consensus == truth else 'diff'})")


if __name__ == "__main__":
    main()
