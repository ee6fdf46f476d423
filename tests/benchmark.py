"""Benchmark suite — the analog of the reference's tests/benchmark.py
(/root/reference/tests/benchmark.py): times each decoder entry point on the
README workload (L2-row-normalized random posteriors, alphabet NACGT,
beam_size=5, beam_cut_threshold=0.1) and, like the reference does for
third-party decoders, includes a pure-Python viterbi (argmax + groupby)
baseline for scale.  Where the reference times 10 single reads, the TPU
engine's native unit is a batch, so batched reads/s is reported alongside
single-read latency.

Run: python tests/benchmark.py [--quick] [reads.npy]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def python_viterbi(probs, alphabet="NACGT"):
    """The reference benchmark's python decoder (benchmark.py:8-13)."""
    from itertools import groupby

    path = np.argmax(probs, axis=1)
    return "".join(alphabet[b] for b, g in groupby(path) if b)


def timeit(fn, iters):
    fn()  # warm/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    quick = "--quick" in sys.argv
    paths = [a for a in sys.argv[1:] if not a.startswith("-")]

    import jax

    from fast_ctc_decode_tpu import beam_search, viterbi_search
    from fast_ctc_decode_tpu.ops import beam_fast
    from fast_ctc_decode_tpu.utils.profiling import block

    if paths:
        x = np.load(paths[0]).astype(np.float32)
    else:
        rng = np.random.RandomState(42)
        x = rng.rand(25 if quick else 1000, 5).astype(np.float32)
        x /= np.linalg.norm(x, ord=2, axis=1, keepdims=True)
    T, A1 = x.shape
    iters = 3 if quick else 10
    print(f"device: {jax.devices()[0]}, read shape: {x.shape}")

    rows = []
    rows.append(("viterbi python argmax+groupby", timeit(lambda: python_viterbi(x), iters)))
    rows.append(("viterbi_search (this repo)", timeit(lambda: viterbi_search(x, "NACGT"), iters)))
    rows.append((
        "beam_search single read (this repo)",
        timeit(lambda: beam_search(x, "NACGT", 5, 0.1), iters),
    ))

    # batched throughput — the engine's native operating point
    B = 64 if quick else 2048
    rng = np.random.RandomState(7)
    xs = rng.rand(B, T, A1).astype(np.float32)
    xs /= np.linalg.norm(xs, ord=2, axis=2, keepdims=True)
    xs_d = jax.device_put(xs)
    ln_d = jax.device_put(np.full((B,), T, np.int32))

    def run_batch():
        block(
            beam_fast.beam_search_fast_batch(
                xs_d, ln_d, np.float32(0.1), beam_size=5
            )
        )

    dt = timeit(run_batch, iters)
    rows.append((f"beam_search batched x{B} (per read)", dt / B))

    print(f"{'decoder':44s} {'sec/read':>12s}")
    for name, sec in rows:
        print(f"{name:44s} {sec:12.6f}")
    print(f"\nbatched beam throughput: {B / dt:,.0f} reads/s")


if __name__ == "__main__":
    main()
