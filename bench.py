"""Benchmark: batched 1D CTC prefix beam search reads/s on one chip.

North-star config (BASELINE.json): T=1000 x 5-label posteriors, beam_size=5,
beam_cut_threshold=0.1, exact sequence parity vs the reference beam_search.
Runs the fused Pallas kernel (fast_ctc_decode_tpu/ops/beam_pallas.py) by
default; BENCH_ENGINE=fast selects the scan engine.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is reads/s divided by the 5000 reads/s/chip target.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    from fast_ctc_decode_tpu.ops import beam_fast, beam_pallas

    engine = os.environ.get("BENCH_ENGINE", "pallas")
    B = int(os.environ.get("BENCH_BATCH", "32768"))
    T = int(os.environ.get("BENCH_T", "1000"))
    A1 = 5
    beam_size = 5
    threshold = np.float32(0.1)

    rng = np.random.RandomState(42)
    probs = rng.rand(B, T, A1).astype(np.float32)
    probs /= np.linalg.norm(probs, ord=2, axis=-1, keepdims=True)
    lengths = np.full((B,), T, np.int32)

    dev = jax.devices()[0]
    probs_d = jax.device_put(probs, dev)
    lengths_d = jax.device_put(lengths, dev)

    if engine == "pallas":
        kernel = lambda: beam_pallas.beam_search_pallas_batch(
            probs_d,
            lengths_d,
            threshold,
            beam_size=beam_size,
            collapse_repeats=True,
            interpret=jax.default_backend() != "tpu",
        )
    else:
        kernel = lambda: beam_fast.beam_search_fast_batch(
            probs_d,
            lengths_d,
            threshold,
            beam_size=beam_size,
            collapse_repeats=True,
        )

    def run():
        out = kernel()
        jax.block_until_ready(out)
        return out

    out = run()  # compile + warm
    assert all(int(e) == 0 for e in np.asarray(out["err"])), "decode errors in bench"

    # correctness gate vs the sequential reference-semantics oracle: the
    # bench result is meaningless without sequence parity, so this is a
    # hard failure (no silent skip), sampled across the batch
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    import oracle

    n_check = int(os.environ.get("BENCH_PARITY_READS", "8"))
    for i in np.linspace(0, B - 1, n_check).astype(int):
        n = int(out["count"][i])
        labels_rev = np.asarray(out["labels_rev"][i])[:n]
        seq = "".join("NACGT"[int(l) + 1] for l in labels_rev[::-1])
        want, _ = oracle.beam_search(probs[i], "NACGT", beam_size, 0.1)
        assert seq == want, f"read {i}: {seq!r} != oracle {want!r}"

    # pipelined timing: queue all iterations, then force ONE host
    # materialization.  Per-call syncs through the axon tunnel add ~30 ms
    # of host round trip per iteration (and block_until_ready can return
    # early on this platform); queuing measures device throughput.
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = kernel()
    np.asarray(out["count"]).sum()
    dt = (time.perf_counter() - t0) / iters

    reads_per_sec = B / dt
    print(
        json.dumps(
            {
                "metric": "beam_search_reads_per_sec_per_chip",
                "value": round(reads_per_sec, 1),
                "unit": "reads/s",
                "vs_baseline": round(reads_per_sec / 5000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
