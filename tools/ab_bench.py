"""A/B the fused 1D beam kernel variants on the real chip.

Checks bit-parity (labels/times/count/err) between versions, then times
raw-kernel and full-pipeline throughput for each (version, block) config.

Usage: python tools/ab_bench.py [B] [T] [iters]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

from fast_ctc_decode_tpu.ops import beam_pallas


def _force(out):
    leaf = min(jax.tree_util.tree_leaves(out), key=lambda x: x.size)
    return np.asarray(leaf).ravel()[:1]


def timed(fn, *args, iters=5, tag=""):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:34s} {dt*1e3:9.2f} ms", flush=True)
    return out, dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    A1, K = 5, 5
    thr = np.float32(0.1)

    rng = np.random.RandomState(42)
    probs = rng.rand(B, T, A1).astype(np.float32)
    probs /= np.linalg.norm(probs, ord=2, axis=-1, keepdims=True)
    lengths = np.full((B,), T, np.int32)
    dev = jax.devices()[0]
    probs_d = jax.device_put(probs, dev)
    lengths_d = jax.device_put(lengths, dev)

    def run(version, raw=False, bt=256, tb=32):
        return beam_pallas.beam_search_pallas_batch(
            probs_d, lengths_d, thr, beam_size=K, raw=raw,
            block_b=bt, block_t=tb, version=version,
        )

    # parity: v2 vs v1 on a slice of the batch
    print("compiling/running v1...", flush=True)
    o1 = run(1)
    _force(o1)
    print("compiling/running v2...", flush=True)
    o2 = run(2)
    _force(o2)
    print("comparing...", flush=True)
    for f in ("labels_rev", "times_rev", "count", "err"):
        a, b = np.asarray(o1[f]), np.asarray(o2[f])
        if not np.array_equal(a, b):
            bad = np.nonzero(~(a == b).reshape(B, -1).all(axis=-1))[0]
            raise SystemExit(f"PARITY FAIL {f}: reads {bad[:10]}")
    print("parity v1 == v2 OK", flush=True)

    for v in (1, 2):
        for bt, tb in [(256, 32), (512, 32), (512, 64), (256, 16)]:
            fn = functools.partial(run, v, True, bt, tb)
            try:
                _, dt = timed(fn, iters=iters, tag=f"v{v} raw bt={bt} tb={tb}")
                print(f"{'':34s} {B/dt:12.0f} reads/s", flush=True)
            except Exception as e:
                print(f"v{v} bt={bt} tb={tb}: {type(e).__name__}: {e}",
                      flush=True)
    for v in (1, 2):
        fn = functools.partial(run, v, False)
        _, dt = timed(fn, iters=iters, tag=f"v{v} full pipeline")
        print(f"{'':34s} {B/dt:12.0f} reads/s", flush=True)


if __name__ == "__main__":
    main()
