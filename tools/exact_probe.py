"""Probe the XLA exact 1D beam engine: does step cost scale with max_nodes?

Usage: python tools/exact_probe.py [B] [T]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

from fast_ctc_decode_tpu.ops import beam


def _force(out):
    leaf = min(jax.tree_util.tree_leaves(out), key=lambda x: x.size)
    return np.asarray(leaf).ravel()[:1]


def timed(fn, *args, iters=3, tag=""):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:36s} {dt*1e3:9.2f} ms", flush=True)
    return out, dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    A1, K = 5, 5
    thr = np.float32(0.1)
    rng = np.random.RandomState(42)
    probs = rng.rand(B, T, A1).astype(np.float32)
    probs /= np.linalg.norm(probs, ord=2, axis=-1, keepdims=True)
    lengths = np.full((B,), T, np.int32)
    dev = jax.devices()[0]
    probs_d = jax.device_put(probs, dev)
    lengths_d = jax.device_put(lengths, dev)

    for N in (20008, 8192, 2048, 512):
        fn = lambda p, l: beam.beam_search_device_batch(
            p, l, thr, beam_size=K, max_nodes=N
        )
        out, dt = timed(fn, probs_d, lengths_d, tag=f"exact batch N={N}")
        print(
            f"{'':36s} {B/dt:10.0f} reads/s  "
            f"err={np.asarray(out['err']).max()}",
            flush=True,
        )


if __name__ == "__main__":
    main()
