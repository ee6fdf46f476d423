"""Split the headline pipeline into stages and time each on the real chip.

Stages of beam_search_pallas_batch (ops/beam_pallas.py):
  1. input transpose  [B, T, A1] -> [T, A1, B]
  2. fused Pallas kernel (ids_log, fin, err)
  3. traceback scan + packed sort (beam_fast._traceback_scan_batch)

Usage: python tools/kernel_probe.py [B] [T] [iters]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from fast_ctc_decode_tpu.ops import beam_fast, beam_pallas


def _force(out):
    """Materialize ONE small leaf on host (block_until_ready returns early
    through the axon tunnel — see PERF.md timing methodology)."""
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
    print(f"{tag:28s} {dt*1e3:9.2f} ms", flush=True)
    return out, dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    A1 = 5
    K = 5
    thr = np.float32(0.1)

    rng = np.random.RandomState(42)
    probs = rng.rand(B, T, A1).astype(np.float32)
    probs /= np.linalg.norm(probs, ord=2, axis=-1, keepdims=True)
    lengths = np.full((B,), T, np.int32)
    dev = jax.devices()[0]
    probs_d = jax.device_put(probs, dev)
    lengths_d = jax.device_put(lengths, dev)

    # full pipeline
    full = lambda: beam_pallas.beam_search_pallas_batch(
        probs_d, lengths_d, thr, beam_size=K
    )
    _, dt_full = timed(full, iters=iters, tag="full pipeline")
    print(f"{'':28s} {B/dt_full:12.0f} reads/s")

    # stage 1: transpose
    @jax.jit
    def transpose(p):
        Bp, Tp, A1_ = p.shape
        pt = jnp.transpose(p.reshape(Bp, Tp * A1_), (1, 0)).reshape(
            Tp, A1_, Bp
        )
        # pt is a jit output (fully materialized); the scalar is the cheap
        # forcing leaf
        return pt, pt[0, 0, 0]

    _, dt_tr = timed(transpose, probs_d, iters=iters, tag="transpose")

    # stage 2: kernel only (incl. transpose; raw=True skips traceback)
    rawfn = functools.partial(
        beam_pallas.beam_search_pallas_batch, beam_size=K, raw=True
    )
    rawout, dt_raw = timed(
        rawfn, probs_d, lengths_d, thr, iters=iters, tag="transpose+kernel (raw)"
    )
    print(f"{'':28s} kernel-only ≈ {(dt_raw-dt_tr)*1e3:.2f} ms, "
          f"traceback ≈ {(dt_full-dt_raw)*1e3:.2f} ms")

    # stage 3: traceback alone over the materialized id log
    ids_log = rawout["ids_log"]
    fin = rawout["fin"]
    tb = jax.jit(
        lambda f, il: beam_fast._traceback_scan_batch(
            f[0, :B], il[:T, :, :B], T, K, 4
        )
    )
    timed(tb, fin, ids_log, iters=iters, tag="traceback standalone")

    # stage 2+3 split: run kernel only (traceback replaced by trivial sum)
    for bt, tb in [(256, 32), (128, 32), (512, 32), (256, 16), (256, 64),
                   (512, 64), (1024, 32)]:
        try:
            fn = functools.partial(
                beam_pallas.beam_search_pallas_batch,
                beam_size=K, block_b=bt, block_t=tb,
            )
            _, dt = timed(
                fn, probs_d, lengths_d, thr, iters=iters,
                tag=f"pipeline bt={bt} tb={tb}",
            )
            print(f"{'':28s} {B/dt:12.0f} reads/s")
        except Exception as e:
            print(f"bt={bt} tb={tb} failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
