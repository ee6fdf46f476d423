"""Micro-bench for the fused tree-engine duplex kernel (exact-pallas).

Reproduces the PERF.md §4 workload (T1=T2=500, W=82 diagonal envelope,
B=256) in isolation so kernel changes can be A/B-timed quickly.

Run: python tools/bench_exact_duplex.py [B] [--crf]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"),
)

from duplex_helpers import diag_env  # noqa: E402


def main():
    import jax

    from fast_ctc_decode_tpu.ops import duplex
    from fast_ctc_decode_tpu.ops import duplex_exact_pallas as dxp

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(args[0]) if args else 256
    crf = "--crf" in sys.argv
    T1 = T2 = 500
    A1 = 5
    S = 16

    rng = np.random.RandomState(11)
    env = diag_env(T1, T2, 40)
    lo_, hi_, We, Wre, ne, Wxe = duplex._prep_envelope(env, T2)
    N = min(duplex._duplex_max_nodes(T1, 5, A1 - 1, We), 4096)

    if crf:
        x1 = rng.rand(B, T1, S, A1).astype(np.float32)
        x2 = rng.rand(B, T2, S, A1).astype(np.float32)
    else:
        x1 = rng.rand(B, T1, A1).astype(np.float32)
        x2 = rng.rand(B, T2, A1).astype(np.float32)
    x1 /= np.linalg.norm(x1, ord=2, axis=-1, keepdims=True)
    x2 /= np.linalg.norm(x2, ord=2, axis=-1, keepdims=True)
    with np.errstate(divide="ignore"):
        l1 = np.log(x1).astype(np.float32)
        l2 = np.log(x2).astype(np.float32)

    rg = np.zeros((B, Wre), np.float32)
    if crf:
        st = np.zeros((B,), np.int64)
        cur = np.zeros((B,), np.float32)
        for i in range(Wre - 1):
            cur = cur + l2[np.arange(B), i, st, 0]
            rg[:, i + 1] = cur
            st = (st * (A1 - 1)) % S
    else:
        rg[:, 1:] = np.cumsum(l2[:, : Wre - 1, 0], axis=1)

    lob = np.tile(lo_, (B, 1)).astype(np.int32)
    hib = np.tile(hi_, (B, 1)).astype(np.int32)
    a1d, a2d, rgd = (jax.device_put(v) for v in (l1, l2, rg))

    fn = lambda: dxp.duplex_exact_pallas_batch(
        a1d, a2d, rgd, lob, hib, np.float32(-np.inf),
        np.zeros(B, np.int32), np.full(B, T1, np.int32),
        beam_size=5, collapse_repeats=not crf,
        max_nodes=N, crf=crf, needs_ext=ne,
    )
    out = fn()
    jax.block_until_ready(out)
    errs = np.asarray(out["err"])
    assert (errs == 0).all(), f"errors: {np.unique(errs)}"
    iters = 3
    t0 = time.perf_counter()
    o = None
    for _ in range(iters):
        o = fn()
    np.asarray(o["count"]).sum()
    dt = (time.perf_counter() - t0) / iters
    tag = "CRF " if crf else ""
    print(f"{tag}exact-pallas duplex x{B} (W={We}, N={N}): "
          f"{B / dt:>8,.1f} pairs/s  ({dt * 1e3:.1f} ms/batch)")


if __name__ == "__main__":
    main()
