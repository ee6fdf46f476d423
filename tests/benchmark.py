"""Benchmark suite — the analog of the reference's tests/benchmark.py
(/root/reference/tests/benchmark.py): times each decoder entry point on the
README workload (L2-row-normalized random posteriors, alphabet NACGT,
beam_size=5, beam_cut_threshold=0.1) and, like the reference does for
third-party decoders, includes a pure-Python viterbi (argmax + groupby)
baseline for scale.  Where the reference times 10 single reads, the TPU
engine's native unit is a batch, so batched reads/s is reported alongside
single-read latency.

Throughput sections use pipelined timing (queue all iterations, one host
materialization) — per-call syncs through the axon tunnel cost ~30 ms each
and would dominate sub-100 ms batches (PERF.md methodology note).

Run: python tests/benchmark.py [--quick] [--full] [reads.npy]
  default: single-read latencies + batched 1D beam (engines: fast, and
           pallas on TPU)
  --full:  adds CRF beam (fast + pallas), banded duplex (XLA fast, Pallas,
           exact single + batched) — reproduces PERF.md §§1-4
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


def timeit_pipelined(fn, materialize, iters):
    """Queue ``iters`` device calls, force one host materialization."""
    materialize(fn())  # warm/compile
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    materialize(out)
    return (time.perf_counter() - t0) / iters


def norm_batch(B, T, A1, seed):
    rng = np.random.RandomState(seed)
    x = rng.rand(B, T, A1).astype(np.float32)
    return x / np.linalg.norm(x, ord=2, axis=2, keepdims=True)


def diag_env(T1, T2, w):
    env = np.zeros((T1, 2), np.int64)
    for i in range(T1):
        c = int(i * T2 / T1)
        env[i, 0] = max(0, c - w)
        env[i, 1] = min(T2, c + w + 1)
    env[:, 0] = np.maximum.accumulate(env[:, 0])
    last = 0
    for i in range(T1):
        env[i, 0] = min(env[i, 0], last)
        env[i, 1] = max(env[i, 1], env[i, 0] + 1)
        last = max(last, env[i, 1])
    return env


def main():
    quick = "--quick" in sys.argv
    full = "--full" in sys.argv
    paths = [a for a in sys.argv[1:] if not a.startswith("-")]

    import jax

    from fast_ctc_decode_tpu import beam_search, viterbi_search
    from fast_ctc_decode_tpu.ops import beam_fast

    on_tpu = jax.default_backend() == "tpu"
    mat = lambda out: np.asarray(
        out["count"] if isinstance(out, dict) else out
    ).sum()

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
        "beam_search single read (exact engine)",
        timeit(lambda: beam_search(x, "NACGT", 5, 0.1), iters),
    ))
    rows.append((
        "beam_search single read (fast engine)",
        timeit(lambda: beam_search(x, "NACGT", 5, 0.1, engine="fast"), iters),
    ))

    print(f"{'decoder':46s} {'sec/read':>12s}")
    for name, sec in rows:
        print(f"{name:46s} {sec:12.6f}")

    # ---- batched 1D beam: the engine's native operating point ----
    B = 64 if quick else 4096
    xs_d = jax.device_put(norm_batch(B, T, A1, 7))
    ln_d = jax.device_put(np.full((B,), T, np.int32))

    dt = timeit_pipelined(
        lambda: beam_fast.beam_search_fast_batch(
            xs_d, ln_d, np.float32(0.1), beam_size=5
        ),
        mat,
        iters,
    )
    print(f"\n1D beam fast   x{B}: {B / dt:>12,.0f} reads/s")

    if on_tpu:
        from fast_ctc_decode_tpu.ops import beam_pallas

        dt = timeit_pipelined(
            lambda: beam_pallas.beam_search_pallas_batch(
                xs_d, ln_d, np.float32(0.1), beam_size=5
            ),
            mat,
            iters,
        )
        print(f"1D beam pallas x{B}: {B / dt:>12,.0f} reads/s")

        # bit-exact fused tree engine (ops/beam_exact_pallas.py)
        from fast_ctc_decode_tpu.ops import beam_exact_pallas as bxp

        Bx = min(B, 256)
        dt = timeit_pipelined(
            lambda: bxp.beam_search_exact_pallas_batch(
                xs_d[:Bx], ln_d[:Bx], np.float32(0.1), beam_size=5,
                max_nodes=bxp.DEFAULT_KERNEL_NODES,
            ),
            mat,
            max(iters // 2, 1),
        )
        print(f"1D beam exact-pallas x{Bx}: {Bx / dt:>6,.0f} reads/s")

    if not full:
        return

    # ---- CRF beam (PERF.md §3) ----
    Bc, Tc, S = (32, 50, 8) if quick else (512, 400, 64)
    rng = np.random.RandomState(3)
    cp = rng.rand(Bc, Tc, S, A1).astype(np.float32)
    cp /= cp.sum(-1, keepdims=True)
    ci = rng.rand(Bc, S).astype(np.float32)
    cpd, cid = jax.device_put(cp), jax.device_put(ci)
    cld = jax.device_put(np.full((Bc,), Tc, np.int32))
    dt = timeit_pipelined(
        lambda: beam_fast.crf_beam_search_fast_batch(
            cpd, cid, cld, np.float32(0.0), beam_size=5
        ),
        mat,
        iters,
    )
    print(f"CRF beam fast   x{Bc} (S={S}): {Bc / dt:>10,.0f} reads/s")
    if on_tpu:
        from fast_ctc_decode_tpu.ops import beam_pallas

        dt = timeit_pipelined(
            lambda: beam_pallas.crf_beam_search_pallas_batch(
                cpd, cid, cld, np.float32(0.0), beam_size=5
            ),
            mat,
            iters,
        )
        print(f"CRF beam pallas x{Bc} (S={S}): {Bc / dt:>10,.0f} reads/s")

        from fast_ctc_decode_tpu.ops import beam_exact_pallas as bxp

        Bxc = min(Bc, 64)
        dt = timeit_pipelined(
            lambda: bxp.crf_beam_search_exact_pallas_batch(
                cpd[:Bxc], cid[:Bxc], cld[:Bxc], np.float32(0.0),
                beam_size=5, max_nodes=bxp.DEFAULT_KERNEL_NODES,
            ),
            mat,
            max(iters // 2, 1),
        )
        print(f"CRF beam exact-pallas x{Bxc} (S={S}): {Bxc / dt:>6,.0f} reads/s")

    # ---- banded duplex (PERF.md §4) ----
    from fast_ctc_decode_tpu import beam_search_duplex
    from fast_ctc_decode_tpu.ops import duplex, duplex_fast

    Bd, T1 = (16, 60) if quick else (256, 500)
    T2 = T1
    env = diag_env(T1, T2, 8 if quick else 40)
    ep = duplex_fast._prep_envelope_fast(env, T2)
    n1 = norm_batch(Bd, T1, A1, 11)
    n2 = norm_batch(Bd, T2, A1, 12)
    with np.errstate(divide="ignore"):
        l1 = np.log(n1).astype(np.float32)
        l2 = np.log(n2).astype(np.float32)
    rg = np.zeros((Bd, ep.Wr), np.float32)
    rg[:, 1:] = np.cumsum(l2[:, : ep.Wr - 1, 0], axis=1)
    a1d, a2d, rgd = (jax.device_put(v) for v in (l1, l2, rg))
    lod = jax.device_put(ep.lo.astype(np.int32))
    hid = jax.device_put(ep.hi.astype(np.int32))
    std = jax.device_put(np.zeros(Bd, np.int32))
    lnd = jax.device_put(np.full(Bd, T1, np.int32))

    dt = timeit_pipelined(
        lambda: duplex_fast.duplex_fast_batch(
            a1d, a2d, rgd, lod, hid, np.float32(-np.inf), std, lnd,
            beam_size=5, collapse_repeats=True, W=ep.W, Wr=ep.Wr,
            Wext=ep.Wext, needs_ext=ep.needs_ext, crf=False,
            static_window=ep.static_window, rel_window=ep.rel_window,
            D=ep.D, shared_env=True,
        ),
        mat,
        max(iters // 2, 2),
    )
    print(f"duplex banded fast(XLA) x{Bd} (W={ep.W}): {Bd / dt:>8,.0f} pairs/s")

    if on_tpu:
        from fast_ctc_decode_tpu.ops import duplex_pallas

        dt = timeit_pipelined(
            lambda: duplex_pallas.duplex_pallas_batch(
                a1d, a2d, rgd, lod, hid, np.float32(-np.inf), lnd,
                beam_size=5, collapse_repeats=True, W=ep.W, D=ep.D,
                needs_ext=ep.needs_ext,
            ),
            mat,
            max(iters // 2, 2),
        )
        print(f"duplex banded pallas    x{Bd} (W={ep.W}): {Bd / dt:>8,.0f} pairs/s")

    # exact tree engine: single pair + small batch
    dt = timeit(
        lambda: beam_search_duplex(
            n1[0], n2[0], "NACGT", envelope=env, engine="exact"
        ),
        max(iters // 3, 2),
    )
    print(f"duplex banded exact single pair: {dt:.3f} s/pair")
    Be = min(Bd, 32)
    lo_, hi_, We, Wre, ne, Wxe = duplex._prep_envelope(env, T2)
    N = duplex._duplex_max_nodes(T1, 5, A1 - 1, We)
    lob = np.tile(lo_, (Be, 1))
    hib = np.tile(hi_, (Be, 1))
    dt = timeit_pipelined(
        lambda: duplex.duplex_exact_batch(
            a1d[:Be], a2d[:Be], rgd[:Be],
            lob, hib, np.float32(-np.inf),
            np.zeros(Be, np.int32), np.full(Be, T1, np.int32),
            beam_size=5, collapse_repeats=True, max_nodes=N, W=We, Wr=Wre,
            Wext=Wxe, needs_ext=ne, crf=False,
        ),
        mat,
        2,
    )
    print(f"duplex banded exact batched x{Be}: {Be / dt:>8,.1f} pairs/s")

    if on_tpu:
        # fused tree-engine kernel: reference band-reuse semantics at
        # throughput (ops/duplex_exact_pallas.py)
        from fast_ctc_decode_tpu.ops import duplex_exact_pallas as dxp

        Bx = Bd
        lobx = np.tile(lo_, (Bx, 1)).astype(np.int32)
        hibx = np.tile(hi_, (Bx, 1)).astype(np.int32)
        dt = timeit_pipelined(
            lambda: dxp.duplex_exact_pallas_batch(
                a1d[:Bx], a2d[:Bx], rgd[:Bx], lobx, hibx,
                np.float32(-np.inf), np.zeros(Bx, np.int32),
                np.full(Bx, T1, np.int32),
                beam_size=5, collapse_repeats=True,
                max_nodes=min(N, 4096), crf=False, needs_ext=ne,
            ),
            mat,
            2,
        )
        print(f"duplex banded exact-pallas x{Bx}: {Bx / dt:>8,.1f} pairs/s")

        # CRF through the same kernel (the CRF duplex throughput path —
        # PERF.md "Why there is no CRF mode in the slot-band kernel")
        Sx = 16
        c1 = rng.rand(Bx, T1, Sx, A1).astype(np.float32)
        c1 /= c1.sum(-1, keepdims=True)
        c2 = rng.rand(Bx, T2, Sx, A1).astype(np.float32)
        c2 /= c2.sum(-1, keepdims=True)
        with np.errstate(divide="ignore"):
            cl1 = np.log(c1).astype(np.float32)
            cl2 = np.log(c2).astype(np.float32)
        crg = np.zeros((Bx, ep.Wr), np.float32)
        st = np.zeros((Bx,), np.int64)
        cur = np.zeros((Bx,), np.float32)
        for i in range(ep.Wr - 1):
            cur = cur + cl2[np.arange(Bx), i, st, 0]
            crg[:, i + 1] = cur
            st = (st * (A1 - 1)) % Sx
        dt = timeit_pipelined(
            lambda: dxp.duplex_exact_pallas_batch(
                jax.device_put(cl1), jax.device_put(cl2),
                jax.device_put(crg), lobx, hibx,
                np.float32(-np.inf), np.zeros(Bx, np.int32),
                np.full(Bx, T1, np.int32),
                beam_size=5, collapse_repeats=False,
                max_nodes=min(N, 4096), crf=True, needs_ext=ne,
            ),
            mat,
            2,
        )
        print(
            f"CRF duplex exact-pallas x{Bx} (S={Sx}): {Bx / dt:>8,.1f} pairs/s"
        )


if __name__ == "__main__":
    main()
