"""Sharded batch decode pipeline.

Reads stream in as padded posterior batches ``[B, T, A+1]`` with per-read
lengths; the batch axis is sharded over the 1-D ``data`` mesh (pjit infers
the partitioning of the vmapped scan — reads never communicate), decoded
token/path arrays come back sharded, and only fixed-width arrays + counters
cross host boundaries.  Ragged strings are assembled host-local per shard.

A ``shard_map``-based variant demonstrates explicit collectives: a ``psum``
over the data axis merges per-shard read counters (the reads/s accounting
the multi-host benchmark uses).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .. import errors
from ..alphabet import normalize_alphabet
from ..ops import beam as beam_ops
from ..ops import beam_fast as beam_fast_ops
from ..ops import viterbi as viterbi_ops
from .mesh import DATA_AXIS, batch_sharding, make_data_mesh


class BatchBeamDecoder:
    """Batched, mesh-sharded CTC prefix beam search decoder.

    Static configuration (shapes compile once): T, alphabet size, beam size,
    collapse flag.  ``decode`` accepts [B, T, A+1] f32 posteriors + [B]
    lengths, with B divisible by the mesh size.

    ``engine`` selects the device kernel:
      - "pallas" (default on TPU): fully fused Pallas kernel
        (ops/beam_pallas.py) — bit-identical to "fast", several times
        faster; runs interpreted (slow) off-TPU.
      - "fast": hash-identity scan engine (ops/beam_fast.py) — O(beam)
        scan state, sequence-exact vs the reference; ``path`` entries for
        pruned-and-re-derived prefixes report their latest creation time.
      - "exact": flattened-suffix-tree engine (ops/beam.py) — bit-exact
        path and tie-break parity at much lower throughput; honours
        ``max_nodes``.
      - None (default): "pallas" on TPU backends, "fast" elsewhere.
    """

    def __init__(
        self,
        alphabet,
        T: int,
        beam_size: int = 5,
        beam_cut_threshold: float = 0.0,
        collapse_repeats: bool = True,
        max_nodes: Optional[int] = None,
        mesh=None,
        engine: Optional[str] = None,
    ):
        self.alphabet = normalize_alphabet(alphabet)
        self.T = int(T)
        self.beam_size = int(beam_size)
        self.threshold = np.float32(beam_cut_threshold)
        self.collapse = bool(collapse_repeats)
        if engine is None:
            engine = "pallas" if jax.default_backend() == "tpu" else "fast"
        if engine not in ("pallas", "fast", "exact"):
            raise ValueError(f"unknown engine {engine!r}")
        self.engine = engine
        self.mesh = mesh if mesh is not None else make_data_mesh()
        self._sharding = batch_sharding(self.mesh)

        if engine == "pallas":
            from ..ops import beam_pallas as beam_pallas_ops

            kernel = functools.partial(
                beam_pallas_ops.beam_search_pallas_batch,
                beam_size=self.beam_size,
                collapse_repeats=self.collapse,
                interpret=jax.default_backend() != "tpu",
            )
        elif engine == "fast":
            kernel = functools.partial(
                beam_fast_ops.beam_search_fast_batch,
                beam_size=self.beam_size,
                collapse_repeats=self.collapse,
            )
        else:
            self.max_nodes = int(
                max_nodes
                if max_nodes is not None
                else beam_ops.default_max_nodes(
                    T, beam_size, len(self.alphabet) - 1
                )
            )
            kernel = functools.partial(
                beam_ops.beam_search_device_batch,
                beam_size=self.beam_size,
                collapse_repeats=self.collapse,
                max_nodes=self.max_nodes,
            )
        call = lambda p, l: kernel(p, l, self.threshold)
        if engine == "pallas":
            # a pallas_call does not partition under pjit — shard-map it so
            # each device runs the fused kernel on its local read shard
            self._fn = jax.jit(
                jax.shard_map(
                    call,
                    mesh=self.mesh,
                    in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                    out_specs=P(DATA_AXIS),
                    check_vma=False,
                )
            )
        else:
            self._fn = jax.jit(
                call,
                in_shardings=(self._sharding, self._sharding),
                out_shardings=self._sharding,
            )

    def decode_arrays(self, probs, lengths):
        """Device decode only — returns the raw fixed-width result dict
        (labels_rev, times_rev, count, err), sharded over the mesh."""
        probs = jnp.asarray(probs, jnp.float32)
        lengths = jnp.asarray(lengths, jnp.int32)
        return self._fn(probs, lengths)

    def decode(self, probs, lengths) -> List[Tuple[str, List[int], int]]:
        """Full decode: returns [(sequence, path, err_code)] per read.
        Reads that fail keep their status code instead of raising, so one
        bad read cannot abort a batch (reference would raise per call).
        String assembly uses the native C++ detokenizer when available."""
        from ..native import detokenize_batch

        out = jax.device_get(self.decode_arrays(probs, lengths))
        counts = np.where(
            np.asarray(out["err"]) == errors.OK, np.asarray(out["count"]), 0
        ).astype(np.int32)
        seqs = detokenize_batch(
            np.asarray(out["labels_rev"]), counts, self.alphabet[1:], reverse=True
        )
        res = []
        for seq, times_rev, n, err in zip(
            seqs, out["times_rev"], counts, out["err"]
        ):
            err = int(err)
            if err != errors.OK:
                res.append(("", [], err))
                continue
            path = [int(t) for t in times_rev[: int(n)][::-1]]
            res.append((seq, path, errors.OK))
        return res


class BatchViterbiDecoder:
    """Batched, mesh-sharded viterbi decoder (device argmax + emission)."""

    def __init__(
        self,
        alphabet,
        T: int,
        collapse_repeats: bool = True,
        qscale: float = 1.0,
        qbias: float = 0.0,
        mesh=None,
    ):
        self.alphabet = normalize_alphabet(alphabet)
        self.T = int(T)
        self.collapse = bool(collapse_repeats)
        self.qscale = np.float32(qscale)
        self.qbias = np.float32(qbias)
        self.mesh = mesh if mesh is not None else make_data_mesh()
        self._sharding = batch_sharding(self.mesh)

        self._fn = jax.jit(
            lambda p, l: jax.vmap(
                lambda pp, ll: viterbi_ops.viterbi_device(
                    pp, ll, self.qscale, self.qbias, collapse_repeats=self.collapse
                )
            )(p, l),
            in_shardings=(self._sharding, self._sharding),
            out_shardings=self._sharding,
        )

    def decode_arrays(self, probs, lengths):
        probs = jnp.asarray(probs, jnp.float32)
        lengths = jnp.asarray(lengths, jnp.int32)
        return self._fn(probs, lengths)

    def decode(self, probs, lengths, qstring: bool = False):
        out = jax.device_get(self.decode_arrays(probs, lengths))
        res = []
        for tokens, path, qints, n in zip(
            out["tokens"], out["path"], out["qints"], out["n"]
        ):
            n = int(n)
            seq = "".join(self.alphabet[int(t)] for t in tokens[:n])
            if qstring:
                seq += "".join(chr(int(q) + 33) for q in qints[:n])
            res.append((seq, [int(i) for i in path[:n]]))
        return res


def decode_and_count(
    mesh, probs, lengths, *, beam_size, threshold, collapse, max_nodes=None
):
    """shard_map decode with an explicit psum over the data axis: every shard
    decodes its reads and all shards agree on the global (decoded, errored)
    counters — the cross-host merge the reference never had.  Uses the fast
    engine (``max_nodes`` is accepted for API compatibility and ignored)."""
    del max_nodes

    def shard_fn(p, l):
        out = beam_fast_ops.beam_search_fast_batch(
            p,
            l,
            jnp.float32(threshold),
            beam_size=beam_size,
            collapse_repeats=collapse,
        )
        ok = jnp.sum((out["err"] == errors.OK).astype(jnp.int32))
        bad = jnp.sum((out["err"] != errors.OK).astype(jnp.int32))
        totals = jax.lax.psum(jnp.stack([ok, bad]), DATA_AXIS)
        return out, totals

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P()),
        # per-shard decode is communication-free until the final psum; the
        # scan carry starts from replicated constants, which the varying-axes
        # checker would otherwise reject
        check_vma=False,
    )
    return jax.jit(fn)(probs, lengths)


def decode_many(
    reads: Sequence[np.ndarray],
    alphabet,
    *,
    beam_size: int = 5,
    beam_cut_threshold: float = 0.0,
    collapse_repeats: bool = True,
    batch_size: int = 256,
    T: Optional[int] = None,
    mesh=None,
    engine: str = "fast",
    checkpoint_path: Optional[str] = None,
) -> List[Tuple[str, List[int], int]]:
    """Decode a long list of variable-length reads with checkpoint/resume.

    Reads are padded to a common T (max length unless given), processed in
    fixed ``batch_size`` device batches over the data mesh, and the
    (sequence, path, err) results are persisted after every batch via
    ``utils.checkpoint.DecodeCheckpoint`` — a preempted run restarted with
    the same ``checkpoint_path`` resumes at the first undecoded read.
    """
    from ..utils.checkpoint import DecodeCheckpoint
    from ..utils.padding import pad_batch

    if T is None:
        T = max((r.shape[0] for r in reads), default=0)
    meta = {
        "n_reads": len(reads),
        "T": int(T),
        "beam_size": int(beam_size),
        "beam_cut_threshold": float(beam_cut_threshold),
        "collapse_repeats": bool(collapse_repeats),
        "engine": engine,
    }
    ckpt = DecodeCheckpoint.load_or_create(checkpoint_path, meta)
    if ckpt.cursor >= len(reads):
        return ckpt.results

    dec = BatchBeamDecoder(
        alphabet,
        T=T,
        beam_size=beam_size,
        beam_cut_threshold=beam_cut_threshold,
        collapse_repeats=collapse_repeats,
        mesh=mesh,
        engine=engine,
    )
    n_dev = len(dec.mesh.devices.reshape(-1))
    batch_size = max(batch_size - batch_size % n_dev, n_dev)

    while ckpt.cursor < len(reads):
        chunk = reads[ckpt.cursor : ckpt.cursor + batch_size]
        n = len(chunk)
        # pad the final partial batch up to a full device batch
        padded = list(chunk) + [chunk[-1]] * (batch_size - n)
        probs, lengths = pad_batch(padded, T=T)
        ckpt.extend(dec.decode(probs, lengths), n)
    return ckpt.results
