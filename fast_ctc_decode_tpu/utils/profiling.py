"""Profiling helpers: wall-clock reads/s counters and jax.profiler traces.

The reference has no observability at all (SURVEY.md §5); this is the
framework-native replacement: per-stage timers and a trace context usable
around any decode call.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, Optional

import jax


@dataclass
class Counters:
    reads: int = 0
    frames: int = 0
    seconds: float = 0.0
    stages: Dict[str, float] = field(default_factory=dict)

    @property
    def reads_per_sec(self) -> float:
        return self.reads / self.seconds if self.seconds else 0.0

    @property
    def frames_per_sec(self) -> float:
        return self.frames / self.seconds if self.seconds else 0.0


@contextlib.contextmanager
def timed(counters: Counters, stage: str, reads: int = 0, frames: int = 0):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        counters.seconds += dt
        counters.reads += reads
        counters.frames += frames
        counters.stages[stage] = counters.stages.get(stage, 0.0) + dt


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """jax.profiler trace context (no-op when logdir is None)."""
    if logdir is None:
        yield
        return
    with jax.profiler.trace(logdir):
        yield


def block(tree):
    """Block until all arrays in a pytree are ready (for honest timing)."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return tree


# ------------------------------------------------------- pipeline metrics

import logging

log = logging.getLogger("fast_ctc_decode_tpu")

#: process-wide per-stage metrics, populated by the batch pipeline:
#: stage -> seconds, plus read/error counters.  Reset with reset_metrics().
METRICS = Counters()


def reset_metrics() -> Counters:
    """Reset and return the process-wide pipeline metrics object."""
    global METRICS
    METRICS = Counters()
    return METRICS


@contextlib.contextmanager
def stage(name: str, reads: int = 0, frames: int = 0):
    """Record a pipeline stage into the process-wide METRICS and emit a
    DEBUG log line with the stage wall time."""
    t0 = time.perf_counter()
    with timed(METRICS, name, reads=reads, frames=frames):
        yield
    log.debug(
        "stage %s: %.3fs (reads=%d)", name, time.perf_counter() - t0, reads
    )
