"""Checkpoint/resume for long batched decode runs.

The reference has no checkpointing (decodes are single short calls —
SURVEY.md §5); a TPU pipeline streaming millions of reads needs resumable
iteration.  State is deliberately tiny — a cursor plus the already-decoded
outputs — saved atomically (write-to-temp + rename) as JSON after every
batch, so a preempted job resumes exactly where it stopped without
re-decoding.

Used by ``parallel.pipeline.decode_many``.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple


@dataclass
class DecodeCheckpoint:
    """Cursor + accumulated per-read results for a resumable decode run."""

    path: Optional[str]
    cursor: int = 0
    results: List[Tuple[str, List[int], int]] = field(default_factory=list)
    meta: Dict = field(default_factory=dict)

    @classmethod
    def load_or_create(cls, path: Optional[str], meta: Optional[Dict] = None):
        """Resume from ``path`` when it exists (validating ``meta`` —
        resuming with different decode params is an error), else start."""
        meta = meta or {}
        if path is not None and os.path.exists(path):
            with open(path) as f:
                d = json.load(f)
            if meta and d.get("meta") != meta:
                raise ValueError(
                    f"checkpoint {path} was written with different decode "
                    f"parameters: {d.get('meta')} != {meta}"
                )
            return cls(
                path=path,
                cursor=int(d["cursor"]),
                results=[tuple(r) for r in d["results"]],
                meta=d.get("meta", {}),
            )
        return cls(path=path, meta=meta)

    def extend(self, batch_results: List[Tuple[str, List[int], int]], n: int):
        """Record ``n`` newly decoded reads and persist."""
        self.results.extend(batch_results[:n])
        self.cursor += n
        self.save()

    def save(self):
        if self.path is None:
            return
        d = {"cursor": self.cursor, "results": self.results, "meta": self.meta}
        dirname = os.path.dirname(os.path.abspath(self.path))
        os.makedirs(dirname, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=dirname, suffix=".ckpt.tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(d, f)
            os.replace(tmp, self.path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
