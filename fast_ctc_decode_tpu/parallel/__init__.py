"""Data-parallel scaling: mesh construction and sharded decode pipelines.

The reference has no parallelism at all (its only concurrency affordance is
releasing the Python GIL, src/lib.rs:199 etc.) — reads are embarrassingly
parallel, so data parallelism over a 1-D device mesh is the only strategy
the workload needs (SURVEY.md §2).
"""
