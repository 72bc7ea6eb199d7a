"""Deterministic synthetic fixtures: the transcripts corpus and the
reference query set (FIXTURES.md §1-2). Seeded, order-independent,
partitionable — the same (seed, conv range) always yields the same rows,
on any executor, which is what makes builds checkpoint-resumable and
benchmarks reproducible."""
