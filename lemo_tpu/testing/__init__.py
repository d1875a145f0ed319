"""Synthetic assets for tests and benchmarks (licensed data stand-ins)."""
