"""Deterministic, partition-independent vectorized randomness.

Workflow constraint: generation must be reproducible regardless of how Spark
partitions the id range, so every random draw is a pure function of
(seed, row id, slot) via a splitmix64-style avalanche hash — no RNG state.
"""

from __future__ import annotations

import numpy as np

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 arrays."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return z ^ (z >> np.uint64(31))


def hash_u64(seed: int, ids: np.ndarray, slot: int) -> np.ndarray:
    """Deterministic uint64 per (seed, id, slot)."""
    seed_mix = np.uint64((seed * 0x9E3779B97F4A7C15) % 2**64)
    slot_mix = np.uint64((slot * 0xC2B2AE3D27D4EB4F) % 2**64)
    base = (ids.astype(np.uint64) * np.uint64(0x100000001B3)) & _MASK
    base = (base + seed_mix + slot_mix) & _MASK
    return splitmix64(base)


def uniform(seed: int, ids: np.ndarray, slot: int) -> np.ndarray:
    """Deterministic float64 in [0, 1) per (seed, id, slot)."""
    return hash_u64(seed, ids, slot).astype(np.float64) / 2**64


def randint(seed: int, ids: np.ndarray, slot: int, n: int) -> np.ndarray:
    """Deterministic int in [0, n) per (seed, id, slot)."""
    return (hash_u64(seed, ids, slot) % np.uint64(n)).astype(np.int64)


def zipf_indices(seed: int, ids: np.ndarray, slot: int, n: int, alpha: float = 1.1) -> np.ndarray:
    """Zipf-distributed index in [0, n): heavy skew toward low indices.

    Used to plant hot CURIEs / frequent speakers (FIXTURES.md §1); the hot keys
    are what the salted two-phase aggregation and AQE skew-join handling are
    benchmarked against.
    """
    ranks = np.arange(1, n + 1, dtype=np.float64)
    w = 1.0 / ranks**alpha
    cdf = np.cumsum(w) / w.sum()
    u = uniform(seed, ids, slot)
    return np.searchsorted(cdf, u, side="right").clip(0, n - 1)
