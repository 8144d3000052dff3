"""Vectorized Bloom filter over url keys — the 100-TB stale-filter
prefilter (SURVEY.md §3.4).

When the duplicated-url winner map is too large to broadcast as a dict,
the flagship pipeline broadcasts only this FIXED-SIZE bit array and routes
rows through it: a miss proves the url is unique (straight to processing,
no exchange), a hit means *maybe duplicated* (the row joins the small
maybe-dup stream that pays the grouped dedup exchange).  False positives
only cost a few extra rows in that stream — never a wrong answer, because
the maybe stream resolves winners exactly (``stages.dedup.dedup_latest``).

Hashing is ``pandas.util.hash_array`` (SipHash-1-3 with pandas' fixed
default key) + double hashing for the k probe positions — deterministic
across processes/machines for one pandas version, which a containerized
cluster pins; everything is numpy-vectorized across rows.
"""

from __future__ import annotations

import math

import numpy as np

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MAX_BITS = 1 << 33  # 1 GiB bitmap cap: bounds worker memory at any key count


def _bloom_bits(n_keys: int, bits_per_key: int) -> int:
    """Power-of-two bit count: ~bits_per_key bits/key, floor 1024, capped."""
    want = max(int(n_keys), 1) * bits_per_key
    m = 1 << max(10, math.ceil(math.log2(want)))
    return min(m, _MAX_BITS)


def hash_urls(urls: np.ndarray) -> np.ndarray:
    """Stable 64-bit hash per url (vectorized)."""
    import pandas as pd

    return pd.util.hash_array(np.asarray(urls, dtype=object))


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Full-avalanche 64-bit mixer (splitmix64 finalizer, public domain)."""
    with np.errstate(over="ignore"):
        z = x + _GOLDEN
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def bloom_positions(urls: np.ndarray, m: int, k: int) -> np.ndarray:
    """The k probe positions per url, shape (n, k) uint64 — double hashing
    h1 + i*h2 over a power-of-two table (mask, no modulo).  h2 comes from a
    full avalanche mix of h1: a plain odd-multiplier h2 has low bits fully
    determined by ``h1 mod m``, which collapses every probe pattern to a
    function of one residue and inflates the FP rate ~60×."""
    h1 = hash_urls(urls)
    with np.errstate(over="ignore"):
        h2 = _splitmix64(h1) | np.uint64(1)
        steps = np.arange(k, dtype=np.uint64)
        pos = h1[:, None] + steps[None, :] * h2[:, None]
    return pos & np.uint64(m - 1)


class UrlBloom:
    """The broadcastable membership filter (bits + params only)."""

    def __init__(self, n_keys: int, *, bits_per_key: int = 16, k: int = 8) -> None:
        self.m = _bloom_bits(n_keys, bits_per_key)
        self.k = k
        self.bits = np.zeros(self.m // 8, dtype=np.uint8)

    def set_positions(self, pos: np.ndarray) -> None:
        """OR probe positions into the bitmap (driver-side streaming merge)."""
        p = np.asarray(pos, dtype=np.uint64).reshape(-1)
        np.bitwise_or.at(
            self.bits, (p >> np.uint64(3)).astype(np.int64),
            (np.uint64(1) << (p & np.uint64(7))).astype(np.uint8),
        )

    def add(self, urls: np.ndarray) -> None:
        self.set_positions(bloom_positions(urls, self.m, self.k))

    def contains(self, urls: np.ndarray) -> np.ndarray:
        """Vectorized membership mask: True = maybe present, False = definitely
        absent."""
        n = len(urls)
        if n == 0:
            return np.zeros(0, dtype=bool)
        pos = bloom_positions(urls, self.m, self.k)
        byte = self.bits[(pos >> np.uint64(3)).astype(np.int64)]
        bit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
        return bit.all(axis=1)
