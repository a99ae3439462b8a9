"""Mergeable sketches for distributed column profiling (SURVEY.md T6/A6).

The reference's only aggregates are per-type counts
(/root/reference/base_validator.py:115-125); at 10^12 rows the engine instead
computes per-block PARTIAL sketches inside ``map_batches``, merges them per
partition via a tiny groupby, and compares partitions to a stored reference
profile with PSI/KS drift tests — sketches are mergeable by construction so
the combine tree is exact regardless of block boundaries.

All sketch inputs are hashed with the deterministic hashers in
:mod:`..functions.hashing`, so partial merges are reproducible across
processes (checkpoint/resume + retry safety).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from .hashing import hash_column

# ------------------------------------------------------------------ HyperLogLog


class HLL:
    """Dense HyperLogLog, p=12 (4096 registers, ~1.6% rel. error). Vectorized
    add; merge = elementwise max; serializes to 4096 bytes."""

    P = 12
    M = 1 << P

    def __init__(self, registers: np.ndarray | None = None):
        self.reg = registers if registers is not None else np.zeros(self.M, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> "HLL":
        if len(h) == 0:
            return self
        h = h.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.P)).astype(np.int64)
        w = h << np.uint64(self.P)
        # vectorized bit_length of w → rank = 64 - P - bit_length(w >> P?) …
        # rank = leading zeros of the remaining 52 bits + 1, capped.
        bl = np.zeros(len(w), dtype=np.int64)
        x = w.copy()
        for s in (32, 16, 8, 4, 2, 1):
            t = x >> np.uint64(s)
            upd = t > 0
            bl[upd] += s
            x[upd] = t[upd]
        bl += x > 0                      # bit_length of w (0 for w == 0)
        rank = np.where(w == 0, 64 - self.P + 1, 64 - bl + 1).astype(np.uint8)
        np.maximum.at(self.reg, idx, rank)
        return self

    def add_column(self, arr) -> "HLL":
        import pyarrow.compute as pc
        if isinstance(arr, (pa.Array, pa.ChunkedArray)):
            arr = arr.filter(pc.is_valid(arr))
        return self.add_hashes(hash_column(arr))

    def merge(self, other: "HLL") -> "HLL":
        np.maximum(self.reg, other.reg, out=self.reg)
        return self

    def estimate(self) -> float:
        m = float(self.M)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        e = alpha * m * m / np.sum(np.exp2(-self.reg.astype(np.float64)))
        zeros = int(np.count_nonzero(self.reg == 0))
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)    # linear-counting small-range correction
        return float(e)

    def to_bytes(self) -> bytes:
        return self.reg.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HLL":
        return cls(np.frombuffer(b, dtype=np.uint8).copy())


# -------------------------------------------------------------- merging t-digest


class TDigest:
    """Merging t-digest (Dunning's k1 scale), fully vectorized compress via
    quantile-bin reduceat — no per-value Python loop. Mergeable; ~2·delta
    centroids retained."""

    def __init__(self, delta: int = 200,
                 means: np.ndarray | None = None, weights: np.ndarray | None = None):
        self.delta = delta
        self.means = means if means is not None else np.empty(0, dtype=np.float64)
        self.weights = weights if weights is not None else np.empty(0, dtype=np.float64)

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        if len(means) == 0:
            self.means, self.weights = means, weights
            return
        order = np.argsort(means, kind="stable")
        m, w = means[order], weights[order]
        total = w.sum()
        q = (np.cumsum(w) - 0.5 * w) / total
        k = np.floor(self.delta / (2 * np.pi) * (np.arcsin(2 * q - 1) + np.pi / 2))
        # group consecutive equal-k centroids
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        wsum = np.add.reduceat(w, starts)
        msum = np.add.reduceat(w * m, starts)
        self.means, self.weights = msum / wsum, wsum

    def add(self, values: np.ndarray) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v):
            self._compress(np.concatenate([self.means, v]),
                           np.concatenate([self.weights, np.ones(len(v))]))
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        self._compress(np.concatenate([self.means, other.means]),
                       np.concatenate([self.weights, other.weights]))
        return self

    @property
    def count(self) -> float:
        return float(self.weights.sum())

    def quantile(self, q: float) -> float:
        if len(self.means) == 0:
            return float("nan")
        cum = np.cumsum(self.weights) - 0.5 * self.weights
        return float(np.interp(q * self.count, cum, self.means,
                               left=self.means[0], right=self.means[-1]))

    def cdf(self, x: np.ndarray | float) -> np.ndarray:
        if len(self.means) == 0:
            return np.zeros_like(np.atleast_1d(np.asarray(x, dtype=float)))
        cum = (np.cumsum(self.weights) - 0.5 * self.weights) / self.count
        return np.interp(np.atleast_1d(np.asarray(x, dtype=float)),
                         self.means, cum, left=0.0, right=1.0)

    def to_bytes(self) -> bytes:
        return struct.pack("<Iq", self.delta, len(self.means)) + \
            self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        delta, n = struct.unpack_from("<Iq", b, 0)
        off = struct.calcsize("<Iq")
        means = np.frombuffer(b, dtype=np.float64, count=n, offset=off).copy()
        weights = np.frombuffer(b, dtype=np.float64, count=n, offset=off + 8 * n).copy()
        return cls(delta, means, weights)


# -------------------------------------------------------------- column profiles


class ColumnProfile:
    """count / nulls / min / max + HLL distinct + t-digest quantiles for one
    column — one partial per block, merged per partition (SURVEY.md A6)."""

    def __init__(self, count=0, nulls=0, vmin=np.inf, vmax=-np.inf,
                 hll: HLL | None = None, digest: TDigest | None = None):
        self.count, self.nulls = int(count), int(nulls)
        self.vmin, self.vmax = float(vmin), float(vmax)
        self.hll = hll or HLL()
        self.digest = digest or TDigest()

    def add_arrow(self, arr: pa.ChunkedArray | pa.Array) -> "ColumnProfile":
        import pyarrow.compute as pc
        self.count += len(arr)
        self.nulls += int(pc.sum(pc.cast(pc.is_null(arr), pa.int64())).as_py() or 0)
        valid = arr.filter(pc.is_valid(arr))
        if len(valid):
            self.hll.add_hashes(hash_column(valid))
            if pa.types.is_integer(valid.type) or pa.types.is_floating(valid.type):
                # safe=False: int64 values beyond 2^53 (e.g. phash) lose ulps,
                # which is fine for sketch/quantile purposes
                v = pc.cast(valid, pa.float64(), safe=False).to_numpy(
                    zero_copy_only=False)
                self.vmin = min(self.vmin, float(v.min()))
                self.vmax = max(self.vmax, float(v.max()))
                self.digest.add(v)
        return self

    def merge(self, other: "ColumnProfile") -> "ColumnProfile":
        self.count += other.count
        self.nulls += other.nulls
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        self.hll.merge(other.hll)
        self.digest.merge(other.digest)
        return self

    def to_bytes(self) -> bytes:
        h, d = self.hll.to_bytes(), self.digest.to_bytes()
        return struct.pack("<qqddq", self.count, self.nulls, self.vmin, self.vmax,
                           len(h)) + h + d

    @classmethod
    def from_bytes(cls, b: bytes) -> "ColumnProfile":
        count, nulls, vmin, vmax, hlen = struct.unpack_from("<qqddq", b, 0)
        off = struct.calcsize("<qqddq")
        return cls(count, nulls, vmin, vmax,
                   HLL.from_bytes(b[off:off + hlen]),
                   TDigest.from_bytes(b[off + hlen:]))

    def summary(self) -> dict:
        return {
            "count": self.count, "nulls": self.nulls,
            "null_rate": self.nulls / self.count if self.count else 0.0,
            "min": None if self.vmin == np.inf else self.vmin,
            "max": None if self.vmax == -np.inf else self.vmax,
            "distinct_est": round(self.hll.estimate(), 1),
            "p50": self.digest.quantile(0.5), "p99": self.digest.quantile(0.99),
        }


# ------------------------------------------------------------------ drift tests


def psi(reference: TDigest, observed: TDigest, buckets: int = 10,
        eps: float = 1e-4) -> float:
    """Population Stability Index between two digests over the reference's
    quantile buckets. Rule of thumb: <0.1 stable, 0.1–0.2 moderate, >0.2 drift."""
    if reference.count == 0 or observed.count == 0:
        return 0.0
    edges = np.array([reference.quantile(q) for q in np.linspace(0, 1, buckets + 1)])
    edges[0], edges[-1] = -np.inf, np.inf
    inner = edges[1:-1]
    r = np.diff(np.r_[0.0, reference.cdf(inner), 1.0]).clip(eps)
    o = np.diff(np.r_[0.0, observed.cdf(inner), 1.0]).clip(eps)
    r, o = r / r.sum(), o / o.sum()
    return float(np.sum((o - r) * np.log(o / r)))


def ks_stat(reference: TDigest, observed: TDigest) -> float:
    """Kolmogorov–Smirnov statistic: max |CDF_ref − CDF_obs| at both digests'
    centroid support points."""
    if reference.count == 0 or observed.count == 0:
        return 0.0
    xs = np.unique(np.concatenate([reference.means, observed.means]))
    return float(np.abs(reference.cdf(xs) - observed.cdf(xs)).max())
