"""Sketch correctness: estimates within tolerance, merges exact-equivalent to
single-shot, serialization round-trips (no Ray)."""

import numpy as np
import pyarrow as pa

from faang_pydantics_validation_ray.functions.sketches import (
    HLL, ColumnProfile, TDigest, ks_stat, psi,
)
from faang_pydantics_validation_ray.functions.hashing import hash_column


def test_hll_estimate_and_merge():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 1 << 60, 50_000)
    b = rng.integers(0, 1 << 60, 50_000)
    h1 = HLL().add_hashes(hash_column(a))
    h2 = HLL().add_hashes(hash_column(b))
    est = h1.merge(h2).estimate()
    true = len(np.unique(np.concatenate([a, b])))
    assert abs(est - true) / true < 0.05
    single = HLL().add_hashes(hash_column(np.concatenate([a, b])))
    assert np.array_equal(h1.reg, single.reg)  # merge == single-shot exactly


def test_hll_small_range():
    h = HLL().add_hashes(hash_column(np.arange(100)))
    assert abs(h.estimate() - 100) / 100 < 0.1


def test_hll_roundtrip():
    h = HLL().add_hashes(hash_column(np.arange(1000)))
    assert np.array_equal(HLL.from_bytes(h.to_bytes()).reg, h.reg)


def test_tdigest_quantiles():
    rng = np.random.default_rng(3)
    v = rng.normal(100, 15, 200_000)
    d = TDigest()
    for chunk in np.array_split(v, 20):
        d.add(chunk)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        assert abs(d.quantile(q) - np.quantile(v, q)) < 1.0
    assert abs(d.count - len(v)) < 1e-6
    assert len(d.means) < 600  # bounded size


def test_tdigest_merge_and_roundtrip():
    rng = np.random.default_rng(4)
    a, b = rng.uniform(0, 1, 50_000), rng.uniform(0, 1, 50_000)
    d = TDigest().add(a).merge(TDigest().add(b))
    assert abs(d.quantile(0.5) - 0.5) < 0.01
    d2 = TDigest.from_bytes(d.to_bytes())
    assert np.allclose(d2.means, d.means) and d2.count == d.count


def test_column_profile():
    arr = pa.chunked_array([pa.array([1, 2, None, 4, 4, 1000], type=pa.int64())])
    p = ColumnProfile().add_arrow(arr)
    s = p.summary()
    assert s["count"] == 6 and s["nulls"] == 1
    assert s["min"] == 1.0 and s["max"] == 1000.0
    assert 3 <= s["distinct_est"] <= 5
    p2 = ColumnProfile.from_bytes(p.to_bytes())
    assert p2.summary() == s
    merged = ColumnProfile().add_arrow(arr).merge(ColumnProfile().add_arrow(arr))
    assert merged.summary()["count"] == 12


def test_drift_detects_shift():
    rng = np.random.default_rng(5)
    ref = TDigest().add(rng.uniform(8, 49, 50_000))
    same = TDigest().add(rng.uniform(8, 49, 50_000))
    shifted = TDigest().add(rng.uniform(24, 81, 50_000))   # the datagen drift shift
    assert psi(ref, same) < 0.05
    assert psi(ref, shifted) > 0.2
    assert ks_stat(ref, same) < 0.05
    assert ks_stat(ref, shifted) > 0.2
