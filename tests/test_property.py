"""Property-based kernel tests (hypothesis) — random inputs vs straightforward
Python reference semantics."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from faang_pydantics_validation_ray.functions.sketches import HLL, TDigest
from faang_pydantics_validation_ray.functions.hashing import hash_column
from faang_pydantics_validation_ray.imagetable import codec
from faang_pydantics_validation_ray.rules import kernels, sentinels
from faang_pydantics_validation_ray.rules.spec import RuleContext

SENT = list(sentinels.SENTINELS)
values = st.one_of(st.none(), st.sampled_from(SENT),
                   st.text(alphabet="abcXYZ ", max_size=8))


@settings(max_examples=50, deadline=None)
@given(st.lists(values, min_size=1, max_size=40),
       st.sampled_from(["mandatory", "recommended", "optional"]))
def test_sentinel_policy_reference(vals, level):
    col = pa.chunked_array([pa.array(vals, type=pa.string())])
    got: dict[int, str] = {}
    for mask, sev, _ in sentinels.sentinel_findings(col, level):
        for i, hit in enumerate(mask):
            if hit:
                assert i not in got, "row flagged twice"
                got[i] = sev
    for i, v in enumerate(vals):
        expected = sentinels.POLICY[level].get(v) if v is not None else None
        assert got.get(i) == expected


@settings(max_examples=50, deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.floats(-1e6, 1e6, allow_nan=False)),
                min_size=1, max_size=50),
       st.floats(-100, 0), st.floats(0, 100))
def test_numeric_range_reference(vals, lo, hi):
    t = pa.table({"v": pa.array(vals, type=pa.float64())})
    mask = kernels.numeric_range("v", lo=lo, hi=hi)(t, RuleContext(t, {}))[0][0]
    for i, v in enumerate(vals):
        assert mask[i] == (v is not None and (v < lo or v > hi))


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(), st.sampled_from(["a", "b", "c", "z", ""])),
                min_size=1, max_size=50))
def test_enum_reference(vals):
    t = pa.table({"v": pa.array(vals, type=pa.string())})
    ctx = RuleContext(t, {"v": "mandatory"})
    mask = kernels.enum_in("v", ["a", "b"])(t, ctx)[0][0]
    for i, v in enumerate(vals):
        expected = v is not None and v not in ("a", "b") and v not in SENT
        assert mask[i] == expected


@settings(max_examples=10, deadline=None)
@given(st.integers(100, 20_000))
def test_hll_error_bound(n):
    h = HLL().add_hashes(hash_column(np.arange(n)))
    assert abs(h.estimate() - n) / n < 0.15


@settings(max_examples=10, deadline=None)
@given(st.integers(500, 20_000), st.floats(0.05, 0.95))
def test_tdigest_quantile_bound(n, q):
    rng = np.random.default_rng(n)
    v = rng.uniform(0, 1000, n)
    d = TDigest()
    for chunk in np.array_split(v, 7):
        d.add(chunk)
    assert abs(d.quantile(q) - np.quantile(v, q)) < 25.0


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 80), st.integers(1, 80),
       st.sampled_from(["png", "jpeg", "webp"]))
def test_codec_roundtrip_property(w, h, fmt):
    px = codec.gen_pixels(f"IMG_{w:06d}{h:06d}", w, h)
    got_fmt, gw, gh, out = codec.decode(codec.encode(px, fmt))
    assert (got_fmt, gw, gh) == (fmt, w, h)
    if fmt != "jpeg":
        assert np.array_equal(out, px)
    else:
        assert codec.psnr(px, out) >= 40.0
