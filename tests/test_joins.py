"""Join-based rule operators: J2 mismatch counting, J4 2-cycle detection,
semi/anti wrappers (Dataset.join)."""

import pandas as pd
import pytest


@pytest.fixture()
def edges(ray_session):
    import ray.data as rd
    return rd.from_pandas(pd.DataFrame({
        "src": ["a", "b", "c", "d", "e", "x"],
        "dst": ["b", "a", "d", "c", "f", "x"],
    }))  # cycles: (a,b), (c,d); self-loop: (x,x)


def test_two_cycles(edges):
    from faang_pydantics_validation_ray.functions.joins import two_cycles
    out = two_cycles(edges).to_pandas().sort_values(["src", "dst"])
    got = set(zip(out.src, out.dst))
    assert got == {("a", "b"), ("c", "d"), ("x", "x")}


def test_semi_anti(ray_session):
    import ray.data as rd
    from faang_pydantics_validation_ray.functions.joins import anti_join, semi_join
    left = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3, 4], "v": "abcd".split("")
                                        if False else list("abcd")}))
    right = rd.from_pandas(pd.DataFrame({"k": [2, 4]}))
    assert sorted(r["k"] for r in semi_join(left, right, "k").take_all()) == [2, 4]
    assert sorted(r["k"] for r in anti_join(left, right, "k").take_all()) == [1, 3]


def test_join_mismatch_count(ray_session):
    import pyarrow.compute as pc
    import ray.data as rd
    from faang_pydantics_validation_ray.functions.joins import join_mismatch_count
    child = rd.from_pandas(pd.DataFrame(
        {"pid": [1, 1, 2, 3], "species": ["cat", "dog", "cat", "owl"]}))
    parent = rd.from_pandas(pd.DataFrame(
        {"id": [1, 2, 3], "p_species": ["cat", "cat", "owl"]}))
    bad = join_mismatch_count(
        child, parent, "pid", "id",
        lambda t: pc.not_equal(t.column("species"), t.column("p_species")))
    assert bad == 1  # the (1, dog) child


def test_fused_counts_handles_empty_and_null_batches(ray_session):
    """Regression (ADVICE r1): a batch yielding zero key-count rows (all-null
    keys / empty block) must not crash the prefix tagging."""
    import numpy as np
    import ray.data as rd
    from faang_pydantics_validation_ray.functions.groups import (
        fused_cross_record_counts)
    df = pd.DataFrame({
        "image_id": ["A", "A", None, None, "B"],
        "phash": pd.array([None, None, None, None, None], dtype="Int64"),
    })
    # one block is entirely null-keyed
    ds = rd.from_pandas([df.iloc[:2], df.iloc[2:4], df.iloc[4:],
                         df.iloc[0:0]])
    caps = rd.from_pandas(pd.DataFrame({"image_id": ["A", "Z", "Z"]}))
    dup, missing, near, external = fused_cross_record_counts(ds, caps)
    assert dup.set_index("image_id")["cnt"].to_dict() == {"A": 2}
    assert missing.set_index("image_id")["left_cnt"].to_dict() == {"Z": 2}
    assert len(near) == 0 and len(external) == 0


def test_fused_counts_external_catalog(ray_session):
    """T3: locally-missing refs found in the external catalog split out of
    ``missing`` (downgraded severity at the caller) — still one shuffle."""
    import ray.data as rd
    from faang_pydantics_validation_ray.functions.groups import (
        fused_cross_record_counts)
    ds = rd.from_pandas(pd.DataFrame({
        "image_id": ["A", "B"], "phash": pd.array([1, 1], dtype="Int64")}))
    caps = rd.from_pandas(pd.DataFrame(
        {"image_id": ["A", "X", "X", "Y"]}))
    cat = rd.from_pandas(pd.DataFrame({"image_id": ["X", "UNUSED"]}))
    dup, missing, near, external = fused_cross_record_counts(
        ds, caps, catalog_keys=cat)
    assert missing.set_index("image_id")["left_cnt"].to_dict() == {"Y": 1}
    assert external.set_index("image_id")["left_cnt"].to_dict() == {"X": 2}
    assert near.set_index("phash")["cnt"].to_dict() == {1: 2}


def test_asof_join_backward_with_tiebreak(ray_session):
    import ray.data as rd
    from faang_pydantics_validation_ray.functions.joins import asof_join
    left = rd.from_pandas(pd.DataFrame({
        "k": [1, 1, 1, 2, 3],
        "lt": pd.to_datetime(["2024-01-05", "2024-01-10", "2024-01-01",
                              "2024-01-05", "2024-01-05"]),
        "lid": [10, 11, 12, 20, 30]}))
    right = rd.from_pandas(pd.DataFrame({
        "rk": [1, 1, 1, 2],
        "rt": pd.to_datetime(["2024-01-03", "2024-01-03", "2024-01-08",
                              "2024-01-09"]),
        "rid": [100, 101, 102, 200]}))
    out = asof_join(left, right, "k", "rk", "lt", "rt",
                    ["lid"], ["rid"], right_tiebreak="rid")
    got = dict(zip(out.lid.astype(int), out.rid.astype(int)))
    # lid=10 (Jan 5): latest right <= Jan 5 is Jan 3; tie -> max rid 101
    # lid=11 (Jan 10): Jan 8 row (rid 102)
    # lid=12 (Jan 1): no right row at-or-before -> dropped
    # k=2 (Jan 5): right is Jan 9 (after) -> dropped; k=3: no right side
    assert got == {10: 101, 11: 102}


def test_range_join_counts(ray_session):
    import ray.data as rd
    from faang_pydantics_validation_ray.functions.joins import range_join_counts
    left = rd.from_pandas(pd.DataFrame({
        "k": [1, 1, 1, 2],
        "lt": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-20",
                              "2024-01-01"])}))
    right = rd.from_pandas(pd.DataFrame({
        "rk": [1, 1, 3],
        "rt": pd.to_datetime(["2024-01-01", "2024-01-15", "2024-01-01"]),
        "rid": [100, 101, 300]}))
    out = range_join_counts(left, right, "k", "rk", "lt", "rt", "rid",
                            lo_us=0, hi_us=7 * 86400 * 1_000_000)
    got = dict(zip(out.rid.astype(int), out.n.astype(int)))
    # rid=100 window [Jan1, Jan8): hits Jan1+Jan2 = 2; rid=101 [Jan15, Jan22):
    # hits Jan20 = 1; rid=300 key 3 has no left rows -> dropped
    assert got == {100: 2, 101: 1}


def test_asof_join_matches_pandas_merge_asof(ray_session):
    """Randomized cross-check against pandas.merge_asof (backward,
    exact-match allowed): same keys, same times, same tie-break."""
    import numpy as np
    import ray.data as rd
    from faang_pydantics_validation_ray.functions.joins import asof_join
    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        nl, nr = 150, 80
        left = pd.DataFrame({
            "k": rng.integers(0, 12, nl),
            "lt": pd.to_datetime("2024-01-01")
                  + pd.to_timedelta(rng.integers(0, 10**6, nl), unit="s"),
            "lid": np.arange(nl)})
        right = pd.DataFrame({
            "rk": rng.integers(0, 12, nr),
            "rt": pd.to_datetime("2024-01-01")
                  + pd.to_timedelta(rng.integers(0, 10**6, nr), unit="s"),
            "rid": np.arange(nr)})
        got = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                        "k", "rk", "lt", "rt", ["lid"], ["rid"],
                        right_tiebreak="rid")
        ref = pd.merge_asof(
            left.sort_values("lt"), right.sort_values(["rt", "rid"]),
            left_on="lt", right_on="rt", left_by="k", right_by="rk",
            direction="backward").dropna(subset=["rid"])
        want = dict(zip(ref.lid.astype(int), ref.rid.astype(int)))
        have = dict(zip(got.lid.astype(int), got.rid.astype(int)))
        assert have == want, f"seed {seed}: {len(have)} vs {len(want)}"


def test_collect_list_agg_overflow_fails_loudly(ray_session):
    """A hot key past max_per_key must raise, not silently balloon one
    accumulator list (VERDICT r2 #9)."""
    import pytest
    import ray.data as rd
    from faang_pydantics_validation_ray.functions import groups
    df = pd.DataFrame({"k": ["hot"] * 30 + ["ok"], "v": range(31)})
    ds = rd.from_pandas(df).repartition(4)
    with pytest.raises(Exception, match="max_per_key"):
        (ds.groupby("k")
         .aggregate(groups.collect_list_agg("v", max_per_key=10))
         .to_pandas())
    out = (ds.groupby("k")
           .aggregate(groups.collect_list_agg("v", max_per_key=100))
           .to_pandas())
    assert sorted(out.loc[out["k"] == "hot", "v_list"].iloc[0]) == \
        list(range(30))
