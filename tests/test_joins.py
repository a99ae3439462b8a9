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


def test_recover_exact_counts_separates_collisions(ray_session):
    """The hashed fused exchange stays EXACT under hash collisions because
    hash-level candidates are re-counted per REAL key: a candidate set that
    (as if by collision) contains the hash of a count-1 key must not turn
    that key into a duplicate."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from faang_pydantics_validation_ray.functions.groups import (
        recover_exact_counts)
    from faang_pydantics_validation_ray.functions.hashing import hash_column

    ds = rd.from_pandas(pd.DataFrame(
        {"image_id": ["A", "A", "B", "C", "C", "C"]}))
    # candidate set = hashes of A (true dup), B (count 1 — as if a collision
    # merged it with another key at the hash level), but NOT C
    hset = hash_column(pa.array(["A", "B"])).view(np.int64)
    rec = recover_exact_counts(ds, "image_id", hset)
    got = rec.set_index("image_id")["cnt"].to_dict()
    assert got == {"A": 2, "B": 1}          # exact per real key; C untouched
    # the caller's >= min_count filter then drops B — no false duplicate
    assert rec[rec["cnt"] >= 2]["image_id"].tolist() == ["A"]


def test_fused_hashed_matches_string_path(ray_session):
    """Parity: the hashed exchange (fused_cross_record_counts) returns the
    same dup/missing/near/external sets as the legacy string-tagged partial
    path over a seeded table with all four outcomes."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from faang_pydantics_validation_ray.functions import groups

    rng = np.random.default_rng(5)
    ids = [f"img{i:04d}" for i in range(400)]
    ids += ["img0007", "img0007", "img0011"]           # dups
    ph = rng.integers(0, 50, size=len(ids))            # colliding phashes
    ds = rd.from_pandas(pd.DataFrame(
        {"image_id": ids, "phash": pd.array(ph, dtype="Int64")}))
    caps = rd.from_pandas(pd.DataFrame(
        {"image_id": ids[:100] + ["ghost1", "ghost1", "extcat"]}))
    cat = rd.from_pandas(pd.DataFrame({"image_id": ["extcat", "unused"]}))

    dup_h, miss_h, near_h, ext_h = groups.fused_cross_record_counts(
        ds, caps, catalog_keys=cat)

    def str_partials(t):
        import pyarrow as _pa
        import pyarrow.compute as _pc
        outs = []
        for colname, prefix in (("image_id", "i"), ("phash", "p")):
            c = groups._batch_key_counts(t, colname)
            keys = _pc.binary_join_element_wise(
                _pa.array([prefix] * c.num_rows, type=_pa.string()),
                _pc.cast(c.column(colname), _pa.string()).combine_chunks(),
                ":")
            zero = _pa.array(np.zeros(c.num_rows, dtype=np.int64))
            outs.append(_pa.table({
                "key": keys,
                "own_cnt": _pc.cast(c.column("cnt"),
                                    _pa.int64()).combine_chunks(),
                "cap_cnt": zero, "cat_cnt": zero}))
        return pa.concat_tables(outs)

    tagged = ds.map_batches(str_partials, batch_format="pyarrow")
    dup_s, miss_s, near_s, ext_s = groups.fused_counts_from_partials(
        tagged, caps, catalog_keys=cat)

    def cmp(a, b, key, val):
        assert (a.set_index(key)[val].sort_index().to_dict()
                == b.set_index(key)[val].sort_index().to_dict())

    cmp(dup_h, dup_s, "image_id", "cnt")
    cmp(miss_h, miss_s, "image_id", "left_cnt")
    cmp(ext_h, ext_s, "image_id", "left_cnt")
    near_s["phash"] = near_s["phash"].astype("int64")
    cmp(near_h, near_s, "phash", "cnt")


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


def test_full_outer_join_query_shape(ray_session):
    """sf0.01 happens to have every event user in customer, so the oracle
    can't exercise the unmatched-RIGHT side — this synthetic does: keys on
    both sides missing from the other, Ray's key-coalescing behavior
    (unmatched right rows arrive with the LEFT key column filled)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    L = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3], "seg": ["a", "b", "c"]}))
    R = rd.from_pandas(pd.DataFrame({"rk": [2, 3, 4, 5],
                                     "n": [20, 30, 40, 50]}))
    out = (L.join(R, join_type="full_outer", num_partitions=4,
                  on=("k",), right_on=("rk",))
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["k"].tolist() == [1, 2, 3, 4, 5]     # key coalesced
    assert out["seg"].tolist() == ["a", "b", "c", None, None]
    assert out["n"].fillna(-1).astype(int).tolist() == [-1, 20, 30, 40, 50]
