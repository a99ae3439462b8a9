"""Mimic the driver's correctness gate: run each queries() entry at sf0.01
and compare to its oracle_sql() via DuckDB — row count, schema (column
names), and order-insensitive values."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import importlib.util
    spec = importlib.util.spec_from_file_location("__ray_entry__",
                                                  "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def _compare(ray_df: pd.DataFrame, sql_df: pd.DataFrame, name: str):
    assert list(sorted(ray_df.columns)) == list(sorted(sql_df.columns)), \
        f"{name}: columns {sorted(ray_df.columns)} != {sorted(sql_df.columns)}"
    assert len(ray_df) == len(sql_df), \
        f"{name}: rows {len(ray_df)} != {len(sql_df)}"
    a, b = _canon(ray_df), _canon(sql_df)
    for col in a.columns:
        av, bv = a[col], b[col]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            assert (av.astype(float).round(6).fillna(-1)
                    == bv.astype(float).round(6).fillna(-1)).all(), \
                f"{name}.{col} float mismatch"
        else:
            assert (av.astype(str) == bv.astype(str)).all(), \
                f"{name}.{col} mismatch:\n{av.head()}\n{bv.head()}"


def test_all_oracle_queries_match(entrymod, con):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    failures = []
    for name, sql in oracles.items():
        ray_df = qs[name](SF)
        if not isinstance(ray_df, pd.DataFrame):
            ray_df = ray_df.to_pandas()
        sql_df = con.sql(sql).df()
        try:
            _compare(ray_df, sql_df, name)
        except AssertionError as e:
            failures.append(str(e))
    assert not failures, "\n".join(failures)


def test_rows_only_queries_run(entrymod):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name in set(qs) - set(oracles):
        if name.startswith("img_"):
            continue  # covered by test_entry_and_img below (slower)
        out = qs[name](SF)
        df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
        assert df is not None and df.shape[1] > 0, name


def test_entry_and_img_queries(entrymod):
    out = entrymod.entry()
    assert len(out) > 0 and "rule_id" in out.columns
    s = entrymod.queries()["img_summary"]("/root/testdata/sf0.001")
    assert s["total"].iloc[0] >= 2000
    assert s["invalid"].iloc[0] > 0


def test_tfidf_join_path_matches_broadcast(ray_session):
    """Forcing the open-web Dataset-join path (broadcast_df_max=0) must
    reproduce the broadcast path / oracle exactly (VERDICT r2 #8)."""
    from faang_pydantics_validation_ray.pipelines.queries import \
        _tfidf_documents
    sf = "/root/testdata/sf0.001"
    broadcast = _tfidf_documents(sf)
    joined = _tfidf_documents(sf, broadcast_df_max=0)
    pd.testing.assert_frame_equal(broadcast, joined)


def test_exact_topk_distributed_tie_fallback(ray_session):
    """A tie plateau spanning past the pull margin resolves with the
    distributed boundary passes — never a full-aggregate driver pull —
    and still returns the exact (count desc, key asc) top-k."""
    import numpy as np
    import ray.data as rd
    from faang_pydantics_validation_ray.pipelines.queries import \
        _exact_topk_by_count
    rng = np.random.default_rng(4)
    # 3 clear leaders + a 200-key tie plateau at n=7 that dwarfs the margin
    df = pd.DataFrame({
        "token": [f"top{i}" for i in range(3)]
        + [f"tie{i:03d}" for i in range(200)],
        "n": [100, 90, 80] + [7] * 200})
    df = df.sample(frac=1, random_state=1).reset_index(drop=True)
    agg = rd.from_pandas(df).repartition(8)
    got = _exact_topk_by_count(agg, "token", "n", k=10, margin=12)
    want = (df.sort_values(["n", "token"], ascending=[False, True])
            .head(10).reset_index(drop=True))
    want["n"] = want["n"].astype("int64")
    pd.testing.assert_frame_equal(got[["token", "n"]],
                                  want[["token", "n"]])
