"""Unit tests: corpus-cleaning kernels (functions/clean.py), bloom-filter
reference checks (functions/bloom.py), percent_rank/cume_dist windows."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from faang_pydantics_validation_ray.functions import bloom, clean, window


def _t(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                     "text": pa.array(texts, type=pa.string())})


class TestRedact:
    def test_redacts_all_three_kinds(self):
        r = clean.redact_pii_batch(_t(
            ["mail a.b+c@ex.co.uk now", "call +1-202-555-0143",
             "ping 192.168.0.1", None, ""]))
        out = r.column("clean_text").to_pylist()
        assert out[0] == "mail <EMAIL> now"
        assert out[1] == "call <PHONE>"
        assert out[2] == "ping <IP>"
        assert out[3] == "" and out[4] == ""
        assert r.column("n_email").to_pylist() == [1, 0, 0, 0, 0]
        assert r.column("n_phone").to_pylist() == [0, 1, 0, 0, 0]
        assert r.column("n_ip").to_pylist() == [0, 0, 1, 0, 0]

    def test_multiple_matches_counted(self):
        r = clean.redact_pii_batch(_t(["a@b.io c@d.org and 8.8.8.8 1.2.3.4"]))
        assert r.column("n_email").to_pylist() == [2]
        assert r.column("n_ip").to_pylist() == [2]
        assert "<EMAIL> <EMAIL>" in r.column("clean_text").to_pylist()[0]


class TestCleanLines:
    def test_min_words_filter(self):
        r = clean.clean_lines_batch(
            _t(["one two three\nshort\nfour five six seven", "tiny", None]),
            min_words=3)
        assert r.column("clean_text").to_pylist() == [
            "one two three\nfour five six seven", "", ""]
        assert r.column("n_lines").to_pylist() == [3, 1, 1]
        assert r.column("kept_lines").to_pylist() == [2, 0, 0]

    def test_terminal_punctuation(self):
        r = clean.clean_lines_batch(
            _t(["good line here.\nno terminal punct\nalso fine one!"]),
            min_words=3, require_terminal=True)
        assert r.column("clean_text").to_pylist() == [
            "good line here.\nalso fine one!"]

    def test_empty_rows_at_boundaries(self):
        # leading/trailing/empty docs exercise the offset arithmetic
        r = clean.clean_lines_batch(_t(["", "a b c d", ""]), min_words=2)
        assert r.column("clean_text").to_pylist() == ["", "a b c d", ""]
        assert r.column("kept_lines").to_pylist() == [0, 1, 0]


class TestChunk:
    def test_overlapping_windows(self):
        toks = " ".join(f"w{i}" for i in range(11))
        out = clean.chunk_batch(_t([toks]), size=5, step=3).to_pandas()
        # ws=11 → ceil((11-5)/3)+1 = 3 chunks
        assert out["chunk_id"].tolist() == [0, 1, 2]
        assert out["chunk_text"].tolist() == [
            "w0 w1 w2 w3 w4", "w3 w4 w5 w6 w7", "w6 w7 w8 w9 w10"]
        assert out["chunk_tokens"].tolist() == [5, 5, 5]

    def test_short_and_empty_docs(self):
        out = clean.chunk_batch(_t(["a b", "", None]), size=5,
                                step=3).to_pandas()
        assert len(out) == 1            # empty/null docs emit nothing
        assert out["chunk_text"].tolist() == ["a b"]
        assert out["chunk_tokens"].tolist() == [2]

    def test_exact_boundary(self):
        # ws == size → exactly one chunk
        out = clean.chunk_batch(_t(["a b c d e"]), size=5, step=3).to_pandas()
        assert len(out) == 1 and out["chunk_tokens"].tolist() == [5]


class TestBloom:
    def test_no_false_negatives_and_low_fp(self):
        rng = np.random.default_rng(7)
        present = rng.choice(10**9, size=20_000, replace=False)
        b = bloom.Bloom(len(present), fp_rate=0.01)
        b.add(present)
        assert b.contains(present).all()
        absent = present + 10**9              # disjoint by construction
        fp = b.contains(absent).mean()
        assert fp < 0.03

    def test_anti_join_counts_matches_exact(self, ray_session):
        import ray.data as rd
        probe = rd.from_pandas(pd.DataFrame(
            {"k": [1, 1, 2, 3, 5, 8, 13, 21, 2]}))
        dim = rd.from_pandas(pd.DataFrame({"d": [1, 3, 8, 100]}))
        out = bloom.bloom_anti_join_counts(probe, dim, "k", "d",
                                           n_dim_items=4)
        assert dict(zip(out["k"], out["left_cnt"])) == {2: 2, 5: 1, 13: 1,
                                                        21: 1}

    def test_null_keys_ignored_like_exact_path(self, ray_session):
        # null probe/dim keys must be dropped (groups._batch_key_counts
        # semantics); before the fix a nullable int64 key came back from
        # to_numpy as float64+NaN and crashed the uint64 hash view
        import ray.data as rd
        probe = rd.from_arrow(pa.table({
            "k": pa.array([1, None, 2, 3, None, 5], type=pa.int64())}))
        dim = rd.from_arrow(pa.table({
            "d": pa.array([1, None, 3], type=pa.int64())}))
        out = bloom.bloom_anti_join_counts(probe, dim, "k", "d", n_dim_items=3)
        assert dict(zip(out["k"], out["left_cnt"])) == {2: 1, 5: 1}
        semi = (bloom.bloom_semi_join(probe, dim, "k", "d", n_dim_items=3)
                .to_pandas())
        assert sorted(semi["k"].tolist()) == [1, 3]

    def test_semi_join_matches_exact(self, ray_session):
        import ray.data as rd
        rng = np.random.default_rng(3)
        probe = pd.DataFrame({"k": rng.integers(0, 500, size=2000),
                              "payload": np.arange(2000)})
        dim = pd.DataFrame({"d": np.arange(0, 500, 7)})
        got = (bloom.bloom_semi_join(rd.from_pandas(probe),
                                     rd.from_pandas(dim), "k", "d",
                                     n_dim_items=len(dim))
               .to_pandas().sort_values("payload").reset_index(drop=True))
        want = (probe[probe["k"].isin(set(dim["d"]))]
                .sort_values("payload").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)


class TestPercentRank:
    def test_matches_pandas(self, ray_session):
        import ray.data as rd
        rng = np.random.default_rng(11)
        df = pd.DataFrame({"k": rng.choice(list("abc"), size=300),
                           "v": rng.integers(0, 20, size=300).astype(float),
                           "i": np.arange(300)})
        out = (window.percent_rank_cume_dist(rd.from_pandas(df), "k", "v")
               .to_pandas().sort_values("i").reset_index(drop=True))
        want_p = df.groupby("k")["v"].rank(method="min")
        n = df.groupby("k")["v"].transform("size")
        want_prnk = ((want_p - 1) / (n - 1).clip(lower=1)).where(n > 1, 0.0)
        want_cume = df.groupby("k")["v"].rank(method="max") / n
        got = out.sort_values("i")
        assert np.allclose(got["prnk"].to_numpy(),
                           want_prnk.to_numpy(), atol=1e-12)
        assert np.allclose(got["cume"].to_numpy(),
                           want_cume.to_numpy(), atol=1e-12)


class TestHeavyHitters:
    def test_mg_merge_shrinks_and_keeps_heavy(self):
        import pandas as pd
        from faang_pydantics_validation_ray.functions.heavy import mg_merge
        s = pd.Series({"hot": 1000, "warm": 50, "a": 3, "b": 2, "c": 1})
        out = mg_merge(s, 2)
        assert len(out) <= 2 and "hot" in out.index
        assert out["hot"] == 1000 - 3     # decremented by (k+1)-th largest

    def test_exact_counts_on_skewed_stream(self, ray_session):
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data as rd
        from faang_pydantics_validation_ray.functions import heavy
        rng = np.random.default_rng(5)
        # zipf-ish: token t0 dominates; long uniform tail
        toks = (["t0"] * 5000 + ["t1"] * 900
                + [f"tail{i}" for i in rng.integers(0, 4000, size=4000)])
        rng.shuffle(toks)
        docs = [" ".join(toks[i:i + 50]) for i in range(0, len(toks), 50)]
        ds = rd.from_pandas(pd.DataFrame({"text": docs})).repartition(8)

        def bt(t: pa.Table) -> pa.Array:
            flat = pc.list_flatten(pc.split_pattern_regex(
                pc.fill_null(t.column("text"), ""), r"\s+"))
            return flat.filter(pc.not_equal(flat, ""))

        out = heavy.heavy_hitters(ds, bt, k=100, min_frac=0.04)
        got = dict(zip(out["token"], out["n"]))
        assert got == {"t0": 5000, "t1": 900}

    def test_too_small_k_raises_up_front(self, ray_session):
        from faang_pydantics_validation_ray.functions import heavy
        with pytest.raises(ValueError, match="too small"):
            heavy.heavy_hitters(None, None, k=10, min_frac=0.002)

    def test_min_count_only_completeness_guard(self, ray_session):
        # min_count below the MG survival bound total/k must raise loudly
        # instead of silently dropping truly-heavy keys in pass 1
        import ray.data as rd
        from faang_pydantics_validation_ray.functions import heavy
        docs = [" ".join(f"u{i}" for i in range(j * 50, (j + 1) * 50))
                for j in range(40)]                      # 2000 distinct tokens
        ds = rd.from_pandas(pd.DataFrame({"text": docs}))

        def bt(t: pa.Table) -> pa.Array:
            import pyarrow.compute as pc
            flat = pc.list_flatten(pc.split_pattern_regex(
                pc.fill_null(t.column("text"), ""), r"\s+"))
            return flat.filter(pc.not_equal(flat, ""))

        with pytest.raises(ValueError, match="completeness"):
            heavy.heavy_hitters(ds, bt, k=5, min_count=2)


def test_approx_distinct_within_bound(ray_session):
    from faang_pydantics_validation_ray.pipelines.queries import QUERIES
    out = QUERIES["approx_distinct_lineitem"]("/root/testdata/sf0.001")
    assert set(out["column"]) == {"l_partkey", "l_suppkey", "l_orderkey"}
    assert (out["rel_err"] < 0.05).all(), out


def test_clean_kernels_accept_empty_batches():
    # Ray hands stages zero-row batches at block boundaries
    import pyarrow as pa
    from faang_pydantics_validation_ray.functions import clean
    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "text": pa.array([], type=pa.string())})
    r = clean.redact_pii_batch(empty)
    assert r.num_rows == 0 and "clean_text" in r.column_names
    c = clean.clean_lines_batch(empty)
    assert c.num_rows == 0 and "kept_lines" in c.column_names
    ch = clean.chunk_batch(empty)
    assert ch.num_rows == 0 and ch.column_names == [
        "doc_id", "chunk_id", "chunk_text", "chunk_tokens"]


def test_hash_partitioned_reduce_empty_and_tiny(ray_session):
    import pandas as pd
    import ray.data as rd
    from faang_pydantics_validation_ray.functions import groups
    # empty probe side: anti-join over empty datasets must not crash
    empty = rd.from_pandas(pd.DataFrame({"key": pd.array([], dtype="int64")}))
    out = groups.anti_join_counts(empty, empty, "key").to_pandas()
    assert len(out) == 0
    # tiny: counts survive the partitioned reduce exactly
    left = rd.from_pandas(pd.DataFrame({"key": [1, 1, 2, 9]}))
    right = rd.from_pandas(pd.DataFrame({"key": [2]}))
    out = groups.anti_join_counts(left, right, "key").to_pandas()
    assert dict(zip(out["key"], out["left_cnt"])) == {1: 2, 9: 1}
