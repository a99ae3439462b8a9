"""Wide (shuffle) rule primitives: key counting with map-side combine, salted
group exemplars, and an aggregate-only anti-join (SURVEY.md A4/A5/J1, §4.2
skew mitigation).

Skew strategy, explicitly:

- **Counting** (uniqueness, near-dup cardinality) never ships raw rows to the
  reducer: each batch pre-aggregates ``(key, partial_count)`` with a
  vectorized Arrow group-by, so a hot key contributes ONE row per batch to
  the shuffle — a combiner, strictly stronger than salting for counts.
- **Per-group row collection** (exemplar image_ids for a near-dup cluster)
  cannot be pre-counted, so it uses SALTED two-stage grouping:
  ``groupby(key, salt=hash(row_key) % n_salt)`` bounds any reducer group to
  ~group_size/n_salt rows, then a second tiny groupby over per-salt partials
  combines counts and concatenates capped exemplar lists.
- **Referential checks** are an aggregate-only anti-join: tag each side with
  (left_cnt, right_cnt) partials, union, ``groupby(key).sum`` — missing keys
  are rows with ``right_cnt == 0``. No row payloads cross the shuffle.

All keys are hashed with the deterministic hashers (reproducible retries).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import hash_column

try:  # Dataset type only for annotations; library code never calls ray.init
    import ray.data as rd
except ImportError:  # pragma: no cover
    rd = None


def _batch_key_counts(t: pa.Table, key: str) -> pa.Table:
    """Vectorized within-batch combine: (key, cnt) for non-null keys."""
    valid = t.filter(pc.is_valid(t.column(key)))
    if valid.num_rows == 0:
        return pa.table({key: pa.array([], type=t.column(key).type),
                         "cnt": pa.array([], type=pa.int64())})
    g = valid.select([key]).group_by(key).aggregate([([], "count_all")])
    return g.rename_columns([key, "cnt"])


def key_counts(ds: "rd.Dataset", key: str) -> "rd.Dataset":
    """Distributed exact key counts with map-side combine: one shuffle over
    (key, partial) rows only."""
    from ray.data.aggregate import Sum
    partials = ds.map_batches(lambda t: _batch_key_counts(t, key),
                              batch_format="pyarrow")
    return partials.groupby(key).aggregate(Sum("cnt", alias_name="cnt"))


def duplicate_keys(ds: "rd.Dataset", key: str, min_count: int = 2) -> "rd.Dataset":
    """Keys occurring ≥ min_count times → (key, cnt). The uniqueness rule
    (SURVEY.md A4): the reference silently overwrites duplicate Sample Names in
    its record map (/root/reference/generic_validator_classes.py:584-597); here
    duplicates are an explicit, exactly-counted violation."""
    counted = key_counts(ds, key)
    return counted.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("cnt"), min_count)),
        batch_format="pyarrow")


def salted_group_exemplars(ds: "rd.Dataset", key: str, row_key: str,
                           n_salt: int = 16, k: int = 3,
                           min_count: int = 2) -> "rd.Dataset":
    """(key, cnt, exemplars[:k]) for groups of size ≥ min_count, via salted
    two-stage grouping so hot keys (e.g. a constant-color phash bucket) are
    split across ``n_salt`` reducer groups (SURVEY.md A5 / §4.2)."""

    def add_salt(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column(key)))
        salt = (hash_column(t.column(row_key)) % np.uint64(n_salt)).astype(np.int32)
        return t.append_column("salt", pa.array(salt))

    def stage1(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "cnt": [len(g)],
                             "exemplars": [list(g[row_key].astype(str).head(k))]})

    def stage2(g: pd.DataFrame) -> pd.DataFrame:
        ex: list[str] = []
        for lst in g["exemplars"]:
            ex.extend(lst)
            if len(ex) >= k:
                break
        return pd.DataFrame({key: [g[key].iloc[0]], "cnt": [int(g["cnt"].sum())],
                             "exemplars": [ex[:k]]})

    salted = ds.map_batches(add_salt, batch_format="pyarrow")
    partials = salted.groupby([key, "salt"]).map_groups(stage1, batch_format="pandas")
    combined = partials.groupby(key).map_groups(stage2, batch_format="pandas")
    return combined.filter(lambda row: row["cnt"] >= min_count)


def anti_join_counts(left: "rd.Dataset", right: "rd.Dataset", key: str) -> "rd.Dataset":
    """Keys present in ``left`` but absent from ``right`` → (key, left_cnt).

    Aggregate-only anti semi-join (graft of the reference-existence check,
    /root/reference/generic_validator_classes.py:576-641): both sides collapse
    to (key, partial count) inside map_batches, union, one hash shuffle on the
    key, filter right_cnt == 0."""
    from ray.data.aggregate import Sum

    def tag(side: str):
        def fn(t: pa.Table) -> pa.Table:
            c = _batch_key_counts(t, key)
            zero = pa.array(np.zeros(c.num_rows, dtype=np.int64))
            if side == "left":
                return pa.table({key: c.column(key), "lcnt": c.column("cnt"),
                                 "rcnt": zero})
            return pa.table({key: c.column(key), "lcnt": zero,
                             "rcnt": c.column("cnt")})
        return fn

    unioned = left.map_batches(tag("left"), batch_format="pyarrow").union(
        right.map_batches(tag("right"), batch_format="pyarrow"))
    summed = unioned.groupby(key).aggregate(Sum("lcnt", alias_name="left_cnt"),
                                            Sum("rcnt", alias_name="right_cnt"))
    return summed.map_batches(
        lambda t: t.filter(pc.and_(pc.equal(t.column("right_cnt"), 0),
                                   pc.greater(t.column("left_cnt"), 0)))
        .select([key, "left_cnt"]),
        batch_format="pyarrow")
