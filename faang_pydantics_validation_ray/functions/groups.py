"""Wide (shuffle) rule primitives: key counting with map-side combine,
broadcast-filtered group exemplars, and aggregate-only anti-joins
(SURVEY.md A4/A5/J1, §4.2 skew mitigation).

Skew strategy, explicitly:

- **Counting** (uniqueness, near-dup cardinality, referential) never ships
  raw rows to the reducer: each batch pre-aggregates ``(key, partial_count)``
  with a vectorized Arrow group-by, so a hot key contributes ONE row per
  batch to the shuffle — a combiner, strictly stronger than reducer-side
  key-salting for counts (which still ships every row).
- **Per-group row collection** (exemplar image_ids for a near-dup cluster)
  is a map-only pass filtering against the broadcast ≥min_count key set:
  each batch emits at most ``k`` exemplar rows per key it contains, so even
  a key covering 5% of the table costs k rows per batch — no reducer hotspot
  (this replaced a salted two-stage ``map_groups``, which paid one Python
  call per distinct key and was measured 2.5× slower).
- **Referential checks** are an aggregate-only anti-join: tag each side with
  (left_cnt, right_cnt) partials, union, ``groupby(key).sum`` — missing keys
  are rows with ``right_cnt == 0``. No row payloads cross the shuffle.
- :func:`fused_cross_record_counts` shares ONE exchange for all three rules
  via disjoint key namespaces.

All keys are hashed with the deterministic hashers (reproducible retries).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import hash_column, splitmix64

try:  # Dataset type only for annotations; library code never calls ray.init
    import ray.data as rd
except ImportError:  # pragma: no cover
    rd = None


def hash_partitioned_sum(partials: "rd.Dataset", key: str,
                         sum_cols: list[str],
                         num_partitions: int | None = None,
                         post=None) -> "rd.Dataset":
    """Sum ``sum_cols`` per ``key`` via a hash-partitioned reduce: bucket
    the (already map-side-combined) partial rows into ~#cores partitions by
    key hash, then ONE vectorized pandas groupby-sum per partition.

    This replaces ``groupby(key).aggregate(Sum...)`` for aggregate-only
    shuffles: Ray's per-key sort-based aggregate pays a large constant per
    DISTINCT key (measured 8.7 s for 195k string keys / 294k partial rows
    on 32 cpus), while the partitioned reduce is a 32-group sort + 32
    C-speed combines (measured 1.7 s warm — 5×). Partition sizes are
    balanced by distinct-key count (hot keys were already combined to one
    row per batch upstream), and ``num_partitions`` derives from the live
    session so a 4N-core cluster fans out 4× wider.

    ``post``: optional per-partition pandas filter applied AFTER the
    combine (valid for row-wise predicates — every key lives in exactly
    one partition), so oversized results shrink before leaving workers.
    """
    return hash_partitioned_agg(partials, key,
                                {c: (c, "sum") for c in sum_cols},
                                num_partitions=num_partitions, post=post)


def hash_partitioned_agg(partials: "rd.Dataset", key: str,
                         agg: dict[str, tuple[str, str]],
                         num_partitions: int | None = None,
                         post=None) -> "rd.Dataset":
    """Generalized hash-partitioned reduce: ``agg`` maps output column →
    (input column, pandas agg fn name) — each fn must be re-applicable over
    per-batch partials of itself (sum/min/max/count-as-sum). See
    :func:`hash_partitioned_sum` for why this beats per-key
    ``groupby().aggregate`` and for the skew/partitioning notes."""
    from ..runtime import shuffle_partitions
    P = num_partitions or shuffle_partitions()

    def add_p(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            pd.Series(t.column(key).to_numpy(zero_copy_only=False)),
            index=False).to_numpy()
        return t.append_column("_p", pa.array((h % P).astype(np.int64)))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(key, sort=False)
               .agg(**{o: pd.NamedAgg(column=c, aggfunc=f)
                       for o, (c, f) in agg.items()})
               .reset_index())
        return post(out) if post is not None else out

    return (partials.map_batches(add_p, batch_format="pyarrow")
            .groupby("_p").map_groups(combine, batch_format="pandas"))


def _batch_key_counts(t: pa.Table, key: str) -> pa.Table:
    """Vectorized within-batch combine: (key, cnt) for non-null keys."""
    valid = t.filter(pc.is_valid(t.column(key)))
    if valid.num_rows == 0:
        return pa.table({key: pa.array([], type=t.column(key).type),
                         "cnt": pa.array([], type=pa.int64())})
    g = valid.select([key]).group_by(key).aggregate([([], "count_all")])
    return g.rename_columns([key, "cnt"])


def key_counts(ds: "rd.Dataset", key: str) -> "rd.Dataset":
    """Distributed exact key counts with map-side combine: one
    hash-partitioned reduce over (key, partial) rows only."""
    partials = ds.map_batches(lambda t: _batch_key_counts(t, key),
                              batch_format="pyarrow")
    return hash_partitioned_sum(partials, key, ["cnt"])


def duplicate_keys(ds: "rd.Dataset", key: str, min_count: int = 2) -> "rd.Dataset":
    """Keys occurring ≥ min_count times → (key, cnt). The uniqueness rule
    (SURVEY.md A4): the reference silently overwrites duplicate Sample Names in
    its record map (/root/reference/generic_validator_classes.py:584-597); here
    duplicates are an explicit, exactly-counted violation."""
    counted = key_counts(ds, key)
    return counted.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("cnt"), min_count)),
        batch_format="pyarrow")


def group_exemplars(ds: "rd.Dataset", key: str, row_key: str,
                    k: int = 3, min_count: int = 2) -> pd.DataFrame:
    """(key, cnt, exemplars[:k]) for groups of size ≥ min_count — the near-dup
    rule (SURVEY.md A5) with explicit hot-key (skew) handling:

    1. exact counts via :func:`key_counts` (map-side combine: a hot key —
       e.g. a constant-color phash bucket — contributes ONE partial row per
       batch, never raw rows, which supersedes reducer-side salting for the
       counting half);
    2. the (small) ≥min_count key set is broadcast back and each batch emits
       at most ``k`` exemplar row-keys per key present in the batch —
       vectorized, no per-group Python, no shuffle of row payloads; a hot
       key costs k rows per batch, combined driver-side.

    Returns a pandas DataFrame (the result is aggregate-sized: one row per
    colliding key)."""
    dup = key_counts(ds, key).map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("cnt"), min_count)),
        batch_format="pyarrow").to_pandas()
    return collect_exemplars(ds, key, row_key, dup, k)


def collect_exemplars(ds: "rd.Dataset", key: str, row_key: str,
                      dup: pd.DataFrame, k: int = 3) -> pd.DataFrame:
    """Attach up to ``k`` exemplar row-keys to precomputed dup-key counts via
    a broadcast key-set filter pass (see :func:`group_exemplars` docstring)."""
    import ray

    if dup.empty:
        return pd.DataFrame({key: [], "cnt": [], "exemplars": []})
    keys_ref = ray.put(pa.array(dup[key].tolist()))

    def per_batch(t: pa.Table) -> pa.Table:
        wanted = ray.get(keys_ref)
        m = pc.is_in(t.column(key), value_set=wanted.cast(t.column(key).type))
        sub = t.filter(pc.fill_null(m, False)).select([key, row_key])
        if sub.num_rows == 0:
            return pa.table({key: pa.array([], type=t.column(key).type),
                             row_key: pa.array([], type=t.column(row_key).type)})
        # k-SMALLEST row_keys per key within the batch (not first-seen): the
        # global sorted head over per-batch partials is then exactly the
        # global k-smallest, independent of block size / batch order
        df = (sub.to_pandas().sort_values(row_key)
              .groupby(key, sort=False).head(k))
        return pa.Table.from_pandas(df, preserve_index=False)

    # distributed per-key head BEFORE the driver sees anything: the filtered
    # partials are ≤ k rows per key per batch, which for a hot key on a
    # 10^12-row table is still k × #batches — the groupby caps it to k rows
    # per key (deterministic: smallest row_keys win), so the driver result
    # is bounded by k × #dup-keys
    partials = (ds.map_batches(per_batch, batch_format="pyarrow")
                .groupby(key)
                .map_groups(lambda g: g.sort_values(row_key).head(k),
                            batch_format="pandas")
                .to_pandas())
    ex = (partials.groupby(key)[row_key]
          .apply(lambda s: [str(v) for v in s.head(k)]).rename("exemplars")
          .reset_index())
    out = dup.merge(ex, on=key, how="left")
    out["exemplars"] = out["exemplars"].apply(
        lambda v: v if isinstance(v, list) else [])
    return out.reset_index(drop=True)


def fused_cross_record_counts(narrow: "rd.Dataset",
                              captions_keys: "rd.Dataset | None",
                              id_col: str = "image_id",
                              phash_col: str = "phash",
                              min_count: int = 2,
                              catalog_keys: "rd.Dataset | None" = None,
                              ) -> tuple[pd.DataFrame, pd.DataFrame,
                                         pd.DataFrame, pd.DataFrame]:
    """ALL counting cross-record rules in ONE hash shuffle (SURVEY.md §4.2
    "pick ONE partitioning key and reuse it"): uniqueness (A4), referential
    anti-join (J1), near-dup phash cardinality (A5) and the external-catalog
    fall-through (T3, graft of the reference's BioSamples lookup,
    /root/reference/generic_validator_classes.py:604-636) tag their per-batch
    combined partials into disjoint key namespaces (``i:<image_id>``,
    ``p:<phash>``) and count columns, sharing a single groupby-sum exchange.
    A hot key still contributes one partial row per batch (map-side combine).

    Returns (duplicates(image_id, cnt), missing(image_id, left_cnt),
    neardup(phash, cnt), external(image_id, left_cnt)) — aggregate-sized
    pandas frames. ``external`` holds referenced ids absent locally but
    present in ``catalog_keys`` (downgraded severity at the caller); with no
    catalog it is empty and every unresolved ref lands in ``missing``.
    """
    def img_partials(t: pa.Table) -> pa.Table:
        return pa.concat_tables([
            _hashed_batch_counts(t, id_col, NS_ID, "own_cnt"),
            _hashed_batch_counts(t, phash_col, NS_PHASH, "own_cnt")])

    own = narrow.map_batches(img_partials, batch_format="pyarrow")
    return fused_counts_hashed(own, captions_keys, narrow,
                               id_col=id_col, phash_col=phash_col,
                               min_count=min_count,
                               catalog_keys=catalog_keys)


def fused_counts_from_partials(own_tagged: "rd.Dataset",
                               captions_keys: "rd.Dataset | None",
                               id_col: str = "image_id",
                               phash_col: str = "phash",
                               min_count: int = 2,
                               catalog_keys: "rd.Dataset | None" = None,
                               ) -> tuple[pd.DataFrame, pd.DataFrame,
                                          pd.DataFrame, pd.DataFrame]:
    """Same fused exchange as :func:`fused_cross_record_counts`, but the
    own-side partials arrive pre-tagged as (key, own_cnt, cap_cnt, cat_cnt)
    rows — the flagship emits them straight from pass 1's fused actor stage
    (stages/validate_batch.py::_key_count_events), so the shuffle rules pay
    NO second full-table scan."""
    def _tagged_counts(t: pa.Table, key_src: str,
                       prefix: str) -> tuple[pa.Array, pa.Array]:
        c = _batch_key_counts(t, key_src)
        keys = pc.binary_join_element_wise(
            pa.array([prefix] * c.num_rows, type=pa.string()),
            pc.cast(c.column(key_src), pa.string()).combine_chunks(), ":")
        return keys, c.column("cnt").combine_chunks()

    def _table(keys, own, cap, cat) -> pa.Table:
        return pa.table({"key": keys, "own_cnt": own, "cap_cnt": cap,
                         "cat_cnt": cat})

    def _zeros(n: int) -> pa.Array:
        return pa.array(np.zeros(n, dtype=np.int64))

    def cap_partials(t: pa.Table) -> pa.Table:
        k, c = _tagged_counts(t, id_col, "i")
        return _table(k, _zeros(len(k)), c, _zeros(len(k)))

    def cat_partials(t: pa.Table) -> pa.Table:
        k, c = _tagged_counts(t, id_col, "i")
        return _table(k, _zeros(len(k)), _zeros(len(k)), c)

    tagged = own_tagged
    if captions_keys is not None:
        tagged = tagged.union(captions_keys.map_batches(cap_partials,
                                                        batch_format="pyarrow"))
    if catalog_keys is not None:
        tagged = tagged.union(catalog_keys.map_batches(cat_partials,
                                                       batch_format="pyarrow"))

    # own_cnt==0 keys matter only when something actually references them
    # (cap_cnt>0): without the cap_cnt guard every unreferenced external-
    # catalog key would reach the driver, scaling driver memory with catalog
    # size instead of dup+orphan keys. The filter runs INSIDE the reduce
    # partitions (post=) so only aggregate-sized rows ever leave workers.
    def _post(g: pd.DataFrame) -> pd.DataFrame:
        return g[(g["own_cnt"] >= min_count)
                 | ((g["own_cnt"] == 0) & (g["cap_cnt"] > 0))]

    interesting = hash_partitioned_sum(
        tagged, "key", ["own_cnt", "cap_cnt", "cat_cnt"],
        post=_post).to_pandas()
    empty = (pd.DataFrame({id_col: [], "cnt": []}),
             pd.DataFrame({id_col: [], "left_cnt": []}),
             pd.DataFrame({phash_col: [], "cnt": []}),
             pd.DataFrame({id_col: [], "left_cnt": []}))
    if interesting.empty:
        return empty
    ns = interesting["key"].str.slice(0, 2)
    raw = interesting["key"].str.slice(2)
    img = interesting[ns == "i:"]
    ph = interesting[ns == "p:"]
    # NB: assign via lambdas sliced to d.index — assigning the full ``raw``
    # Series onto an EMPTY filtered frame would resurrect its rows as NaNs
    dup = (img[img["own_cnt"] >= min_count]
           .assign(**{id_col: lambda d: raw.loc[d.index],
                      "cnt": lambda d: d["own_cnt"]})
           [[id_col, "cnt"]].reset_index(drop=True))
    unresolved = img[(img["own_cnt"] == 0) & (img["cap_cnt"] > 0)]
    missing = (unresolved[unresolved["cat_cnt"] == 0]
               .assign(**{id_col: lambda d: raw.loc[d.index],
                          "left_cnt": lambda d: d["cap_cnt"]})
               [[id_col, "left_cnt"]].reset_index(drop=True))
    external = (unresolved[unresolved["cat_cnt"] > 0]
                .assign(**{id_col: lambda d: raw.loc[d.index],
                           "left_cnt": lambda d: d["cap_cnt"]})
                [[id_col, "left_cnt"]].reset_index(drop=True))
    near = ph[ph["own_cnt"] >= min_count].copy()
    near[phash_col] = pd.to_numeric(raw.loc[near.index]).astype("int64")
    near["cnt"] = near["own_cnt"]
    near = near[[phash_col, "cnt"]].reset_index(drop=True)
    return dup, missing, near, external


NS_ID, NS_PHASH = 0, 1     # key namespaces in the hashed fused exchange
# Wire encoding of the exchange rows: the count SLOT (own / cap / cat) is
# folded into the namespace byte instead of travelling as three mostly-zero
# int64 columns — wire rows are (ns:int8, kh:int64, cnt:int64), 17 bytes vs
# 33, so the all-to-all sorts and ships ~2× fewer bytes. The reducer pivots
# slots back into (own_cnt, cap_cnt, cat_cnt) per (base-ns, kh).
_SLOT_IDX = {"own_cnt": 0, "cap_cnt": 1, "cat_cnt": 2}


def wire_ns(ns: int, slot: str) -> int:
    """Namespace byte for the 3-column hashed exchange: base ns × 4 + slot."""
    return ns * 4 + _SLOT_IDX[slot]


def _empty_wire_table() -> pa.Table:
    return pa.table({"ns": pa.array([], type=pa.int8()),
                     "kh": pa.array([], type=pa.int64()),
                     "cnt": pa.array([], type=pa.int64())})


def _hashed_batch_counts(t: pa.Table, key_col: str, ns: int,
                         slot: str) -> pa.Table:
    """Per-batch combined (ns, kh, cnt) partials for the HASHED fused
    exchange: string keys become their deterministic 64-bit SipHash
    (functions/hashing.hash_column), integer keys (phash) pass through
    raw — fixed-width 17-byte rows instead of tagged strings, so the
    all-to-all moves ~5× fewer bytes and the reducer pivot runs on int64,
    not object dtype. ``slot`` names which count the row carries
    (own_cnt / cap_cnt / cat_cnt); it rides inside the ns byte
    (:func:`wire_ns`)."""

    c = _batch_key_counts(t, key_col)
    n = c.num_rows
    if n == 0:
        return _empty_wire_table()
    keys = c.column(key_col)
    if pa.types.is_integer(keys.type):
        kh = np.asarray(keys.cast(pa.int64())).astype(np.int64)
    else:
        kh = hash_column(keys).view(np.int64)
    return pa.table({"ns": pa.array(np.full(n, wire_ns(ns, slot),
                                            dtype=np.int8)),
                     "kh": pa.array(kh),
                     "cnt": np.asarray(c.column("cnt").cast(pa.int64()))})


def recover_exact_counts(ds: "rd.Dataset", key_col: str,
                         hset: np.ndarray) -> pd.DataFrame:
    """EXACT (key, cnt) for the keys of ``ds`` whose 64-bit hash lands in
    ``hset`` — a broadcast sorted-hash-set filter pass (same shape as the
    exemplar collector): per batch, hash the combined keys, keep members,
    emit (key, partial) rows; the driver sums the aggregate-sized result.
    Used to map hash-level candidates from the fused exchange back to real
    keys: two distinct keys colliding into one candidate hash are re-counted
    SEPARATELY here, so counting rules stay exact under collisions."""
    import ray

    ref = ray.put(np.sort(hset.view(np.uint64)))

    def per_batch(t: pa.Table) -> pa.Table:
        c = _batch_key_counts(t, key_col)
        if c.num_rows == 0:
            return c
        H = ray.get(ref)
        kh = hash_column(c.column(key_col))
        idx = np.searchsorted(H, kh)
        m = (idx < len(H)) & (H[np.minimum(idx, len(H) - 1)] == kh)
        return c.filter(pa.array(m))

    parts = ds.map_batches(per_batch, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame({key_col: [], "cnt": []})
    return (parts.groupby(key_col, sort=False)["cnt"].sum().reset_index()
            .astype({"cnt": "int64"}))


def fused_counts_hashed(own_hashed: "rd.Dataset",
                        captions_keys: "rd.Dataset | None",
                        narrow: "rd.Dataset | None",
                        id_col: str = "image_id",
                        phash_col: str = "phash",
                        min_count: int = 2,
                        catalog_keys: "rd.Dataset | None" = None,
                        num_partitions: int | None = None,
                        neardup_min: int | None = None,
                        exemplar_k: int | None = None,
                        ) -> tuple[pd.DataFrame, pd.DataFrame,
                                   pd.DataFrame, pd.DataFrame]:
    """The fused cross-record exchange over HASHED keys — wire rows are
    (ns:int8, kh:int64, cnt:int64) with the count slot folded into the ns
    byte (:func:`wire_ns`), all fixed-width, no strings cross the
    all-to-all. Semantics match :func:`fused_counts_from_partials`:

    - near-dup: phash keys ride raw in ``kh`` — counts are exact, no
      recovery needed.
    - uniqueness: hash-level candidates (own_cnt ≥ min_count) map back to
      real image_ids via :func:`recover_exact_counts` over ``narrow`` — a
      broadcast filter pass bounded by the candidate count; exact under
      collisions (colliding keys are re-counted separately).
    - referential / external-catalog: unresolved hashes (own 0, cap > 0)
      recover their caption-side image_ids the same way from
      ``captions_keys``. A truly-missing ref whose hash collides with ANY
      present image key is silently resolved — probability ≈ n/2^64 per key
      (≈5e-8 at 10^12 rows), the documented exactness bound of this path.

    ``own_hashed`` rows: (ns, kh, cnt) with ns pre-encoded via
    :func:`wire_ns`. When no candidates survive the exchange, the recovery
    passes are skipped entirely (zero extra scans on clean data).

    With ``exemplar_k`` set, ``near`` is filtered to ``cnt >= neardup_min``
    and gains an ``exemplars`` column (the k smallest row keys per phash,
    byte-identical to :func:`collect_exemplars`), collected inside the SAME
    fused recovery scan as dup/ref recovery instead of a separate pass."""
    from ..runtime import shuffle_partitions

    P = num_partitions or shuffle_partitions()
    tagged = own_hashed
    if captions_keys is not None:
        tagged = tagged.union(captions_keys.map_batches(
            lambda t: _hashed_batch_counts(t, id_col, NS_ID, "cap_cnt"),
            batch_format="pyarrow"))
    if catalog_keys is not None:
        tagged = tagged.union(catalog_keys.map_batches(
            lambda t: _hashed_batch_counts(t, id_col, NS_ID, "cat_cnt"),
            batch_format="pyarrow"))

    def add_p(t: pa.Table) -> pa.Table:
        h = splitmix64(np.asarray(t.column("kh").cast(pa.int64()))
                       .view(np.uint64))
        return t.append_column("_p", pa.array((h % P).astype(np.int64)))

    def combine(t: pa.Table) -> pa.Table:
        # Pivot the slot-encoded wire rows back to per-(base-ns, key) count
        # triples — pure numpy on int64, one np.unique per base namespace.
        ns = np.asarray(t.column("ns"))
        kh = np.asarray(t.column("kh"))
        cnt = np.asarray(t.column("cnt"))
        outs = []
        for base in np.unique(ns >> 2):
            bm = (ns >> 2) == base
            u, inv = np.unique(kh[bm], return_inverse=True)
            sums = np.zeros((3, len(u)), dtype=np.int64)
            slot = ns[bm] & 3
            bc, bi = cnt[bm], inv
            for s in range(3):
                sm = slot == s
                if sm.any():
                    np.add.at(sums[s], bi[sm], bc[sm])
            own_c, cap_c, cat_c = sums
            keep = (own_c >= min_count) | ((own_c == 0) & (cap_c > 0))
            outs.append(pa.table({
                "ns": pa.array(np.full(int(keep.sum()), base, dtype=np.int8)),
                "kh": pa.array(u[keep]), "own_cnt": pa.array(own_c[keep]),
                "cap_cnt": pa.array(cap_c[keep]),
                "cat_cnt": pa.array(cat_c[keep])}))
        if not outs:
            return pa.table({"ns": pa.array([], pa.int8()),
                             "kh": pa.array([], pa.int64()),
                             "own_cnt": pa.array([], pa.int64()),
                             "cap_cnt": pa.array([], pa.int64()),
                             "cat_cnt": pa.array([], pa.int64())})
        return pa.concat_tables(outs)

    interesting = (tagged.map_batches(add_p, batch_format="pyarrow")
                   .groupby("_p").map_groups(combine, batch_format="pyarrow")
                   .to_pandas())
    if "_p" in interesting.columns:       # empty-group passthrough artifact
        interesting = interesting.drop(columns=["_p"])
    empty = (pd.DataFrame({id_col: [], "cnt": []}),
             pd.DataFrame({id_col: [], "left_cnt": []}),
             pd.DataFrame({phash_col: [], "cnt": []}),
             pd.DataFrame({id_col: [], "left_cnt": []}))
    dup, missing, near, external = empty
    if interesting.empty:
        return dup, missing, near, external

    ph = interesting[interesting["ns"] == NS_PHASH]
    ph = ph[ph["own_cnt"] >= min_count]
    near = pd.DataFrame({phash_col: ph["kh"].astype("int64").to_numpy(),
                         "cnt": ph["own_cnt"].astype("int64").to_numpy()})
    if neardup_min is not None:
        near = near[near["cnt"] >= neardup_min].reset_index(drop=True)

    img = interesting[interesting["ns"] == NS_ID]
    dup_h = img[img["own_cnt"] >= min_count]["kh"].to_numpy(np.int64)
    unresolved = img[(img["own_cnt"] == 0) & (img["cap_cnt"] > 0)]
    miss_h = unresolved[unresolved["cat_cnt"] == 0]["kh"].to_numpy(np.int64)
    ext_h = unresolved[unresolved["cat_cnt"] > 0]["kh"].to_numpy(np.int64)

    need_dup = bool(len(dup_h)) and narrow is not None
    need_ref = bool(len(miss_h) or len(ext_h)) and captions_keys is not None
    need_ex = (exemplar_k is not None and len(near) and narrow is not None)
    if not (need_dup or need_ref or need_ex):
        if exemplar_k is not None:
            near = near.assign(
                exemplars=[[] for _ in range(len(near))])
        return dup, missing, near, external

    # ---- ONE fused recovery scan (narrow ∪ captions) replaces what used
    # to be three separate Dataset executions (dup-id recovery over narrow,
    # missing-ref recovery over captions, near-dup exemplar collection over
    # narrow again) — each a full column scan plus per-execution fixed cost
    # per timed run. Partials are tagged by kind: 0 = dup-key exact counts,
    # 1 = caption-ref exact counts, 2 = near-dup exemplar rows.
    import ray

    dup_ref = ray.put(np.sort(dup_h.view(np.uint64))) if need_dup else None
    ref_ref = (ray.put(np.sort(np.concatenate([miss_h, ext_h])
                               .view(np.uint64))) if need_ref else None)
    near_ref = (ray.put(pa.array(near[phash_col].astype("int64")))
                if need_ex else None)
    k = exemplar_k or 0

    def _empty_parts() -> pa.Table:
        return pa.table({"kind": pa.array([], pa.int8()),
                         "key": pa.array([], pa.string()),
                         "ph": pa.array([], pa.int64()),
                         "cnt": pa.array([], pa.int64())})

    def _member(sorted_h: np.ndarray, kh: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(sorted_h, kh)
        return ((idx < len(sorted_h))
                & (sorted_h[np.minimum(idx, len(sorted_h) - 1)] == kh))

    def _count_partial(t: pa.Table, ref, kind: int) -> pa.Table | None:
        c = _batch_key_counts(t, id_col)
        if c.num_rows == 0:
            return None
        kh = hash_column(c.column(id_col)).view(np.uint64)
        sub = c.filter(pa.array(_member(ray.get(ref), kh)))
        if sub.num_rows == 0:
            return None
        n = sub.num_rows
        return pa.table({"kind": pa.array(np.full(n, kind, dtype=np.int8)),
                         "key": pc.cast(sub.column(id_col), pa.string()),
                         "ph": pa.array(np.zeros(n, dtype=np.int64)),
                         "cnt": pc.cast(sub.column("cnt"), pa.int64())})

    def emit_narrow(t: pa.Table) -> pa.Table:
        outs = []
        if dup_ref is not None:
            p = _count_partial(t, dup_ref, 0)
            if p is not None:
                outs.append(p)
        if near_ref is not None:
            wanted = ray.get(near_ref)
            m = pc.is_in(t.column(phash_col),
                         value_set=wanted.cast(t.column(phash_col).type))
            sub = (t.filter(pc.fill_null(m, False))
                   .select([phash_col, id_col]))
            if sub.num_rows:
                # k-SMALLEST row keys per phash within the batch — exactly
                # collect_exemplars' map-side head, so the global sorted
                # head below is the global k-smallest
                df = (sub.to_pandas().sort_values(id_col)
                      .groupby(phash_col, sort=False).head(k))
                n = len(df)
                outs.append(pa.table({
                    "kind": pa.array(np.full(n, 2, dtype=np.int8)),
                    "key": pa.array(df[id_col].astype(str).to_numpy()),
                    "ph": pa.array(df[phash_col].astype("int64").to_numpy()),
                    "cnt": pa.array(np.ones(n, dtype=np.int64))}))
        return pa.concat_tables(outs) if outs else _empty_parts()

    def emit_cap(t: pa.Table) -> pa.Table:
        p = _count_partial(t, ref_ref, 1)
        return p if p is not None else _empty_parts()

    sides = []
    if need_dup or need_ex:
        sides.append(narrow.map_batches(emit_narrow, batch_format="pyarrow"))
    if need_ref:
        sides.append(captions_keys.map_batches(emit_cap,
                                               batch_format="pyarrow"))
    uni = sides[0] if len(sides) == 1 else sides[0].union(*sides[1:])
    if need_ex:
        # two consumers below — materialize the (aggregate-sized) partials
        # so the narrow/captions scans run once
        uni = uni.materialize()

    counts = (uni.map_batches(
        lambda t: t.filter(pc.less_equal(t.column("kind"), 1)),
        batch_format="pyarrow").to_pandas()
        if (need_dup or need_ref) else pd.DataFrame(
            {"kind": [], "key": [], "ph": [], "cnt": []}))
    if need_dup:
        rec = counts[counts["kind"] == 0]
        rec = (rec.groupby("key", sort=False)["cnt"].sum().reset_index()
               .rename(columns={"key": id_col}).astype({"cnt": "int64"}))
        dup = (rec[rec["cnt"] >= min_count][[id_col, "cnt"]]
               .reset_index(drop=True))
    if need_ref:
        rec = counts[counts["kind"] == 1]
        rec = (rec.groupby("key", sort=False)["cnt"].sum().reset_index()
               .rename(columns={"key": id_col}).astype({"cnt": "int64"}))
        if len(rec):
            rh = hash_column(pa.array(rec[id_col])).view(np.int64)
            in_miss = np.isin(rh, miss_h)
            rec = rec.rename(columns={"cnt": "left_cnt"})
            missing = rec[in_miss][[id_col, "left_cnt"]].reset_index(drop=True)
            external = (rec[~in_miss][[id_col, "left_cnt"]]
                        .reset_index(drop=True))
    if exemplar_k is not None:
        if need_ex:
            exparts = (uni.map_batches(
                lambda t: t.filter(pc.equal(t.column("kind"), 2)),
                batch_format="pyarrow")
                .groupby("ph")
                .map_groups(lambda g: g.sort_values("key").head(k),
                            batch_format="pandas")
                .to_pandas())
            ex = (exparts.groupby("ph")["key"]
                  .apply(lambda s: [str(v) for v in s.head(k)])
                  .rename("exemplars").reset_index()
                  .rename(columns={"ph": phash_col}))
            near = near.merge(ex, on=phash_col, how="left")
            near["exemplars"] = near["exemplars"].apply(
                lambda v: v if isinstance(v, list) else [])
            near = near.reset_index(drop=True)
        else:
            near = near.assign(exemplars=[[] for _ in range(len(near))])
    return dup, missing, near, external


def collect_list_agg(col: str, name: str | None = None,
                     max_per_key: int = 10_000):
    """Distributed list-collection aggregate (A3 variant): gathers the
    group's ``col`` values into one list per key. Use ONLY where per-key
    cardinality is bounded (e.g. captions per image) — ``max_per_key`` is a
    hard bound that FAILS LOUDLY when a hot key exceeds it, instead of
    silently ballooning one accumulator list until a worker OOMs."""
    import pandas as _pd

    from ray.data.aggregate import AggregateFn

    def _check(acc: list) -> list:
        if len(acc) > max_per_key:
            raise ValueError(
                f"collect_list_agg('{col}'): a key accumulated more than "
                f"max_per_key={max_per_key} values — this aggregate is for "
                f"bounded-cardinality keys only; pre-aggregate or raise the "
                f"cap explicitly")
        return acc

    def acc_block(acc: list, block) -> list:
        if isinstance(block, pa.Table):
            return _check(acc + block.column(col).to_pylist())
        if isinstance(block, _pd.DataFrame):
            return _check(acc + block[col].tolist())
        return _check(acc + [row[col] for row in block])

    return AggregateFn(init=lambda k: [], merge=lambda a, b: _check(a + b),
                       accumulate_block=acc_block,
                       name=name or f"{col}_list")


def anti_join_counts(left: "rd.Dataset", right: "rd.Dataset", key: str) -> "rd.Dataset":
    """Keys present in ``left`` but absent from ``right`` → (key, left_cnt).

    Aggregate-only anti semi-join (graft of the reference-existence check,
    /root/reference/generic_validator_classes.py:576-641): both sides collapse
    to (key, partial count) inside map_batches, union, one hash shuffle on the
    key, filter right_cnt == 0."""
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
    summed = hash_partitioned_sum(
        unioned, key, ["lcnt", "rcnt"],
        post=lambda g: (g[(g["rcnt"] == 0) & (g["lcnt"] > 0)]
                        .rename(columns={"lcnt": "left_cnt"})
                        [[key, "left_cnt"]]))
    return summed
