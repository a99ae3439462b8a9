"""Keyed window analytics: exact running aggregates (cumulative sum,
row_number) per key without per-group Python.

Graft note: the reference has no window engine (single-process Pydantic
validation, /root/reference/unified_validator.py); this family covers the
SQL-window surface a data-engineering user of the engine expects next to
the §2.7 tumbling/sliding/session windows.

Scale design (the Spark-window strategy, Ray-native):
  1. ``Dataset.sort([key, *order])`` — ONE range-partition shuffle; rows
     come out globally ordered across blocks.
  2. A metadata-only boundary pass: each sorted block reports its first/last
     key and their per-key partial (sum, count) — TWO tiny rows per block,
     never the rows themselves.
  3. The driver threads carry-offsets through the boundary summaries (a key
     can only continue across blocks through a block's first/last position,
     so the carry dict holds at most ONE key at a time).
  4. A per-block vectorized pass computes within-block prefix sums (numpy
     segment cumsum) and adds the carry offset to the first key segment.

Raw ``@ray.remote`` tasks are used for passes 2/4 because the cross-block
carry genuinely cannot be expressed through ``map_batches`` (a block needs
the running totals of every preceding block — order-dependent state the
streaming executor does not expose). Row blocks stay in the object store
throughout; only boundary summaries visit the driver.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _as_table(blk) -> pa.Table:
    if isinstance(blk, pa.Table):
        return blk
    return pa.Table.from_pandas(blk, preserve_index=False)


def cumulative_by_key(ds, key: str, order: list[str], value: str,
                      out_sum: str = "cum_sum", out_rn: str = "rn"):
    """→ Dataset(key, *order, value, out_sum, out_rn): exact per-``key``
    running sum of ``value`` and 1-based row number, ordered by ``order``
    (ties broken by the order columns themselves — pass a unique tiebreak
    column last, as SQL would)."""
    import ray
    import ray.data as rd

    from ..runtime import ensure_shipped
    ensure_shipped()

    cols = [key] + [c for c in order if c != key] + (
        [value] if value not in order and value != key else [])
    sorted_ds = ds.select_columns(cols).sort([key] + order).materialize()
    refs = [blk for bundle in sorted_ds.iter_internal_ref_bundles()
            for blk, md in bundle.blocks if (md.num_rows or 0) > 0]
    if not refs:
        return sorted_ds

    @ray.remote
    def boundary(blk):
        t = _as_table(blk)
        k = t.column(key).to_numpy(zero_copy_only=False)
        v = t.column(value).to_numpy(zero_copy_only=False).astype(np.float64)
        first_k, last_k = k[0], k[-1]
        fm, lm = k == first_k, k == last_k
        return (first_k, float(v[fm].sum()), int(fm.sum()),
                last_k, float(v[lm].sum()), int(lm.sum()))

    summaries = ray.get([boundary.remote(r) for r in refs])

    # Thread carry offsets: sorted order means only a block's LAST key can
    # reappear in later blocks, so the carry is a single (key, sum, cnt).
    offsets = []
    carry_key, carry = None, (0.0, 0)
    for first_k, f_sum, f_cnt, last_k, l_sum, l_cnt in summaries:
        off = carry if carry_key == first_k else (0.0, 0)
        offsets.append(off)
        base = off if first_k == last_k else (0.0, 0)
        carry_key, carry = last_k, (base[0] + l_sum, base[1] + l_cnt)

    @ray.remote
    def apply(blk, off_sum: float, off_cnt: int):
        t = _as_table(blk)
        k = t.column(key).to_numpy(zero_copy_only=False)
        v = t.column(value).to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(k)
        # segment starts where the key changes
        new_seg = np.empty(n, dtype=bool)
        new_seg[0] = True
        new_seg[1:] = k[1:] != k[:-1]
        seg_id = np.cumsum(new_seg) - 1
        csum = np.cumsum(v)
        cpos = np.arange(1, n + 1, dtype=np.int64)
        # running totals BEFORE each segment's first row
        start_idx = np.flatnonzero(new_seg)
        base_sum = np.where(start_idx > 0, csum[start_idx - 1], 0.0)
        base_pos = np.where(start_idx > 0, cpos[start_idx - 1], 0)
        cum = csum - base_sum[seg_id]
        rn = cpos - base_pos[seg_id]
        # carry from preceding blocks applies only to the FIRST segment
        first_seg = seg_id == 0
        cum = np.where(first_seg, cum + off_sum, cum)
        rn = np.where(first_seg, rn + off_cnt, rn)
        return t.append_column(out_sum, pa.array(cum, type=pa.float64())) \
                .append_column(out_rn, pa.array(rn, type=pa.int64()))

    out_refs = [apply.remote(r, off[0], off[1])
                for r, off in zip(refs, offsets)]
    return rd.from_arrow_refs(out_refs)


def lag_by_key(ds, key: str, order: list[str], value: str,
               out: str = "prev_value"):
    """→ Dataset(key, *order, value, out): SQL ``lag(value) OVER
    (PARTITION BY key ORDER BY order)`` — previous row's value within the
    key, null for each key's first row. Same sort + boundary-carry design
    as ``cumulative_by_key``: only one boundary row per block visits the
    driver (the block's LAST row), shipped to the NEXT block's task."""
    import ray
    import ray.data as rd

    from ..runtime import ensure_shipped
    ensure_shipped()

    cols = [key] + [c for c in order if c != key] + (
        [value] if value not in order and value != key else [])
    sorted_ds = ds.select_columns(cols).sort([key] + order).materialize()
    refs = [blk for bundle in sorted_ds.iter_internal_ref_bundles()
            for blk, md in bundle.blocks if (md.num_rows or 0) > 0]
    if not refs:
        return sorted_ds

    @ray.remote
    def tail_row(blk):
        t = _as_table(blk)
        return (t.column(key)[-1].as_py(), t.column(value)[-1].as_py())

    tails = ray.get([tail_row.remote(r) for r in refs])

    @ray.remote
    def apply(blk, prev_key, prev_val):
        import pyarrow.compute as pc
        t = _as_table(blk)
        n = t.num_rows
        k = t.column(key).to_numpy(zero_copy_only=False)
        typ = t.schema.field(value).type
        shifted = pa.concat_arrays(
            [pa.array([prev_val], type=typ),
             t.column(value).combine_chunks().slice(0, n - 1)])
        # null out each key-segment's first row (lag resets per key)
        seg_first = np.empty(n, dtype=bool)
        seg_first[0] = k[0] != prev_key
        seg_first[1:] = k[1:] != k[:-1]
        lagged = pc.if_else(pa.array(seg_first),
                            pa.nulls(n, type=typ), shifted)
        return t.append_column(out, lagged)

    out_refs = [apply.remote(r,
                             tails[i - 1][0] if i else None,
                             tails[i - 1][1] if i else None)
                for i, r in enumerate(refs)]
    return rd.from_arrow_refs(out_refs)


def lead_by_key(ds, key: str, order: list[str], value: str,
                out: str = "next_value"):
    """→ Dataset(key, *order, value, out): SQL ``lead(value) OVER
    (PARTITION BY key ORDER BY order)`` — next row's value within the key,
    null for each key's last row. Mirror of :func:`lag_by_key`: one
    boundary row per block visits the driver (the block's FIRST row),
    shipped to the PREVIOUS block's task."""
    import ray
    import ray.data as rd

    from ..runtime import ensure_shipped
    ensure_shipped()

    cols = [key] + [c for c in order if c != key] + (
        [value] if value not in order and value != key else [])
    sorted_ds = ds.select_columns(cols).sort([key] + order).materialize()
    refs = [blk for bundle in sorted_ds.iter_internal_ref_bundles()
            for blk, md in bundle.blocks if (md.num_rows or 0) > 0]
    if not refs:
        return sorted_ds

    @ray.remote
    def head_row(blk):
        t = _as_table(blk)
        return (t.column(key)[0].as_py(), t.column(value)[0].as_py())

    heads = ray.get([head_row.remote(r) for r in refs])

    @ray.remote
    def apply(blk, next_key, next_val):
        import pyarrow.compute as pc
        t = _as_table(blk)
        n = t.num_rows
        k = t.column(key).to_numpy(zero_copy_only=False)
        typ = t.schema.field(value).type
        shifted = pa.concat_arrays(
            [t.column(value).combine_chunks().slice(1, n - 1),
             pa.array([next_val], type=typ)])
        # null out each key-segment's last row (lead resets per key)
        seg_last = np.empty(n, dtype=bool)
        seg_last[-1] = k[-1] != next_key
        seg_last[:-1] = k[:-1] != k[1:]
        led = pc.if_else(pa.array(seg_last), pa.nulls(n, type=typ), shifted)
        return t.append_column(out, led)

    out_refs = [apply.remote(r,
                             heads[i + 1][0] if i + 1 < len(refs) else None,
                             heads[i + 1][1] if i + 1 < len(refs) else None)
                for i, r in enumerate(refs)]
    return rd.from_arrow_refs(out_refs)


def rolling_mean_by_key(ds, key: str, order: list[str], value: str,
                        window: int = 4, out: str = "mov_avg"):
    """→ Dataset(key, *order, value, out): SQL ``AVG(value) OVER (PARTITION
    BY key ORDER BY order ROWS BETWEEN window-1 PRECEDING AND CURRENT
    ROW)`` — the moving average over the last ``window`` rows of the key.

    Same ONE-range-shuffle design as :func:`cumulative_by_key`; the boundary
    pass ships at most ``window - 1`` tail VALUES of each block's last key
    segment (never rows), and the driver threads a single
    (key, tail_values) carry so a key segment spanning many blocks stays
    exact. Within a block the frame sums come from one segment-relative
    cumsum difference — no per-row or per-group Python."""
    import ray
    import ray.data as rd

    from ..runtime import ensure_shipped
    ensure_shipped()

    W = int(window)
    if W < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    cols = [key] + [c for c in order if c != key] + (
        [value] if value not in order and value != key else [])
    sorted_ds = ds.select_columns(cols).sort([key] + order).materialize()
    refs = [blk for bundle in sorted_ds.iter_internal_ref_bundles()
            for blk, md in bundle.blocks if (md.num_rows or 0) > 0]
    if not refs:
        return sorted_ds

    @ray.remote
    def boundary(blk):
        t = _as_table(blk)
        k = t.column(key).to_numpy(zero_copy_only=False)
        v = t.column(value).to_numpy(zero_copy_only=False).astype(np.float64)
        seg = k == k[-1]
        tail = v[seg][-(W - 1):] if W > 1 else np.empty(0)
        return (k[0], k[-1], int(seg.sum()), tail)

    summaries = ray.get([boundary.remote(r) for r in refs])

    # Thread the carry: the last ≤ W-1 values of the key that may continue
    # into the next block. A short whole-block segment extends the previous
    # carry; a segment with ≥ W-1 own rows replaces it.
    offsets: list[np.ndarray] = []
    carry_key, carry = None, np.empty(0)
    for first_k, last_k, seg_len, tail in summaries:
        off = carry if carry_key == first_k else np.empty(0)
        offsets.append(off)
        if first_k == last_k and len(off) and seg_len < W - 1:
            carry = np.concatenate([off, tail])[-(W - 1):]
        else:
            carry = tail
        carry_key = last_k

    @ray.remote
    def apply(blk, off_vals: np.ndarray):
        t = _as_table(blk)
        k = t.column(key).to_numpy(zero_copy_only=False)
        v = t.column(value).to_numpy(zero_copy_only=False).astype(np.float64)
        pre = len(off_vals)
        if pre:
            # prepend the carried tail as context rows of the first segment;
            # they are dropped from the output slice below
            kk = np.concatenate([np.repeat(k[:1], pre), k])
            vv = np.concatenate([np.asarray(off_vals, dtype=np.float64), v])
        else:
            kk, vv = k, v
        n = len(kk)
        new_seg = np.empty(n, dtype=bool)
        new_seg[0] = True
        new_seg[1:] = kk[1:] != kk[:-1]
        seg_id = np.cumsum(new_seg) - 1
        start_idx = np.flatnonzero(new_seg)
        csum = np.cumsum(vv)
        base = np.where(start_idx > 0, csum[start_idx - 1], 0.0)
        segrel = csum - base[seg_id]            # inclusive per-segment cumsum
        pos = np.arange(n, dtype=np.int64) - start_idx[seg_id]
        win_sum = segrel.copy()
        far = np.flatnonzero(pos >= W)          # frame no longer reaches row 0
        win_sum[far] -= segrel[far - W]
        cnt = np.minimum(pos + 1, W).astype(np.float64)
        avg = (win_sum / cnt)[pre:]
        return t.append_column(out, pa.array(avg, type=pa.float64()))

    out_refs = [apply.remote(r, off) for r, off in zip(refs, offsets)]
    return rd.from_arrow_refs(out_refs)


def rank_by_key(ds, key: str, value: str,
                out_rank: str = "rnk", out_dense: str = "drnk"):
    """→ Dataset(key, ..., value, out_rank, out_dense): SQL ``rank()`` and
    ``dense_rank() OVER (PARTITION BY key ORDER BY value)`` — tied values
    share a rank; rank gaps after ties, dense_rank has none.

    Same ONE-range-shuffle design as ``cumulative_by_key``; the boundary
    pass ships 9 scalars per block (never rows), and the driver threads a
    single (key, rows, last_val, rank, dense) carry — a value run or key
    segment spanning many blocks is exact."""
    import ray
    import ray.data as rd

    from ..runtime import ensure_shipped
    ensure_shipped()

    sorted_ds = ds.sort([key, value]).materialize()
    refs = [blk for bundle in sorted_ds.iter_internal_ref_bundles()
            for blk, md in bundle.blocks if (md.num_rows or 0) > 0]
    if not refs:
        return sorted_ds

    @ray.remote
    def boundary(blk):
        """Last-key-segment partials: (first_k, last_k, seg_rows,
        rows_below_last_val, n_distinct, first_val_of_seg, last_val)."""
        t = _as_table(blk)
        k = t.column(key).to_numpy(zero_copy_only=False)
        v = t.column(value).to_numpy(zero_copy_only=False)
        seg = k == k[-1]
        sv = v[seg]
        return (k[0], k[-1], int(seg.sum()),
                int((sv != sv[-1]).sum()),          # sorted: != ⇒ <
                int(1 + (sv[1:] != sv[:-1]).sum()),
                sv[0], sv[-1])

    summaries = ray.get([boundary.remote(r) for r in refs])

    # Thread the carry: (rows_so_far, last_val, rank(last_val),
    # dense(last_val)) for the key that may continue into the next block.
    offsets = []
    carry_key, carry = None, None
    for first_k, last_k, s, b, d, fv, lv in summaries:
        off = carry if carry is not None and carry_key == first_k else None
        offsets.append(off)
        if first_k != last_k or off is None:
            carry = (s, lv, b + 1, d)
        else:
            R0, lv0, r0, d0 = off
            if lv == lv0:                       # whole block equals lv0
                carry = (R0 + s, lv, r0, d0)
            else:
                carry = (R0 + s, lv, R0 + b + 1,
                         d0 + d - (1 if fv == lv0 else 0))
        carry_key = last_k

    @ray.remote
    def apply(blk, off):
        t = _as_table(blk)
        k = t.column(key).to_numpy(zero_copy_only=False)
        v = t.column(value).to_numpy(zero_copy_only=False)
        n = len(k)
        new_seg = np.empty(n, dtype=bool)
        new_seg[0] = True
        new_seg[1:] = k[1:] != k[:-1]
        seg_id = np.cumsum(new_seg) - 1
        start_idx = np.flatnonzero(new_seg)
        val_change = new_seg.copy()
        val_change[1:] |= v[1:] != v[:-1]
        # rank: run-start position within segment; dense: distinct count
        run_start = np.maximum.accumulate(
            np.where(val_change, np.arange(n), -1))
        rank = run_start - start_idx[seg_id] + 1
        dcs = np.cumsum(val_change)
        dense = dcs - (dcs[start_idx] - 1)[seg_id]
        if off is not None:
            R0, lv0, r0, d0 = off
            first = seg_id == 0
            eq = first & (v == lv0)
            gt = first & ~eq
            fv_eq = v[0] == lv0
            rank = np.where(eq, r0, np.where(gt, rank + R0, rank))
            dense = np.where(eq, d0,
                             np.where(gt, dense + d0 - (1 if fv_eq else 0),
                                      dense))
        return t.append_column(out_rank, pa.array(rank, type=pa.int64())) \
                .append_column(out_dense, pa.array(dense, type=pa.int64()))

    out_refs = [apply.remote(r, off) for r, off in zip(refs, offsets)]
    return rd.from_arrow_refs(out_refs)


def cumulative_by_key_groups(ds, key: str, order: list[str], value: str,
                             out_sum: str = "cum_sum", out_rn: str = "rn"):
    """Reference implementation via groupby().map_groups (per-key pandas
    cumsum) — the simple Ray idiom, used by tests to cross-check the
    sort-based scale path. Partitioning assumption: one key's rows fit one
    worker (true for per-customer / per-user windows; NOT for global keys)."""
    def f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order, kind="mergesort")
        g[out_sum] = g[value].astype(np.float64).cumsum()
        g[out_rn] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return ds.groupby(key).map_groups(f, batch_format="pandas")


def percent_rank_cume_dist(ds, key: str, value: str,
                           out_prnk: str = "prnk", out_cume: str = "cume"):
    """SQL ``percent_rank()`` and ``cume_dist() OVER (PARTITION BY key ORDER
    BY value)`` in ONE ranked pass:

    - ``percent_rank = (rank - 1) / (N - 1)`` (0 when N == 1)
    - ``cume_dist = (rank - 1 + ties(key, value)) / N`` — rows <= v are the
      rows below the tie run plus the run itself.

    One :func:`rank_by_key` range shuffle, plus two aggregate-only
    ``groupby`` passes whose results broadcast via ``ray.put``: per-key N
    (one row per key) and per-(key, value) tie counts (one row per distinct
    pair). Partitioning assumption: the distinct (key, value) pair set is
    broadcastable; for pair cardinalities near the row count use a hash
    join on (key, value) instead — same formula, one extra shuffle.
    """
    import ray
    from ray.data.aggregate import Count

    n_per_key = (ds.groupby(key).aggregate(Count(alias_name="n"))
                 .to_pandas())
    ties = (ds.groupby([key, value]).aggregate(Count(alias_name="t"))
            .to_pandas())
    dims_ref = ray.put((n_per_key, ties))

    ranked = rank_by_key(ds, key, value, out_rank="_rnk", out_dense="_drnk")

    def finish(t: pa.Table) -> pa.Table:
        n_df, tie_df = ray.get(dims_ref)
        k = t.column(key).to_numpy(zero_copy_only=False)
        v = t.column(value).to_numpy(zero_copy_only=False)
        # vectorized broadcast lookups: left merges preserve row order
        b = pd.DataFrame({key: k, value: v})
        m = (b.merge(tie_df, on=[key, value], how="left")
             .merge(n_df, on=key, how="left"))
        n = m["n"].to_numpy(dtype=np.float64)
        tie = m["t"].to_numpy(dtype=np.float64)
        r = t.column("_rnk").to_numpy(zero_copy_only=False).astype(
            np.float64)
        prnk = np.where(n > 1, (r - 1.0) / np.maximum(n - 1.0, 1.0), 0.0)
        cume = (r - 1.0 + tie) / n
        keep = [c for c in t.column_names if c not in ("_rnk", "_drnk")]
        return (t.select(keep)
                .append_column(out_prnk, pa.array(prnk, type=pa.float64()))
                .append_column(out_cume, pa.array(cume, type=pa.float64())))

    return ranked.map_batches(finish, batch_format="pyarrow")
