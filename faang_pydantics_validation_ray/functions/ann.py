"""Approximate-nearest-neighbor search over an embedding column
(``list<float>``) — brute-force cosine top-k baseline + LSH-bucketed scale
path (task brief "similarity search").

Brute force: the query matrix is broadcast ONCE via ``ray.put``; each batch
does one numpy matmul against it and emits only its per-query top-k partial
rows (k·q rows per batch), so the final combine is a tiny per-query top-k —
no full score materialization, no shuffle of embeddings.

LSH variant: random-hyperplane signatures bucket the corpus; only buckets
matching a query signature are scored (probes flips for recall).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _batch_matrix(col: pa.ChunkedArray) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix (zero-copy flat values).

    Null or ragged embeddings (exactly what the cardinality/required rules
    flag) would silently misalign the reshape — raise a clear error naming
    the offending rows instead; callers should validate/filter first."""
    arr = col.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    if arr.null_count:
        bad = pc.is_null(arr).to_numpy(zero_copy_only=False)
        raise ValueError(
            f"null embeddings at batch rows {np.flatnonzero(bad)[:10].tolist()}"
            " — filter/validate before ANN (see cardinality/required rules)")
    lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
    d = int(lens[0])
    if not (lens == d).all():
        bad = np.flatnonzero(lens != d)
        raise ValueError(
            f"ragged embeddings (expected dim {d}) at batch rows "
            f"{bad[:10].tolist()} — filter/validate before ANN")
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    return flat.reshape(n, d)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class TopKScorer:
    """Actor-pool stage: normalized query matrix fetched once per actor from
    the object store (``ray.put`` broadcast, not re-shipped per batch)."""

    def __init__(self, queries_ref, k: int, id_col: str, emb_col: str):
        import ray
        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) \
            else queries_ref
        self.q = _normalize(np.asarray(q, dtype=np.float64))
        self.k, self.id_col, self.emb_col = k, id_col, emb_col

    def __call__(self, t: pa.Table) -> pa.Table:
        e = _normalize(_batch_matrix(t.column(self.emb_col)))
        ids = t.column(self.id_col).to_numpy(zero_copy_only=False)
        if e.shape[0] == 0:
            return pa.table({"query_id": pa.array([], type=pa.int32()),
                             self.id_col: pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.float64())})
        scores = e @ self.q.T                       # (n, q)
        k = min(self.k, e.shape[0])
        qi, vi, sc = [], [], []
        for j in range(self.q.shape[0]):
            # deterministic per-batch top-k: include ALL rows tied with the
            # k-th score, break ties by id asc — matches the SQL oracle's
            # row_number(ORDER BY score DESC, id) when duplicates exist
            s = scores[:, j]
            kth = np.partition(s, -k)[-k]
            cand = np.flatnonzero(s >= kth)
            order = np.lexsort((ids[cand], -s[cand]))
            sel = cand[order[:k]]
            qi.extend([j] * len(sel))
            vi.extend(ids[sel].tolist())
            sc.extend(s[sel].tolist())
        return pa.table({"query_id": pa.array(qi, type=pa.int32()),
                         self.id_col: pa.array(vi, type=pa.int64()),
                         "score": pa.array(sc, type=pa.float64())})


def topk_cosine(ds, queries: np.ndarray, k: int = 10, id_col: str = "vec_id",
                emb_col: str = "embedding") -> pd.DataFrame:
    """Exact brute-force cosine top-k per query → DataFrame
    (query_id, vec_id, score) sorted by (query_id, -score, vec_id)."""
    import ray
    from ..runtime import pool_concurrency
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = ds.map_batches(
        TopKScorer, fn_constructor_kwargs=dict(queries_ref=qref, k=k,
                                               id_col=id_col, emb_col=emb_col),
        batch_format="pyarrow", concurrency=pool_concurrency(),
        num_cpus=1).to_pandas()
    if partials.empty:
        return partials
    out = (partials.sort_values(["query_id", "score", id_col],
                                ascending=[True, False, True])
           .groupby("query_id").head(k).reset_index(drop=True))
    out["score"] = out["score"].round(6)
    return out


def lsh_topk_cosine(ds, queries: np.ndarray, k: int = 10, n_planes: int = 12,
                    probes: int = 2, id_col: str = "vec_id",
                    emb_col: str = "embedding", seed: int = 99) -> pd.DataFrame:
    """LSH-bucketed ANN: random-hyperplane signatures partition the corpus;
    only buckets within ``probes`` bit flips of a query's signature are
    scored. Approximate — the scale path when the corpus ≫ memory."""
    import ray
    rng = np.random.default_rng(seed)
    d = np.asarray(queries).shape[1]
    planes = rng.normal(size=(d, n_planes))
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    qsig = (qn @ planes > 0).astype(np.uint32)
    bit_w = (1 << np.arange(n_planes)).astype(np.uint32)
    # query buckets + single-bit probe expansions
    target_buckets: dict[int, list[int]] = {}
    for j in range(qn.shape[0]):
        base = int((qsig[j] * bit_w).sum())
        buckets = {base}
        if probes >= 1:
            buckets |= {base ^ (1 << b) for b in range(n_planes)}
        if probes >= 2:
            buckets |= {base ^ (1 << b1) ^ (1 << b2)
                        for b1 in range(n_planes) for b2 in range(b1 + 1, n_planes)}
        for bkt in buckets:
            target_buckets.setdefault(bkt, []).append(j)
    tb_ref = ray.put(target_buckets)
    planes_ref = ray.put(planes)
    q_ref = ray.put(qn)

    class BucketScorer:
        def __init__(self):
            self.tb = ray.get(tb_ref)
            self.planes = ray.get(planes_ref)
            self.q = ray.get(q_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            e = _normalize(_batch_matrix(t.column(emb_col)))
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            qi, vi, sc = [], [], []
            if e.shape[0]:
                sig = ((e @ self.planes > 0).astype(np.uint32) * bit_w).sum(axis=1)
                for row, bkt in enumerate(sig):
                    for j in self.tb.get(int(bkt), ()):
                        s = float(e[row] @ self.q[j])
                        qi.append(j)
                        vi.append(int(ids[row]))
                        sc.append(s)
            return pa.table({"query_id": pa.array(qi, type=pa.int32()),
                             id_col: pa.array(vi, type=pa.int64()),
                             "score": pa.array(sc, type=pa.float64())})

    from ..runtime import pool_concurrency
    partials = ds.map_batches(BucketScorer, batch_format="pyarrow",
                              concurrency=pool_concurrency(),
                              num_cpus=1).to_pandas()
    if partials.empty:
        return partials
    out = (partials.sort_values(["query_id", "score", id_col],
                                ascending=[True, False, True])
           .groupby("query_id").head(k).reset_index(drop=True))
    out["score"] = out["score"].round(6)
    return out


# ----------------------------------------------------------------- IVF ANN


def _kmeans(sample: np.ndarray, k: int, iters: int = 10,
            seed: int = 11) -> np.ndarray:
    """Tiny deterministic k-means (coarse quantizer training); sample is
    expected to be a driver-side subsample of the corpus."""
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=min(k, len(sample)),
                                  replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(len(centroids)):
            members = sample[assign == j]
            if len(members):
                centroids[j] = members.mean(axis=0)
    return centroids


def ivf_topk_cosine(ds, queries: np.ndarray, k: int = 10, n_lists: int = 16,
                    n_probe: int = 4, sample_size: int = 2048,
                    id_col: str = "vec_id", emb_col: str = "embedding",
                    seed: int = 11) -> pd.DataFrame:
    """IVF-style ANN: a k-means coarse quantizer (trained on a driver-side
    sample) partitions the corpus into ``n_lists`` inverted lists; each query
    scores only the ``n_probe`` nearest lists. The scale path alongside the
    LSH variant: at cluster scale the assignment is a groupby shuffle writing
    list-partitioned parquet once, amortized across query batches.

    Here both phases stream: one map_batches pass assigns + scores each batch
    against only the queries probing that batch's lists (no materialized
    inverted index needed for a single query set).
    """
    import ray
    rng = np.random.default_rng(seed)
    sample = ds.random_sample(min(1.0, sample_size / max(1, ds.count())),
                              seed=seed).to_pandas()
    smat = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                                for v in sample[emb_col]]))
    centroids = _kmeans(smat, n_lists, seed=seed)
    cn = _normalize(centroids)
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    # which lists each query probes
    probes = np.argsort(-(qn @ cn.T), axis=1)[:, :n_probe]      # (q, n_probe)
    probe_of_list: dict[int, list[int]] = {}
    for qi, lists in enumerate(probes):
        for li in lists:
            probe_of_list.setdefault(int(li), []).append(qi)
    state = ray.put((cn, qn, probe_of_list))

    def score(t: pa.Table) -> pa.Table:
        c, q, pol = ray.get(state)
        e = _normalize(_batch_matrix(t.column(emb_col)))
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        out_q, out_v, out_s = [], [], []
        if e.shape[0]:
            assign = (e @ c.T).argmax(axis=1)
            for li in np.unique(assign):
                qids = pol.get(int(li), ())
                if not qids:
                    continue
                rows = np.flatnonzero(assign == li)
                sub = e[rows] @ q[qids].T           # (rows, probing queries)
                for jj, qi in enumerate(qids):
                    out_q.extend([qi] * len(rows))
                    out_v.extend(ids[rows].tolist())
                    out_s.extend(sub[:, jj].tolist())
        return pa.table({"query_id": pa.array(out_q, type=pa.int32()),
                         id_col: pa.array(out_v, type=pa.int64()),
                         "score": pa.array(out_s, type=pa.float64())})

    partials = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    if partials.empty:
        return partials
    out = (partials.sort_values(["query_id", "score", id_col],
                                ascending=[True, False, True])
           .groupby("query_id").head(k).reset_index(drop=True))
    out["score"] = out["score"].round(6)
    return out


def nn_join_cosine(ds, id_col: str = "vec_id", emb_col: str = "embedding",
                   round_to: int = 4) -> pd.DataFrame:
    """Exact cosine 1-NN SELF-JOIN: for every row, its nearest OTHER row
    (argmax cosine over the whole corpus, ties → smallest neighbor id) →
    DataFrame(id_col, nn_id, score) sorted by id.

    Distributed block cross-product (the ``dedup.embedding_near_dups_exact``
    shape): the corpus normalizes ONCE into materialized object-store
    blocks; each Ray task owns one left block and streams the block list
    one ref at a time (``ray.get`` inside the task — per-task memory is two
    blocks), keeping a running per-row best. Exactly n_left result rows
    leave each task, so there is no reduce shuffle and the corpus never
    materializes on the driver. O(B²) score work is inherent to EXACT 1-NN;
    :func:`lsh_topk_cosine` / :func:`ivf_topk_cosine` are the approximate
    scale paths."""
    import ray

    def pack(t: pa.Table) -> pa.Table:
        e = _normalize(_batch_matrix(t.column(emb_col)))
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if e.shape[0] == 0:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "emb": pa.array([], type=pa.list_(pa.float64()))})
        emb_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(e.ravel(), type=pa.float64()), e.shape[1]) \
            .cast(pa.list_(pa.float64()))
        return pa.table({id_col: pa.array(ids), "emb": emb_arr})

    def _unpack(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        emb = t.column("emb").combine_chunks()
        flat = np.asarray(emb.flatten(), dtype=np.float64)
        return (t.column(id_col).to_numpy(zero_copy_only=False),
                flat.reshape(t.num_rows, -1))

    mat = (ds.select_columns([id_col, emb_col])
           .map_batches(pack, batch_format="pyarrow").materialize())
    refs = [blk for bundle in mat.iter_internal_ref_bundles()
            for blk, md in bundle.blocks if (md.num_rows or 0) > 0]
    empty = pd.DataFrame({id_col: pd.array([], dtype="int64"),
                          "nn_id": pd.array([], dtype="int64"),
                          "score": pd.array([], dtype="float64")})
    if not refs:
        return empty

    @ray.remote
    def best_for_block(ta: pa.Table, other_refs: list) -> pd.DataFrame:
        import ray as _ray
        ids_a, ma = _unpack(ta)
        n = len(ids_a)
        best = np.full(n, -np.inf)
        best_id = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        for rb in other_refs:
            ids_b, mb = _unpack(_ray.get(rb))
            s = ma @ mb.T
            s[ids_a[:, None] == ids_b[None, :]] = -np.inf   # exclude self
            # sort columns by id so argmax's first-occurrence rule breaks
            # exact-score ties toward the smallest neighbor id
            order = np.argsort(ids_b, kind="mergesort")
            s = s[:, order]
            idso = ids_b[order]
            j = np.argmax(s, axis=1)
            sc = s[np.arange(n), j]
            cand = idso[j]
            better = (sc > best) | ((sc == best) & (cand < best_id))
            best = np.where(better, sc, best)
            best_id = np.where(better, cand, best_id)
        return pd.DataFrame({id_col: ids_a, "nn_id": best_id,
                             "score": np.round(best, round_to)})

    # nested-in-list refs are NOT auto-resolved by Ray — exactly what we
    # want: the task fetches them one at a time, bounding its memory
    parts = ray.get([best_for_block.remote(r, refs) for r in refs])
    out = pd.concat(parts, ignore_index=True)
    # a single-row corpus has no "other" row: drop unmatched (-inf) rows
    out = out[np.isfinite(out["score"].to_numpy())]
    if not len(out):
        return empty
    return out.sort_values(id_col).reset_index(drop=True)
