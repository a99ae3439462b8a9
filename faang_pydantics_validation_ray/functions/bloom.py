"""Bloom-filter pre-filtered reference checks — the broadcast-prune scale
path for referential joins.

At 100 TB the fact side of a referential check (J1) is enormous while the
dim side (customers, catalog) is merely large. A full hash anti-join
shuffles every fact row; the bloom path instead:

1. builds a bit array over the dim keys with per-block partial bitmaps
   (``map_batches`` → fixed-size np.uint64 words, OR-reduced on the driver —
   a 1e8-key filter at 1% FP is ~120 MB, still broadcastable),
2. ``ray.put``'s the bits once; every probe batch tests membership with two
   vectorized splitmix64 hashes (Kirsch-Mitzenmacher double hashing),
3. bloom-NEGATIVE rows are definite non-members (no false negatives) and
   never enter the shuffle; only the small bloom-POSITIVE remainder goes
   through the exact join to strip false positives.

Net: the all-to-all exchange sees ``match_rate + fp_rate`` of the probe
rows instead of 100%. Results are EXACT — the bloom only prunes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import splitmix64

_LN2 = 0.6931471805599453


def _drop_null_keys(t: pa.Table, key: str) -> pa.Table:
    """Null keys never participate in referential checks (matching
    ``groups._batch_key_counts`` semantics, which the bloom paths are
    documented drop-in swaps for); they would also poison the vectorized
    hash path — a null int64 column comes back from ``to_numpy`` as
    float64 with NaN, breaking the uint64 view."""
    col = t.column(key)
    if col.null_count == 0:
        return t
    return t.filter(pc.is_valid(col))


class Bloom:
    """Fixed-size bloom filter over int64 keys, vectorized add/test."""

    def __init__(self, n_items: int, fp_rate: float = 0.01,
                 bits: np.ndarray | None = None):
        m = max(64, int(-n_items * np.log(fp_rate) / (_LN2 * _LN2)))
        self.m = (m + 63) // 64 * 64
        self.k = max(1, round(self.m / max(n_items, 1) * _LN2))
        self.bits = (bits if bits is not None
                     else np.zeros(self.m // 64, dtype=np.uint64))

    def _hashes(self, keys: np.ndarray) -> np.ndarray:
        """(k, n) bit positions via double hashing h1 + i*h2."""
        u = keys.astype(np.int64).view(np.uint64)
        h1 = splitmix64(u)
        h2 = splitmix64(h1) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return (h1[None, :] + i * h2[None, :]) % np.uint64(self.m)

    def add(self, keys: np.ndarray) -> None:
        pos = self._hashes(np.asarray(keys))
        word, bit = pos >> np.uint64(6), pos & np.uint64(63)
        np.bitwise_or.at(self.bits, word.ravel(),
                         np.uint64(1) << bit.ravel())

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Boolean mask: True = possibly present, False = definitely absent."""
        pos = self._hashes(np.asarray(keys))
        word, bit = pos >> np.uint64(6), pos & np.uint64(63)
        hit = (self.bits[word] >> bit) & np.uint64(1)
        return hit.all(axis=0).astype(bool)


def build_bloom(ds, key: str, n_items: int, fp_rate: float = 0.01) -> Bloom:
    """Distributed build: per-block partial bitmaps (same fixed geometry),
    OR-reduced on the driver. One pass over the dim side, no shuffle."""
    proto = Bloom(n_items, fp_rate)
    m, k = proto.m, proto.k

    def partial(t: pa.Table) -> pa.Table:
        t = _drop_null_keys(t, key)
        b = Bloom(n_items, fp_rate)
        assert (b.m, b.k) == (m, k)
        b.add(t.column(key).to_numpy(zero_copy_only=False))
        return pa.table({"bits": pa.array([b.bits.tobytes()],
                                          type=pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    for buf in parts["bits"]:
        proto.bits |= np.frombuffer(buf, dtype=np.uint64)
    return proto


def bloom_anti_join_counts(probe, dim, probe_key: str, dim_key: str,
                           n_dim_items: int, fp_rate: float = 0.01):
    """EXACT orphan counts (rows of ``probe`` whose key is absent from
    ``dim``) via bloom pruning: definite-absent rows are counted straight
    out of the map stage; only possibly-present rows enter the exact
    aggregate-only anti-join to strip bloom false positives.

    Shuffle shape: ONE aggregate-only exchange of per-batch (key, cnt)
    partials — same as ``groups.anti_join_counts`` — but the dim side is
    never shuffled at all: membership for the (small) bloom-positive
    candidate set is resolved by broadcasting the candidate keys into a
    dim-side scan. For row-level outputs where payload would otherwise
    cross the exchange, see :func:`bloom_semi_join`.

    Returns a pandas DataFrame (probe_key, left_cnt): one row per orphan
    key with its occurrence count — same shape as
    :func:`groups.anti_join_counts` so call sites can swap paths.
    """
    import pandas as pd
    import ray

    bloom = build_bloom(dim, dim_key, n_dim_items, fp_rate)
    bloom_ref = ray.put(bloom)

    def split_batch(t: pa.Table) -> pa.Table:
        t = _drop_null_keys(t, probe_key)
        b = ray.get(bloom_ref)
        keys = t.column(probe_key).to_numpy(zero_copy_only=False)
        maybe = b.contains(keys)
        # definite orphans: aggregate locally to (key, cnt, definite=1)
        ok, cnt = np.unique(keys[~maybe], return_counts=True)
        mk, mcnt = np.unique(keys[maybe], return_counts=True)
        return pa.table({
            probe_key: pa.array(np.concatenate([ok, mk]), type=pa.int64()),
            "cnt": pa.array(np.concatenate([cnt, mcnt]), type=pa.int64()),
            "definite": pa.array(
                np.concatenate([np.ones(len(ok), np.int8),
                                np.zeros(len(mk), np.int8)]))})

    tagged = probe.map_batches(split_batch, batch_format="pyarrow")
    # ONE aggregate-only shuffle of (key, cnt) partials — payload rows never
    # cross; the dim side re-keys only the candidate set
    from ray.data.aggregate import Max, Sum
    agg = (tagged.groupby(probe_key)
           .aggregate(Sum("cnt", alias_name="left_cnt"),
                      Max("definite", alias_name="definite"))
           .to_pandas())
    definite = agg[agg["definite"] == 1][[probe_key, "left_cnt"]]
    cand = agg[agg["definite"] == 0]
    if len(cand):
        # strip false positives: exact membership for candidate keys only
        # (np.isin against the broadcast sorted candidate array — vectorized)
        cand_arr = np.sort(cand[probe_key].to_numpy(dtype=np.int64))
        keys_ref = ray.put(cand_arr)

        def dim_hits(t: pa.Table) -> pa.Table:
            t = _drop_null_keys(t, dim_key)
            ks = ray.get(keys_ref)
            v = t.column(dim_key).to_numpy(zero_copy_only=False)
            u = np.unique(v[np.isin(v, ks)])
            return pa.table({dim_key: pa.array(u, type=pa.int64())})

        present = set(dim.map_batches(dim_hits, batch_format="pyarrow")
                      .to_pandas()[dim_key].tolist())
        fp = cand[~cand[probe_key].isin(present)][[probe_key, "left_cnt"]]
        definite = pd.concat([definite, fp])
    out = definite.sort_values(probe_key).reset_index(drop=True)
    out["left_cnt"] = out["left_cnt"].astype("int64")
    return out


def bloom_semi_join(probe, dim, probe_key: str, dim_key: str,
                    n_dim_items: int, fp_rate: float = 0.01):
    """EXACT row-level semi-join (probe rows whose key exists in dim) with
    ZERO probe-side shuffle: bloom-filter the probe stream (definite-absent
    rows drop immediately), then strip false positives by broadcasting the
    present-key subset of the surviving candidate keys back into a second
    streaming filter. The probe payload never enters an all-to-all exchange
    — the only cross-node traffic is the bloom bits + the candidate key
    arrays (keys only, no payload).

    Requires the bloom-positive DISTINCT key set to be driver-collectable
    (it is match_rate·|dim keys| + fp_rate·|probe keys| — keys, not rows);
    for key spaces beyond that, fall back to ``joins.semi_join``.
    """
    import ray

    bloom = build_bloom(dim, dim_key, n_dim_items, fp_rate)
    bloom_ref = ray.put(bloom)

    def pass_bloom(t: pa.Table) -> pa.Table:
        t = _drop_null_keys(t, probe_key)
        b = ray.get(bloom_ref)
        keys = t.column(probe_key).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(b.contains(keys)))

    survivors = probe.map_batches(pass_bloom, batch_format="pyarrow")
    # distinct candidate keys (aggregate-only; small)
    cand = np.sort(survivors.select_columns([probe_key]).unique(probe_key))
    cand_ref = ray.put(np.asarray(cand, dtype=np.int64))

    def dim_hits(t: pa.Table) -> pa.Table:
        t = _drop_null_keys(t, dim_key)
        ks = ray.get(cand_ref)
        v = t.column(dim_key).to_numpy(zero_copy_only=False)
        u = np.unique(v[np.isin(v, ks)])
        return pa.table({dim_key: pa.array(u, type=pa.int64())})

    present = np.sort(dim.map_batches(dim_hits, batch_format="pyarrow")
                      .to_pandas()[dim_key].to_numpy(dtype=np.int64))
    present_ref = ray.put(present)

    def strip_fp(t: pa.Table) -> pa.Table:
        ks = ray.get(present_ref)
        keys = t.column(probe_key).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(keys, ks)))

    return survivors.map_batches(strip_fp, batch_format="pyarrow")
