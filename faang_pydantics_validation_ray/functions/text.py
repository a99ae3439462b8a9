"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID, document fingerprinting.

All hot paths are vectorized ``pyarrow.compute`` regex/string kernels (RE2),
chosen so the SQL-expressible ones are reproducible verbatim in DuckDB (also
RE2) for the oracle gate:

- ``ws_tokens``  = number of whitespace-separated tokens of trim(text)
- ``re_tokens``  = BPE-ish token count (letter runs | digit runs | single
  other non-space)
- ``punct_ratio``, ``digit_ratio``, ``upper_ratio``, ``stopword_ratio``
- ``quality_score`` = simple weighted combination (graft of "quality
  scoring": length/punct/stopword ratios)

Language-ID is an n-gram/function-word heuristic (not SQL-expressible);
fingerprints are 64-bit polynomial rolling hashes with winnowing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import hash_column

TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
STOPWORDS_EN = ("the", "and", "of", "a", "to", "in", "is", "it", "that", "for")
STOP_RE = r"(?i)\b(" + "|".join(STOPWORDS_EN) + r")\b"

# distinctive function words per language (tiny heuristic lexicons)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "that", "with", "for"),
    "de": ("der", "die", "und", "das", "nicht", "ist", "mit"),
    "fr": ("le", "la", "et", "les", "des", "est", "dans"),
    "es": ("el", "los", "las", "es", "una", "para", "con"),
}


def _ratio(num: pa.ChunkedArray, den: pa.ChunkedArray) -> pa.ChunkedArray:
    return pc.if_else(pc.greater(den, 0),
                      pc.divide(pc.cast(num, pa.float64()),
                                pc.cast(den, pa.float64())),
                      pa.scalar(0.0))


def text_stats_batch(t: pa.Table, col: str = "text") -> pa.Table:
    """Append ws_tokens, re_tokens, punct_ratio, digit_ratio, upper_ratio,
    stopword_ratio, mean_word_len, quality_score columns (vectorized)."""
    s = t.column(col)
    trimmed = pc.utf8_trim_whitespace(pc.fill_null(s, ""))
    nonempty = pc.not_equal(trimmed, "")
    length = pc.utf8_length(trimmed)
    ws_tokens = pc.add(pc.count_substring_regex(trimmed, r"\s+"),
                       pc.cast(nonempty, pa.int32()))
    ws_tokens = pc.cast(ws_tokens, pa.int64())
    re_tokens = pc.cast(pc.count_substring_regex(trimmed, TOKEN_RE), pa.int64())
    punct = pc.count_substring_regex(trimmed, r"[[:punct:]]")
    digit = pc.count_substring_regex(trimmed, r"[0-9]")
    upper = pc.count_substring_regex(trimmed, r"[A-Z]")
    stop = pc.count_substring_regex(trimmed, STOP_RE)
    letters = pc.count_substring_regex(trimmed, r"[A-Za-z]")
    mean_word_len = pc.if_else(pc.greater(ws_tokens, 0),
                               pc.divide(pc.cast(letters, pa.float64()),
                                         pc.cast(ws_tokens, pa.float64())),
                               pa.scalar(0.0))
    punct_ratio = _ratio(punct, length)
    digit_ratio = _ratio(digit, length)
    upper_ratio = _ratio(upper, length)
    stop_ratio = _ratio(stop, ws_tokens)
    # quality: long enough, some stopwords, not punct/digit heavy
    len_np = np.minimum(np.asarray(length, dtype=np.float64) / 200.0, 1.0)
    q = (0.4 * len_np
         + 0.3 * np.minimum(np.asarray(stop_ratio, dtype=np.float64) * 5.0, 1.0)
         + 0.15 * (1.0 - np.asarray(punct_ratio, dtype=np.float64))
         + 0.15 * (1.0 - np.asarray(digit_ratio, dtype=np.float64)))
    for name, arr in [("ws_tokens", ws_tokens), ("re_tokens", re_tokens),
                      ("punct_ratio", punct_ratio), ("digit_ratio", digit_ratio),
                      ("upper_ratio", upper_ratio), ("stopword_ratio", stop_ratio),
                      ("mean_word_len", mean_word_len),
                      ("quality_score", pa.array(q))]:
        t = t.append_column(name, arr)
    return t


def langid_batch(t: pa.Table, col: str = "text") -> pa.Table:
    """Append ``detected_lang``: CJK-ratio check, then per-language
    function-word densities (vectorized regex counts; argmax per row)."""
    s = pc.fill_null(t.column(col), "")
    n = t.num_rows
    length = np.maximum(np.asarray(pc.utf8_length(s), dtype=np.float64), 1.0)
    cjk = np.asarray(pc.count_substring_regex(s, r"[\x{4e00}-\x{9fff}]"),
                     dtype=np.float64) / length
    scores = np.zeros((len(LANG_MARKERS), n))
    langs = list(LANG_MARKERS)
    ws = np.maximum(np.asarray(
        pc.add(pc.count_substring_regex(s, r"\s+"), 1), dtype=np.float64), 1.0)
    for i, lang in enumerate(langs):
        pat = r"(?i)\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"
        scores[i] = np.asarray(pc.count_substring_regex(s, pat),
                               dtype=np.float64) / ws
    best = np.array(langs, dtype=object)[scores.argmax(axis=0)]
    best[scores.max(axis=0) <= 0.0] = "unknown"
    best[cjk > 0.2] = "zh"
    return t.append_column("detected_lang", pa.array(best, type=pa.string()))


def fingerprint_batch(t: pa.Table, col: str = "text",
                      window: int = 8) -> pa.Table:
    """Append ``fingerprint``: winnowed min of 64-bit rolling k-gram hashes of
    the lowercased text (document fingerprinting / near-dup pre-key). Tokens
    are hashed with the deterministic siphash, combined by position-weighted
    polynomial mixing. Fully vectorized over the batch (one Arrow split, one
    token-hash pass, per-doc min via ``reduceat``); docs shorter than the
    window fold their tokens with the same Horner polynomial the previous
    per-row implementation used."""
    P = np.uint64(1099511628211)
    out = np.zeros(t.num_rows, dtype=np.int64)
    hs, cnt = _word_token_hashes(t.column(col))
    bounds = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(cnt)])
    long = cnt >= window
    with np.errstate(over="ignore"):
        if long.any():
            gh, gdoc = _gram_hashes(hs, cnt, window)
            # per-doc min over each doc's contiguous gram segment
            v = np.maximum(cnt - window + 1, 0)
            starts = np.concatenate([np.zeros(1, dtype=np.int64),
                                     np.cumsum(v)])[:-1][long]
            out[long] = np.minimum.reduceat(gh, starts).view(np.int64)
        short = (~long) & (cnt > 0)
        if short.any():
            # Horner fold acc = acc*P + h ≡ Σ h[i]·P^(len-1-i), vectorized
            # with per-token exponents and a segment sum
            tok_doc = np.repeat(np.arange(len(cnt), dtype=np.int64), cnt)
            expo = (np.repeat(bounds[1:], cnt) - 1
                    - np.arange(len(hs), dtype=np.int64))
            m = short[tok_doc]
            acc = np.zeros(len(cnt), dtype=np.uint64)
            np.add.at(acc, tok_doc[m], hs[m] * P ** expo[m].astype(np.uint64))
            out[short] = acc[short].view(np.int64)
    return t.append_column("fingerprint", pa.array(out, type=pa.int64()))


# ------------------------------------------------------- decontamination

_FNV = np.uint64(1099511628211)


def _word_token_hashes(texts) -> tuple[np.ndarray, np.ndarray]:
    """(uint64 hashes of all non-empty lowered whitespace tokens in batch
    order, per-doc token counts int64[n]) — ONE Arrow split for the batch,
    dictionary-encoded SipHash so only DISTINCT tokens are hashed, no
    per-row Python (same discipline as dedup.simhash_batch)."""
    arr = pc.utf8_lower(pc.fill_null(texts, ""))
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    words = pc.utf8_split_whitespace(arr)
    lens = pc.list_value_length(words).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(words)
    nonempty = np.asarray(pc.not_equal(flat, ""))
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)[nonempty]
    cnt = np.bincount(doc_idx, minlength=n).astype(np.int64)
    if len(doc_idx) == 0:
        return np.empty(0, dtype=np.uint64), cnt
    enc = flat.filter(pa.array(nonempty)).dictionary_encode()
    hs = hash_column(enc.dictionary)[
        enc.indices.to_numpy(zero_copy_only=False)]
    return hs.astype(np.uint64), cnt


def _gram_hashes(hs: np.ndarray, cnt: np.ndarray,
                 n: int) -> tuple[np.ndarray, np.ndarray]:
    """All length-``n`` window polynomial hashes over per-doc token-hash
    segments (docs with < n tokens emit none) → (gram_hash uint64,
    doc_index int64), windows never crossing doc boundaries."""
    v = np.maximum(cnt - n + 1, 0)
    total = int(v.sum())
    gdoc = np.repeat(np.arange(len(cnt), dtype=np.int64), v)
    if total == 0:
        return np.empty(0, dtype=np.uint64), gdoc
    bounds = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(cnt)])
    wc = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(v)])
    start = (np.arange(total, dtype=np.int64) - np.repeat(wc[:-1], v)
             + np.repeat(bounds[:-1], v))
    gh = np.zeros(total, dtype=np.uint64)
    with np.errstate(over="ignore"):
        pw = _FNV ** np.arange(n, dtype=np.uint64)
        for j in range(n):
            gh += hs[start + j] * pw[j]
    return gh, gdoc


def word_ngram_hashes(texts, n: int = 4) -> tuple[np.ndarray, np.ndarray]:
    """(gram_hash uint64, doc_index int64) for every word n-gram of every
    doc in the batch: one Arrow split + one token-hash pass + ``n`` strided
    adds for the whole batch — no per-row Python."""
    hs, cnt = _word_token_hashes(texts)
    return _gram_hashes(hs, cnt, n)


def benchmark_ngram_hashes(ds, col: str = "text", n: int = 4) -> np.ndarray:
    """Distinct word-n-gram hashes of the benchmark dataset, sorted uint64:
    distinct-per-batch in workers, union on the driver. Driver memory is
    bounded by the BENCHMARK's distinct-gram count — an eval set is MBs
    against a 100 TB train corpus; this is the canonical broadcast small
    side, never the corpus."""
    def part(t: pa.Table) -> pa.Table:
        gh, _ = word_ngram_hashes(t.column(col), n)
        return pa.table({"g": pa.array(np.unique(gh).view(np.int64))})

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return np.empty(0, dtype=np.uint64)
    return np.unique(parts["g"].to_numpy().view(np.uint64))


def decontaminate(ds, bench_hashes: np.ndarray, col: str = "text",
                  id_col: str = "doc_id", n: int = 4):
    """GPT-3-style train/test decontamination (Brown et al. 2020 appendix C;
    also Dodge et al. 2021): flag every training doc sharing at least one
    word n-gram with the benchmark set → DataFrame(doc_id, n_overlap) with
    n_overlap = DISTINCT overlapping grams, contaminated docs only.

    Shape: the sorted benchmark gram-hash array is broadcast once
    (``ray.put``); ONE streaming pass computes each batch's gram hashes and
    membership via searchsorted — only the sparse contaminated rows leave
    the workers, nothing shuffles."""
    import ray

    bench = np.sort(np.asarray(bench_hashes, dtype=np.uint64))
    bref = ray.put(bench)

    def per_batch(t: pa.Table) -> pa.Table:
        b = ray.get(bref)
        empty = pa.table({id_col: pa.array([], type=t.schema.field(id_col).type),
                          "n_overlap": pa.array([], type=pa.int64())})
        if len(b) == 0:
            return empty
        gh, gdoc = word_ngram_hashes(t.column(col), n)
        if len(gh) == 0:
            return empty
        pos = np.searchsorted(b, gh)
        hit = np.zeros(len(gh), dtype=bool)
        inb = pos < len(b)
        hit[inb] = b[pos[inb]] == gh[inb]
        gd, gg = gdoc[hit], gh[hit]
        if len(gd) == 0:
            return empty
        order = np.lexsort((gg, gd))
        gd, gg = gd[order], gg[order]
        first = np.ones(len(gd), dtype=bool)
        first[1:] = (gd[1:] != gd[:-1]) | (gg[1:] != gg[:-1])
        counts = np.bincount(gd[first], minlength=t.num_rows)
        rows = np.flatnonzero(counts)
        return pa.table({id_col: t.column(id_col).take(pa.array(rows)),
                         "n_overlap": pa.array(counts[rows], type=pa.int64())})

    import pandas as pd
    out = ds.map_batches(per_batch, batch_format="pyarrow").to_pandas()
    if len(out) == 0:
        return pd.DataFrame({id_col: pd.array([], dtype="int64"),
                             "n_overlap": pd.array([], dtype="int64")})
    return out.sort_values(id_col).reset_index(drop=True)


def repetition_stats_batch(t: pa.Table, col: str = "text") -> pa.Table:
    """Append Gopher-style repetition signals (Rae et al. 2021 "Scaling
    Language Models", table A1 repetition filters):

    - ``top_bigram_frac``: fraction of tokens covered by the single most
      frequent bigram (2·max_count/n_tokens; 0.0 under 2 tokens)
    - ``dup_3gram_frac``: 1 − distinct/total trigrams (0.0 under 3 tokens)

    Vectorized for the whole batch: one token-hash pass, gram hashes via
    the shared polynomial kernel, per-doc run-length stats via one lexsort."""
    n = t.num_rows
    hs, cnt = _word_token_hashes(t.column(col))
    top_big = np.zeros(n, dtype=np.float64)
    dup3 = np.zeros(n, dtype=np.float64)

    def _runs(gh: np.ndarray, gdoc: np.ndarray):
        """(run_doc, run_len) for equal (doc, gram) runs after sorting."""
        order = np.lexsort((gh, gdoc))
        gd, gg = gdoc[order], gh[order]
        first = np.ones(len(gd), dtype=bool)
        first[1:] = (gd[1:] != gd[:-1]) | (gg[1:] != gg[:-1])
        starts = np.flatnonzero(first)
        lens = np.diff(np.concatenate([starts, [len(gd)]]))
        return gd[starts], lens

    gh2, gdoc2 = _gram_hashes(hs, cnt, 2)
    if len(gh2):
        rd_, rl = _runs(gh2, gdoc2)
        maxc = np.zeros(n, dtype=np.int64)
        np.maximum.at(maxc, rd_, rl)
        m = cnt >= 2
        top_big[m] = 2.0 * maxc[m] / cnt[m]
    gh3, gdoc3 = _gram_hashes(hs, cnt, 3)
    if len(gh3):
        rd_, _ = _runs(gh3, gdoc3)
        distinct = np.bincount(rd_, minlength=n)
        total = np.maximum(cnt - 2, 0)
        m = total > 0
        dup3[m] = 1.0 - distinct[m] / total[m]
    # round half AWAY from zero (SQL ROUND semantics; np.round banker's
    # rounding differs on exact .00005 boundaries like 1/32)
    def _round4(x: np.ndarray) -> np.ndarray:
        return np.floor(x * 10000.0 + 0.5) / 10000.0

    return (t.append_column("top_bigram_frac", pa.array(_round4(top_big)))
             .append_column("dup_3gram_frac", pa.array(_round4(dup3))))
