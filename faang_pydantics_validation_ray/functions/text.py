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
    polynomial mixing."""
    texts = pc.utf8_lower(pc.fill_null(t.column(col), "")).to_pandas()
    out = np.zeros(len(texts), dtype=np.int64)
    P = np.uint64(1099511628211)
    for i, txt in enumerate(texts):
        words = txt.split()
        if not words:
            continue
        hs = hash_column(np.array(words, dtype=object))
        if len(hs) < window:
            acc = np.uint64(0)
            with np.errstate(over="ignore"):
                for hh in hs:
                    acc = acc * P + hh
            out[i] = np.int64(acc.astype(np.int64))
            continue
        with np.errstate(over="ignore"):
            pw = P ** np.arange(window, dtype=np.uint64)
            from numpy.lib.stride_tricks import sliding_window_view
            grams = (sliding_window_view(hs, window) * pw).sum(axis=1,
                                                               dtype=np.uint64)
        out[i] = np.int64(grams.min().astype(np.int64))
    return t.append_column("fingerprint", pa.array(out, type=pa.int64()))
