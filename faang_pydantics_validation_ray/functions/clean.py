"""Corpus-cleaning operators for large-scale training-data pipelines:
PII redaction, C4-style line-level filtering, and token-window chunking.

All three are pure per-batch Arrow transforms (``map_batches``-shaped, no
shuffle, no per-row Python in the hot path) — at 100 TB they stream block
by block with zero exchange. Regexes use RE2 via ``pyarrow.compute`` so a
DuckDB ``regexp_*`` oracle (also RE2) reproduces them character-for-character.

Reference parity: the reference scrubs/normalizes free-text fields before
validation (text normalizers, /root/reference/validation_utils.py) — these
kernels are the web-scale counterparts (C4/Gopher-style corpus hygiene).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# RE2 patterns valid in both Arrow and DuckDB (leftmost-first, greedy).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{1,3}[-. ]?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

PII_RULES: list[tuple[str, str, str]] = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("phone", PHONE_RE, "<PHONE>"),
    ("ip", IPV4_RE, "<IP>"),
]


def redact_pii_batch(t: pa.Table, col: str = "text",
                     out: str = "clean_text") -> pa.Table:
    """Redact emails / phone numbers / IPv4 addresses with typed placeholder
    tokens; emits ``out`` plus per-row match counts (n_email, n_phone, n_ip).

    Order matters (phone before ip would eat dotted quads? no — rules are
    applied in declaration order and the counts are taken BEFORE that rule's
    own replacement so each count reflects the original text as seen at its
    stage). Fully vectorized: one ``count_substring_regex`` + one
    ``replace_substring_regex`` per rule per batch.
    """
    s = pc.fill_null(t.column(col), "")
    cols: dict[str, object] = {}
    for name, pattern, repl in PII_RULES:
        cols[f"n_{name}"] = pc.cast(
            pc.count_substring_regex(s, pattern), pa.int64())
        s = pc.replace_substring_regex(s, pattern, repl)
    return t.append_column(out, s) \
            .append_column(f"n_{PII_RULES[0][0]}", cols["n_email"]) \
            .append_column(f"n_{PII_RULES[1][0]}", cols["n_phone"]) \
            .append_column(f"n_{PII_RULES[2][0]}", cols["n_ip"])


def _filter_list_array(arr: pa.ListArray, keep: np.ndarray) -> pa.ListArray:
    """New ListArray keeping only flat elements where ``keep`` is True,
    preserving row boundaries (rows may end up empty)."""
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]        # flatten() is offset-relative
    cum = np.concatenate([[0], np.cumsum(keep.astype(np.int64))])
    per_row_kept = cum[offsets[1:]] - cum[offsets[:-1]]
    new_offsets = np.concatenate([[0], np.cumsum(per_row_kept)])
    flat = arr.flatten().filter(pa.array(keep))
    return pa.ListArray.from_arrays(
        pa.array(new_offsets, type=pa.int32()), flat)


def clean_lines_batch(t: pa.Table, col: str = "text",
                      min_words: int = 3, require_terminal: bool = False,
                      out: str = "clean_text") -> pa.Table:
    """C4-style line-level cleanup: split on newline, drop lines with fewer
    than ``min_words`` whitespace tokens (and, optionally, lines that do not
    end in terminal punctuation ``.!?"'``), re-join survivors with newline.

    Emits ``out`` plus ``n_lines`` / ``kept_lines``. Vectorized end-to-end:
    ONE ``split_pattern`` to a list array, per-line word counts over the
    flattened values, offset arithmetic to rebuild rows, ``binary_join`` to
    re-assemble — no Python per row or per line.
    """
    s = pc.fill_null(t.column(col), "")
    lines = pc.split_pattern(s, "\n").combine_chunks()
    flat = lines.flatten()
    words = pc.count_substring_regex(flat, r"\S+").to_numpy(
        zero_copy_only=False)
    keep = words >= min_words
    if require_terminal:
        term = pc.match_substring_regex(flat, r"[.!?\"']$").to_numpy(
            zero_copy_only=False)
        keep &= term
    kept = _filter_list_array(lines, keep)
    offsets = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    n_lines = offsets[1:] - offsets[:-1]
    kept_off = kept.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    kept_lines = kept_off[1:] - kept_off[:-1]
    return t.append_column(out, pc.binary_join(kept, "\n")) \
            .append_column("n_lines", pa.array(n_lines, type=pa.int64())) \
            .append_column("kept_lines",
                           pa.array(kept_lines, type=pa.int64()))


def chunk_batch(t: pa.Table, col: str = "text", id_col: str = "doc_id",
                size: int = 40, step: int = 30) -> pa.Table:
    """Token-window chunking (the context-window prep op): split each doc on
    whitespace and emit overlapping chunks of ``size`` tokens advancing by
    ``step`` (overlap = size - step). Docs with zero tokens emit no chunks;
    the last chunk is the final partial window.

    n_chunks = 1 if ws <= size else ceil((ws - size) / step) + 1 — identical
    to the SQL oracle's generate_series bound. Output: (id, chunk_id,
    chunk_text, chunk_tokens). One flat gather + ``binary_join``; the gather
    index is built with np.repeat/arange arithmetic, no Python loop.
    """
    s = pc.utf8_trim_whitespace(pc.fill_null(t.column(col), ""))
    toks = pc.split_pattern_regex(s, r"\s+").combine_chunks()
    # split('') yields [''] — count real tokens instead
    ws = pc.count_substring_regex(s, r"\S+").to_numpy(zero_copy_only=False)
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    flat = toks.flatten()

    ws_i = ws.astype(np.int64)
    n_chunks = np.where(
        ws_i == 0, 0,
        np.where(ws_i <= size, 1, (ws_i - size + step - 1) // step + 1))
    total = int(n_chunks.sum())
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    if total == 0:
        return pa.table({
            id_col: pa.array([], type=pa.int64()),
            "chunk_id": pa.array([], type=pa.int64()),
            "chunk_text": pa.array([], type=pa.string()),
            "chunk_tokens": pa.array([], type=pa.int64())})

    doc_of_chunk = np.repeat(np.arange(len(ws)), n_chunks)
    # chunk_id within doc: global arange minus each doc's first-chunk index
    first_chunk = np.concatenate([[0], np.cumsum(n_chunks)])[:-1]
    chunk_id = np.arange(total) - first_chunk[doc_of_chunk]
    start = chunk_id * step                       # token start within doc
    length = np.minimum(start + size, ws_i[doc_of_chunk]) - start
    g_start = offsets[doc_of_chunk] + start       # global flat index
    # gather indices: repeat(g_start) + intra-chunk arange
    rep = np.repeat(g_start, length)
    intra = np.arange(length.sum()) - np.repeat(
        np.concatenate([[0], np.cumsum(length)])[:-1], length)
    gathered = flat.take(pa.array(rep + intra, type=pa.int64()))
    chunk_list = pa.ListArray.from_arrays(
        pa.array(np.concatenate([[0], np.cumsum(length)]), type=pa.int32()),
        gathered)
    return pa.table({
        id_col: pa.array(ids[doc_of_chunk], type=pa.int64()),
        "chunk_id": pa.array(chunk_id, type=pa.int64()),
        "chunk_text": pc.binary_join(chunk_list, " "),
        "chunk_tokens": pa.array(length, type=pa.int64())})


def curate_clean_batch(t: pa.Table, bench_sorted: np.ndarray,
                       id_col: str = "doc_id",
                       col: str = "text", ngram: int = 4) -> pa.Table:
    """One batch of the composed corpus-curation chain → (doc_id,
    content_hash): held-out-slice exclusion (doc_id%97==0) → language
    filter (en) → quality filter (≥5 tokens, punct ratio ≤0.2) → C4 line
    cleaning (≥3 words per line, non-empty doc) → 4-gram decontamination
    against the SORTED ``bench_sorted`` hash array (searchsorted, broadcast
    small side) → md5 content hash of the cleaned text.

    Shared verbatim by the registered ``curate_documents`` query and
    ``state.curate_checkpoint.run_curate_checkpointed`` so the resumable
    run is provably the same computation the DuckDB oracle verifies."""
    from . import dedup, text

    empty = pa.table({id_col: pa.array([], type=pa.int64()),
                      "content_hash": pa.array([], type=pa.string())})
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    t = t.filter(pa.array(ids % 97 != 0))
    if t.num_rows == 0:
        return empty
    t = t.filter(pc.equal(
        text.langid_batch(t, col).column("detected_lang"), "en"))
    if t.num_rows == 0:
        return empty
    s = text.text_stats_batch(t, col)
    t = t.filter(pc.and_(pc.greater_equal(s.column("ws_tokens"), 5),
                         pc.less_equal(s.column("punct_ratio"), 0.2)))
    if t.num_rows == 0:
        return empty
    dirty = pc.replace_substring(pc.fill_null(t.column(col), ""),
                                 " table ", "\n")
    c = clean_lines_batch(
        pa.table({id_col: t.column(id_col), col: dirty}), col=col,
        min_words=3)
    c = c.filter(pc.greater(c.column("kept_lines"), 0))
    if c.num_rows == 0:
        return empty
    gh, gdoc = text.word_ngram_hashes(c.column("clean_text"), ngram)
    contaminated = np.zeros(c.num_rows, dtype=bool)
    if len(bench_sorted) and len(gh):
        pos = np.searchsorted(bench_sorted, gh)
        hit = np.zeros(len(gh), dtype=bool)
        inb = pos < len(bench_sorted)
        hit[inb] = bench_sorted[pos[inb]] == gh[inb]
        contaminated[np.unique(gdoc[hit])] = True
    c = c.filter(pa.array(~contaminated))
    out = pa.table({id_col: c.column(id_col), col: c.column("clean_text")})
    return dedup.add_md5_batch(out, col).select([id_col, "content_hash"])
