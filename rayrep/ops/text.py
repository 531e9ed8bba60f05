"""Text analysis operators: token stats, quality scoring, language ID,
document fingerprinting. All kernels are vectorized over whole Arrow
batches — token flattening + ``np.*.reduceat`` over per-doc offsets — no
per-row Python in the hot path. Stateful pieces (compiled regexes, stopword
profiles, hash coefficients) live in callable classes instantiated once per
actor/process.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# BPE-ish pre-tokenizer: words, numbers, or single non-space symbols —
# the GPT-2 pre-tokenize shape without the merges table.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ich", "nicht", "ein", "zu", "mit"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pas", "que", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "que", "no", "por"},
}


def _tokens_and_offsets(texts: pa.ChunkedArray | pa.Array):
    """Split every doc on whitespace (vectorized); return the flattened
    token array plus per-doc offsets for segment reductions."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern_regex(texts, pattern=r"\s+")
    flat = pc.list_flatten(toks)
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, offsets


def _segment_counts(offsets: np.ndarray) -> np.ndarray:
    return np.diff(offsets)


def segment_sum(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-segment int64 sums over a flattened array; empty segments → 0.

    reduceat-safe: plain ``np.add.reduceat(values, offsets[:-1])`` mis-assigns
    empty and trailing segments (repeated / clamped offsets collapse them
    into a neighbor's range). Restricting the reduceat to non-empty segment
    starts keeps every span exact — empty segments occupy zero positions, so
    consecutive non-empty starts still delimit precisely one segment."""
    counts = np.diff(offsets)
    out = np.zeros(len(counts), dtype=np.int64)
    nz = counts > 0
    if values.size and nz.any():
        out[nz] = np.add.reduceat(values.astype(np.int64), offsets[:-1][nz])
    return out


def segment_min(values: np.ndarray, offsets: np.ndarray, empty_val) -> np.ndarray:
    """Per-segment minima; empty segments → ``empty_val`` (reduceat-safe)."""
    counts = np.diff(offsets)
    out = np.full(len(counts), empty_val, dtype=values.dtype)
    nz = counts > 0
    if values.size and nz.any():
        out[nz] = np.minimum.reduceat(values, offsets[:-1][nz])
    return out


def word_ngram_counts(batch: pa.Table, n: int = 3, text_col: str = "text") -> pa.Table:
    """Per-batch partial word-n-gram frequency counts (the map-side
    pre-aggregate for a global vocabulary / n-gram frequency table — the
    tokenizer-training shape). Fully vectorized: whitespace-split once,
    drop empty tokens, build n-grams as ``binary_join_element_wise`` over
    shifted slices of the flattened token array, mask grams that cross doc
    boundaries, then an Arrow grouped count. Emits (ngram, n) partials;
    callers finish with a tiny groupby-sum over distinct grams — shuffled
    bytes are the batch's distinct-gram table, never the corpus."""
    grams, _, _ = word_ngrams_with_docs(batch.column(text_col), n)
    if len(grams) == 0:
        return pa.table(
            {"ngram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    agg = pa.TableGroupBy(pa.table({"ngram": grams}), ["ngram"]).aggregate(
        [([], "count_all")]
    )
    return agg.rename_columns(["ngram", "n"])


def word_ngrams_with_docs(
    texts: pa.ChunkedArray | pa.Array, n: int
) -> tuple[pa.Array, np.ndarray, int]:
    """Flattened word n-grams for a batch of docs, fully vectorized:
    whitespace-split once, drop empty tokens, join ``n`` shifted slices of
    the flattened token array, mask grams that would cross a doc boundary.
    Returns ``(grams, doc_of, n_docs)`` where ``doc_of[i]`` is the batch-row
    index the i-th gram belongs to (the machinery behind
    ``word_ngram_counts``, exposed for per-doc consumers)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_docs = len(texts)
    toks = pc.split_pattern_regex(texts, pattern=r"\s+")
    flat = pc.list_flatten(toks)
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    keep = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
    counts = segment_sum(keep.astype(np.int64), offsets)
    flat = flat.filter(pa.array(keep))
    total = len(flat)
    if total < n:
        return pa.array([], pa.string()), np.empty(0, np.int64), n_docs
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    ends = starts + counts
    pos = np.arange(total - n + 1, dtype=np.int64)
    doc_of = np.searchsorted(starts, pos, side="right") - 1
    valid = pos + (n - 1) < ends[doc_of]
    parts = [flat.slice(j, total - n + 1) for j in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ").filter(pa.array(valid))
    return grams, doc_of[valid], n_docs


class Decontaminate:
    """Benchmark decontamination: flag corpus docs sharing any word n-gram
    with a held-out benchmark/eval set — the eval-overlap removal step of a
    training-data pipeline (the GPT-3/FLAN 13-gram decontamination shape;
    ``n`` configurable because synthetic docs are short).

    Scale shape: eval suites are MBs while the corpus is TBs, so the
    benchmark gram set is built once and broadcast once (``ray.put``); each
    batch runs ONE vectorized ``pc.is_in`` over its flattened n-grams and
    emits one row per doc — the corpus text never shuffles. Grams are
    matched as strings for oracle exactness; at 100 TB swap in the 64-bit
    gram hash (same shape, 8 B/gram broadcast) and accept the ~0
    collision-rate approximation."""

    def __init__(self, bench_ref, n: int = 5, id_col: str = "doc_id",
                 text_col: str = "text"):
        import ray

        grams = ray.get(bench_ref) if isinstance(bench_ref, ray.ObjectRef) else bench_ref
        self.bench = pa.array(sorted(set(grams)), pa.string())
        self.n, self.id_col, self.text_col = n, id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        grams, doc_of, n_docs = word_ngrams_with_docs(
            batch.column(self.text_col), self.n
        )
        hits = np.zeros(n_docs, dtype=np.int64)
        if len(grams) and len(self.bench):
            m = pc.is_in(grams, value_set=self.bench).to_numpy(zero_copy_only=False)
            np.add.at(hits, doc_of[m], 1)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "n_bench_hits": pa.array(hits),
            "contaminated": pa.array(hits > 0),
        })


def benchmark_ngram_set(ds, n: int = 5, text_col: str = "text") -> list[str]:
    """Distinct word n-grams of a (small) benchmark Dataset: per-batch
    vectorized gram extraction + per-batch dedup; the global distinct set is
    assembled driver-side because benchmarks are eval-set-sized by
    definition (the result is the broadcast payload, so it must fit in one
    object anyway)."""
    def per_batch(t: pa.Table) -> pa.Table:
        grams, _, _ = word_ngrams_with_docs(t.column(text_col), n)
        return pa.table({"g": pc.unique(grams)})

    out = ds.map_batches(per_batch, batch_format="pyarrow").to_pandas()
    return sorted(set(out["g"].tolist()))


def doc_freq_partial(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch document-frequency partials: distinct (doc, word) pairs
    collapsed to (word, n_docs_in_batch). Because a document is one row,
    it lives in exactly one batch — summing partials over batches is the
    EXACT corpus df, no cross-batch dedup needed. Shuffled bytes are the
    batch's distinct words, never the corpus."""
    toks, doc_of, _ = word_ngrams_with_docs(batch.column(text_col), 1)
    if len(toks) == 0:
        return pa.table({"w": pa.array([], pa.string()),
                         "df": pa.array([], pa.int64())})
    pairs = pa.TableGroupBy(
        pa.table({"w": toks, "d": pa.array(doc_of)}), ["w", "d"]
    ).aggregate([])
    agg = pa.TableGroupBy(pairs.select(["w"]), ["w"]).aggregate(
        [([], "count_all")])
    return agg.rename_columns(["w", "df"])


class TfidfTopTerm:
    """Per-document top TF-IDF term: the keyword-extraction step of a
    corpus curation pipeline. The document-frequency table (vocab-sized —
    MBs while the corpus is TBs; hash words to int64 at real scale) is
    broadcast ONCE via ``ray.put``; each batch computes exact per-doc term
    frequencies (one Arrow grouped count — a doc never spans batches),
    looks up df by searchsorted, scores tf·N/df, and takes the per-doc
    argmax (ties → lexicographically smallest term) with one sort +
    segment-boundary pass. Docs never shuffle; score is one int·int double
    division, so both engines produce identical IEEE doubles."""

    def __init__(self, df_ref, n_docs: int, id_col: str = "doc_id",
                 text_col: str = "text"):
        import ray

        words, dfs = (ray.get(df_ref)
                      if isinstance(df_ref, ray.ObjectRef) else df_ref)
        self.words = words          # sorted np.ndarray of str
        self.dfs = dfs              # aligned int64 df values
        self.n_docs = n_docs
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({
            self.id_col: pa.array([], batch.schema.field(self.id_col).type),
            "top_term": pa.array([], pa.string()),
            "score": pa.array([], pa.float64()),
        })
        toks, doc_of, _ = word_ngrams_with_docs(batch.column(self.text_col), 1)
        if len(toks) == 0:
            return empty
        tf = pa.TableGroupBy(
            pa.table({"d": pa.array(doc_of), "w": toks}), ["d", "w"]
        ).aggregate([([], "count_all")]).rename_columns(["d", "w", "tf"])
        w = tf.column("w").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(self.words, w)
        # every batch word is in the global df table by construction
        df = self.dfs[np.minimum(pos, len(self.dfs) - 1)]
        score = tf.column("tf").to_numpy().astype(np.float64) * self.n_docs / df
        scored = tf.append_column("score", pa.array(score))
        idx = pc.sort_indices(scored, sort_keys=[
            ("d", "ascending"), ("score", "descending"), ("w", "ascending")])
        s = scored.take(idx)
        d = s.column("d").to_numpy()
        first = np.ones(len(d), dtype=bool)
        first[1:] = d[1:] != d[:-1]
        top = s.filter(pa.array(first))
        ids = batch.column(self.id_col).take(top.column("d"))
        return pa.table({
            self.id_col: ids,
            "top_term": top.column("w"),
            "score": top.column("score"),
        })


class RepetitionStats:
    """Gopher-family within-document repetition signals: duplicate-word
    fraction (1 − distinct/total) and top-word fraction (mode count /
    total), plus a keep flag. One vectorized pass per batch: whitespace
    tokens are dictionary-encoded (Arrow C++), (doc, code) pairs packed
    into one int64 key, and a single ``np.unique`` yields both per-doc
    distinct counts and per-(doc,word) frequencies for the segment-max."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 max_top_word_frac: float = 0.2):
        self.id_col, self.text_col = id_col, text_col
        self.max_top = max_top_word_frac

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n_docs = len(texts)
        toks = pc.split_pattern_regex(texts, pattern=r"\s+")
        flat = pc.list_flatten(toks)
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        keep = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
        n_words = segment_sum(keep.astype(np.int64), offsets)
        flat = flat.filter(pa.array(keep))
        n_distinct = np.zeros(n_docs, dtype=np.int64)
        top_cnt = np.zeros(n_docs, dtype=np.int64)
        if len(flat):
            enc = flat.dictionary_encode()
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), n_words)
            key = (doc_of << 32) | codes
            ukey, ucnt = np.unique(key, return_counts=True)  # sorted by doc
            udoc = (ukey >> 32).astype(np.int64)
            np.add.at(n_distinct, udoc, 1)
            bounds = np.flatnonzero(np.r_[True, udoc[1:] != udoc[:-1]])
            top_cnt[udoc[bounds]] = np.maximum.reduceat(ucnt, bounds)
        nz = n_words > 0
        dup = np.zeros(n_docs, dtype=np.float64)
        top = np.zeros(n_docs, dtype=np.float64)
        # single-division IEEE ratios: bitwise-equal to the SQL oracle
        dup[nz] = 1.0 - n_distinct[nz].astype(np.float64) / n_words[nz]
        top[nz] = top_cnt[nz].astype(np.float64) / n_words[nz]
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "n_words": pa.array(n_words),
            "n_distinct": pa.array(n_distinct),
            "dup_word_frac": pa.array(dup),
            "top_word_frac": pa.array(top),
            "keep": pa.array(top <= self.max_top),
        })


class CleanText:
    """C4-family text normalization as one vectorized Arrow stage: strip
    URLs, collapse whitespace runs to single spaces, trim, and drop docs
    whose cleaned text is shorter than ``min_len``. Both Arrow and DuckDB
    compile regexes with RE2, so the SQL oracle
    (regexp_replace(..., 'g') chains) is semantics-identical, not merely
    approximately equivalent."""

    URL_RE = r"https?://\S+"

    def __init__(self, text_col: str = "text", min_len: int = 20):
        self.text_col = text_col
        self.min_len = min_len

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        no_url = pc.replace_substring_regex(text, pattern=self.URL_RE,
                                            replacement="")
        one_ws = pc.replace_substring_regex(no_url, pattern=r"\s+",
                                            replacement=" ")
        clean = pc.utf8_trim(one_ws, " ")
        n = pc.utf8_length(clean).cast(pa.int64())
        keep = pc.greater_equal(n, pa.scalar(self.min_len))
        out = batch.drop_columns([self.text_col])
        out = out.append_column("clean_text", clean)
        out = out.append_column("clean_len", n)
        return out.filter(keep)


class PIIRedact:
    """PII scrubbing as one vectorized Arrow stage (the mandatory
    pre-training privacy pass): count, then redact, email addresses and
    NANP-style phone numbers.  Emails are redacted first and phones are
    counted on the email-redacted string, so the two passes can never
    overlap-claim the same characters; the SQL oracle chains its
    regexp_replace in the same order.  Both Arrow and DuckDB compile RE2,
    so regex semantics are identical, not merely approximately so.  At
    100 TB this runs as a plain task-pool ``map_batches`` — stateless,
    no shuffle, output ≈ input sized."""

    EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
    PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{1,4}"

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n_emails = pc.count_substring_regex(
            text, pattern=self.EMAIL_RE).cast(pa.int64())
        no_email = pc.replace_substring_regex(
            text, pattern=self.EMAIL_RE, replacement="<EMAIL>")
        n_phones = pc.count_substring_regex(
            no_email, pattern=self.PHONE_RE).cast(pa.int64())
        redacted = pc.replace_substring_regex(
            no_email, pattern=self.PHONE_RE, replacement="<PHONE>")
        out = batch.drop_columns([self.text_col])
        out = out.append_column("redacted_text", redacted)
        out = out.append_column("n_emails", n_emails)
        return out.append_column("n_phones", n_phones)


def whitespace_token_counts(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Whitespace token count on TRIMMED text, defined identically to the
    SQL oracle `length(regexp_split_to_array(trim(text), '\\s+'))`. DuckDB
    trim() strips ASCII spaces only, so trim exactly " " here —
    utf8_trim_whitespace would also strip tabs/newlines and diverge."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    trimmed = pc.utf8_trim(text, " ")
    return pc.add(
        pc.count_substring_regex(trimmed, pattern=r"\s+").cast(pa.int64()), 1
    )


class TextStats:
    """Per-doc counts: whitespace tokens, regex (BPE-ish) tokens, chars,
    punctuation/digit counts, stopword ratio, and a quality score in [0,1]
    (heuristics in the C4/Gopher-rules family: length, symbol density,
    stopword presence)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.stop_en = pa.array(sorted(_STOPWORDS["en"]))

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = len(text)
        n_chars = pc.utf8_length(text).cast(pa.int64())
        tok_counts = pc.list_value_length(
            pc.extract_regex_span(text, pattern=TOKEN_RE)
        ).cast(pa.int64()) if hasattr(pc, "extract_regex_span") else None
        if tok_counts is None:
            tok_counts = pc.count_substring_regex(text, pattern=TOKEN_RE).cast(pa.int64())
        ws_counts = whitespace_token_counts(text)
        n_punct = pc.count_substring_regex(text, pattern=r"[^\w\s]").cast(pa.int64())
        n_digit = pc.count_substring_regex(text, pattern=r"[0-9]").cast(pa.int64())

        flat, offsets = _tokens_and_offsets(text)
        lower = pc.utf8_lower(flat)
        is_stop = pc.is_in(lower, value_set=self.stop_en)
        stops = segment_sum(
            is_stop.to_numpy(zero_copy_only=False).astype(np.int64), offsets
        )
        tok_n = np.maximum(_segment_counts(offsets), 1)
        stop_ratio = stops / tok_n

        nc = n_chars.to_numpy(zero_copy_only=False).astype(np.float64)
        punct_ratio = n_punct.to_numpy(zero_copy_only=False) / np.maximum(nc, 1)
        # quality: long enough, not symbol-soup, has stopwords
        quality = (
            np.clip(nc / 200.0, 0, 1) * 0.4
            + np.clip(1.0 - 4.0 * punct_ratio, 0, 1) * 0.3
            + np.clip(stop_ratio * 5.0, 0, 1) * 0.3
        )
        out = batch
        for name, col in [
            ("n_chars_calc", n_chars),
            ("token_count", ws_counts),
            ("bpe_token_count", tok_counts),
            ("n_punct", n_punct),
            ("n_digit", n_digit),
            ("stop_ratio", pa.array(stop_ratio)),
            ("quality", pa.array(quality)),
        ]:
            out = out.append_column(name, col)
        return out


class LangId:
    """N-gram/stopword-profile language ID heuristic: score each doc's
    lowercase tokens against per-language stopword sets; argmax wins,
    'und' (undetermined) when nothing matches. Profiles are built once per
    actor — the canonical stateful map_batches stage."""

    LANGS = ["en", "de", "fr", "es"]

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.sets = [pa.array(sorted(_STOPWORDS[lang])) for lang in self.LANGS]

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        flat, offsets = _tokens_and_offsets(
            text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
        )
        lower = pc.utf8_lower(flat)
        n = batch.num_rows
        scores = np.zeros((len(self.LANGS), n), dtype=np.int64)
        if len(flat):
            for i, vs in enumerate(self.sets):
                hits = pc.is_in(lower, value_set=vs).to_numpy(zero_copy_only=False)
                scores[i] = segment_sum(hits.astype(np.int64), offsets)
        best = scores.argmax(axis=0)
        lang = np.array(self.LANGS, dtype="U3")[best]
        lang[scores.max(axis=0) == 0] = "und"
        return batch.append_column("lang_pred", pa.array(lang))


class Fingerprint:
    """Winnowing-style document fingerprint: minimum 64-bit polynomial
    rolling hash over all k-byte grams of the doc (a 1-perm MinHash). The
    rolling hash runs once over the batch's concatenated bytes with doc
    boundaries masked out, then ``np.minimum.reduceat`` segments per doc —
    zero Python per row."""

    B = np.uint64(1099511628211)  # FNV prime as the base

    def __init__(self, text_col: str = "text", k: int = 8):
        self.text_col = text_col
        self.k = k
        # precompute B^k mod 2^64 for the rolling update (Python-int pow
        # avoids the noisy-but-harmless numpy overflow warning)
        self.bk = np.uint64(pow(int(self.B), k, 1 << 64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
            if isinstance(text, pa.ChunkedArray):
                text = (text.chunk(0) if text.num_chunks
                        else pa.array([], text.type))
        n = batch.num_rows
        # zero-copy: bytes + per-doc lengths straight from Arrow's own
        # buffers (no per-doc encode); grams never cross doc boundaries
        # because each doc's valid window is masked below, so no
        # separator bytes are needed either
        buf, lens = _utf8_bytes(text)
        arr = buf.astype(np.uint64)
        if len(arr) < self.k:
            return batch.append_column("fingerprint", pa.array(np.zeros(n, np.int64)))
        with np.errstate(over="ignore"):
            # content-invariant k-gram hash: fixed weight vector over each
            # window (k vectorized passes, no per-row Python)
            g = np.zeros(len(arr) - self.k + 1, dtype=np.uint64)
            w = np.uint64(1)
            for j in range(self.k):
                g += arr[j : len(arr) - self.k + 1 + j] * w
                w = np.uint64(w * self.B)
            g = (g ^ (g >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
            g = g ^ (g >> np.uint64(33))
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        # mask grams that cross a doc boundary, then segment-min
        valid_end = starts + np.maximum(lens - self.k + 1, 0)
        pos = np.arange(len(g), dtype=np.int64)
        doc_of = np.searchsorted(starts, pos, side="right") - 1
        invalid = pos >= valid_end[doc_of]
        g[invalid] = np.uint64(0xFFFFFFFFFFFFFFFF)
        starts_c = np.minimum(starts, len(g) - 1)
        mins = np.minimum.reduceat(g, starts_c)
        mins[lens < self.k] = 0
        return batch.append_column("fingerprint", pa.array(mins.view(np.int64)))


def _utf8_bytes(text: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (concatenated UTF-8 byte buffer, per-doc byte lengths)
    straight from a string array's own offsets/data buffers — Arrow
    strings ARE UTF-8, so no per-doc Python ``encode`` loop. Nulls read
    as empty docs."""
    if text.null_count:
        text = pc.fill_null(text, "")
    odt = np.int64 if pa.types.is_large_string(text.type) else np.int32
    bufs = text.buffers()
    off = np.frombuffer(bufs[1], dtype=odt)[
        text.offset: text.offset + len(text) + 1]
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.empty(0, np.uint8))
    lens = (off[1:] - off[:-1]).astype(np.int64)
    return data[int(off[0]): int(off[-1])], lens


def _gram_pairs(batch: pa.Table, *, k: int, id_col: str,
                text_col: str, stride: int = 1,
                hashed: bool = False) -> pa.Table:
    """Every k-byte gram position as a (gram, doc_id) row — one
    sliding-window view over the batch's concatenated bytes with doc
    boundaries masked, no per-row Python.  Gram strings (not hashes) so
    the downstream equality is EXACT; byte==codepoint holds for ASCII
    corpora (the oracle's substr() is codepoint-based).

    Scale levers: ``stride=s`` keeps only grams whose rolling hash is
    0 mod s — CONTENT-DEFINED sampling, so an identical gram is sampled
    identically in every doc containing it (positional sampling would
    pick different grams of a shared span in different docs and miss it);
    a duplicated span of length L is caught with prob 1-(1-1/s)^(L-k+1).
    ``hashed`` ships the 8-byte rolling hash instead of the k-byte string
    (collision probability ~n^2/2^64; the exact-string mode is the
    verified one)."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
        if isinstance(text, pa.ChunkedArray):  # pyarrow<14 keeps the wrap
            text = (text.chunk(0) if text.num_chunks
                    else pa.array([], text.type))
    buf, lens = _utf8_bytes(text)
    if not hashed and len(buf) and buf.max() >= 128:
        # byte==codepoint only holds for ASCII; the S->U gram view below
        # would otherwise die mid-kernel with an anonymous
        # UnicodeDecodeError. Name the offending doc instead (hashed=True
        # is the non-ASCII-safe mode: it never builds gram strings).
        first = int(np.flatnonzero(buf >= 128)[0])
        starts0 = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts0[1:])
        bad_doc = batch.column(id_col)[
            int(np.searchsorted(starts0, first, side="right") - 1)].as_py()
        raise ValueError(
            f"dup-span exact-gram mode requires ASCII text (oracle parity: "
            f"substr() is codepoint-based); {id_col}={bad_doc} contains "
            "non-ASCII bytes — normalize upstream or use hashed=True"
        )
    gtype = pa.uint64() if hashed else pa.string()
    empty = pa.table({"gram": pa.array([], gtype),
                      id_col: pa.array([], pa.int64())})
    if len(buf) < k:
        return empty
    win = np.lib.stride_tricks.sliding_window_view(buf, k)
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    pos = np.arange(len(win), dtype=np.int64)
    doc_of = np.searchsorted(starts, pos, side="right") - 1
    valid = pos <= starts[doc_of] + lens[doc_of] - k
    g = None
    if hashed or stride > 1:
        u = buf.astype(np.uint64)
        with np.errstate(over="ignore"):
            g = np.zeros(len(win), dtype=np.uint64)
            w, B = np.uint64(1), np.uint64(1099511628211)
            for j in range(k):
                g += u[j: len(u) - k + 1 + j] * w
                w = np.uint64(w * B)
    if stride > 1:  # content-defined sample: same gram → same decision
        valid &= g % np.uint64(stride) == 0
    sel = np.flatnonzero(valid)
    if not len(sel):
        return empty
    ids = batch.column(id_col).to_numpy()[doc_of[sel]]
    if hashed:
        return pa.table({"gram": pa.array(g[sel], pa.uint64()),
                         id_col: pa.array(ids)})
    grams = np.ascontiguousarray(win[sel])
    gram_str = grams.view(f"S{k}").ravel().astype(f"U{k}")
    return pa.table({"gram": pa.array(gram_str), id_col: pa.array(ids)})


def dup_span_doc_counts(ds, *, k: int = 20, id_col: str = "doc_id",
                        text_col: str = "text", num_parts: int = 32,
                        stride: int = 1, hashed: bool = False) -> pd.DataFrame:
    """Exact duplicate-SPAN detection (the substring-dedup shape of
    Lee et al.'s 'Deduplicating Training Data Makes Language Models
    Better', arXiv:2107.06499, done with hashed-gram grouping instead of
    a suffix array): for every doc, count the k-byte positions whose
    exact gram also occurs in at least one OTHER doc.

    Scale shape: one (gram, doc) row per position enters ONE hash
    shuffle, co-grouped by gram-hash partition; the per-partition fold is
    a single factorize + lexsort (distinct-doc counts per gram, then
    per-doc position counts) — no per-gram Python.  This is the inherent
    all-to-all cost of exact substring dedup; at 10^14 bytes,
    ``stride=s`` cuts exchanged rows ~s-fold via content-defined gram
    sampling (a shared span of length L is caught with prob
    1-(1-1/s)^(L-k+1); counts become per-sample) and ``hashed=True``
    cuts bytes/row from k to 8 at ~n^2/2^64 collision risk.  The
    verified query keeps exact gram strings at stride 1 so the SQL
    oracle is bit-exact."""
    from ray.data.aggregate import Sum

    from rayrep.hashing import stable_hash_strings

    pairs = ds.map_batches(
        _gram_pairs,
        fn_kwargs={"k": k, "id_col": id_col, "text_col": text_col,
                   "stride": stride, "hashed": hashed},
        batch_format="pyarrow",
    )

    def tag(t: pa.Table) -> pa.Table:
        if hashed:
            pid = (t.column("gram").to_numpy()
                   % np.uint64(num_parts)).astype(np.int32)
        else:
            pid = (stable_hash_strings(t.column("gram"))
                   % np.uint64(num_parts)).astype(np.int32)
        return t.append_column("part_id", pa.array(pid))

    def per_part(g: pa.Table) -> pa.Table:
        gram = g.column("gram").to_numpy(zero_copy_only=False)
        doc = g.column(id_col).to_numpy()
        codes, _ = pd.factorize(gram, sort=False)
        order = np.lexsort((doc, codes))
        c, d = codes[order], doc[order]
        newpair = np.ones(len(c), dtype=bool)
        newpair[1:] = (c[1:] != c[:-1]) | (d[1:] != d[:-1])
        ndoc = np.bincount(c[newpair], minlength=int(codes.max()) + 1)
        keep = ndoc[codes] >= 2  # gram shared by >= 2 distinct docs
        if not keep.any():
            return pa.table({id_col: pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        du, inv = np.unique(doc[keep], return_inverse=True)
        return pa.table({id_col: pa.array(du),
                         "c": pa.array(np.bincount(inv).astype(np.int64))})

    out = (pairs.map_batches(tag, batch_format="pyarrow")
           .groupby("part_id").map_groups(per_part, batch_format="pyarrow")
           .groupby(id_col).aggregate(Sum("c", alias_name="dup_spans"))
           .to_pandas())
    return out.sort_values(id_col).reset_index(drop=True)
