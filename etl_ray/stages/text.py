"""Text-analysis stages for large-scale training-data pipelines.

Target-added operators (no reference analogue — the reference processes
JSON chain events): language-ID, quality scoring, token counting, document
fingerprinting.  Each is a callable CLASS for
``map_batches(Cls, concurrency=N)`` actor pools — regexes/tables compiled
once per actor in ``__init__`` (the fix for the reference's
rebuild-state-per-file anti-pattern, `src/pipeline/core/spark.py:31-47`).

All scores are deterministic and, where feasible, defined so a DuckDB SQL
oracle can reproduce them exactly (integer counts, md5 hex digests;
ratios defined as plain divisions of those integers).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# stopword sets for the n-gram-free heuristic language id
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "pt": {"de", "que", "e", "o", "a", "do", "da", "em", "um", "para"},
    "de": {"der", "die", "und", "das", "in", "von", "zu", "den", "mit", "ist"},
    "es": {"de", "la", "que", "el", "en", "y", "los", "del", "se", "las"},
    "fr": {"de", "la", "le", "et", "les", "des", "en", "un", "du", "une"},
}


class TokenCounter:
    """Whitespace tokens + a BPE-ish subword estimate per document.

    ``n_tokens`` = count of ``\\S+`` runs (== DuckDB
    ``len(regexp_extract_all(text,'\\S+'))``); ``n_bpe_est`` = count of
    word/number/punct pieces from a GPT-2-style pre-tokenizer regex.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        # ASCII whitespace class, NOT \S: Python \S is Unicode-aware while
        # DuckDB's RE2 \S is ASCII-only — U+00A0 etc. would diverge
        self.ws = re.compile(r"[^ \t\n\r\f\v]+")
        # public GPT-2 pre-tokenizer shape (contractions, words, numbers, other)
        self.bpe = re.compile(r"'s|'t|'re|'ve|'m|'ll|'d| ?\w+| ?[^\s\w]+|\s+(?!\S)")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        n_tok = np.fromiter(
            (len(self.ws.findall(t or "")) for t in texts), np.int64, len(texts)
        )
        n_bpe = np.fromiter(
            (len(self.bpe.findall(t or "")) for t in texts), np.int64, len(texts)
        )
        return batch.append_column("n_tokens", pa.array(n_tok)).append_column(
            "n_bpe_est", pa.array(n_bpe)
        )


class QualityScorer:
    """Length / punctuation / alpha / stopword signals per document.

    Integer counts are SQL-reproducible; ``alpha_ratio`` =
    n_alpha / max(n_chars_counted, 1) with n_chars_counted = length(text).
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.alpha = re.compile(r"[A-Za-z]")
        self.punct = re.compile(r"[!-/:-@\[-`{-~]")
        self.word = re.compile(r"[a-z']+")
        self.stop_en = _STOPWORDS["en"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        n_chars = np.fromiter((len(t or "") for t in texts), np.int64, n)
        n_alpha = np.fromiter(
            (len(self.alpha.findall(t or "")) for t in texts), np.int64, n
        )
        n_punct = np.fromiter(
            (len(self.punct.findall(t or "")) for t in texts), np.int64, n
        )
        stop_ratio = np.empty(n, np.float64)
        for i, t in enumerate(texts):
            words = self.word.findall((t or "").lower())
            stop_ratio[i] = (
                sum(w in self.stop_en for w in words) / len(words) if words else 0.0
            )
        out = batch
        out = out.append_column("n_chars_counted", pa.array(n_chars))
        out = out.append_column("n_alpha", pa.array(n_alpha))
        out = out.append_column("n_punct", pa.array(n_punct))
        out = out.append_column(
            "alpha_ratio", pa.array(n_alpha / np.maximum(n_chars, 1))
        )
        out = out.append_column("stop_ratio_en", pa.array(stop_ratio))
        return out


class LangId:
    """Heuristic language ID: argmax of per-language stopword hit rates,
    tie-broken alphabetically; 'und' when nothing matches."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word = re.compile(r"[a-zà-ÿäöüß']+")
        self.tables = {k: frozenset(v) for k, v in _STOPWORDS.items()}

    def classify(self, text: str) -> str:
        words = self.word.findall((text or "").lower())
        if not words:
            return "und"
        best, best_score = "und", 0
        for lang in sorted(self.tables):
            score = sum(w in self.tables[lang] for w in words)
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        preds = pa.array([self.classify(t) for t in texts], pa.string())
        return batch.append_column("lang_pred", preds)


class Fingerprinter:
    """Document fingerprints: md5 of normalized text (SQL-reproducible:
    ``md5(lower(trim(text)))``) plus a 64-bit rolling (Rabin-Karp-style)
    hash over byte windows for shift-robust near-dup blocking."""

    BASE = 257
    MOD = (1 << 61) - 1

    def __init__(self, text_col: str = "text", window: int = 16):
        self.text_col = text_col
        self.window = window

    def md5_norm(self, text: str) -> str:
        # ASCII trim set matches the DuckDB oracle's trim(' \t\n\r\v\f');
        # bare .strip() would also remove Unicode whitespace
        return hashlib.md5(
            (text or "").strip(" \t\n\r\v\f").lower().encode("utf-8")
        ).hexdigest()

    def rolling_min(self, text: str) -> int:
        """Min rolling hash over all windows (a 1-perm minhash on byte
        shingles) — stable under content shifts."""
        data = (text or "").encode("utf-8")
        w = self.window
        if len(data) < w:
            return self._hash(data)
        h = self._hash(data[:w])
        out = h
        pw = pow(self.BASE, w - 1, self.MOD)
        for i in range(w, len(data)):
            h = ((h - data[i - w] * pw) * self.BASE + data[i]) % self.MOD
            if h < out:
                out = h
        return out

    def _hash(self, b: bytes) -> int:
        h = 0
        for c in b:
            h = (h * self.BASE + c) % self.MOD
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        md5s = pa.array([self.md5_norm(t) for t in texts], pa.string())
        rolls = pa.array([self.rolling_min(t) for t in texts], pa.int64())
        return batch.append_column("fp_md5", md5s).append_column("fp_roll", rolls)


class VocabPartials:
    """Per-batch token-count partials for corpus vocabulary building.

    Emits one (token, n) row per DISTINCT token per batch — the combiner
    half of a distributed word count.  The shuffle that follows moves at
    most |batch_vocab| rows per batch regardless of batch token volume,
    and the downstream ``groupby(token).sum`` sees bounded input
    (n_batches x vocab), never the raw token stream.  Tokens are ASCII
    whitespace runs (same class as TokenCounter, SQL-reproducible via
    ``regexp_extract_all(text, '[^ \\t\\n\\r\\f\\v]+')``)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.ws = re.compile(r"[^ \t\n\r\f\v]+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        counts: Counter = Counter()
        for t in batch.column(self.text_col).to_pylist():
            counts.update(self.ws.findall(t or ""))
        if not counts:
            return pa.table(
                {"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        toks, ns = zip(*counts.items())
        return pa.table(
            {"token": pa.array(toks, pa.string()), "n": pa.array(ns, pa.int64())}
        )


class RepetitionProfiler:
    """Within-document repetition signals (Gopher-style quality filters):
    total tokens, the most-frequent token's count, and the distinct-token
    count per document.  High ``top_token_n / n_tokens`` or low
    ``n_distinct / n_tokens`` flags boilerplate/spam for corpus
    filtering.  Integer outputs only — ratios belong to the caller so the
    SQL oracle compares exact int64s."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.ws = re.compile(r"[^ \t\n\r\f\v]+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        n_tok = np.zeros(n, np.int64)
        top_n = np.zeros(n, np.int64)
        n_dis = np.zeros(n, np.int64)
        for i, t in enumerate(texts):
            c = Counter(self.ws.findall(t or ""))
            if c:
                n_tok[i] = sum(c.values())
                top_n[i] = max(c.values())
                n_dis[i] = len(c)
        out = batch.append_column("n_tokens", pa.array(n_tok))
        out = out.append_column("top_token_n", pa.array(top_n))
        return out.append_column("n_distinct", pa.array(n_dis))


class PostingLister:
    """Inverted-index explode: one (token, doc_id) row per distinct token
    per document.  Documents are row-disjoint across batches, so per-doc
    dedup here IS global pair dedup — no shuffle needed for uniqueness.
    Downstream consumers groupby(token) for posting lists / document
    frequencies (bounded by vocab, not corpus size)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.ws = re.compile(r"[^ \t\n\r\f\v]+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        ids = batch.column(self.id_col).to_pylist()
        out_tok: list[str] = []
        out_id: list[int] = []
        for i, t in zip(ids, texts):
            toks = sorted(set(self.ws.findall(t or "")))
            out_tok.extend(toks)
            out_id.extend([i] * len(toks))
        return pa.table(
            {
                "token": pa.array(out_tok, pa.string()),
                "doc_id": pa.array(out_id, pa.int64()),
            }
        )


class PiiRedactor:
    """Regex PII scrubbing: replace emails / phone numbers with typed
    placeholder tags and count the hits per document — the standard
    pre-training privacy pass.  Patterns are restricted to ASCII
    constructs that behave identically in Python ``re`` and DuckDB's RE2
    (no ``\\w``/``\\d``/``\\b``, which differ in Unicode mode), so a SQL
    oracle reproduces the redaction byte-for-byte.  Compiled once per
    actor; order is fixed (emails first, then phones) and mirrored by
    the oracle's nested regexp_replace."""

    EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    PHONE = r"\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}"

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.email = re.compile(self.EMAIL)
        self.phone = re.compile(self.PHONE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        n_em = np.zeros(n, np.int64)
        n_ph = np.zeros(n, np.int64)
        red = []
        for i, t in enumerate(texts):
            t = t or ""
            t, n_em[i] = self.email.subn("<EMAIL>", t)
            t, n_ph[i] = self.phone.subn("<PHONE>", t)
            red.append(t)
        out = batch.append_column("text_redacted", pa.array(red, pa.string()))
        out = out.append_column("n_emails", pa.array(n_em))
        return out.append_column("n_phones", pa.array(n_ph))


class RegexExtractor:
    """Pattern extraction explode: one (id, match, idx) row per regex
    match per document, in document order — the span-harvesting pass
    (URLs, citations, code identifiers, entities) that feeds targeted
    corpus slices.  Pattern compiled once per actor; restricted to ASCII
    constructs that behave identically in Python ``re`` and DuckDB RE2
    so the oracle is ``unnest(regexp_extract_all(...))`` zipped with its
    ordinal.  Output rows are bounded by match count, not input size —
    a flat_map that usually SHRINKS the data."""

    def __init__(
        self, pattern: str, text_col: str = "text", id_col: str = "doc_id"
    ):
        self.text_col = text_col
        self.id_col = id_col
        self.rx = re.compile(pattern)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        ids = batch.column(self.id_col)
        out_ids, out_terms, out_idx = [], [], []
        for i, t in enumerate(texts):
            ms = self.rx.findall(t or "")
            if not ms:
                continue
            out_ids.extend([ids[i].as_py()] * len(ms))
            out_terms.extend(ms)
            out_idx.extend(range(1, len(ms) + 1))
        return pa.table(
            {
                self.id_col: pa.array(out_ids, batch.schema.field(self.id_col).type),
                "term": pa.array(out_terms, pa.string()),
                "idx": pa.array(out_idx, pa.int64()),
            }
        )


class TermCounter:
    """Term-frequency explode: one (doc_id, token, tf) row per distinct
    token per document — the TF side of TF-IDF.  Join against the
    document-frequency aggregate (``groupby(token).count()`` over these
    rows, vocab-bounded) for full doc-term scoring; both sides stay
    distributed (Dataset.join on token), no driver materialization."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        # fully vectorized: regex split on ASCII-whitespace runs (same
        # token definition as TokenCounter: [^ \t\n\r\f\v]+), flatten to a
        # (doc, token) stream, then group-count via dictionary-encode +
        # lexsort + run boundaries — no Python per row or per token
        texts = batch.column(self.text_col).combine_chunks()
        parts = pc.split_pattern_regex(texts, pattern="[ \t\n\r\f\v]+")
        flat = pc.list_flatten(parts)
        par = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        nonempty = pc.not_equal(flat, pa.scalar("", pa.string()))
        keep = nonempty.to_numpy(zero_copy_only=False)
        if not keep.all():
            idx = np.flatnonzero(keep)
            flat = flat.take(pa.array(idx))
            par = par[idx]
        if len(flat) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "token": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        enc = pc.dictionary_encode(flat)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((codes, par))
        par_s, codes_s = par[order], codes[order]
        boundary = np.concatenate(
            ([True], (par_s[1:] != par_s[:-1]) | (codes_s[1:] != codes_s[:-1]))
        )
        starts = np.flatnonzero(boundary)
        tf = np.diff(np.append(starts, len(par_s)))
        ids = batch.column(self.id_col).take(pa.array(par_s[starts]))
        return pa.table(
            {
                "doc_id": ids.cast(pa.int64()),
                "token": enc.dictionary.take(pa.array(codes_s[starts])),
                "tf": pa.array(tf.astype(np.int64), pa.int64()),
            }
        )


class Chunker:
    """Context-window chunking: split each document into fixed-size
    character windows with overlap — (doc_id, chunk_id, chunk) rows.

    ``window`` chars per chunk, ``stride`` chars between chunk starts
    (overlap = window - stride).  Chunk i covers codepoints
    [i*stride, i*stride + window); a doc of length L emits
    floor((L-1)/stride) + 1 chunks (empty/null docs emit none) —
    exactly DuckDB ``substr(text, i*stride+1, window)`` over
    ``generate_series(0, floor((len-1)/stride))``.

    Vectorized by CHUNK INDEX, not by row: iteration k filters the docs
    long enough to own a k-th chunk and slices them with one scalar
    ``utf8_slice_codeunits`` kernel call — the loop count is bounded by
    the longest doc / stride, never by batch size."""

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        window: int = 500,
        stride: int = 400,
    ):
        assert 0 < stride <= window
        self.text_col = text_col
        self.id_col = id_col
        self.window = window
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).combine_chunks()
        ids = batch.column(self.id_col)
        lens = pc.utf8_length(texts)
        out_ids, out_cid, out_chunk = [], [], []
        k = 0
        while True:
            start = k * self.stride
            alive = pc.fill_null(pc.greater(lens, start), False)
            n_alive = pc.sum(alive).as_py() or 0
            if n_alive == 0:
                break
            sub_t = texts.filter(alive)
            out_ids.append(ids.filter(alive))
            out_cid.append(pa.array(np.full(n_alive, k, np.int64)))
            out_chunk.append(
                pc.utf8_slice_codeunits(sub_t, start=start, stop=start + self.window)
            )
            k += 1
        if not out_ids:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "chunk_id": pa.array([], pa.int64()),
                    "chunk": pa.array([], pa.string()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_ids]
                ).cast(pa.int64()),
                "chunk_id": pa.concat_arrays(out_cid),
                "chunk": pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_chunk]
                ),
            }
        )


class BigramCounter:
    """Per-document bigram frequencies — (doc_id, bigram, n) rows, the
    n-gram LM / collocation-stats building block.  Fully vectorized:
    tokens from one regex split (ASCII-whitespace runs, the repo-wide
    token class), adjacent pairs joined with one
    ``binary_join_element_wise`` kernel masked to same-document
    positions, then the TermCounter dictionary/lexsort group count."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "bigram": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        texts = batch.column(self.text_col).combine_chunks()
        parts = pc.split_pattern_regex(texts, pattern="[ \t\n\r\f\v]+")
        flat = pc.list_flatten(parts)
        par = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, pa.scalar("", pa.string())).to_numpy(
            zero_copy_only=False
        )
        if not keep.all():
            idx = np.flatnonzero(keep)
            flat = flat.take(pa.array(idx))
            par = par[idx]
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        n = len(flat)
        if n < 2:
            return empty
        # adjacent positions within the same document
        pair_ok = par[1:] == par[:-1]
        if not pair_ok.any():
            return empty
        bigrams = pc.binary_join_element_wise(
            flat.slice(0, n - 1), flat.slice(1, n), " "
        )
        idx = np.flatnonzero(pair_ok)
        bigrams = bigrams.take(pa.array(idx))
        bpar = par[idx]
        enc = pc.dictionary_encode(
            bigrams.combine_chunks() if isinstance(bigrams, pa.ChunkedArray) else bigrams
        )
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((codes, bpar))
        par_s, codes_s = bpar[order], codes[order]
        boundary = np.concatenate(
            ([True], (par_s[1:] != par_s[:-1]) | (codes_s[1:] != codes_s[:-1]))
        )
        starts = np.flatnonzero(boundary)
        cnt = np.diff(np.append(starts, len(par_s)))
        ids = batch.column(self.id_col).take(pa.array(par_s[starts]))
        return pa.table(
            {
                "doc_id": ids.cast(pa.int64()),
                "bigram": enc.dictionary.take(pa.array(codes_s[starts])),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )


def doc_ngrams(batch: pa.Table, n: int, text_col: str = "text",
               id_col: str = "doc_id", distinct: bool = True) -> pa.Table:
    """(doc_id, gram) rows: space-joined token n-grams per document,
    vectorized — tokens from one regex split, each gram one
    ``binary_join_element_wise`` over n shifted views masked to
    same-document windows; per-doc distinct via the dictionary/lexsort
    trick.  The building block for contamination checks and n-gram LM
    stats."""
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "gram": pa.array([], pa.string())}
    )
    texts = batch.column(text_col).combine_chunks()
    parts = pc.split_pattern_regex(texts, pattern="[ \t\n\r\f\v]+")
    flat = pc.list_flatten(parts)
    par = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, pa.scalar("", pa.string())).to_numpy(
        zero_copy_only=False
    )
    if not keep.all():
        idx = np.flatnonzero(keep)
        flat = flat.take(pa.array(idx))
        par = par[idx]
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    total = len(flat)
    if total < n:
        return empty
    ok = par[n - 1:] == par[: total - n + 1]  # window stays in one doc
    if not ok.any():
        return empty
    views = [flat.slice(i, total - n + 1) for i in range(n)]
    grams = views[0]
    for v in views[1:]:
        grams = pc.binary_join_element_wise(grams, v, " ")
    idx = np.flatnonzero(ok)
    grams = grams.take(pa.array(idx))
    gpar = par[idx]
    if isinstance(grams, pa.ChunkedArray):
        grams = grams.combine_chunks()
    if distinct:
        enc = pc.dictionary_encode(grams)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((codes, gpar))
        ps, cs = gpar[order], codes[order]
        heads = np.flatnonzero(
            np.concatenate(([True], (ps[1:] != ps[:-1]) | (cs[1:] != cs[:-1])))
        )
        gpar = ps[heads]
        grams = enc.dictionary.take(pa.array(cs[heads]))
    ids = batch.column(id_col).take(pa.array(gpar))
    return pa.table({"doc_id": ids.cast(pa.int64()), "gram": grams})


class CharLMScorer:
    """Character-bigram language-model scorer — the train-then-score
    quality-model shape (a CCNet/KenLM-style perplexity filter reduced
    to its distributable core).

    CONTRACT: the model is defined over UTF-8 BYTES (that is what keeps
    the table at 256x256 = 512 KB; a codepoint table would be unbounded)
    — so byte bigrams equal character bigrams only on ASCII text.  A SQL
    oracle written with per-character substr pairs agrees with this
    scorer iff the corpus is ASCII; on multibyte text the byte model is
    still well-defined (and arguably better for LM filtering), it just
    is not the per-character statistic.  The repo's doc fixtures are
    ASCII, which the oracle comparison relies on.

    TRAIN: :func:`charlm_counts` aggregates the corpus's 256x256 byte
    bigram counts as per-batch numpy bincount partials (one tiny
    all-reduce; the model is 512 KB of int64).  SCORE: this actor-pool
    callable holds the broadcast log-prob table (Laplace-smoothed
    conditional P(b2 | b1)) and scores each document as the sum of byte
    bigram log-probs — one ``np.add.reduceat`` per batch, no Python per
    row.  Scores are emitted as floor-micro-nats int64 (the suite's
    cross-engine determinism rule)."""

    def __init__(
        self,
        logp_ref,
        id_col: str = "doc_id",
        text_col: str = "text",
        keep_cols: tuple = (),
    ):
        self.__name__ = "CharLMScorer"
        import ray as _ray

        self.logp = _ray.get(logp_ref)  # (256, 256) float64
        self.id_col = id_col
        self.text_col = text_col
        self.keep_cols = tuple(keep_cols)  # passthrough label columns

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        blob = b"".join(t.encode() if t else b"" for t in texts)
        lens = np.fromiter(
            (len(t.encode()) if t else 0 for t in texts), np.int64, len(texts)
        )
        a = np.frombuffer(blob, np.uint8)
        n = len(a)
        scores = np.zeros(len(texts), np.float64)
        if n >= 2:
            lp = self.logp[a[:-1], a[1:]]  # per adjacent byte pair
            ends = np.cumsum(lens)
            starts = ends - lens
            # zero out pairs that straddle document boundaries
            cross = np.zeros(n - 1, bool)
            for e in ends[:-1]:
                if 0 < e < n:
                    cross[e - 1] = True
            lp = np.where(cross, 0.0, lp)
            valid = lens >= 2
            seg_starts = np.clip(starts, 0, max(n - 1, 0))
            sums = np.add.reduceat(lp, seg_starts[valid]) if valid.any() else []
            # reduceat sums to the next start; the zeroed boundary pairs
            # make each segment's sum exactly its in-doc bigrams
            scores[valid] = sums
        out = np.floor(scores * 1e6).astype(np.int64)
        npairs = np.maximum(lens - 1, 0)
        cols = {
            self.id_col: batch.column(self.id_col),
            "n_pairs": pa.array(npairs, pa.int64()),
            "lm_score_unats": pa.array(out, pa.int64()),
        }
        for c in self.keep_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)


def charlm_counts(ds, text_col: str = "text") -> np.ndarray:
    """Corpus byte-bigram count matrix (256x256 int64) via per-batch
    bincount partials — the 'training' all-reduce.  Cross-document
    pairs are excluded, so counts equal the per-document definition the
    SQL oracle uses."""

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        cnt = np.zeros(65536, np.int64)
        blob = b"".join(t.encode() if t else b"" for t in texts)
        lens = np.fromiter(
            (len(t.encode()) if t else 0 for t in texts), np.int64, len(texts)
        )
        a = np.frombuffer(blob, np.uint8)
        if len(a) >= 2:
            pairs = a[:-1].astype(np.int32) * 256 + a[1:]
            ends = np.cumsum(lens)
            keep = np.ones(len(a) - 1, bool)
            for e in ends[:-1]:
                if 0 < e < len(a):
                    keep[e - 1] = False
            cnt += np.bincount(pairs[keep], minlength=65536)
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {
                "cell": pa.array(nz.astype(np.int64), pa.int64()),
                "n": pa.array(cnt[nz], pa.int64()),
            }
        )

    total = np.zeros(65536, np.int64)
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        total[r["cell"]] += r["n"]
    return total.reshape(256, 256)


def charlm_logp(counts: np.ndarray, alpha: float = 1.0) -> np.ndarray:
    """Laplace-smoothed conditional log P(b2|b1):
    ln((c + alpha) / (row_total + 256*alpha))."""
    row = counts.sum(axis=1, keepdims=True).astype(np.float64)
    return np.log((counts + alpha) / (row + 256.0 * alpha))


class GopherQuality:
    """Gopher-style document quality gate (Rae et al. 2021, public
    "Scaling Language Models" filtering rules), in integer-exact form so
    the gate is SQL-hash-checkable:

    * ``n_words``      — count of ASCII-whitespace token runs
    * ``sum_word_len`` — total codepoints across those tokens
    * ``stop_hits``    — tokens (lowercased) in the English stopword set
    * ``keep``         — 1 iff 50 <= n_words <= 100_000
                         AND 3*n_words <= sum_word_len <= 10*n_words
                         (mean word length in [3, 10] without a float
                         division — cross-multiplied, so no rounding)
                         AND stop_hits >= 2

    Fully vectorized: one regex split per batch, flattened token stream
    with parent indices, per-doc sums via np.bincount.  Reference
    analogue: per-record quality/validity gates in the mapper chain
    (`src/pipeline/etl/avax/*_etl.py` filter steps)."""

    MIN_WORDS, MAX_WORDS = 50, 100_000
    MIN_MEAN, MAX_MEAN = 3, 10  # integer cross-multiply bounds
    MIN_STOP = 2

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        min_words: int | None = None,
        max_words: int | None = None,
        min_stop: int | None = None,
    ):
        self.text_col = text_col
        self.id_col = id_col
        # per-instance thresholds (class constants are the published
        # Gopher values; web-lake callers gate smaller pages)
        self.MIN_WORDS = self.MIN_WORDS if min_words is None else min_words
        self.MAX_WORDS = self.MAX_WORDS if max_words is None else max_words
        self.MIN_STOP = self.MIN_STOP if min_stop is None else min_stop
        self.stop_en = pa.array(sorted(_STOPWORDS["en"]), pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        texts = batch.column(self.text_col).combine_chunks()
        parts = pc.split_pattern_regex(texts, pattern="[ \t\n\r\f\v]+")
        flat = pc.list_flatten(parts)
        par = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        keep_tok = pc.not_equal(flat, pa.scalar("", pa.string()))
        keep_np = keep_tok.to_numpy(zero_copy_only=False)
        if not keep_np.all():
            idx = np.flatnonzero(keep_np)
            flat = flat.take(pa.array(idx))
            par = par[idx]
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        n_words = np.bincount(par, minlength=n).astype(np.int64)
        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        sum_len = np.bincount(par, weights=tok_len, minlength=n).astype(np.int64)
        is_stop = pc.is_in(
            pc.utf8_lower(flat), value_set=self.stop_en
        ).to_numpy(zero_copy_only=False)
        stop_hits = np.bincount(par, weights=is_stop, minlength=n).astype(np.int64)
        keep = (
            (n_words >= self.MIN_WORDS)
            & (n_words <= self.MAX_WORDS)
            & (self.MIN_MEAN * n_words <= sum_len)
            & (sum_len <= self.MAX_MEAN * n_words)
            & (stop_hits >= self.MIN_STOP)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column(self.id_col),
                "n_words": pa.array(n_words),
                "sum_word_len": pa.array(sum_len),
                "stop_hits": pa.array(stop_hits),
                "keep": pa.array(keep),
            }
        )


def flatten_tokens(texts):
    """Vectorized corpus flatten: whitespace-split a string column and
    return (flat_tokens, parent_row_indices, positions) where positions
    number the NON-EMPTY tokens 0.. within each row — exactly the
    ordinals SQL's unnest(regexp_extract_all(text, '\\S+')) produces
    (regexp matches never include empties).  One split kernel + offset
    arithmetic; no Python loop."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    parts = pc.split_pattern_regex(texts, pattern="[ \t\n\r\f\v]+")
    flat = pc.list_flatten(parts)
    par = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, pa.scalar("", pa.string()))
    idx = np.flatnonzero(keep.to_numpy(zero_copy_only=False))
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    flat = flat.take(pa.array(idx))
    par = par[idx]
    # renumber positions over the surviving tokens per row: global index
    # minus the index of each row's first survivor
    n = len(par)
    if n == 0:
        return flat, par, np.array([], np.int64)
    starts = np.flatnonzero(np.concatenate(([True], par[1:] != par[:-1])))
    pos = np.arange(n, dtype=np.int64) - np.repeat(
        np.arange(n, dtype=np.int64)[starts], np.diff(np.append(starts, n))
    )
    return flat, par, pos


def md5_bucket(flat, n_buckets: int) -> np.ndarray:
    """SQL-replicable token bucketing: ``int(md5(token)[:8], 16) %
    n_buckets`` per element — the same digest prefix DuckDB's ``md5()``
    emits (oracle expression ``CAST(concat('0x', substr(md5(tok),1,8))
    AS BIGINT) % n``).  Hashes once per DISTINCT value in the batch
    (dictionary-encode first) then scatters through the indices; the
    per-distinct python loop is the md5 cost floor — there is no
    vectorized md5 kernel — and distinct tokens per batch are bounded
    by vocabulary, not corpus."""
    import hashlib

    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    d = pc.dictionary_encode(flat)
    uniq = d.dictionary.to_pylist()
    bu = np.fromiter(
        (
            int(hashlib.md5(u.encode()).hexdigest()[:8], 16) % n_buckets
            for u in uniq
        ),
        np.int64,
        len(uniq),
    )
    return bu[d.indices.to_numpy(zero_copy_only=False)]
