"""Distributed BPE (byte-pair-encoding) tokenizer TRAINING.

The reference pipeline ships raw text toward model training
(`/root/reference/src/pipeline/transforms/text_extract.py` ends at
clean text); the missing step every LLM data pipeline runs next is
learning the tokenizer itself (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units").  The classic trainer is
a single-process dict loop; this is the Ray-Data-native shape:

1. **Word-type compression** (one pass over the corpus): whitespace
   tokens -> distributed ``groupby(word).count()``.  Every later
   iteration runs over word TYPES weighted by counts — vocabulary-
   bounded, not corpus-bounded.  This is the standard trainer trick and
   the entire reason BPE training scales: 100 TB of text is ~10^8 word
   types, a ~GB table that Ray keeps sharded.
2. **Per merge iteration** (``n_merges`` rounds): broadcast the learned
   merge list (``ray.put`` once per round, bytes not megabytes), re-
   segment each word type by replaying the merges in learned order
   (exhaustive left-to-right per merge — the deterministic textbook
   rule), emit per-batch PARTIAL adjacent-pair counts (pre-combined in
   a dict, so the shuffle moves O(distinct pairs per batch), never the
   words), ``groupby(pair).sum``, then a per-batch argmax partial so
   only <=#blocks candidate rows reach the driver for the final
   tie-broken pick (count desc, then lexicographic pair asc).

The per-word segmentation replay is a Python loop over word TYPES —
bounded by vocabulary, weighted by counts, exactly like every published
trainer; the corpus-bounded passes (tokenize + count) stay vectorized.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def word_counts(ds, text_col: str = "text"):
    """Distributed (word, n) table over whitespace tokens of ``ds``."""
    from ray.data.aggregate import Sum

    from .text import flatten_tokens

    def partial(t: pa.Table) -> pa.Table:
        flat, _, _ = flatten_tokens(t.column(text_col))
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        import pyarrow.compute as pc

        d = pc.dictionary_encode(flat)
        idx = d.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(idx, minlength=len(d.dictionary)).astype(np.int64)
        return pa.table({"word": d.dictionary, "n": pa.array(cnt)})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
    )


def _segment(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Deterministic BPE apply: repeatedly merge the present pair with
    the LOWEST learned rank, leftmost first — the textbook rule shared
    with the plain-python reference in tests."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class _PairCounts:
    """Actor-pool stage: per-batch adjacent-pair partial counts over
    word types, current merge table fetched ONCE per actor."""

    def __init__(self, ranks_ref):
        self.__name__ = "_PairCounts"
        self.ranks = ray.get(ranks_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        acc: dict[tuple[str, str], int] = {}
        words = t.column("word").to_pylist()
        ns = t.column("n").to_numpy(zero_copy_only=False)
        for w, n in zip(words, ns):
            syms = _segment(w, self.ranks)
            n = int(n)
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                acc[p] = acc.get(p, 0) + n
        if not acc:
            return pa.table(
                {
                    "left": pa.array([], pa.string()),
                    "right": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        ls, rs = zip(*acc)
        return pa.table(
            {
                "left": pa.array(list(ls), pa.string()),
                "right": pa.array(list(rs), pa.string()),
                "n": pa.array(list(acc.values()), pa.int64()),
            }
        )


def _best_partial(t: pa.Table) -> pa.Table:
    """Per-block argmax candidate (count desc, pair asc) — only one row
    per block survives to the driver."""
    if t.num_rows == 0:
        return t
    n = t.column("n").to_numpy(zero_copy_only=False)
    mx = n.max()
    cand = t.filter(pa.array(n == mx))
    keys = list(
        zip(cand.column("left").to_pylist(), cand.column("right").to_pylist())
    )
    best = min(range(len(keys)), key=keys.__getitem__)
    return cand.slice(best, 1)


def bpe_train(ds, n_merges: int, text_col: str = "text") -> pa.Table:
    """Learn ``n_merges`` BPE merges over ``ds[text_col]``.

    Returns a small Arrow table (rank, left, right, n) — the merge
    table, in learned order.  Only O(n_merges x blocks) candidate rows
    ever reach the driver; word types stay sharded throughout.
    """
    from ray.data.aggregate import Sum

    words = word_counts(ds, text_col).materialize()
    merges: list[tuple[str, str, int]] = []
    ranks: dict[tuple[str, str], int] = {}
    for k in range(n_merges):
        ranks_ref = ray.put(ranks)
        cands = (
            words.map_batches(
                _PairCounts,
                fn_constructor_args=(ranks_ref,),
                batch_format="pyarrow",
                concurrency=(1, 8),
            )
            .groupby(["left", "right"])
            .aggregate(Sum("n", alias_name="n"))
            .map_batches(_best_partial, batch_format="pyarrow")
            .take_all()
        )
        if not cands:
            break
        best = min(cands, key=lambda r: (-int(r["n"]), r["left"], r["right"]))
        pair = (best["left"], best["right"])
        merges.append((pair[0], pair[1], int(best["n"])))
        ranks = dict(ranks)
        ranks[pair] = k
    return pa.table(
        {
            "rank": pa.array(range(len(merges)), pa.int64()),
            "left": pa.array([m[0] for m in merges], pa.string()),
            "right": pa.array([m[1] for m in merges], pa.string()),
            "n": pa.array([m[2] for m in merges], pa.int64()),
        }
    )


def bpe_segment_counts(ds, merges: pa.Table, text_col: str = "text"):
    """Encode: per-document piece count under a learned merge table —
    the cheap proof that the merge table round-trips through encoding.
    Output (doc_id, n_pieces); broadcast merge table, actor pool."""
    ranks = {
        (l, r): int(k)
        for k, l, r in zip(
            merges.column("rank").to_pylist(),
            merges.column("left").to_pylist(),
            merges.column("right").to_pylist(),
        )
    }
    ranks_ref = ray.put(ranks)

    class _Enc:
        def __init__(self, ref):
            self.__name__ = "_Enc"
            self.ranks = ray.get(ref)
            self.cache: dict[str, int] = {}

        def __call__(self, t: pa.Table) -> pa.Table:
            from .text import flatten_tokens

            flat, par, _ = flatten_tokens(t.column(text_col))
            words = (
                flat.combine_chunks()
                if isinstance(flat, pa.ChunkedArray)
                else flat
            ).to_pylist()
            out = np.zeros(t.num_rows, np.int64)
            for w, d in zip(words, par):
                c = self.cache.get(w)
                if c is None:
                    c = len(_segment(w, self.ranks))
                    if len(self.cache) < 1_000_000:
                        self.cache[w] = c
                out[d] += c
            return pa.table(
                {"doc_id": t.column("doc_id"), "n_pieces": pa.array(out)}
            )

    return ds.map_batches(
        _Enc,
        fn_constructor_args=(ranks_ref,),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
