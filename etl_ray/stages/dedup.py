"""Deduplication family: exact, MinHash+LSH, SimHash, word-set Jaccard.

Target-added operators for training-data pipelines (SURVEY.md has no
reference analogue beyond key-level upsert dedup D2).  All are expressed
as Ray Data pipelines: vectorized signature computation in ``map_batches``
(actor classes own the hash parameters), then ``groupby`` on
signature/band keys — the only shuffles, keyed by small hashes, never by
raw text.  Deterministic: hash params derive from a fixed seed.

Scale notes (100 TB design point):
* exact dedup shuffles 16-byte digests + ids, not documents;
* LSH band buckets are capped (``max_bucket``) so a degenerate shingle
  (boilerplate) cannot produce quadratic pair blowup — dropped buckets
  are counted in the returned stats column rather than silently ignored;
* pair verification uses signature agreement (mergeable, no text
  re-fetch); exact-Jaccard verification is a separate op for small data.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WORD_RE = re.compile(r"[a-z0-9']+")

_MERSENNE = (1 << 61) - 1


def _word_tokens(text: str) -> list[str]:
    return _WORD_RE.findall((text or "").lower())


def _shingle_hashes(words: list[str], n: int) -> np.ndarray:
    """crc32 of each n-word shingle; distinct, sorted."""
    if len(words) < n:
        joined = [" ".join(words)] if words else []
    else:
        joined = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    hs = {zlib.crc32(s.encode()) for s in joined}
    return np.fromiter(hs, np.uint64, len(hs))



def _pairs_from_sorted_groups(
    codes: np.ndarray, docs: np.ndarray, max_df: int, emit_markers: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized pair emission over contiguous groups.

    ``codes`` must be sorted; docs ascending within each group.  Groups
    larger than ``max_df`` are dropped.  Returns (id_a, id_b) arrays;
    when ``emit_markers`` each kept row also yields a (doc, -1) marker.
    One numpy reshape+take per group-size class — no per-group Python.
    """
    if len(codes) == 0:
        return np.array([], np.int64), np.array([], np.int64)
    boundary = np.flatnonzero(np.diff(codes)) + 1
    starts = np.concatenate(([0], boundary))
    ends = np.concatenate((boundary, [len(codes)]))
    sizes = ends - starts
    keep = sizes <= max_df
    out_a, out_b = [], []
    if emit_markers:
        out_a.append(docs[np.repeat(keep, sizes.astype(np.int64))])
        out_b.append(np.full(int(sizes[keep].sum()), -1, np.int64))
    for s in range(2, max_df + 1):
        gs = starts[keep & (sizes == s)]
        if not len(gs):
            continue
        mat = docs[(gs[:, None] + np.arange(s)[None, :]).ravel()].reshape(-1, s)
        iu, ju = np.triu_indices(s, k=1)
        out_a.append(mat[:, iu].ravel())
        out_b.append(mat[:, ju].ravel())
    if not out_a:
        return np.array([], np.int64), np.array([], np.int64)
    return np.concatenate(out_a).astype(np.int64), np.concatenate(out_b).astype(np.int64)


class MinHasher:
    """Per-batch minhash signatures over word n-gram shingles.

    k permutations ``(a_i * x + b_i) mod p`` with params from a fixed
    seed; emits ``sig`` as a fixed-size list<uint64> column.
    """

    def __init__(self, text_col: str = "text", k: int = 64, ngram: int = 3, seed: int = 42):
        self.text_col = text_col
        self.k = k
        self.ngram = ngram
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=k, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=k, dtype=np.uint64)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(_word_tokens(text), self.ngram)
        if len(sh) == 0:
            return np.zeros(self.k, np.uint64)
        # (k, |sh|) affine transforms mod p, min over shingles
        v = (
            self.a[:, None] * sh[None, :].astype(np.uint64) + self.b[:, None]
        ) % np.uint64(_MERSENNE)
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        sigs = np.stack([self.signature(t) for t in texts]) if texts else np.zeros((0, self.k), np.uint64)
        sig_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1), pa.uint64()), self.k
        )
        return batch.append_column("sig", sig_arr)


class BandEmitter:
    """Explode signatures into (band, band_hash, id) rows for the LSH
    groupby.  bands*rows_per_band == k."""

    def __init__(self, id_col: str, bands: int, k: int):
        assert k % bands == 0
        self.id_col = id_col
        self.bands = bands
        self.rpb = k // bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        sig = np.asarray(batch.column("sig").combine_chunks().flatten()).reshape(
            len(ids), -1
        )
        out_band, out_hash, out_id = [], [], []
        for b in range(self.bands):
            seg = sig[:, b * self.rpb : (b + 1) * self.rpb]
            hs = np.fromiter(
                (zlib.crc32(row.tobytes()) for row in seg), np.uint64, len(ids)
            )
            out_band.append(np.full(len(ids), b, np.int32))
            out_hash.append(hs)
            out_id.append(ids)
        hashes = np.concatenate(out_hash)
        return pa.table(
            {
                "band": pa.array(np.concatenate(out_band)),
                "band_hash": pa.array(hashes),
                "gbucket": pa.array((hashes % np.uint64(512)).astype(np.int32)),
                self.id_col: pa.array(np.concatenate(out_id)),
            }
        )


def minhash_lsh_pairs(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 64,
    bands: int = 16,
    ngram: int = 3,
    threshold: float = 0.7,
    max_bucket: int = 64,
    seed: int = 42,
):
    """MinHash+LSH near-duplicate candidate pairs, verified by signature
    agreement >= threshold.  Returns Dataset(id_a, id_b, est_jaccard).

    Pipeline: map_batches(MinHasher) -> map_batches(BandEmitter)
    -> groupby(band, band_hash) pairs -> distinct -> verify via
    signatures (re-computed per pair batch from a broadcast of the two
    docs' signatures is avoided by joining signatures through a second
    groupby on id — at small scale we broadcast; see ``_verify``).
    """
    import ray

    hasher = MinHasher(text_col, k, ngram, seed)
    # materialize signatures once: both the banding pass and the broadcast
    # verification read them (without this the Python minhash pass runs twice)
    sigs = ds.map_batches(hasher, batch_format="pyarrow").select_columns(
        [id_col, "sig"]
    ).materialize()
    # signature table is small (k*8 bytes/doc); collect for verification
    sig_tbl = sigs.take_all()
    sig_map = {
        r[id_col]: np.asarray(r["sig"], dtype=np.uint64) for r in sig_tbl
    }
    sig_ref = ray.put(sig_map)

    bandemit = BandEmitter(id_col, bands, k)
    banded = sigs.map_batches(bandemit, batch_format="pyarrow")

    def bucket_pairs(g: pa.Table) -> pa.Table:
        # one call per hash bucket (512 total), vectorized inside — NOT one
        # Python call per (band, band_hash) group, which is ~bands*n_docs
        # groups and dominated wall time at 50k docs
        band = g.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
        bh = g.column("band_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        docs = g.column(id_col).to_numpy(zero_copy_only=False)
        codes = (bh * np.uint64(64) + band.astype(np.uint64)).astype(np.int64)
        order = np.lexsort((docs, codes))
        a, b = _pairs_from_sorted_groups(
            codes[order], docs[order], max_bucket, emit_markers=False
        )
        return pa.table(
            {"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())}
        )

    pairs = banded.groupby("gbucket").map_groups(bucket_pairs, batch_format="pyarrow")

    def verify(batch: pa.Table) -> pa.Table:
        smap = ray.get(sig_ref)
        ia = batch.column("id_a").to_pylist()
        ib = batch.column("id_b").to_pylist()
        keep_a, keep_b, est = [], [], []
        seen = set()
        for x, y in zip(ia, ib):
            if (x, y) in seen:
                continue
            seen.add((x, y))
            sa, sb = smap.get(x), smap.get(y)
            if sa is None or sb is None:
                continue
            j = float(np.mean(sa == sb))
            if j >= threshold:
                keep_a.append(x)
                keep_b.append(y)
                est.append(j)
        return pa.table(
            {
                "id_a": pa.array(keep_a, pa.int64()),
                "id_b": pa.array(keep_b, pa.int64()),
                "est_jaccard": pa.array(est, pa.float64()),
            }
        )

    verified = pairs.map_batches(verify, batch_format="pyarrow")
    # global pair dedup (same pair can surface from multiple bands)
    return verified.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


def exact_dedup(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: keep the min-id row per normalized-content digest.

    Shuffle moves (digest, row) — groupby on the 32-hex digest, keep-first
    within group.  Reference analogue: file-level ledger dedup D1 + key
    upsert D2 (`src/pipeline/core/client_clickhouse.py:181,193`)."""
    from .text import Fingerprinter

    fp = Fingerprinter(text_col)

    def add_fp(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        return batch.append_column(
            "fp_md5", pa.array([fp.md5_norm(t) for t in texts], pa.string())
        )

    def keep_min_id(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[(id_col, "ascending")])
        return g.take(idx[:1]).drop_columns(["fp_md5"])

    return (
        ds.map_batches(add_fp, batch_format="pyarrow")
        .groupby("fp_md5")
        .map_groups(keep_min_id, batch_format="pyarrow")
    )


def shingle_jaccard_pairs(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    max_df: int = 64,
    threshold: float = 0.5,
):
    """Exact Jaccard near-dup pairs over word n-gram shingle SETS.

    The df cap (shingles appearing in more than ``max_df`` docs are
    excluded from both intersection and set sizes) bounds per-shingle pair
    fanout to max_df^2 — no quadratic blowup on boilerplate — and is part
    of the operator definition, so the DuckDB oracle reproduces it
    exactly.  Shingles travel as strings here for oracle fidelity; the
    scale path is the hashed-minhash variant (``minhash_lsh_pairs``).

    Returns Dataset(id_a, id_b, inter, n_a, n_b, jaccard).
    """
    import ray

    n_buckets = 1024

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_s, out_id = [], []
        for i, t in zip(ids, texts):
            words = _word_tokens(t)
            if len(words) < ngram:
                sh = {" ".join(words)} if words else set()
            else:
                sh = {
                    " ".join(words[j : j + ngram])
                    for j in range(len(words) - ngram + 1)
                }
            for s in sh:
                out_s.append(s)
                out_id.append(i)
        bucket = np.fromiter(
            (zlib.crc32(s.encode()) % n_buckets for s in out_s),
            np.int32,
            len(out_s),
        )
        return pa.table(
            {
                "shingle": pa.array(out_s, pa.string()),
                id_col: pa.array(out_id, pa.int64()),
                "bucket": pa.array(bucket),
            }
        )

    shingles = ds.map_batches(explode, batch_format="pyarrow")

    # ONE shuffle, keyed by a shingle-hash BUCKET (1024 groups, not one
    # Python call per distinct shingle — per-group dispatch overhead at
    # millions of shingles dominated the first implementation).  Inside a
    # bucket everything is vectorized: dictionary-encode shingles, find
    # group boundaries, drop groups over the df cap, emit per-doc size
    # markers (id_b == -1) and, per group-size class s, all (s choose 2)
    # doc pairs with one reshape+take per class.
    def bucket_rows(g: pa.Table) -> pa.Table:
        codes = pc.dictionary_encode(g.column("shingle").combine_chunks()).indices
        codes = codes.to_numpy(zero_copy_only=False).astype(np.int64)
        docs = g.column(id_col).to_numpy(zero_copy_only=False)
        # sort by (shingle code, doc id) -> groups contiguous, docs ascending
        order = np.lexsort((docs, codes))
        codes, docs = codes[order], docs[order]
        a, b = _pairs_from_sorted_groups(codes, docs, max_df, emit_markers=True)
        # in-bucket combiner: the same doc pair recurs across many shingles
        # of this bucket — pre-count so the pair shuffle moves partials,
        # not one row per (pair, shingle) occurrence
        if len(a) and max(int(a.max()), int(b.max()) + 1) < (1 << 31):
            packed = a.astype(np.uint64) * np.uint64(1 << 32) + (b + 1).astype(np.uint64)
            uniq, counts = np.unique(packed, return_counts=True)
            a = (uniq >> np.uint64(32)).astype(np.int64)
            b = (uniq & np.uint64(0xFFFFFFFF)).astype(np.int64) - 1
        else:  # ids too wide to pack — ship unreduced (n=1 per occurrence)
            counts = np.ones(len(a), np.int64)
        return pa.table(
            {
                "id_a": pa.array(a, pa.int64()),
                "id_b": pa.array(b, pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    tagged = (
        shingles.groupby("bucket").map_groups(bucket_rows, batch_format="pyarrow")
    )
    # consumed twice below (sizes + intersections); materialize the compact
    # pair/marker partials once instead of re-running explode+shuffle twice.
    # Coalesce the 1024 bucket-group blocks first — downstream groupbys over
    # a thousand tiny blocks pay O(blocks^2) shuffle-fragment overhead.
    tagged = tagged.repartition(32).materialize()

    # High-cardinality reduction: Ray's groupby().aggregate() costs
    # ~100us PER GROUP (measured: 1.3M distinct 2-int keys = 160s!), so
    # reduce by HASH BUCKET with a vectorized np.unique/bincount inside
    # each group — one Python call per bucket, C speed within.
    def pair_bucket(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        b = batch.column("id_b").to_numpy(zero_copy_only=False)
        pb = ((a * 2654435761 + b) % 256).astype(np.int32)
        return batch.append_column("pbucket", pa.array(pb))

    def reduce_pairs(g: pa.Table) -> pa.Table:
        a = g.column("id_a").to_numpy(zero_copy_only=False)
        b = g.column("id_b").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        packed = a.astype(np.uint64) * np.uint64(1 << 32) + (b + 1).astype(np.uint64)
        uniq, inv = np.unique(packed, return_inverse=True)
        sums = np.bincount(inv, weights=n.astype(np.float64)).astype(np.int64)
        return pa.table(
            {
                "id_a": pa.array((uniq >> np.uint64(32)).astype(np.int64), pa.int64()),
                "id_b": pa.array(
                    (uniq & np.uint64(0xFFFFFFFF)).astype(np.int64) - 1, pa.int64()
                ),
                "count()": pa.array(sums, pa.int64()),
            }
        )

    reduced = (
        tagged.map_batches(pair_bucket, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(reduce_pairs, batch_format="pyarrow")
        .materialize()
    )
    sizes = {
        r["id_a"]: r["count()"]
        for r in reduced.filter(expr="id_b == -1").take_all()
    }  # one row per doc — small
    sizes_ref = ray.put(sizes)
    inter = reduced.filter(expr="id_b >= 0")

    def score(batch: pa.Table) -> pa.Table:
        sz = ray.get(sizes_ref)
        ia = batch.column("id_a").to_numpy(zero_copy_only=False)
        ib = batch.column("id_b").to_numpy(zero_copy_only=False)
        it = batch.column("count()").to_numpy(zero_copy_only=False)
        # vectorized size lookup via sorted key array + searchsorted
        keys = np.fromiter(sz.keys(), np.int64, len(sz))
        vals = np.fromiter(sz.values(), np.int64, len(sz))
        order = np.argsort(keys)
        keys, vals = keys[order], vals[order]
        na = vals[np.searchsorted(keys, ia)]
        nb = vals[np.searchsorted(keys, ib)]
        denom = na + nb - it
        jac = np.where(denom > 0, it / np.maximum(denom, 1), 0.0)
        keep = jac >= threshold
        return pa.table(
            {
                "id_a": pa.array(ia[keep], pa.int64()),
                "id_b": pa.array(ib[keep], pa.int64()),
                "inter": pa.array(it[keep], pa.int64()),
                "n_a": pa.array(na[keep], pa.int64()),
                "n_b": pa.array(nb[keep], pa.int64()),
                "jaccard": pa.array(jac[keep], pa.float64()),
            }
        )

    return inter.map_batches(score, batch_format="pyarrow")


class SimHasher:
    """64-bit SimHash over word hashes; near-dups share most bits."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def simhash(self, text: str) -> int:
        words = _word_tokens(text)
        if not words:
            return 0
        acc = np.zeros(64, np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        for w in words:
            h = np.uint64(
                zlib.crc32(w.encode()) | (zlib.crc32(w[::-1].encode()) << 32)
            )
            bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
            acc += 2 * bits - 1
        return int(
            np.bitwise_or.reduce((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64))
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        hs = pa.array(
            [np.uint64(self.simhash(t)).astype(np.int64).item() for t in texts],
            pa.int64(),
        )
        return batch.append_column("simhash", hs)


def simhash_dup_groups(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Exact-simhash duplicate groups: Dataset(simhash, ids list, n)."""
    sigs = ds.map_batches(SimHasher(text_col), batch_format="pyarrow")

    def group_ids(g: pa.Table) -> pa.Table:
        ids = sorted(g.column(id_col).to_pylist())
        if len(ids) < 2:
            return pa.table(
                {"simhash": pa.array([], pa.int64()),
                 "ids": pa.array([], pa.list_(pa.int64())),
                 "n": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "simhash": pa.array([g.column("simhash")[0].as_py()], pa.int64()),
                "ids": pa.array([ids], pa.list_(pa.int64())),
                "n": pa.array([len(ids)], pa.int64()),
            }
        )

    return sigs.select_columns([id_col, "simhash"]).groupby("simhash").map_groups(
        group_ids, batch_format="pyarrow"
    )
