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


def _unique_pairs_sum(
    a: np.ndarray, b: np.ndarray, n: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized per-(a,b) sum of n.  Packs both ids into one uint64 when
    they fit in 31 bits (fast path); otherwise reduces over a structured
    2-column key — wide or negative ids are never silently collided."""
    if len(a) == 0:
        return a.astype(np.int64), b.astype(np.int64), n.astype(np.int64)
    if (
        int(a.min()) >= 0
        and int(b.min()) >= -1
        and max(int(a.max()), int(b.max()) + 1) < (1 << 31)
    ):
        packed = a.astype(np.uint64) * np.uint64(1 << 32) + (b + 1).astype(np.uint64)
        uniq, inv = np.unique(packed, return_inverse=True)
        sums = np.bincount(inv, weights=n.astype(np.float64)).astype(np.int64)
        return (
            (uniq >> np.uint64(32)).astype(np.int64),
            (uniq & np.uint64(0xFFFFFFFF)).astype(np.int64) - 1,
            sums,
        )
    rec = np.empty(len(a), dtype=[("a", np.int64), ("b", np.int64)])
    rec["a"], rec["b"] = a, b
    uniq, inv = np.unique(rec, return_inverse=True)
    sums = np.bincount(inv, weights=n.astype(np.float64)).astype(np.int64)
    return uniq["a"].astype(np.int64), uniq["b"].astype(np.int64), sums


_SHINGLE_C = np.uint64(0x9E3779B97F4A7C15)  # odd multiplier, wraps mod 2^64


class MinHasher:
    """Per-batch minhash signatures over word n-gram shingles.

    k permutations ``(a_i * x + b_i) mod p`` with params from a fixed
    seed; emits ``sig`` as a fixed-size list<uint64> column.

    Vectorized end-to-end: shingle hashes are a multiply-combine of
    per-word crc32s (sliced numpy windows — no per-shingle string joins),
    and the k-permutation min runs as chunked ``np.minimum.reduceat``
    over the concatenated shingles of many docs (one (k, m) kernel per
    ~200k shingles instead of one small kernel per doc).
    """

    def __init__(self, text_col: str = "text", k: int = 64, ngram: int = 3, seed: int = 42):
        self.text_col = text_col
        self.k = k
        self.ngram = ngram
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=k, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=k, dtype=np.uint64)

    def doc_shingles(self, text: str) -> np.ndarray:
        """Distinct shingle hashes: windows of word crc32s combined with a
        wrapping multiply-add chain (order-sensitive, vectorized)."""
        words = _word_tokens(text)
        if not words:
            return np.array([], np.uint64)
        wh = np.fromiter(
            (zlib.crc32(w.encode()) for w in words), np.uint64, len(words)
        )
        n = self.ngram
        if len(wh) < n:
            acc = np.uint64(0)
            for h in wh:
                acc = acc * _SHINGLE_C + h
            return np.array([acc], np.uint64)
        m = len(wh) - n + 1
        acc = np.zeros(m, np.uint64)
        for j in range(n):
            acc = acc * _SHINGLE_C + wh[j : j + m]
        return np.unique(acc)

    def signature(self, text: str) -> np.ndarray:
        sh = self.doc_shingles(text)
        if len(sh) == 0:
            return np.zeros(self.k, np.uint64)
        v = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        n_docs = len(texts)
        sigs = np.zeros((n_docs, self.k), np.uint64)
        hs = [self.doc_shingles(t) for t in texts]
        budget = 200_000  # shingles per kernel: k x budget x 8B ~ 100 MB peak
        i = 0
        while i < n_docs:
            j, total = i, 0
            while j < n_docs and (total == 0 or total + len(hs[j]) <= budget):
                total += len(hs[j])
                j += 1
            idx = [d for d in range(i, j) if len(hs[d])]
            if idx:
                concat = np.concatenate([hs[d] for d in idx])
                v = (self.a[:, None] * concat[None, :] + self.b[:, None]) % np.uint64(
                    _MERSENNE
                )
                counts = np.fromiter((len(hs[d]) for d in idx), np.int64, len(idx))
                starts = np.concatenate(([0], np.cumsum(counts[:-1])))
                sigs[idx, :] = np.minimum.reduceat(v, starts, axis=1).T
            i = j
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
            # band hash = wrapping multiply-add over the band's rows,
            # vectorized across docs (no per-row crc32 of byte buffers);
            # band index is salted in so band b and band b' collide freely
            hs = np.full(len(ids), np.uint64(b + 1), np.uint64)
            for c in range(self.rpb):
                hs = hs * _SHINGLE_C + seg[:, c]
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

    Pipeline (everything distributed; nothing corpus-sized touches the
    driver): map_batches(MinHasher) -> map_batches(BandEmitter)
    -> groupby(hash bucket) vectorized pair emission -> groupby(hash
    bucket) vectorized pair dedup -> two hash-partitioned Dataset.join()s
    back to the signature table -> per-batch vectorized signature
    agreement.  At 10^10 docs the signature table is ~TBs — it stays
    sharded in the object store and moves only through the joins.
    """
    hasher = MinHasher(text_col, k, ngram, seed)
    # materialize signatures once: the banding pass and both verify joins
    # read them (without this the Python minhash pass would run 3x)
    sigs = ds.map_batches(hasher, batch_format="pyarrow").select_columns(
        [id_col, "sig"]
    ).materialize()

    bandemit = BandEmitter(id_col, bands, k)
    banded = sigs.map_batches(bandemit, batch_format="pyarrow")

    def bucket_pairs(g: pa.Table) -> pa.Table:
        # one call per hash bucket (512 total), vectorized inside — NOT one
        # Python call per (band, band_hash) group, which is ~bands*n_docs
        # groups and dominated wall time at 50k docs
        bh = g.column("band_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        docs = g.column(id_col).to_numpy(zero_copy_only=False)
        # the band index is already salted into the 64-bit band hash
        # (BandEmitter seeds each band's chain with b+1), so the hash
        # alone is the group key
        codes = bh.astype(np.int64)
        order = np.lexsort((docs, codes))
        a, b = _pairs_from_sorted_groups(
            codes[order], docs[order], max_bucket, emit_markers=False
        )
        return pa.table(
            {"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())}
        )

    pairs = banded.groupby("gbucket").map_groups(bucket_pairs, batch_format="pyarrow")

    # global pair dedup (same pair can surface from multiple bands):
    # shuffle on a 256-way hash of the pair, np.unique inside — bounded
    # group count, no per-distinct-pair Python dispatch
    def tag_pair(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        b = batch.column("id_b").to_numpy(zero_copy_only=False)
        pb = ((a * 2654435761 + b) % 256).astype(np.int32)
        return batch.append_column("pbucket", pa.array(pb))

    def dedup_pairs(g: pa.Table) -> pa.Table:
        a = g.column("id_a").to_numpy(zero_copy_only=False)
        b = g.column("id_b").to_numpy(zero_copy_only=False)
        ua, ub, _ = _unique_pairs_sum(a, b, np.ones(len(a), np.int64))
        return pa.table(
            {"id_a": pa.array(ua, pa.int64()), "id_b": pa.array(ub, pa.int64())}
        )

    pairs = (
        pairs.map_batches(tag_pair, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(dedup_pairs, batch_format="pyarrow")
    )

    # distributed verification: hash-partitioned joins back to the
    # signature table (NOT a driver-side signature dict — at 10^10 docs
    # the signatures are far beyond driver memory).  Signatures travel as
    # fixed_size_binary (the Acero join rejects fixed_size_list payloads);
    # the bytes are the raw little-endian uint64 signature, zero-copy both
    # ways.
    def _sig_side(side: str):
        def conv(t: pa.Table) -> pa.Table:
            n = t.num_rows
            flat = np.asarray(t.column("sig").combine_chunks().flatten())
            fsb = pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(k * 8), n, [None, pa.py_buffer(flat.tobytes())]
            )
            return pa.table({f"id_{side}": t.column(id_col), f"sig_{side}": fsb})

        return conv

    sig_a = sigs.map_batches(_sig_side("a"), batch_format="pyarrow")
    sig_b = sigs.map_batches(_sig_side("b"), batch_format="pyarrow")
    # each JoinOperator holds num_partitions aggregator actors; BOTH joins
    # run in one streaming plan, so size them to the session or the second
    # join's actors never schedule (measured deadlock: 2x16 partitions on
    # a 4-CPU session)
    import ray as _ray

    ncpu = int(_ray.cluster_resources().get("CPU", 8))
    npart = max(2, min(64, ncpu // 4))
    joined = pairs.join(sig_a, "inner", num_partitions=npart, on=("id_a",)).join(
        sig_b, "inner", num_partitions=npart, on=("id_b",)
    )

    def _sig_matrix(col: pa.ChunkedArray | pa.Array, nrows: int) -> np.ndarray:
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        full = np.frombuffer(arr.buffers()[1], np.uint64).reshape(-1, k)
        return full[arr.offset : arr.offset + nrows]

    def verify(batch: pa.Table) -> pa.Table:
        nrows = batch.num_rows
        if nrows == 0:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "est_jaccard": pa.array([], pa.float64()),
                }
            )
        sa = _sig_matrix(batch.column("sig_a"), nrows)
        sb = _sig_matrix(batch.column("sig_b"), nrows)
        est = (sa == sb).mean(axis=1)
        keep = est >= threshold
        return pa.table(
            {
                "id_a": batch.column("id_a").filter(pa.array(keep)),
                "id_b": batch.column("id_b").filter(pa.array(keep)),
                "est_jaccard": pa.array(est[keep], pa.float64()),
            }
        )

    return joined.map_batches(verify, batch_format="pyarrow")


def exact_dedup(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    return_rows: bool = True,
    digest_col: str | None = None,
):
    """Exact dedup: keep the min-id row per normalized-content digest.

    Scale shape: the shuffle moves ONLY (id, 16-byte digest) — never the
    documents — keyed by the digest's first byte (256 bounded groups;
    per-distinct-digest groupby dispatch costs ~100us per group, hours at
    10^9 docs).  Inside a bucket the keep-first is vectorized
    (dictionary-encode digests, lexsort by (digest, id), take group
    heads).  With ``return_rows`` the winner ids are hash-joined back to
    the corpus (distributed ``Dataset.join``); ``return_rows=False``
    returns just the winner-id Dataset — the cheap form when downstream
    only needs the keep-set.  When the caller already carries a content
    digest column (``digest_col``), no text is read here at all — the
    input can be a narrow (id, digest, ...) table.  Reference analogue:
    file-level ledger dedup D1 + key upsert D2
    (`src/pipeline/core/client_clickhouse.py:181,193`)."""
    from .text import Fingerprinter

    fp = Fingerprinter(text_col)

    def fp_only(batch: pa.Table) -> pa.Table:
        if digest_col is None:
            texts = batch.column(text_col).to_pylist()
            fps = [fp.md5_norm(t) for t in texts]
            fp_arr = pa.array(fps, pa.string())
        else:
            fp_arr = batch.column(digest_col).combine_chunks()
            fps = fp_arr.to_pylist()
        return pa.table(
            {
                id_col: batch.column(id_col),
                "fp_md5": fp_arr,
                "fp_bucket": pa.array([int(h[:2], 16) for h in fps], pa.int32()),
            }
        )

    def keep_min_id_bucket(g: pa.Table) -> pa.Table:
        codes = pc.dictionary_encode(g.column("fp_md5").combine_chunks()).indices
        codes = codes.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, codes))
        heads = order[np.concatenate(([True], np.diff(codes[order]) != 0))]
        # take (not rebuild) so the id dtype passes through unchanged
        return pa.table({id_col: pc.take(g.column(id_col), pa.array(np.sort(heads)))})

    winners = (
        ds.map_batches(fp_only, batch_format="pyarrow")
        .groupby("fp_bucket")
        .map_groups(keep_min_id_bucket, batch_format="pyarrow")
    )
    if not return_rows:
        return winners

    import ray as _ray

    ncpu = int(_ray.cluster_resources().get("CPU", 8))
    npart = max(2, min(64, ncpu // 2))
    return winners.join(ds, "inner", num_partitions=npart, on=(id_col,))


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
        # not one row per (pair, shingle) occurrence (wide ids take the
        # structured-key path inside the helper, never a silent collision)
        a, b, counts = _unique_pairs_sum(a, b, np.ones(len(a), np.int64))
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
    ncpu_blocks = int(ray.cluster_resources().get("CPU", 8))
    tagged = tagged.repartition(max(8, min(256, ncpu_blocks))).materialize()

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
        ua, ub, sums = _unique_pairs_sum(a, b, n)
        return pa.table(
            {
                "id_a": pa.array(ua, pa.int64()),
                "id_b": pa.array(ub, pa.int64()),
                "count()": pa.array(sums, pa.int64()),
            }
        )

    reduced = (
        tagged.map_batches(pair_bucket, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(reduce_pairs, batch_format="pyarrow")
        .materialize()
    )
    # per-doc shingle-set sizes ride along as marker rows (id_b == -1);
    # join them back onto the pair stream TWICE (on id_a, on id_b) —
    # hash-partitioned Dataset.joins, the same shape as the MinHash
    # signature verify.  One row per document never touches the driver
    # (the round-2 form collected a python dict: driver OOM at 10^10 docs).
    inter = reduced.filter(expr="id_b >= 0").map_batches(
        lambda t: pa.table(
            {"id_a": t["id_a"], "id_b": t["id_b"], "inter": t["count()"]}
        ),
        batch_format="pyarrow",
    )

    def _size_side(side: str):
        def conv(t: pa.Table) -> pa.Table:
            return pa.table({f"id_{side}": t["id_a"], f"n_{side}": t["count()"]})

        return conv

    sizes = reduced.filter(expr="id_b == -1")
    sz_a = sizes.map_batches(_size_side("a"), batch_format="pyarrow")
    sz_b = sizes.map_batches(_size_side("b"), batch_format="pyarrow")
    # both joins run in one streaming plan: size partitions to the session
    # (2x num_partitions aggregator actors must fit) — see minhash verify
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    npart = max(2, min(64, ncpu // 4))
    joined = inter.join(sz_a, "inner", num_partitions=npart, on=("id_a",)).join(
        sz_b, "inner", num_partitions=npart, on=("id_b",)
    )

    def score(batch: pa.Table) -> pa.Table:
        ia = batch.column("id_a").to_numpy(zero_copy_only=False)
        ib = batch.column("id_b").to_numpy(zero_copy_only=False)
        it = batch.column("inter").to_numpy(zero_copy_only=False)
        na = batch.column("n_a").to_numpy(zero_copy_only=False)
        nb = batch.column("n_b").to_numpy(zero_copy_only=False)
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

    return joined.map_batches(score, batch_format="pyarrow")


class SimHasher:
    """64-bit SimHash over word hashes; near-dups share most bits.

    Vectorized: per doc, the word-hash array expands to a (words, 64)
    sign matrix in one shift-and-mask kernel (no per-word Python loop);
    the per-bit sums reduce in one pass."""

    _SHIFTS = np.arange(64, dtype=np.uint64)

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def simhash(self, text: str) -> int:
        words = _word_tokens(text)
        if not words:
            return 0
        wh = np.fromiter(
            (
                zlib.crc32(w.encode()) | (zlib.crc32(w[::-1].encode()) << 32)
                for w in words
            ),
            np.uint64,
            len(words),
        )
        bits = ((wh[:, None] >> self._SHIFTS[None, :]) & np.uint64(1)).astype(np.int64)
        acc = (2 * bits - 1).sum(axis=0)
        return int(
            np.bitwise_or.reduce((acc > 0).astype(np.uint64) << self._SHIFTS)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        hs = pa.array(
            [np.uint64(self.simhash(t)).astype(np.int64).item() for t in texts],
            pa.int64(),
        )
        return batch.append_column("simhash", hs)


def simhash_dup_groups(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Exact-simhash duplicate groups: Dataset(simhash, ids list, n).

    Scale shape: ONE shuffle keyed by hash-bucket (256 bounded groups,
    not one Python dispatch per distinct 64-bit simhash ~ n_docs groups);
    inside a bucket the grouping is fully vectorized (lexsort by
    (simhash, id), boundary diff, ListArray built from offsets)."""
    sigs = ds.map_batches(SimHasher(text_col), batch_format="pyarrow")

    def add_bucket(t: pa.Table) -> pa.Table:
        h = t.column("simhash").to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((h.astype(np.uint64) % np.uint64(256)).astype(np.int32))
        )

    def bucket_groups(g: pa.Table) -> pa.Table:
        h = g.column("simhash").to_numpy(zero_copy_only=False)
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))
        h, ids = h[order], ids[order]
        boundary = np.flatnonzero(np.diff(h)) + 1
        starts = np.concatenate(([0], boundary))
        ends = np.concatenate((boundary, [len(h)]))
        sizes = ends - starts
        keep = sizes >= 2
        ks, ksz = starts[keep], sizes[keep]
        # gather kept groups' ids contiguously, then wrap as list<int64>
        take_idx = np.concatenate(
            [np.arange(s, s + z) for s, z in zip(ks, ksz)]
        ) if len(ks) else np.array([], np.int64)
        offsets = np.concatenate(([0], np.cumsum(ksz))).astype(np.int32)
        values = pa.array(ids[take_idx], pa.int64())
        return pa.table(
            {
                "simhash": pa.array(h[ks], pa.int64()),
                "ids": pa.ListArray.from_arrays(pa.array(offsets), values),
                "n": pa.array(ksz.astype(np.int64), pa.int64()),
            }
        )

    return (
        sigs.select_columns([id_col, "simhash"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_groups, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# connected components over a near-dup pair graph (transitive closure)
# ---------------------------------------------------------------------------


def dup_clusters(
    pairs,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
    num_buckets: int = 256,
):
    """Duplicate-cluster assignment: connected components over an
    undirected near-duplicate pair graph (output of
    ``shingle_jaccard_pairs`` / ``minhash_lsh_pairs``).

    Returns one row per node touched by an edge: ``(doc_id,
    cluster_id)`` with ``cluster_id`` = the minimum doc id of the
    component — the canonical representative a training-data dedup
    keeps.  Pairwise near-dup predicates are not transitive, so real
    corpus dedup needs this closure step after pair generation
    (reference has no analogue; target-added operator).

    Shape (100 TB design point): distributed min-label propagation.
    Per iteration: ONE hash-partitioned ``Dataset.join`` (edges x
    labels on the source node) + one bucketed vectorized min-reduce
    (``num_buckets`` groups, numpy lexsort inside — never one Ray
    group per node).  Labels and edges stay sharded in the object
    store; the driver sees only a per-iteration changed-count scalar.
    Converges in O(component diameter) rounds — near-dup graphs are
    shallow (single-digit) — each round shuffling E + N narrow int64
    rows, the canonical distributed-CC cost.
    """
    import ray as _ray

    from .hashutil import hash_bucket

    out_schema = pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())])

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t.column(id_a).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(id_b).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return _ray.data.from_arrow(out_schema.empty_table())

    # the executor's zero-column empty blocks (group/sort splits) poison
    # join partitions — strip them at every materialization point
    from .blockutil import drop_empty_blocks

    def bucket_by(col: str):
        def add(t: pa.Table) -> pa.Table:
            return t.append_column("bucket", hash_bucket(t.column(col), num_buckets))

        return add

    def init_bucket(g: pa.Table) -> pa.Table:
        n = np.unique(g.column("src").to_numpy(zero_copy_only=False))
        arr = pa.array(n, pa.int64())
        return pa.table({"node": arr, "label": arr})

    labels = drop_empty_blocks(
        edges.map_batches(bucket_by("src"), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(init_bucket, batch_format="pyarrow")
        .materialize()
    )

    ncpu = int(_ray.cluster_resources().get("CPU", 8))
    npart = max(2, min(64, ncpu // 2))
    int64_max = np.iinfo(np.int64).max

    def cand_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t["dst"],
                "label": t["label"],
                "is_old": pa.array(np.zeros(t.num_rows, bool)),
            }
        )

    def jump_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t["node"],
                "label": t["label"],
                "is_old": pa.array(np.zeros(t.num_rows, bool)),
            }
        )

    def old_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t["node"],
                "label": t["label"],
                "is_old": pa.array(np.ones(t.num_rows, bool)),
            }
        )

    def reduce_min(g: pa.Table) -> pa.Table:
        node = g.column("node").to_numpy(zero_copy_only=False)
        lab = g.column("label").to_numpy(zero_copy_only=False)
        old = g.column("is_old").to_numpy(zero_copy_only=False)
        order = np.lexsort((lab, node))
        ns, ls, osel = node[order], lab[order], old[order]
        heads = np.r_[True, ns[1:] != ns[:-1]]
        gidx = np.cumsum(heads) - 1
        starts = np.flatnonzero(heads)
        newl = ls[starts]  # min label per node: sorted by (node, label)
        oldl = np.full(len(starts), int64_max, np.int64)
        oldl[gidx[osel]] = ls[osel]  # exactly one old row per node
        changed = (newl < oldl).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(ns[starts], pa.int64()),
                "label": pa.array(newl, pa.int64()),
                "changed": pa.array(changed, pa.int64()),
            }
        )

    for _ in range(max_iters):
        # the two label projections MUST be materialized before joining:
        # a lazy map_batches side gives Ray no schema for a hash
        # partition that receives zero blocks (labels collapse onto few
        # keys as components converge), and the join finalize then fails
        # on a schemaless empty table ("no match for FieldRef src").
        # Narrow (2x int64) tables, same size class as the per-iteration
        # `merged` materialization below.
        lab_src = labels.map_batches(
            lambda t: pa.table({"src": t["node"], "label": t["label"]}),
            batch_format="pyarrow",
        ).materialize()
        cand = edges.join(lab_src, "inner", num_partitions=npart, on=("src",))
        # pointer jumping: label[label[n]] is also a candidate for n.
        # Plain neighbor propagation needs O(diameter) rounds (a 10^6-row
        # boilerplate chain would never converge); the jump halves the
        # remaining pointer depth each round -> O(log diameter) total.
        ptr_in = labels.map_batches(
            lambda t: pa.table({"src": t["label"], "node": t["node"]}),
            batch_format="pyarrow",
        ).materialize()
        jump = ptr_in.join(lab_src, "inner", num_partitions=npart, on=("src",))
        merged = (
            cand.map_batches(cand_rows, batch_format="pyarrow")
            .union(jump.map_batches(jump_rows, batch_format="pyarrow"))
            .union(labels.map_batches(old_rows, batch_format="pyarrow"))
            .map_batches(bucket_by("node"), batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(reduce_min, batch_format="pyarrow")
            .materialize()
        )
        merged = drop_empty_blocks(merged)
        n_changed = merged.sum("changed") or 0
        labels = merged
        if n_changed == 0:
            break

    return labels.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "cluster_id": t["label"]}),
        batch_format="pyarrow",
    ).sort("doc_id")


class ParagraphSplitter:
    """Sub-document unit split for paragraph-level dedup: consecutive
    windows of ``words_per_para`` whitespace tokens per document, joined
    with single spaces — one (doc_id, para_idx, para) row per window.

    Real web text would split on blank lines; the synthetic corpus has
    no newlines, so the unit is a fixed word window (the operator under
    test — global first-occurrence dedup of sub-document units — is
    identical either way; swap this splitter for a '\\n\\n' splitter on
    real pages).  Tokenization is one vectorized regex split per batch;
    window assembly joins python-list slices per doc (string assembly is
    inherently byte work — same cost class as the per-run joins in
    analytic.grouped_concat, and output size ~= input size)."""

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        words_per_para: int = 16,
    ):
        assert words_per_para > 0
        self.text_col = text_col
        self.id_col = id_col
        self.w = words_per_para

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).combine_chunks()
        parts = pc.split_pattern_regex(texts, pattern="[ \t\n\r\f\v]+")
        id_type = batch.column(self.id_col).type  # int64 docs, string urls
        ids = batch.column(self.id_col).to_pylist()
        out_id, out_idx, out_para = [], [], []
        for did, toks in zip(ids, parts.to_pylist()):
            if toks and toks[0] == "":
                toks = toks[1:]
            if toks and toks[-1] == "":
                toks = toks[:-1]
            if not toks:
                continue
            for k in range(0, (len(toks) + self.w - 1) // self.w):
                out_id.append(did)
                out_idx.append(k)
                out_para.append(" ".join(toks[k * self.w : (k + 1) * self.w]))
        return pa.table(
            {
                "doc_id": pa.array(out_id, id_type),
                "para_idx": pa.array(out_idx, pa.int64()),
                "para": pa.array(out_para, pa.string()),
            }
        )


class LineSplitter:
    """Real-paragraph split for web pages: one (doc_id, para_idx, para)
    row per newline-separated line of text.  para_idx is the line's
    position INCLUDING empty lines (matching SQL unnest-with-ordinality
    over string_split before the non-empty filter), then empty lines are
    dropped.  Fully vectorized: one split kernel, flatten + parent
    indices, positions from list offsets — no Python loop over rows."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).combine_chunks()
        parts = pc.split_pattern(texts, pattern="\n")
        flat = pc.list_flatten(parts)
        par = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        # position within each document = global index - that doc's start
        offs = parts.offsets.to_numpy(zero_copy_only=False)
        pos = np.arange(len(flat), dtype=np.int64) - offs[par]
        keep = pc.not_equal(flat, pa.scalar("", pa.string()))
        keep_np = keep.to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(keep_np)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        return pa.table(
            {
                "doc_id": batch.column(self.id_col).take(pa.array(par[idx])),
                "para_idx": pa.array(pos[idx]),
                "para": flat.take(pa.array(idx)),
            }
        )


_PARA_IDX_BITS = 20  # para_idx < 2^20 (a 16M-word doc); doc_id < 2^43


def paragraph_dedup(ds, *, words_per_para: int = 16, n_buckets: int = 256, splitter=None):
    """C4-style paragraph-level exact dedup: across the WHOLE corpus,
    each distinct paragraph (fixed word window, ParagraphSplitter) is
    kept only at its first occurrence in (doc_id, para_idx) order; every
    later occurrence — in other documents or later in the same one — is
    dropped.  Returns the kept (doc_id, para_idx, para) rows; reassemble
    per doc with analytic.grouped_concat(para, ' ' ORDER BY para_idx).

    Scale shape: occurrences shuffle ONCE keyed by md5(para) first byte
    (256 bounded groups — all occurrences of a paragraph land in one
    group, so the winner is decided locally and no join-back is needed);
    within a group the first-occurrence take is vectorized (dictionary-
    encode digest, lexsort by (digest, doc_id<<20|para_idx), group
    heads).  The exchange ships paragraph text once — unavoidable, the
    output IS the surviving text.  Reference analogue: content dedup
    D1/D2 (`src/pipeline/core/client_clickhouse.py:181,193`) applied at
    sub-record granularity."""
    import hashlib

    if splitter is None:
        splitter = ParagraphSplitter(words_per_para=words_per_para)

    def split_digest(batch: pa.Table) -> pa.Table:
        t = splitter(batch)
        paras = t.column("para").to_pylist()
        digs = [hashlib.md5(p.encode()).digest() for p in paras]
        bucket = pa.array([d[0] % n_buckets for d in digs], pa.int32())
        return t.append_column(
            "pdig", pa.array(digs, pa.binary(16))
        ).append_column("pbucket", bucket)

    def keep_first(g: pa.Table) -> pa.Table:
        id_type = g.schema.field("doc_id").type
        if g.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], id_type),
                    "para_idx": pa.array([], pa.int64()),
                    "para": pa.array([], pa.string()),
                }
            )
        if pa.types.is_integer(id_type):
            # int64 ids: pack (doc_id, para_idx) into one sort key and
            # take group heads via lexsort — fastest path
            codes = pc.dictionary_encode(g.column("pdig").combine_chunks()).indices
            codes = codes.to_numpy(zero_copy_only=False).astype(np.int64)
            did = g.column("doc_id").to_numpy(zero_copy_only=False)
            pidx = g.column("para_idx").to_numpy(zero_copy_only=False)
            if len(did) and (did.max() >= (1 << (63 - _PARA_IDX_BITS)) or pidx.max() >= (1 << _PARA_IDX_BITS)):
                raise ValueError("doc_id/para_idx exceed packed-order range")
            packed = (did << _PARA_IDX_BITS) | pidx
            order = np.lexsort((packed, codes))
            heads = order[np.concatenate(([True], np.diff(codes[order]) != 0))]
            return g.select(["doc_id", "para_idx", "para"]).take(
                pa.array(np.sort(heads))
            )
        # generic ids (string urls): Arrow multi-key sort, then group
        # heads where the digest changes between adjacent sorted rows —
        # still fully vectorized, no Python loop
        srt = g.sort_by(
            [("pdig", "ascending"), ("doc_id", "ascending"), ("para_idx", "ascending")]
        )
        dig = srt.column("pdig").combine_chunks()
        n = srt.num_rows
        neq = pc.not_equal(dig.slice(1, n - 1), dig.slice(0, n - 1))
        mask = pa.chunked_array(
            [pa.array([True]), neq.combine_chunks() if isinstance(neq, pa.ChunkedArray) else neq]
        )
        return srt.filter(mask).select(["doc_id", "para_idx", "para"])

    return (
        ds.map_batches(split_digest, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(keep_first, batch_format="pyarrow")
    )
