"""Edit-distance (Levenshtein <= 1) similarity self-join — SymSpell-style
deletion-neighborhood blocking, no all-pairs comparison.

Fuzzy key matching is the string-side near-dup primitive the token-set
paths (MinHash / shingle Jaccard, stages/dedup.py) can't express: a
one-character typo changes every shingle containing it, but is exactly
one edit.  Reference analogue: the dedup/upsert operator family
(SURVEY §2 D2) extended to approximate keys.

Shape (the SymSpell observation, Garbe 2012, public domain algorithm):
two strings within Levenshtein distance 1 share at least one member of
their *deletion neighborhoods* (the string itself plus every
single-character-deletion variant):

* equal strings — share the string itself;
* one substitution at position i — both delete-at-i variants are equal;
* one insertion/deletion — the shorter string IS a deletion variant of
  the longer one.

So: flat-map each key to its <= L+1 neighborhood variants, hash-bucket
the variant space, emit candidate pairs only within a variant group,
verify the exact distance in the same task (no second shuffle), then
global-distinct the verified pairs on 256 hash buckets.  Per key this
ships O(L) copies of an L-char key — bounded and local; the all-pairs
L^2 comparison never happens.  A ``max_group`` cap bounds the pair
blowup from boilerplate-identical prefixes, same rule as MinHash's
``max_bucket``.

Verification is vectorized: variants are padded into a fixed-width
uint8 matrix once per group; equal-length candidates check Hamming<=1
with one numpy reduction; length-diff-1 candidates use the two-pointer
rule (first mismatch, then suffix-shift compare) on the same matrix.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .hashutil import hash64, hash_bucket

_PAIR_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])


def _neighborhood(key: str) -> list[str]:
    """The string plus all single-character-deletion variants."""
    return [key] + [key[:i] + key[i + 1 :] for i in range(len(key))]


def _pad_matrix(keys: list[str], width: int) -> tuple[np.ndarray, np.ndarray]:
    """(n, width) uint8 matrix of utf-8 bytes (zero-padded) + byte lengths."""
    n = len(keys)
    m = np.zeros((n, width), np.uint8)
    lens = np.empty(n, np.int64)
    for i, k in enumerate(keys):
        b = k.encode()[:width]
        m[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    return m, lens


def _dist_le1(m: np.ndarray, lens: np.ndarray, ii: np.ndarray, jj: np.ndarray) -> np.ndarray:
    """Vectorized Levenshtein<=1 verdict for candidate index pairs into
    the padded byte matrix.  Equal lengths -> Hamming<=1 (one numpy
    reduction over the pair axis); |len diff|==1 -> two-pointer
    suffix-shift rule per pair (rare branch, candidates only)."""
    out = np.zeros(len(ii), bool)
    la, lb = lens[ii], lens[jj]
    dl = np.abs(la - lb)

    eq = dl == 0
    if eq.any():
        diff = (m[ii[eq]] != m[jj[eq]]).sum(axis=1)
        out[eq] = diff <= 1

    off = dl == 1
    for p in np.nonzero(off)[0]:
        a, b = ii[p], jj[p]
        if lens[a] < lens[b]:
            a, b = b, a  # a is the longer
        la_, lb_ = int(lens[a]), int(lens[b])
        ra, rb = m[a, :la_], m[b, :lb_]
        neq = np.nonzero(ra[:lb_] != rb)[0]
        k = int(neq[0]) if len(neq) else lb_
        # delete ra[k]; remaining suffixes must match exactly
        out[p] = bool(np.array_equal(ra[k + 1 :], rb[k:]))
    return out


def fuzzy_pairs_ed1(
    ds: ray.data.Dataset,
    id_col: str,
    key_col: str,
    key_len: int = 32,
    num_buckets: int = 256,
    max_group: int = 512,
) -> ray.data.Dataset:
    """All (id_a < id_b) pairs whose ``key_col`` prefixes of ``key_len``
    chars are within Levenshtein distance 1.  Exact — blocking is
    lossless for distance <= 1; only the ``max_group`` cap (degenerate
    identical-prefix groups) can drop pairs, and those are exact-dup
    pairs the exact-dedup path already finds."""

    def variants(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        keys = pc.utf8_slice_codeunits(
            t.column(key_col), 0, key_len
        ).to_pylist()
        v_ids: list[int] = []
        v_keys: list[str] = []
        v_hash: list[str] = []
        for i, k in zip(ids, keys):
            if k is None:
                continue
            for v in _neighborhood(k):
                v_ids.append(i)
                v_keys.append(k)
                v_hash.append(v)
        vh = hash64(pa.array(v_hash, pa.string())) if v_hash else np.empty(0, np.uint64)
        return pa.table(
            {
                "vh": pa.array(vh.view(np.int64), pa.int64()),
                "id": pa.array(v_ids, pa.int64()),
                "key": pa.array(v_keys, pa.string()),
            }
        )

    def bucket_tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_vb", hash_bucket(t.column("vh"), num_buckets)
        )

    def pairs_in_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        vh = g.column("vh").to_numpy(zero_copy_only=False)
        ids = g.column("id").to_numpy(zero_copy_only=False)
        keys = g.column("key").to_pylist()
        order = np.lexsort((ids, vh))
        vh, ids = vh[order], ids[order]
        keys = [keys[i] for i in order]
        m, lens = _pad_matrix(keys, key_len * 4)  # utf-8 worst case
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        starts = np.flatnonzero(np.r_[True, vh[1:] != vh[:-1]])
        ends = np.r_[starts[1:], len(vh)]
        for s, e in zip(starts, ends):
            n = min(e - s, max_group)
            if n < 2:
                continue
            loc = np.arange(s, s + n)
            ii, jj = np.triu_indices(n, k=1)
            ii, jj = loc[ii], loc[jj]
            neq = ids[ii] != ids[jj]
            ii, jj = ii[neq], jj[neq]
            if len(ii) == 0:
                continue
            ok = _dist_le1(m, lens, ii, jj)
            a, b = ids[ii[ok]], ids[jj[ok]]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            out_a.append(lo)
            out_b.append(hi)
        if not out_a:
            return _PAIR_SCHEMA.empty_table()
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a).astype(np.int64)),
                "id_b": pa.array(np.concatenate(out_b).astype(np.int64)),
            }
        )

    pairs_in_bucket.__name__ = "pairs_in_bucket"

    cand = (
        ds.map_batches(variants, batch_format="pyarrow")
        .map_batches(bucket_tag, batch_format="pyarrow")
        .groupby("_vb")
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
    )

    # global distinct on 256 pair-hash buckets (same pair can be found
    # under several shared variants that live in different buckets)
    def pair_bucket(t: pa.Table) -> pa.Table:
        combined = pc.add(
            pc.multiply(t.column("id_a"), pa.scalar(1 << 31, pa.int64())),
            t.column("id_b"),
        )
        return t.append_column("_pb", hash_bucket(combined, num_buckets))

    def uniq(g: pa.Table) -> pa.Table:
        a = g.column("id_a").to_numpy(zero_copy_only=False)
        b = g.column("id_b").to_numpy(zero_copy_only=False)
        c = np.unique(a * (1 << 31) + b)
        return pa.table(
            {
                "id_a": pa.array((c >> 31).astype(np.int64)),
                "id_b": pa.array((c & ((1 << 31) - 1)).astype(np.int64)),
            }
        )

    uniq.__name__ = "uniq"

    return (
        cand.map_batches(pair_bucket, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(uniq, batch_format="pyarrow")
    )
