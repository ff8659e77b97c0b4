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
L^2 comparison never happens.

Within a variant group, verification runs over DISTINCT keys (one
representative each); verified key pairs then expand to their id cross
products, and distance-0 (equal-key) id pairs are emitted only in the
key's own identity-variant group.  ``max_group`` therefore caps
distinct keys per variant group — never exact-duplicate multiplicity —
and the distinct-key count is intrinsically alphabet-bounded (every
member of a variant group is a one-insertion parent of the variant, or
the variant itself), so the cap is a safety valve.  When it does bite,
pairs ARE dropped and the task emits a loud RuntimeWarning with the
group count (no silent caps).

Verification is vectorized AND per code point (matching per-character
Levenshtein semantics — one multibyte substitution is one edit, not
two): representative keys are padded into a fixed-width uint32
codepoint matrix once per group; equal-length candidates check
Hamming<=1 with one numpy reduction; length-diff-1 candidates use the
two-pointer rule (first mismatch, then suffix-shift compare) on the
same matrix.
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
    """(n, width) uint32 matrix of CODE POINTS (zero-padded) + char
    lengths — per-character edit distance, not per-byte, so a single
    multibyte substitution counts as one edit exactly like SQL
    ``levenshtein``."""
    n = len(keys)
    m = np.zeros((n, width), np.uint32)
    lens = np.empty(n, np.int64)
    for i, k in enumerate(keys):
        k = k[:width]
        m[i, : len(k)] = np.fromiter(map(ord, k), np.uint32, len(k))
        lens[i] = len(k)
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
    chars are within Levenshtein distance 1 (per CODE POINT).  Blocking
    is lossless for distance <= 1; verification runs over distinct keys
    per variant group, so exact-duplicate multiplicity can never
    truncate results.  ``max_group`` caps DISTINCT keys per variant
    group — intrinsically alphabet-bounded, so effectively a safety
    valve — and when it does bite, the drop is reported with a
    RuntimeWarning (no silent caps).  A verified cross-key pair may be
    re-emitted from up to 2(L+1) shared variant groups; the final
    256-bucket distinct collapses that bounded duplication."""

    def variants(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        keys = pc.utf8_slice_codeunits(
            t.column(key_col), 0, key_len
        ).to_pylist()
        v_ids: list[int] = []
        v_keys: list[str] = []
        v_hash: list[str] = []
        v_self: list[bool] = []
        for i, k in zip(ids, keys):
            if k is None:
                continue
            for v in _neighborhood(k):
                v_ids.append(i)
                v_keys.append(k)
                v_hash.append(v)
                v_self.append(v == k)
        vh = hash64(pa.array(v_hash, pa.string())) if v_hash else np.empty(0, np.uint64)
        return pa.table(
            {
                "vh": pa.array(vh.view(np.int64), pa.int64()),
                "id": pa.array(v_ids, pa.int64()),
                "key": pa.array(v_keys, pa.string()),
                "self": pa.array(v_self, pa.bool_()),
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
        selfs = g.column("self").to_numpy(zero_copy_only=False)
        karr = np.array(g.column("key").to_pylist(), dtype=object)
        order = np.lexsort((ids, karr, vh))
        vh, ids, karr, selfs = vh[order], ids[order], karr[order], selfs[order]
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        truncated = 0
        g_starts = np.flatnonzero(np.r_[True, vh[1:] != vh[:-1]])
        g_ends = np.r_[g_starts[1:], len(vh)]
        for s, e in zip(g_starts, g_ends):
            if e - s < 2:
                continue
            kg = karr[s:e]
            k_start = np.flatnonzero(np.r_[True, kg[1:] != kg[:-1]]) + s
            k_end = np.r_[k_start[1:], e]
            # distance-0 (equal-key) id pairs: emitted ONLY in the key's
            # own identity-variant group, once per unordered id pair
            for ks, ke in zip(k_start, k_end):
                if not selfs[ks]:
                    continue
                uids = np.unique(ids[ks:ke])
                if len(uids) < 2:
                    continue
                ii0, jj0 = np.triu_indices(len(uids), k=1)
                out_a.append(uids[ii0])
                out_b.append(uids[jj0])
            nk = len(k_start)
            if nk < 2:
                continue
            if nk > max_group:
                truncated += 1
                k_start, k_end = k_start[:max_group], k_end[:max_group]
                nk = max_group
            # verify ed<=1 between one representative per DISTINCT key
            m, lens = _pad_matrix([str(karr[i]) for i in k_start], key_len)
            ii, jj = np.triu_indices(nk, k=1)
            ok = _dist_le1(m, lens, ii, jj)
            for i, j in zip(ii[ok], jj[ok]):
                ua = np.unique(ids[k_start[i]:k_end[i]])
                ub = np.unique(ids[k_start[j]:k_end[j]])
                a = np.repeat(ua, len(ub))
                b = np.tile(ub, len(ua))
                neq = a != b
                a, b = a[neq], b[neq]
                if len(a):
                    out_a.append(np.minimum(a, b))
                    out_b.append(np.maximum(a, b))
        if truncated:
            import warnings

            warnings.warn(
                f"fuzzy_pairs_ed1: {truncated} variant group(s) exceeded "
                f"max_group={max_group} distinct keys; ed<=1 pairs beyond "
                "the cap were DROPPED — raise max_group or pre-filter the "
                "degenerate key prefix",
                RuntimeWarning,
                stacklevel=2,
            )
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
        # bucket key only needs determinism: int64 wraparound on huge ids
        # is fine here (the exact pair identity is preserved below)
        combined = pc.add(
            pc.multiply(t.column("id_a"), pa.scalar(1 << 31, pa.int64())),
            t.column("id_b"),
        )
        return t.append_column("_pb", hash_bucket(combined, num_buckets))

    def uniq(g: pa.Table) -> pa.Table:
        # two-column unique via lexsort + run boundaries — no bit
        # packing, so ids >= 2^31 cannot collide or mis-decode
        a = g.column("id_a").to_numpy(zero_copy_only=False)
        b = g.column("id_b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        keep = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        return pa.table(
            {
                "id_a": pa.array(a[keep].astype(np.int64)),
                "id_b": pa.array(b[keep].astype(np.int64)),
            }
        )

    uniq.__name__ = "uniq"

    return (
        cand.map_batches(pair_bucket, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(uniq, batch_format="pyarrow")
    )
