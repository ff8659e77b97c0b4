"""Property-based tests (hypothesis) for the LWW core and schema logic.

The reference has no property tests (SURVEY.md §5); these pin the
algebraic properties the distributed plan RELIES on: the LWW reduce is
associative, commutative and idempotent, so per-batch combining, salted
pre-reduction and arbitrary re-partitioning cannot change the result.
"""

import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_ray.stages.merge import lww_compact

events = st.lists(
    st.tuples(
        st.integers(0, 5),  # key id
        st.integers(0, 10),  # ts
        st.integers(1, 1000),  # lsn (unique-ified below)
        st.sampled_from(["insert", "update", "delete"]),
    ),
    min_size=1,
    max_size=40,
)


def _tbl(rows):
    # make lsns unique (the WAL guarantees this)
    seen, out = set(), []
    for k, ts, lsn, op in rows:
        while lsn in seen:
            lsn += 1000
        seen.add(lsn)
        out.append((k, ts, lsn, op))
    return pa.table(
        {
            "url": pa.array([f"u{k}" for k, _, _, _ in out], pa.string()),
            "warc_ts": pa.array([ts for _, ts, _, _ in out], pa.timestamp("us")),
            "lsn": pa.array([l for _, _, l, _ in out], pa.int64()),
            "op": pa.array([op for _, _, _, op in out], pa.string()),
        }
    )


def _canon(t: pa.Table):
    t = t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))
    return t.select(["url", "warc_ts", "lsn", "op"]).to_pylist()


def _brute(t: pa.Table):
    best = {}
    for r in t.to_pylist():
        key = (r["warc_ts"], r["lsn"])
        if r["url"] not in best or key > (best[r["url"]]["warc_ts"], best[r["url"]]["lsn"]):
            best[r["url"]] = r
    return sorted(best.values(), key=lambda r: r["url"])


@settings(max_examples=200, deadline=None)
@given(events)
def test_lww_matches_bruteforce(rows):
    t = _tbl(rows)
    got = _canon(lww_compact(t))
    want = [
        {"url": r["url"], "warc_ts": r["warc_ts"], "lsn": r["lsn"], "op": r["op"]}
        for r in _brute(t)
    ]
    assert got == want


@settings(max_examples=100, deadline=None)
@given(events, st.integers(1, 5))
def test_lww_partition_invariance(rows, cut):
    """compact(A + B) == compact(compact(A) + compact(B)) for any split —
    the property that makes the combiner and salting exact."""
    t = _tbl(rows)
    k = max(1, len(t) * cut // 6)
    a, b = t.slice(0, k), t.slice(k)
    whole = _canon(lww_compact(t))
    parts = pa.concat_tables([lww_compact(a), lww_compact(b)]) if b.num_rows else lww_compact(a)
    assert _canon(lww_compact(parts)) == whole


@settings(max_examples=100, deadline=None)
@given(events)
def test_lww_idempotent_under_redelivery(rows):
    """compact(X + X) == compact(X) — duplicate-LSN redelivery is a no-op."""
    t = _tbl(rows)
    doubled = pa.concat_tables([t, t])
    assert _canon(lww_compact(doubled)) == _canon(lww_compact(t))


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=4, unique=True),
    st.lists(st.sampled_from(["a", "b", "c", "d", "e"]), min_size=1, max_size=5, unique=True),
)
def test_schema_evolve_is_additive_and_stable(cur_cols, new_cols):
    from etl_ray.state.schema_registry import conform, evolve

    cur = pa.schema([(c, pa.int64()) for c in cur_cols])
    inc = pa.schema([(c, pa.int64()) for c in new_cols])
    out = evolve(cur, inc)
    # old columns keep position and presence; new ones appended
    assert list(out.names[: len(cur_cols)]) == cur_cols
    assert set(out.names) == set(cur_cols) | set(new_cols)
    # evolve is idempotent
    assert evolve(out, inc).equals(out)
    # conform fills exactly the missing ones with nulls
    t = pa.table({c: pa.array([1], pa.int64()) for c in cur_cols})
    ct = conform(t, out)
    for c in set(new_cols) - set(cur_cols):
        assert ct.column(c).null_count == 1


def test_unique_pairs_sum_wide_ids_match_packed_path():
    """The structured-key fallback for wide (>=2^31) or negative ids must
    agree with the packed fast path on inputs both can handle, and must
    not collide wide ids (hypothesis over random pair multisets)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from etl_ray.stages.dedup import _unique_pairs_sum

    small = st.integers(min_value=0, max_value=2**20)
    wide = st.integers(min_value=-(2**40), max_value=2**40)

    def ref(a, b, n):
        acc = {}
        for x, y, c in zip(a, b, n):
            acc[(x, y)] = acc.get((x, y), 0) + c
        return sorted((k[0], k[1], v) for k, v in acc.items())

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.tuples(small, small, st.integers(1, 5)), max_size=30))
    def check_small(pairs):
        a = np.array([p[0] for p in pairs], np.int64)
        b = np.array([p[1] for p in pairs], np.int64)
        n = np.array([p[2] for p in pairs], np.int64)
        ua, ub, s = _unique_pairs_sum(a, b, n)
        assert sorted(zip(ua.tolist(), ub.tolist(), s.tolist())) == ref(a, b, n)

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.tuples(wide, wide, st.integers(1, 5)), max_size=30))
    def check_wide(pairs):
        a = np.array([p[0] for p in pairs], np.int64)
        b = np.array([p[1] for p in pairs], np.int64)
        n = np.array([p[2] for p in pairs], np.int64)
        ua, ub, s = _unique_pairs_sum(a, b, n)
        assert sorted(zip(ua.tolist(), ub.tolist(), s.tolist())) == ref(a, b, n)

    check_small()
    check_wide()


_WIDEN_TYPES = [
    pa.int8(), pa.int16(), pa.int32(), pa.int64(),
    pa.uint8(), pa.uint16(), pa.uint32(), pa.uint64(),
    pa.float32(), pa.float64(),
    pa.timestamp("s"), pa.timestamp("ms"), pa.timestamp("us"),
    pa.string(), pa.binary(),
]


@given(
    a=st.sampled_from(_WIDEN_TYPES),
    b=st.sampled_from(_WIDEN_TYPES),
)
@settings(max_examples=300, deadline=None)
def test_widen_type_laws(a, b):
    """Commutative; idempotent on equal types; the result (when any)
    admits a LOSSLESS cast from both sides (round-trip check on
    boundary values)."""
    from etl_ray.state.schema_registry import widen_type

    w_ab, w_ba = widen_type(a, b), widen_type(b, a)
    assert (w_ab is None) == (w_ba is None)
    if w_ab is not None:
        assert w_ab.equals(w_ba)
        assert widen_type(a, a).equals(a)
        # both sides cast losslessly into the widened type at their extremes
        for t in (a, b):
            if pa.types.is_integer(t):
                lo = 0 if pa.types.is_unsigned_integer(t) else -(2 ** (t.bit_width - 1))
                hi = 2 ** (t.bit_width - (0 if pa.types.is_unsigned_integer(t) else 1)) - 1
                arr = pa.array([lo, hi], t)
                if pa.types.is_floating(w_ab):
                    back = pc.cast(pc.cast(arr, w_ab), t)
                else:
                    back = pc.cast(pc.cast(arr, w_ab), t)
                assert back.equals(arr)
            elif pa.types.is_timestamp(t):
                arr = pa.array([0, 1_000_000_000], t)
                assert pc.cast(pc.cast(arr, w_ab), t).equals(arr)


# ---------------------------------------------------------------------------
# fuzzy join building blocks (stages/fuzzy.py) — pure-numpy, no Ray
# ---------------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    """Reference Levenshtein DP."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


# includes multibyte code points: the verifier is per-character (one
# multibyte substitution = ONE edit), matching the per-char DP reference
_words = st.text(alphabet="abcdéfß漢", min_size=0, max_size=12)


@settings(max_examples=300, deadline=None)
@given(_words, _words)
def test_fuzzy_dist_le1_matches_reference_dp(a, b):
    import numpy as np

    from etl_ray.stages.fuzzy import _dist_le1, _pad_matrix

    if abs(len(a) - len(b)) > 1:
        return  # blocking prefilter: verifier is only ever called in-band
    m, lens = _pad_matrix([a, b], 48)
    got = _dist_le1(m, lens, np.array([0]), np.array([1]))[0]
    assert bool(got) == (_lev(a, b) <= 1)


@settings(max_examples=300, deadline=None)
@given(_words, _words)
def test_fuzzy_neighborhood_blocking_is_lossless(a, b):
    """SymSpell completeness: any pair within distance 1 shares at least
    one deletion-neighborhood member (the property the candidate
    generation relies on to be exact)."""
    from etl_ray.stages.fuzzy import _neighborhood

    if _lev(a, b) <= 1:
        assert set(_neighborhood(a)) & set(_neighborhood(b))
