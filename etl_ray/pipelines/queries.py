"""Operator-inventory query suite over the driver's testdata tables.

One function per implemented operator family from SURVEY.md §2 (plus the
target-added training-data ops).  Every function takes ``sf_dir`` and
returns a ``ray.data.Dataset`` / ``pyarrow.Table``; the matching DuckDB
oracle SQL lives in ``__ray_entry__.oracle_sql``.

Determinism rules shared with the oracles (so value-hashes match):
* money/float measures aggregate as integer cents via ``floor(x*100)`` —
  float sums are order-sensitive across engines, int64 sums are exact;
* float columns that pass through unchanged are safe to compare;
* divisions of identical operands (ratios) are IEEE-identical and safe.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Min, Sum

from ..stages.hashutil import hash_bucket
from ..stages.merge import lww_compact


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _read_parquet(paths, **kw):
    """ray.data.read_parquet with table-level schema METADATA stripped.

    Input parquet written by pandas carries a b'pandas' schema-metadata
    dict; pyarrow makes such schemas UNHASHABLE, so every Ray Data block
    concat/unify logs 'Failed to hash the schemas (for deduplication):
    unhashable type: dict' (transform_pyarrow.py:181) and skips its
    fast-path dedup.  Passing an explicit metadata-free schema keeps the
    blocks clean end-to-end."""
    if "schema" not in kw:
        import pyarrow.parquet as pq_

        p0 = paths[0] if isinstance(paths, (list, tuple)) else paths
        s = pq_.read_schema(p0)
        if s.metadata:
            cols = kw.get("columns")
            if cols is not None:
                s = pa.schema([s.field(c) for c in cols])
            kw["schema"] = s.remove_metadata()
    return ray.data.read_parquet(paths, **kw)


def _cents(arr) -> pa.Array:
    """floor(x*100) as int64 — deterministic money representation."""
    return pc.cast(pc.floor(pc.multiply(arr, pa.scalar(100.0))), pa.int64())


def _hug2d(v: int) -> float:
    """DuckDB ``CAST(x::HUGEINT AS DOUBLE)`` parity.  DuckDB's
    CastBigintToFloating over the two's-complement (upper:int64,
    lower:uint64) halves computes

        upper == -1:  -(double)(2^64 - 1 - lower) - 1
        otherwise:    (double)lower + (double)upper * (double)(2^64 - 1)

    (note the 2^64 - 1 multiplier), which double-rounds for |v| >= 2^63
    and can land 1 ulp away from Python's correctly-rounded
    ``float(int)``.  Any engine float derived from an integer the ORACLE
    casts from HUGEINT goes through this mirror so the tails stay
    bit-identical (verified exhaustively against DuckDB across
    40-120-bit signed values; below 2^63 both paths agree exactly)."""
    upper = v >> 64
    lower = v & ((1 << 64) - 1)
    if upper == -1:
        return -float((1 << 64) - 1 - lower) - 1.0
    return float(lower) + float(upper) * float((1 << 64) - 1)


# ---------------------------------------------------------------------------
# relational core (reference operator families A1/A2, M4/M9, O, J1/J2, D2)
# ---------------------------------------------------------------------------


def q1_pricing_summary(sf_dir: str):
    """Grouped aggregate with per-batch partial pre-aggregation (A1;
    reference `src/pipeline/core/spark.py:448-451`)."""
    ds = _read_parquet(
        _p(sf_dir, "lineitem"),
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_shipdate",
        ],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.less_equal(t["l_shipdate"], pa.scalar(np.datetime64("1998-09-02", "us")))
        )
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": t["l_quantity"],
                "base_cents": _cents(t["l_extendedprice"]),
                "disc_cents": _cents(rev),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("base_cents", alias_name="sum_base_cents"),
            Sum("disc_cents", alias_name="sum_disc_cents"),
            Count(alias_name="count_order"),
        )
    )


def project_cast_lineitem(sf_dir: str):
    """Rename+cast projection w/ derived columns (M4/M5/M9)."""
    ds = _read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prj(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "order_key": t["l_orderkey"],
                "line_number": pc.cast(t["l_linenumber"], pa.int64()),
                "quantity": t["l_quantity"],
                "revenue_cents": _cents(rev),
                "ship_year": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
            }
        )

    return ds.map_batches(prj, batch_format="pyarrow")


def filter_click_events(sf_dir: str):
    """Vectorized predicate filter (M16/M17)."""
    ds = _read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "event_type", "value"]
    )
    return ds.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t["event_type"], pa.scalar("click")),
                    pc.greater(t["value"], pa.scalar(100.0)))
        ).select(["event_id", "user_id", "value"]),
        batch_format="pyarrow",
    )


def anti_join_customers_without_orders(sf_dir: str):
    """Anti join (J1; reference's driver-collected key list,
    `spark.py:135-140`), via the broadcast/shuffle switch: key side is
    ray.put + per-batch ``pc.is_in`` when it fits, native hash-partitioned
    ``left_anti`` Dataset.join when it does not (stages/joins.py)."""
    from ..stages.joins import key_filter_join

    okeys = _read_parquet(
        _p(sf_dir, "orders"), columns=["o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(
            pc.less(t["o_orderdate"], pa.scalar(np.datetime64("1996-01-01", "us")))
        ).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    left = _read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_name"])
    return key_filter_join(left, okeys, left_on="c_custkey", right_on="o_custkey", anti=True)


def semi_join_customers_with_open_orders(sf_dir: str):
    """Semi join (J2; reference `spark.py:140`), same switched operator."""
    from ..stages.joins import key_filter_join

    open_orders = _read_parquet(
        _p(sf_dir, "orders"), columns=["o_custkey", "o_orderstatus"]
    ).map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], pa.scalar("O"))).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    left = _read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_name"])
    return key_filter_join(left, open_orders, left_on="c_custkey", right_on="o_custkey")


def upsert_lww_events(sf_dir: str):
    """THE flagship semantics on shared data: treat `events` as a change
    log keyed by user_id, LWW-ordered by (ts, event_id) — per-batch
    combiner then per-key reduce, exactly the CDC merge shape (K3/A4/D2;
    reference chains upsert `src/pipeline/core/spark.py:134-177`)."""
    ds = _read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "ts", "user_id", "event_type", "value"]
    )

    # shuffle on a hash BUCKET of the key, not the raw key: Ray groupby
    # dispatch costs ~100us per distinct group (BASELINE.md), so at 10^8
    # users the per-key shuffle is the wall.  lww_compact is already
    # vectorized per-key WITHIN a bucket (bucket is a function of the key).
    def combine(t: pa.Table) -> pa.Table:
        t = lww_compact(t, key="user_id", order_by=("ts", "event_id"))
        return t.append_column("bucket", hash_bucket(t["user_id"], 256))

    def reduce_bucket(g: pa.Table) -> pa.Table:
        return lww_compact(g.drop_columns(["bucket"]), key="user_id", order_by=("ts", "event_id"))

    final = (
        ds.map_batches(combine, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pyarrow")
    )
    return final.map_batches(
        lambda t: t.select(["user_id", "ts", "event_type", "value"]),
        batch_format="pyarrow",
    )


def topk_orders(sf_dir: str):
    """Global sort + limit (O; verification-style)."""
    ds = _read_parquet(_p(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(100)


def distinct_segments(sf_dir: str):
    """Distinct values of one column (D-family)."""
    ds = _read_parquet(_p(sf_dir, "customer"), columns=["c_mktsegment"])
    vals = sorted(ds.unique("c_mktsegment"))
    return pa.table({"c_mktsegment": pa.array(vals, pa.string())})


def union_distinct_ids(sf_dir: str):
    """Union + distinct across two sources."""
    a = _read_parquet(_p(sf_dir, "events"), columns=["user_id"]).map_batches(
        lambda t: pa.table({"id": pc.cast(t["user_id"], pa.int64())}), batch_format="pyarrow"
    )
    b = _read_parquet(_p(sf_dir, "customer"), columns=["c_custkey"]).map_batches(
        lambda t: pa.table({"id": pc.cast(t["c_custkey"], pa.int64())}), batch_format="pyarrow"
    )
    vals = sorted(a.union(b).unique("id"))
    return pa.table({"id": pa.array(vals, pa.int64())})


def hourly_event_stats(sf_dir: str):
    """Streaming-shaped tumbling window: 1h tumble per event_type
    (SURVEY §2.10 — no watermarks; event-time bucketing) via the
    reusable `stages.windows.tumbling` operator."""
    from ..stages.windows import tumbling

    ds = _read_parquet(_p(sf_dir, "events"), columns=["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"ts": t["ts"], "event_type": t["event_type"], "value_cents": _cents(t["value"])}
        )

    return tumbling(
        ds.map_batches(prep, batch_format="pyarrow"),
        ts_col="ts",
        by=["event_type"],
        value_col="value_cents",
        out_col="hour",
    )


def revenue_by_segment(sf_dir: str):
    """Broadcast hash join + partial aggregation (J-family + A1):
    dimension (customer) is ray.put once; fact (orders) streams; per-batch
    pre-aggregation shrinks the shuffle to |segments| rows per block."""
    cust = pa.concat_tables(
        ray.get(
            _read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]).to_arrow_refs()
        )
    )
    seg_ref = ray.put(
        (cust["c_custkey"].combine_chunks(), cust["c_mktsegment"].combine_chunks())
    )

    def join_and_partial(t: pa.Table) -> pa.Table:
        keys, vals = ray.get(seg_ref)
        # vectorized dim lookup: position of each fact key in the dim key
        # array, then take the value column (missing key -> null)
        pos = pc.index_in(t["o_custkey"], value_set=keys)
        segs = pc.take(vals, pos)
        tt = pa.table(
            {"c_mktsegment": segs, "price_cents": _cents(t["o_totalprice"])}
        ).filter(pc.is_valid(segs))
        return tt.group_by("c_mktsegment").aggregate(
            [("price_cents", "sum"), ("price_cents", "count")]
        ).rename_columns(["c_mktsegment", "partial_cents", "partial_n"])

    return (
        _read_parquet(_p(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
        .map_batches(join_and_partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("partial_cents", alias_name="revenue_cents"),
            Sum("partial_n", alias_name="n_orders"),
        )
    )


def customers_per_region(sf_dir: str):
    """Join chain over two broadcast dims (region->nation->customer)."""
    nation = pa.concat_tables(
        ray.get(_read_parquet(_p(sf_dir, "nation")).to_arrow_refs())
    )
    region = pa.concat_tables(
        ray.get(_read_parquet(_p(sf_dir, "region")).to_arrow_refs())
    )
    # pre-join the two tiny dims driver-side (nation -> region name), then
    # broadcast (key array, value array) for a vectorized index_in lookup
    rpos = pc.index_in(nation["n_regionkey"], value_set=region["r_regionkey"].combine_chunks())
    nref = ray.put(
        (
            nation["n_nationkey"].combine_chunks(),
            pc.take(region["r_name"].combine_chunks(), rpos),
        )
    )

    def tag(t: pa.Table) -> pa.Table:
        keys, vals = ray.get(nref)
        pos = pc.index_in(t["c_nationkey"], value_set=keys)
        return pa.table({"r_name": pc.take(vals, pos)})

    return (
        _read_parquet(_p(sf_dir, "customer"), columns=["c_nationkey"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Count(alias_name="n_customers"))
    )


def json_extract_props(sf_dir: str):
    """Per-batch JSON parse (M1/M11-style escape hatch)."""
    ds = _read_parquet(_p(sf_dir, "events"), columns=["event_id", "props"])

    def ext(t: pa.Table) -> pa.Table:
        ks = [json.loads(p).get("k") if p else None for p in t["props"].to_pylist()]
        return pa.table({"event_id": t["event_id"], "k": pa.array(ks, pa.int64())})

    return ds.map_batches(ext, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# text / dedup / similarity (target-added operator families)
# ---------------------------------------------------------------------------


def token_count_docs(sf_dir: str):
    from ..stages.text import TokenCounter

    ds = _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(TokenCounter, batch_format="pyarrow", concurrency=(1, 8)).map_batches(
        lambda t: t.select(["doc_id", "n_tokens"]), batch_format="pyarrow"
    )


def quality_docs(sf_dir: str):
    from ..stages.text import QualityScorer

    ds = _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(QualityScorer, batch_format="pyarrow", concurrency=(1, 8)).map_batches(
        lambda t: t.select(["doc_id", "n_chars_counted", "n_alpha", "n_punct", "alpha_ratio"]),
        batch_format="pyarrow",
    )


def fingerprint_docs(sf_dir: str):
    from ..stages.text import Fingerprinter

    ds = _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    fp = Fingerprinter()

    def add(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "fp_md5": pa.array([fp.md5_norm(x) for x in t["text"].to_pylist()], pa.string()),
            }
        )

    return ds.map_batches(add, batch_format="pyarrow")


def dedup_docs_exact(sf_dir: str):
    from ..stages.dedup import exact_dedup

    ds = _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    # return_rows=False: downstream only needs the keep-set, so nothing
    # but (id, digest) ever shuffles
    return exact_dedup(ds, return_rows=False)


def shingle_jaccard_docs(sf_dir: str):
    from ..stages.dedup import shingle_jaccard_pairs

    ds = _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return shingle_jaccard_pairs(ds, ngram=3, max_df=64, threshold=0.5)


def dup_clusters_docs(sf_dir: str):
    """Transitive near-dup clusters: shingle-Jaccard pairs -> distributed
    connected components (min-label propagation + pointer jumping).  One
    row per doc touched by a pair: (doc_id, cluster_id = min doc id of
    the component).  Oracle: DuckDB recursive CTE over the same pair
    predicate."""
    from ..stages.dedup import dup_clusters, shingle_jaccard_pairs

    ds = _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    pairs = shingle_jaccard_pairs(ds, ngram=3, max_df=64, threshold=0.5)
    return dup_clusters(pairs)


def _query_vectors(sf_dir: str, upper: int) -> dict[int, np.ndarray]:
    """Pruned driver-side read of the query sample: only the two needed
    columns and only vec_id < upper row groups leave storage."""
    import pyarrow.parquet as pq

    from ..stages.similarity import _to_matrix

    tbl = pq.read_table(
        _p(sf_dir, "embeddings"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", upper)],
    )
    m = _to_matrix(tbl, "embedding")
    return {int(i): m[j] for j, i in enumerate(tbl.column("vec_id").to_pylist())}


def range_join_events_sessions(sf_dir: str):
    """Distributed interval join (stages/asof.py interval_join): each
    event paired with ALL of the same user's events in the 2 days up to
    it, inclusive (self-pairs included — a session-context expansion, the
    shape of "recent history per example" feature joins).  Same
    co-partition + vectorized searchsorted machinery as the as-of join,
    plus segment expansion for the one-to-many window."""
    from ..stages.asof import interval_join

    left = _read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "ts", "user_id"]
    )
    right = _read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "ts", "user_id"]
    ).map_batches(
        lambda t: pa.table(
            {"user_id": t["user_id"], "prior_ts": t["ts"], "prior_event_id": t["event_id"]}
        ),
        batch_format="pyarrow",
    )
    day_us = 86_400_000_000
    return interval_join(
        left,
        right,
        on="user_id",
        left_ts="ts",
        right_ts="prior_ts",
        lo_offset=-2 * day_us,
        hi_offset=0,
    )


def topk_events_per_user(sf_dir: str):
    """Grouped top-k (stages/topk.py): each user's 3 highest-value events,
    ranked; ties break on event_id.  Bounded-bucket shuffle + vectorized
    in-bucket ranking — no per-distinct-user dispatch (~100us/group in
    Ray groupby would be ruinous at 10^8 users)."""
    from ..stages.topk import grouped_topk

    ds = _read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "value"]
    )
    return grouped_topk(
        ds,
        group_col="user_id",
        order_by=[("value", "desc"), ("event_id", "desc")],
        k=3,
    )


def asof_join_events_orders(sf_dir: str):
    """Point-in-time enrichment via the distributed as-of join (a custom
    operator Ray Data lacks; stages/asof.py): each event picks the user's
    LATEST order at or before the event time; ties on order date resolve
    to the greatest o_orderkey.  One hash-bucket shuffle, vectorized
    searchsorted merge per bucket."""
    from ..stages.asof import asof_join

    left = _read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "ts", "user_id"]
    )
    right = _read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"],
    ).map_batches(
        lambda t: t.rename_columns(
            ["user_id", "o_orderdate", "o_orderkey", "o_totalprice"]
        ),
        batch_format="pyarrow",
    )
    return asof_join(
        left,
        right,
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        tiebreak="o_orderkey",
    )


def knn_brute_embeddings(sf_dir: str):
    from ..stages.similarity import knn_brute

    queries = _query_vectors(sf_dir, 4)
    ds = _read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    out = knn_brute(ds, queries, k=10)
    return out.map_batches(lambda t: t.select(["query_id", "vec_id"]), batch_format="pyarrow")


# -- rows-only (no SQL-expressible oracle) ----------------------------------


def text_profile_docs(sf_dir: str):
    """LangId (stopword-hit argmax) + english stopword ratio.  Both are
    SQL-reproducible (list_filter + greatest/CASE), so this is oracle-
    checked; the BPE-ish token estimate (lookahead regex, not RE2-safe)
    stays a pytest-only column on TokenCounter."""
    from ..stages.text import LangId, QualityScorer

    ds = _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    out = (
        ds.map_batches(QualityScorer, batch_format="pyarrow", concurrency=(1, 8))
        .map_batches(LangId, batch_format="pyarrow", concurrency=(1, 8))
    )
    return out.map_batches(
        lambda t: t.select(["doc_id", "lang_pred", "stop_ratio_en"]),
        batch_format="pyarrow",
    )


def _dedup_truth_fixture(sf_dir: str) -> str:
    """Fixture-carried ground truth for the signature-based dedup oracles
    (the `payload_md5` pattern): per-doc minhash signatures, band hashes
    and simhash values computed by PLAIN-PYTHON reference loops — not the
    pipeline's chunked/vectorized kernels — written once next to /tmp and
    joined by the DuckDB oracles.  The engine still computes everything
    itself; the oracle checks the distributed banding/bucketing/join
    machinery against the per-doc definition.  Atomic publish (tmp dir +
    rename); cached across processes."""
    import tempfile
    import zlib

    import pyarrow.parquet as pq

    from ..stages.dedup import _MERSENNE, _SHINGLE_C, MinHasher, _word_tokens

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    root = os.path.join(tempfile.gettempdir(), f"etlray_dedup_truth_{sf_name}")
    if os.path.exists(os.path.join(root, "simhash.parquet")):
        return root

    k, bands, ngram, seed = 64, 16, 3, 42
    rpb = k // bands
    C = int(_SHINGLE_C)
    M64 = 1 << 64
    hp = MinHasher(k=k, ngram=ngram, seed=seed)  # only for the (a, b) params
    a_par = [int(x) for x in hp.a]
    b_par = [int(x) for x in hp.b]

    tbl = pq.read_table(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    doc_ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()

    sig_rows, band_rows, sim_rows = [], [], []
    for did, text in zip(doc_ids, texts):
        words = _word_tokens(text)
        wh = [zlib.crc32(w.encode()) for w in words]
        # shingle hashes: wrapping multiply-add chains, plain ints
        if not wh:
            shingles = []
        elif len(wh) < ngram:
            acc = 0
            for h in wh:
                acc = (acc * C + h) % M64
            shingles = [acc]
        else:
            ss = set()
            for j in range(len(wh) - ngram + 1):
                acc = 0
                for h in wh[j : j + ngram]:
                    acc = (acc * C + h) % M64
                ss.add(acc)
            shingles = sorted(ss)
        # the permutation is DEFINED in uint64 arithmetic (numpy wraps the
        # product mod 2^64 before the Mersenne mod) — reproduce that wrap
        sig = [
            min(
                ((((ai * s) % M64 + bi) % M64) % _MERSENNE for s in shingles),
                default=0,
            )
            for ai, bi in zip(a_par, b_par)
        ]
        sig_rows.append(sig)
        for b in range(bands):
            hs = b + 1
            for c in sig[b * rpb : (b + 1) * rpb]:
                hs = (hs * C + c) % M64
            band_rows.append((did, hs))
        # simhash: per-bit majority of word-hash bits, plain ints
        swh = [
            (zlib.crc32(w.encode()) | (zlib.crc32(w[::-1].encode()) << 32))
            for w in words
        ]
        sh = 0
        for bit in range(64):
            c = sum((h >> bit) & 1 for h in swh)
            if 2 * c - len(swh) > 0:
                sh |= 1 << bit
        sim_rows.append(sh if sh < (1 << 63) else sh - M64)  # two's-complement int64

    tmp = f"{root}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "sig": pa.array(sig_rows, pa.list_(pa.uint64())),
            }
        ),
        os.path.join(tmp, "minhash_sigs.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in band_rows], pa.int64()),
                "band_hash": pa.array([r[1] for r in band_rows], pa.uint64()),
            }
        ),
        os.path.join(tmp, "minhash_bands.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "simhash": pa.array(sim_rows, pa.int64()),
            }
        ),
        os.path.join(tmp, "simhash.parquet"),
    )
    try:
        os.rename(tmp, root)
    except OSError:  # concurrent builder won the race
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return root


def minhash_pairs_docs(sf_dir: str):
    from ..stages.dedup import minhash_lsh_pairs

    ds = _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return minhash_lsh_pairs(ds, threshold=0.6)


def simhash_groups_docs(sf_dir: str):
    from ..stages.dedup import simhash_dup_groups

    ds = _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    out = simhash_dup_groups(ds)
    return out.map_batches(
        lambda t: t.select(["simhash", "n"]), batch_format="pyarrow"
    )


def knn_lsh_embeddings(sf_dir: str):
    """LSH top-k, driver entry: probe_radius == bits probes every bucket,
    so the result is EXACTLY the brute-force top-k (same SQL oracle) while
    still exercising the full bucket-shuffle machinery; partial-radius
    recall is pinned by pytest (tests/test_dedup_similarity.py)."""
    from ..stages.similarity import knn_lsh

    queries = _query_vectors(sf_dir, 4)
    ds = _read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    out = knn_lsh(ds, queries, k=10, bits=5, probe_radius=5)
    return out.map_batches(lambda t: t.select(["query_id", "vec_id"]), batch_format="pyarrow")


def _media_fixture_path() -> str:
    """Deterministic media fixture parquet, shared by the Ray pipeline and
    the DuckDB oracle.  Carries ``payload_md5`` (hex, computed at fixture
    build time) so the oracle can reproduce the engine's md5-derived fake
    decode without a BLOB md5 function (this DuckDB has md5(VARCHAR) only).
    The engine ignores that column and hashes the payload bytes itself."""
    import hashlib

    import pyarrow.parquet as pq

    from ..stages.multimodal import make_fake_media_table

    path = "/tmp/etlray_media_256.parquet"
    if not os.path.exists(path):
        tbl = make_fake_media_table(256, seed=42)
        md5s = [
            hashlib.md5(p).hexdigest() if p else None
            for p in tbl.column("payload").to_pylist()
        ]
        tbl = tbl.append_column("payload_md5", pa.array(md5s, pa.string()))
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
    return path


def multimodal_features(sf_dir: str):
    """Actor-pool decode/feature plumbing over deterministic fake media."""
    from ..stages.multimodal import FeatureExtractor, ImageDecoder

    ds = _read_parquet(_media_fixture_path())
    out = ds.map_batches(
        ImageDecoder, batch_format="pyarrow", batch_size=64, concurrency=(1, 8)
    ).map_batches(FeatureExtractor, batch_format="pyarrow", batch_size=64, concurrency=(1, 8))
    return out.map_batches(
        lambda t: t.select(["media_id", "dec_height", "dec_width", "dec_channels"]),
        batch_format="pyarrow",
    )


def training_prep_docs(sf_dir: str):
    """Composite training-data prep pipeline (the shape a 100 TB corpus
    job runs end-to-end): quality gate -> exact near-dup removal -> token
    accounting.  The only pinned intermediate is NARROW — (doc_id,
    fp_md5, n_tokens), ~50 bytes/doc: the content digest is computed in
    the streaming gate stage while the text flows past, so the full-width
    corpus is never materialized (round-2 verdict item 5).  Both
    consumers (dedup keep-set + token join) read the narrow table."""
    from ..stages.dedup import exact_dedup
    from ..stages.text import Fingerprinter, QualityScorer, TokenCounter

    ds = _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    scored = ds.map_batches(TokenCounter, batch_format="pyarrow", concurrency=(1, 8)).map_batches(
        QualityScorer, batch_format="pyarrow", concurrency=(1, 8)
    )
    fp = Fingerprinter()

    def gate(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t["alpha_ratio"], pa.scalar(0.5)),
            pc.greater_equal(t["n_tokens"], pa.scalar(10, pa.int64())),
        )
        kept = t.filter(keep)
        digests = pa.array(
            [fp.md5_norm(x) for x in kept["text"].to_pylist()], pa.string()
        )
        return pa.table(
            {"doc_id": kept["doc_id"], "fp_md5": digests, "n_tokens": kept["n_tokens"]}
        )

    # materialize the narrow gated intermediate: BOTH the dedup branch and
    # the keep-set join read it — without this the streaming plan would
    # instantiate the scoring actor pools twice (re-executing the Python
    # scoring AND deadlocking small sessions on actor reservations)
    gated = scored.map_batches(gate, batch_format="pyarrow").materialize()
    winners = exact_dedup(gated, return_rows=False, digest_col="fp_md5")

    # keep-set is a Dataset of winner ids; join back to carry n_tokens
    import ray as _ray

    ncpu = int(_ray.cluster_resources().get("CPU", 8))
    npart = max(2, min(64, ncpu // 2))
    kept = winners.join(
        gated.map_batches(
            lambda t: t.select(["doc_id", "n_tokens"]), batch_format="pyarrow"
        ),
        "inner",
        num_partitions=npart,
        on=("doc_id",),
    )
    return kept


def multimodal_frames(sf_dir: str):
    """FrameSampler plumbing: deterministic frame byte-ranges per media
    row, exploded to (media_id, frame_idx, offset, length) rows so the
    DuckDB oracle can reproduce them from octet_length(payload)."""
    from ..stages.multimodal import FrameSampler

    ds = _read_parquet(_media_fixture_path())
    sampled = ds.map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=64, concurrency=(1, 8)
    )

    def explode(t: pa.Table) -> pa.Table:
        frames = t.column("frames").combine_chunks()
        counts = np.diff(frames.offsets.to_numpy(zero_copy_only=False))
        mids = np.repeat(t.column("media_id").to_numpy(zero_copy_only=False), counts)
        idx = np.concatenate([np.arange(c) for c in counts]) if len(counts) else np.array([], np.int64)
        vals = frames.flatten()
        return pa.table(
            {
                "media_id": pa.array(mids, pa.int64()),
                "frame_idx": pa.array(idx, pa.int64()),
                "offset": pc.struct_field(vals, "offset"),
                "length": pc.struct_field(vals, "length"),
            }
        )

    return sampled.map_batches(explode, batch_format="pyarrow")


_CDC_SIZES = {"sf0.001": (300, 1500), "sf0.01": (1000, 8000), "sf0.1": (4000, 40000)}


def _cdc_fixture(n_urls: int, n_events: int) -> str:
    """Deterministic cached CDC fixture (base + WAL + flattened oracle
    event table) under /tmp; atomic publish; no Ray needed.  Returns the
    fixture root dir.  Callable from both the query and ``oracle_sql()``
    (the driver may run either side first)."""
    import tempfile

    import pyarrow.parquet as pq

    from ..gen import WalSpec, generate_dataset
    from ..oracle import flat_events_table

    root = os.path.join(tempfile.gettempdir(), f"etlray_cdc_{n_urls}_{n_events}")
    data_dir = os.path.join(root, "data")
    if not os.path.exists(os.path.join(data_dir, "wal")):
        # generate into a private dir, publish with one atomic rename —
        # concurrent callers must never observe a half-written fixture
        tmp_dir = f"{data_dir}.tmp.{os.getpid()}"
        paths = generate_dataset(
            tmp_dir, WalSpec(n_urls=n_urls, n_events=n_events, n_segments=8)
        )
        pq.write_table(
            flat_events_table(paths["base"], paths["segments"]),
            os.path.join(tmp_dir, "oracle_events.parquet"),
        )
        try:
            os.rename(tmp_dir, data_dir)
        except OSError:  # someone else won the race
            import shutil

            shutil.rmtree(tmp_dir, ignore_errors=True)
    elif not os.path.exists(os.path.join(data_dir, "oracle_events.parquet")):
        # fixture from an older run without the flat oracle table: backfill
        from .replay import list_segments

        tmp = os.path.join(data_dir, f"oracle_events.tmp.{os.getpid()}")
        pq.write_table(
            flat_events_table(
                os.path.join(data_dir, "base", "pages.parquet"),
                list_segments(os.path.join(data_dir, "wal")),
            ),
            tmp,
        )
        os.replace(tmp, os.path.join(data_dir, "oracle_events.parquet"))
    return root


def cdc_replay_pages(sf_dir: str):
    """The flagship CDC pipeline itself, scaled by sf_dir.  The driver
    oracle is real SQL over a flattened event table written next to the
    fixture: the LWW/delete/schema-evolution semantics live in the SQL
    window query (`__ray_entry__.oracle_sql`); per-event ``text`` comes
    from the shared pure ``extract_text`` (byte-identity is additionally
    pinned by the pytest differential suite)."""
    from .replay import bootstrap_lake, read_table_arrow, replay

    n_urls, n_events = _CDC_SIZES.get(os.path.basename(sf_dir.rstrip("/")), (300, 1500))
    root = _cdc_fixture(n_urls, n_events)
    data_dir = os.path.join(root, "data")
    lake_root = os.path.join(root, "lake", str(os.getpid()), "pages")
    bootstrap_lake(lake_root, os.path.join(data_dir, "base", "pages.parquet"), num_partitions=16)
    replay(lake_root, os.path.join(data_dir, "wal"))
    out = read_table_arrow(lake_root)
    return out.select(["url", "warc_ts", "text", "lang"])


def cdc_replay_pages_delta(sf_dir: str):
    """The flagship replay in merge-on-read delta mode, deliberately LEFT
    UNFOLDED: segments apply as 3 incremental transactions whose delta
    chains stay in place, so the result is served through the chain-
    merging read path (base ∪ deltas LWW-reduced per partition).  Same
    SQL oracle as ``cdc_replay_pages`` — final state must be identical
    to rewrite mode; only write amplification differs."""
    from .replay import bootstrap_lake, read_table_arrow, replay

    n_urls, n_events = _CDC_SIZES.get(os.path.basename(sf_dir.rstrip("/")), (300, 1500))
    root = _cdc_fixture(n_urls, n_events)
    data_dir = os.path.join(root, "data")
    lake_root = os.path.join(root, "lake", f"delta{os.getpid()}", "pages")
    bootstrap_lake(lake_root, os.path.join(data_dir, "base", "pages.parquet"), num_partitions=16)
    replay(
        lake_root, os.path.join(data_dir, "wal"),
        max_segments_per_tx=3, merge_mode="delta",
    )
    out = read_table_arrow(lake_root)
    return out.select(["url", "warc_ts", "text", "lang"])


def schema_evolution_pages(sf_dir: str):
    """The flagship replay followed by LIVE metadata-only schema
    evolution — the full Iceberg-style triple on a committed lake:
    ``rename_column(lang -> language)`` then ``drop_column(html)``,
    each ONE manifest transaction with zero file rewrites (reference
    evolves schemas by ALTER on the target table,
    clickhouse_client.py's DDL path; here evolution is a lake-manifest
    edit and every read normalizes through the rename chain + drop
    log).  The serving read must present current-era names with the
    dropped column excluded even though every stored part file still
    carries pre-evolution bytes.  The SQL oracle is the same LWW
    window query with the rename expressed as an alias and the drop
    as column exclusion — value-hash equality proves the era mapping
    is exact, not just shaped right."""
    from .maintenance import drop_column, rename_column
    from .replay import bootstrap_lake, read_table_arrow, replay

    n_urls, n_events = _CDC_SIZES.get(os.path.basename(sf_dir.rstrip("/")), (300, 1500))
    root = _cdc_fixture(n_urls, n_events)
    data_dir = os.path.join(root, "data")
    lake_root = os.path.join(root, "lake", f"evo{os.getpid()}", "pages")
    bootstrap_lake(lake_root, os.path.join(data_dir, "base", "pages.parquet"), num_partitions=16)
    replay(lake_root, os.path.join(data_dir, "wal"))
    rename_column(lake_root, "lang", "language")
    drop_column(lake_root, "html")
    out = read_table_arrow(lake_root)
    return out.select(["url", "warc_ts", "text", "language"])


def gdpr_delete_pages(sf_dir: str):
    """The flagship replay followed by a GDPR-style predicate delete
    (takedown of one whole domain): ``delete_where(url prefix
    'https://d1.example.')`` payload-nulls every matching live row in
    ONE manifest transaction, rewriting only the partitions whose
    parquet footer statistics admit a possible match — the 100 TB
    right-to-be-forgotten shape (metadata probe, then O(matching
    partitions) work).  The purge tombstone keeps its original
    (warc_ts, _lsn) order key so late WAL redelivery cannot resurrect
    the data (tests/test_delete_where.py pins that protocol).  The
    reference never deletes from its lake (rows only accumulate,
    client_clickhouse.py); a web-page corpus needs this operator.
    Oracle: the same LWW window query with the takedown expressed as a
    NOT LIKE filter — value-hash equality proves the purge removed
    exactly the predicate rows and nothing else."""
    from .maintenance import delete_where
    from .replay import bootstrap_lake, read_table_arrow, replay

    n_urls, n_events = _CDC_SIZES.get(os.path.basename(sf_dir.rstrip("/")), (300, 1500))
    root = _cdc_fixture(n_urls, n_events)
    data_dir = os.path.join(root, "data")
    lake_root = os.path.join(root, "lake", f"gdpr{os.getpid()}", "pages")
    bootstrap_lake(lake_root, os.path.join(data_dir, "base", "pages.parquet"), num_partitions=16)
    replay(lake_root, os.path.join(data_dir, "wal"))
    delete_where(lake_root, "url", "prefix", "https://d1.example.")
    out = read_table_arrow(lake_root)
    return out.select(["url", "warc_ts", "text", "lang"])


def pages_per_domain(sf_dir: str):
    """Webtext rollup over the replayed CDC lake: top-10 hosts by live
    page count (deterministic tie-break on host).  Exercises the
    vectorized URL parser + bucketed domain reduce (stages/urlops.py)
    over the streaming lake read — pages never concentrate anywhere,
    only (bucket, host) pairs shuffle."""
    from ..stages.urlops import top_domains
    from .replay import bootstrap_lake, read_table, replay

    n_urls, n_events = _CDC_SIZES.get(os.path.basename(sf_dir.rstrip("/")), (300, 1500))
    root = _cdc_fixture(n_urls, n_events)
    data_dir = os.path.join(root, "data")
    lake_root = os.path.join(root, "lake", f"dom{os.getpid()}", "pages")
    bootstrap_lake(lake_root, os.path.join(data_dir, "base", "pages.parquet"), num_partitions=16)
    replay(lake_root, os.path.join(data_dir, "wal"))
    return top_domains(read_table(lake_root, columns=["url"]), k=10, key="host")


def quantiles_events(sf_dir: str):
    """Distributed exact quantiles of the events value column (sort +
    metadata split selection; stages/quantiles.py)."""
    from ..stages.quantiles import exact_quantiles

    ds = _read_parquet(_p(sf_dir, "events"), columns=["value"])
    return exact_quantiles(ds, "value", [0.25, 0.5, 0.9, 0.99])


def cdc_table_diff(sf_dir: str):
    """Reverse CDC: net change stream (op, url, warc_ts) between the
    bootstrap snapshot and the fully-replayed head, via manifest-pruned,
    shuffle-free per-partition diff (pipelines/diff.py).  Oracle: LWW
    winner state vs the base table, classified in SQL."""
    from ..state.manifest import LakeTable
    from .diff import table_diff
    from .replay import bootstrap_lake, replay

    n_urls, n_events = _CDC_SIZES.get(os.path.basename(sf_dir.rstrip("/")), (300, 1500))
    root = _cdc_fixture(n_urls, n_events)
    data_dir = os.path.join(root, "data")
    lake_root = os.path.join(root, "lake", f"diff{os.getpid()}", "pages")
    bootstrap_lake(lake_root, os.path.join(data_dir, "base", "pages.parquet"), num_partitions=16)
    tx_boot = LakeTable(lake_root).read_manifest()["txid"]
    replay(lake_root, os.path.join(data_dir, "wal"))
    tx_head = LakeTable(lake_root).read_manifest()["txid"]
    return table_diff(lake_root, tx_boot, tx_head).drop_columns(["pid"])


def join_orders_lineitem_native(sf_dir: str):
    """Large-side equi join via Ray's native hash-partitioned Dataset.join
    (both sides stream; num_partitions bounds per-partition memory).
    Result: revenue cents per order priority."""
    orders = _read_parquet(
        _p(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"]
    )
    li = _read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def li_prep(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"], "rev_cents": _cents(rev)})

    li = li.map_batches(li_prep, batch_format="pyarrow")
    joined = orders.join(
        li, "inner", num_partitions=16, on=("o_orderkey",), right_on=("l_orderkey",)
    )
    return (
        joined.groupby("o_orderpriority")
        .aggregate(
            Sum("rev_cents", alias_name="revenue_cents"),
            Count(alias_name="n_lineitems"),
        )
    )


def embedding_neardup_pairs(sf_dir: str):
    """Embedding-cosine near-duplicate pairs (vec_id < 1000 sample, i<j,
    cosine >= 0.42): broadcast the sample matrix, one numpy matmul per
    batch — no shuffle of the corpus."""
    import pyarrow.parquet as pq_

    from ..stages.similarity import _normalize, _to_matrix

    tbl = pq_.read_table(
        _p(sf_dir, "embeddings"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", 1000)],
    )
    ids = tbl.column("vec_id").to_numpy(zero_copy_only=False)
    m = _normalize(_to_matrix(tbl, "embedding").astype(np.float64))
    m_ref = ray.put((ids, m))

    ds = _read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], pa.scalar(1000))),
        batch_format="pyarrow",
    )

    def pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_m = ray.get(m_ref)
        bid = batch.column("vec_id").to_numpy(zero_copy_only=False)
        out_a = np.empty(0, np.int64)
        out_b = np.empty(0, np.int64)
        if len(bid):
            bm = _normalize(_to_matrix(batch, "embedding").astype(np.float64))
            sims = bm @ all_m.T  # (B, N)
            ii, jj = np.nonzero(sims >= 0.42)
            keep = bid[ii] < all_ids[jj]  # i<j once, vectorized
            out_a = bid[ii][keep].astype(np.int64)
            out_b = all_ids[jj][keep].astype(np.int64)
        return pa.table(
            {"id_a": pa.array(out_a, pa.int64()), "id_b": pa.array(out_b, pa.int64())}
        )

    return ds.map_batches(pairs, batch_format="pyarrow")


def sliding_window_events(sf_dir: str):
    """Sliding window (2h size, 1h step) via the reusable
    `stages.windows.sliding` operator: each event lands in width/step
    windows via a per-batch flat-map, then one bounded groupby."""
    from ..stages.windows import sliding

    ds = _read_parquet(_p(sf_dir, "events"), columns=["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"ts": t["ts"], "event_type": t["event_type"], "value_cents": _cents(t["value"])}
        )

    return sliding(
        ds.map_batches(prep, batch_format="pyarrow"),
        ts_col="ts",
        by=["event_type"],
        value_col="value_cents",
    )


def session_windows_events(sf_dir: str):
    """Session windows (30 min inactivity gap) per user (SURVEY §2.10)
    via the reusable `stages.windows.sessionize` operator (bucketed
    shuffle + vectorized in-bucket sessionization; the DuckDB oracle
    reproduces it with lag() + cumulative sum)."""
    from ..stages.windows import sessionize

    ds = _read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts", "event_id"])
    return sessionize(ds, key_col="user_id", ts_col="ts", order_cols=("event_id",))


def knn_ivf_embeddings(sf_dir: str):
    """IVF top-k, driver entry: nprobe == n_lists scans every cell, so the
    result is EXACTLY the brute-force top-k (same SQL oracle) while still
    exercising the distributed k-means + cell-shuffle machinery;
    partial-nprobe recall is pinned by pytest."""
    from ..stages.similarity import knn_ivf

    queries = _query_vectors(sf_dir, 4)
    ds = _read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    out = knn_ivf(ds, queries, k=10, n_lists=8, nprobe=8)
    return out.map_batches(lambda t: t.select(["query_id", "vec_id"]), batch_format="pyarrow")


def sample_docs_hash(sf_dir: str):
    """Deterministic 25% Bernoulli sample of documents by md5(doc_id)
    threshold (stages/sampling.py): shuffle-free, row-local, exactly
    reproducible across runs and cluster widths.  Oracle is the same
    predicate in SQL via DuckDB md5()."""
    from ..stages.sampling import hash_sample

    ds = _read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "lang", "source"]
    )
    return hash_sample(ds, "doc_id", 0.25)


def stratified_sample_docs(sf_dir: str):
    """Per-language rebalancing sample: keep 12.5% of dominant `en`,
    all of `zh`/`de`, 50% of everything else — the canonical
    training-mix operation, still one streaming row-local filter."""
    from ..stages.sampling import stratified_sample

    ds = _read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"]
    )
    return stratified_sample(
        ds, "doc_id", "lang", {"en": 0.125, "zh": 1.0, "de": 1.0}, default_rate=0.5
    )


def train_eval_split_docs(sf_dir: str):
    """Disjoint deterministic 80/20 train/eval split, returned as one
    labeled table: both sides apply the SAME hash predicate with
    opposite sign, so the result is provably a partition of the corpus
    (the oracle's CASE expression checks exactly that)."""
    from ..stages.sampling import split

    ds = _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "lang"])
    train, ev = split(ds, "doc_id", eval_rate=0.2)
    tag = lambda name: (  # noqa: E731
        lambda t: t.append_column(
            "split", pa.array([name] * t.num_rows, pa.string())
        )
    )
    return train.map_batches(tag("train"), batch_format="pyarrow").union(
        ev.map_batches(tag("eval"), batch_format="pyarrow")
    )


def incremental_domain_stats(sf_dir: str):
    """Incremental view maintenance end-to-end (pipelines/views.py):
    build the per-host (n_pages, text_chars) view at the half-replayed
    lake, replay the remaining WAL, then REFRESH the view from the
    signed delta stream only — no table rescan.  The oracle recomputes
    the same rollup from scratch at head in SQL, so a green row proves
    incremental == full recompute."""
    from ..state.manifest import LakeTable
    from .replay import bootstrap_lake, list_segments, replay
    from .views import build_view, read_view, refresh_view

    n_urls, n_events = _CDC_SIZES.get(os.path.basename(sf_dir.rstrip("/")), (300, 1500))
    root = _cdc_fixture(n_urls, n_events)
    data_dir = os.path.join(root, "data")
    base = os.path.join(root, "lake", f"ivm{os.getpid()}")
    lake_root = os.path.join(base, "pages")
    view_root = os.path.join(base, "view")
    bootstrap_lake(lake_root, os.path.join(data_dir, "base", "pages.parquet"), num_partitions=16)
    wal = os.path.join(data_dir, "wal")
    segs = list_segments(wal)
    replay(lake_root, wal, segments=segs[: len(segs) // 2])
    build_view(view_root, lake_root)
    replay(lake_root, wal)  # the rest
    refresh_view(view_root, lake_root)
    assert _view_txid(view_root) == LakeTable(lake_root).read_manifest()["txid"]
    return read_view(view_root)


def _view_txid(view_root: str) -> str:
    with open(os.path.join(view_root, "VIEW.json")) as f:
        return json.load(f)["txid"]


# ---------------------------------------------------------------------------
# round-3 additions: analytic (window) functions, OLAP pivot/rollup,
# corpus vocabulary / repetition / inverted index
# ---------------------------------------------------------------------------


def user_event_analytics(sf_dir: str):
    """Per-user ordered window analytics (stages/analytic.py): row
    number, gap to previous event, running spend — one bounded
    hash-bucket shuffle, all window math vectorized inside buckets.
    Money runs as integer cents so the running sum is exact (float
    cumsums are engine-order-sensitive)."""
    from ..stages.analytic import partitioned_analytics

    ds = _read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "ts", "user_id", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "value_cents": _cents(t["value"]),
            }
        )

    out = partitioned_analytics(
        ds.map_batches(prep, batch_format="pyarrow"),
        key="user_id",
        order_by=["ts", "event_id"],
        lag_cols=["ts"],
        cum_cols=["value_cents"],
    )

    def finish(t: pa.Table) -> pa.Table:
        gap = pc.subtract(
            pc.cast(t["ts"], pa.int64()), pc.cast(t["ts_prev"], pa.int64())
        )
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "rn": t["rn"],
                "gap_us": gap,
                "cum_value_cents": t["cum_value_cents"],
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def pivot_orders_status(sf_dir: str):
    """Pivot (long -> wide): per-segment order counts by status plus open
    revenue, as conditional aggregates.  Broadcast dim join + per-batch
    partials, so the shuffle carries |segments| rows per block."""
    cust = pa.concat_tables(
        ray.get(
            _read_parquet(
                _p(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
            ).to_arrow_refs()
        )
    )
    seg_ref = ray.put(
        (cust["c_custkey"].combine_chunks(), cust["c_mktsegment"].combine_chunks())
    )

    def partial(t: pa.Table) -> pa.Table:
        keys, vals = ray.get(seg_ref)
        pos = pc.index_in(t["o_custkey"], value_set=keys)
        segs = pc.take(vals, pos)
        status = t["o_orderstatus"]
        cents = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        is_o = pc.equal(status, pa.scalar("O")).to_numpy(zero_copy_only=False)
        is_f = pc.equal(status, pa.scalar("F")).to_numpy(zero_copy_only=False)
        is_p = pc.equal(status, pa.scalar("P")).to_numpy(zero_copy_only=False)
        tt = pa.table(
            {
                "c_mktsegment": segs,
                "p_open": pa.array(is_o.astype(np.int64)),
                "p_filled": pa.array(is_f.astype(np.int64)),
                "p_partial": pa.array(is_p.astype(np.int64)),
                "p_cents": pa.array(np.where(is_o, cents, 0)),
            }
        ).filter(pc.is_valid(segs))
        return (
            tt.group_by("c_mktsegment")
            .aggregate(
                [
                    ("p_open", "sum"),
                    ("p_filled", "sum"),
                    ("p_partial", "sum"),
                    ("p_cents", "sum"),
                ]
            )
            .rename_columns(
                ["c_mktsegment", "p_open", "p_filled", "p_partial", "p_cents"]
            )
        )

    return (
        _read_parquet(
            _p(sf_dir, "orders"), columns=["o_custkey", "o_orderstatus", "o_totalprice"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("p_open", alias_name="n_open"),
            Sum("p_filled", alias_name="n_filled"),
            Sum("p_partial", alias_name="n_partial"),
            Sum("p_cents", alias_name="open_cents"),
        )
    )


def rollup_customers_region_segment(sf_dir: str):
    """ROLLUP(region, segment) over customers: detail rows, per-region
    subtotals, grand total (GROUPING SETS semantics, null = rolled-up
    level).  The detail aggregate streams + shuffles distributed; the
    subtotal derivation runs on the aggregate RESULT, which is bounded
    by |regions| x |segments| — driver-side by design, not a scale
    leak."""
    nation = pa.concat_tables(
        ray.get(_read_parquet(_p(sf_dir, "nation")).to_arrow_refs())
    )
    region = pa.concat_tables(
        ray.get(_read_parquet(_p(sf_dir, "region")).to_arrow_refs())
    )
    rpos = pc.index_in(
        nation["n_regionkey"], value_set=region["r_regionkey"].combine_chunks()
    )
    nref = ray.put(
        (
            nation["n_nationkey"].combine_chunks(),
            pc.take(region["r_name"].combine_chunks(), rpos),
        )
    )

    def tag(t: pa.Table) -> pa.Table:
        keys, vals = ray.get(nref)
        pos = pc.index_in(t["c_nationkey"], value_set=keys)
        return pa.table(
            {
                "r_name": pc.take(vals, pos),
                "c_mktsegment": t["c_mktsegment"],
                "bal_cents": _cents(t["c_acctbal"]),
            }
        )

    detail = (
        _read_parquet(
            _p(sf_dir, "customer"),
            columns=["c_nationkey", "c_mktsegment", "c_acctbal"],
        )
        .map_batches(tag, batch_format="pyarrow")
        .groupby(["r_name", "c_mktsegment"])
        .aggregate(
            Count(alias_name="n_customers"),
            Sum("bal_cents", alias_name="acctbal_cents"),
        )
    )
    # aggregate result is <= |regions| x |segments| rows: subtotal + total
    # levels derive from it locally (same rows a ROLLUP exchange would move).
    # Drop the executor's zero-column empty blocks before concat.
    d = pa.concat_tables(
        [t for t in ray.get(detail.to_arrow_refs()) if t.num_columns],
        promote_options="default",
    ).combine_chunks()
    by_region = d.group_by("r_name").aggregate(
        [("n_customers", "sum"), ("acctbal_cents", "sum")]
    )
    by_region = pa.table(
        {
            "r_name": by_region["r_name"],
            "c_mktsegment": pa.nulls(by_region.num_rows, pa.string()),
            "n_customers": by_region["n_customers_sum"],
            "acctbal_cents": by_region["acctbal_cents_sum"],
        }
    )
    total = pa.table(
        {
            "r_name": pa.nulls(1, pa.string()),
            "c_mktsegment": pa.nulls(1, pa.string()),
            "n_customers": pa.array(
                [pc.sum(d["n_customers"]).as_py()], pa.int64()
            ),
            "acctbal_cents": pa.array(
                [pc.sum(d["acctbal_cents"]).as_py()], pa.int64()
            ),
        }
    )
    return pa.concat_tables(
        [d.select(["r_name", "c_mktsegment", "n_customers", "acctbal_cents"]),
         by_region, total]
    )


def vocab_topk_docs(sf_dir: str):
    """Corpus vocabulary: top-50 tokens by frequency.  Per-batch Counter
    partials (stages/text.VocabPartials) bound the shuffle at
    n_batches x batch_vocab rows; the global sum is a |vocab|-row
    groupby, then a tiny sort+limit."""
    from ..stages.text import VocabPartials

    ds = _read_parquet(_p(sf_dir, "documents"), columns=["text"])
    return (
        ds.map_batches(VocabPartials, batch_format="pyarrow", concurrency=(1, 8))
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "token"], descending=[True, False])
        .limit(50)
    )


def repetition_docs(sf_dir: str):
    """Within-doc repetition profile (Gopher-style boilerplate signals):
    token totals, top-token count, distinct-token count per document."""
    from ..stages.text import RepetitionProfiler

    ds = _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    out = ds.map_batches(RepetitionProfiler, batch_format="pyarrow", concurrency=(1, 8))
    return out.map_batches(
        lambda t: t.select(["doc_id", "n_tokens", "top_token_n", "n_distinct"]),
        batch_format="pyarrow",
    )


def inverted_index_docs(sf_dir: str):
    """Inverted-index postings: distinct (token, doc_id) pairs.  Per-doc
    dedup inside the explode stage IS global dedup (docs are
    row-disjoint), so the index needs no shuffle at all; consumers
    groupby(token) at vocab-bounded cost."""
    from ..stages.text import PostingLister

    ds = _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(PostingLister, batch_format="pyarrow", concurrency=(1, 8))


def scd2_history_pages(sf_dir: str):
    """Type-2 slowly-changing-dimension history from the CDC stream: one
    row per non-delete version of each url with its event-time validity
    window ([valid_from, valid_to), valid_to null = open) and a current
    flag.  Deletes emit no version row but CLOSE the previous version's
    window.

    The lead() that closes windows is ``stages/analytic.py``'s
    partitioned lead — one bounded hash-bucket shuffle on url, windows
    vectorized inside buckets; schema-evolution (v0 WAL segments lack
    ``lang``) handled by the same unified-schema read the replay path
    uses."""
    import pyarrow.parquet as pq

    from ..stages.analytic import partitioned_analytics
    from ..state.schema_registry import conform, evolve
    from .replay import list_segments

    n_urls, n_events = _CDC_SIZES.get(os.path.basename(sf_dir.rstrip("/")), (300, 1500))
    root = _cdc_fixture(n_urls, n_events)
    data_dir = os.path.join(root, "data")
    segs = list_segments(os.path.join(data_dir, "wal"))
    uni = pq.read_schema(segs[0])
    for s in segs[1:]:
        uni = evolve(uni, pq.read_schema(s))

    def wal_prep(t: pa.Table) -> pa.Table:
        t = conform(t, uni)
        return t.select(["url", "warc_ts", "lsn", "op", "lang"])

    wal = _read_parquet(segs, schema=uni).map_batches(
        wal_prep, batch_format="pyarrow"
    )

    def base_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t["url"],
                "warc_ts": t["warc_ts"],
                "lsn": pa.array(np.zeros(t.num_rows, np.int64)),
                "op": pa.array(["insert"] * t.num_rows, pa.string()),
                "lang": t["lang"],
            }
        )

    base = _read_parquet(
        os.path.join(data_dir, "base", "pages.parquet"),
        columns=["url", "warc_ts", "lang"],
    ).map_batches(base_prep, batch_format="pyarrow")

    ev = partitioned_analytics(
        base.union(wal),
        key="url",
        order_by=["warc_ts", "lsn"],
        lead_cols=["warc_ts"],
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["op"], pa.scalar("delete")))
        return pa.table(
            {
                "url": t["url"],
                "valid_from": t["warc_ts"],
                "valid_to": t["warc_ts_next"],
                "lsn": t["lsn"],
                "lang": t["lang"],
                "is_current": pc.is_null(t["warc_ts_next"]),
            }
        )

    return ev.map_batches(finish, batch_format="pyarrow")


def scd2_asof_read_pages(sf_dir: str):
    """Point-in-time (temporal) read over the SCD2 history: the live
    page version per url AS OF each of three probe timestamps (the
    quartiles of the CDC stream's event-time span) — the standard
    consumer of type-2 history ("what did the table look like at T?").

    Scale shape: the probe bounds are computed from parquet FOOTER
    statistics of the base snapshot + WAL segments — metadata-only, no
    data scan (on the lake the same min/max live in the manifest's
    per-partition lineage stats).  The as-of predicate is a vectorized
    window-containment filter mapped over the history stream with the
    (tiny) probe list broadcast into every task: history rows never
    leave their shards, no shuffle — the classic small-side temporal
    join.  A version is live at probe p iff
    ``valid_from <= p < coalesce(valid_to, +inf)``; a url whose last
    event before p was a delete has a closed window and is correctly
    absent.

    Reference analogue: the reference keeps only latest state per key
    (ClickHouse-style replacing merge, src/pipeline/core/db.py); history
    + temporal reads are a target-added lake capability built on
    ``scd2_history_pages``."""
    import pyarrow.parquet as pq

    from .replay import list_segments

    n_urls, n_events = _CDC_SIZES.get(os.path.basename(sf_dir.rstrip("/")), (300, 1500))
    root = _cdc_fixture(n_urls, n_events)
    data_dir = os.path.join(root, "data")
    files = [os.path.join(data_dir, "base", "pages.parquet")] + list_segments(
        os.path.join(data_dir, "wal")
    )
    t0, t1 = None, None
    for f in files:
        md = pq.read_metadata(f)
        idx = md.schema.to_arrow_schema().names.index("warc_ts")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            # min_raw/max_raw are the physical int64 epoch-µs values —
            # exact, no datetime round trip
            t0 = st.min_raw if t0 is None else min(t0, st.min_raw)
            t1 = st.max_raw if t1 is None else max(t1, st.max_raw)
    span = t1 - t0
    probes = [(k, t0 + span * k // 4) for k in (1, 2, 3)]

    hist = scd2_history_pages(sf_dir)

    def asof(t: pa.Table) -> pa.Table:
        vf = pc.cast(t["valid_from"], pa.int64()).to_numpy(zero_copy_only=False)
        vt = (
            pc.fill_null(pc.cast(t["valid_to"], pa.int64()), np.iinfo(np.int64).max)
            .to_numpy(zero_copy_only=False)
        )
        outs = []
        for k, p in probes:
            m = (vf <= p) & (vt > p)
            sel = t.filter(pa.array(m))
            outs.append(
                pa.table(
                    {
                        "probe_q": pa.array(np.full(sel.num_rows, k, np.int64)),
                        "probe_ts": pa.array(
                            np.full(sel.num_rows, p, np.int64), pa.timestamp("us")
                        ),
                        "url": sel["url"],
                        "lsn": sel["lsn"],
                        "lang": sel["lang"],
                    }
                )
            )
        return pa.concat_tables(outs)

    return hist.map_batches(asof, batch_format="pyarrow")


def _pii_fixture_path() -> str:
    """Deterministic PII-laced document fixture, shared by the Ray
    pipeline and the DuckDB oracle (the sf tables carry no PII-shaped
    content, so redaction over them would be a no-op non-test)."""
    import random

    import pyarrow.parquet as pq

    path = "/tmp/etlray_pii_400.parquet"
    if not os.path.exists(path):
        rng = random.Random(12345)
        words = [
            "alpha", "beta", "gamma", "delta", "omega", "sigma",
            "row", "scan", "merge", "batch", "table", "key",
        ]
        ids, texts = [], []
        for i in range(400):
            toks = [words[rng.randrange(len(words))] for _ in range(rng.randrange(5, 40))]
            if i % 2 == 0:
                toks.insert(
                    rng.randrange(len(toks)),
                    f"user{i}@example{i % 7}.com",
                )
            if i % 3 == 0:
                toks.insert(
                    rng.randrange(len(toks)),
                    f"+1 555-{100 + i % 900:03d}-{1000 + i * 7 % 9000:04d}"
                    if i % 6 == 0
                    else f"555-{100 + i % 900:03d}-{1000 + i * 7 % 9000:04d}",
                )
            ids.append(i)
            texts.append(" ".join(toks))
        tbl = pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
        )
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
    return path


def pii_redact_docs(sf_dir: str):
    """PII redaction over the deterministic fixture: actor-pool regex
    scrub (stages/text.PiiRedactor), byte-identical to the oracle's
    nested regexp_replace."""
    from ..stages.text import PiiRedactor

    ds = _read_parquet(_pii_fixture_path())
    out = ds.map_batches(PiiRedactor, batch_format="pyarrow", concurrency=(1, 8))
    return out.map_batches(
        lambda t: t.select(["doc_id", "text_redacted", "n_emails", "n_phones"]),
        batch_format="pyarrow",
    )


def left_join_customer_order_counts(sf_dir: str):
    """LEFT OUTER join via Ray's native hash-partitioned Dataset.join:
    per-customer order count INCLUDING zero-order customers (the rows an
    inner join drops).  The fact side pre-aggregates to one row per
    custkey before the join, so the exchange moves |customers| rows, not
    |orders|."""
    counts = (
        _read_parquet(_p(sf_dir, "orders"), columns=["o_custkey"])
        .groupby("o_custkey")
        .aggregate(Count(alias_name="cnt"))
    )
    cust = _read_parquet(
        _p(sf_dir, "customer"), columns=["c_custkey", "c_name"]
    )
    joined = cust.join(
        counts, "left_outer", num_partitions=16,
        on=("c_custkey",), right_on=("o_custkey",),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_name": t["c_name"],
                "n_orders": pc.coalesce(t["cnt"], pa.scalar(0, pa.int64())),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def tfidf_docs(sf_dir: str):
    """TF-IDF scaffold with exact integer comparison: per (doc, token)
    term frequency joined with the token's document frequency via a
    hash-partitioned Dataset.join — idf itself is ``ln(N/df)``, left to
    the consumer because float logs differ in the last ulp across
    engines.  Both sides stream; the df side is vocab-bounded."""
    from ..stages.text import PostingLister, TermCounter

    tf = _read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "text"]
    ).map_batches(TermCounter, batch_format="pyarrow", concurrency=(1, 8))
    # df from its own streaming pass over the source (classic two-pass
    # TF-IDF): re-reading beats pinning the full doc-term table in the
    # object store or re-executing the actor pool for two consumers
    df = (
        _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
        .map_batches(PostingLister, batch_format="pyarrow", concurrency=(1, 8))
        .groupby("token")
        .aggregate(Count(alias_name="df"))
    )
    joined = tf.join(
        df, "inner", num_partitions=8, on=("token",), right_on=("token",),
        right_suffix="_r",
    )
    cols = ["doc_id", "token", "tf", "df"]
    return joined.map_batches(lambda t: t.select(cols), batch_format="pyarrow")


def full_outer_join_daily_activity(sf_dir: str):
    """FULL OUTER join via Ray's native hash-partitioned Dataset.join:
    per-calendar-day event count vs order count, keeping days present on
    either side only (both null directions are exercised — event days and
    order days barely overlap in the fixture).  Both sides pre-aggregate
    to one row per day before the exchange, so the join moves |days|
    rows, not |facts|."""
    ev = (
        _read_parquet(_p(sf_dir, "events"), columns=["ts"])
        .map_batches(
            lambda t: pa.table({"d": pc.floor_temporal(t["ts"], unit="day")}),
            batch_format="pyarrow",
        )
        .groupby("d")
        .aggregate(Count(alias_name="n_events"))
    )
    od = (
        _read_parquet(_p(sf_dir, "orders"), columns=["o_orderdate"])
        .map_batches(
            lambda t: pa.table(
                {"d": pc.floor_temporal(t["o_orderdate"], unit="day")}
            ),
            batch_format="pyarrow",
        )
        .groupby("d")
        .aggregate(Count(alias_name="n_orders"))
    )
    joined = ev.join(
        od, "full_outer", num_partitions=8,
        on=("d",), right_on=("d",), right_suffix="_r",
    )

    def finish(t: pa.Table) -> pa.Table:
        # Ray's full_outer coalesces same-named key columns itself; only
        # the count columns need their null sides zeroed.  floor_temporal
        # yields timestamp[s] — cast back to us to match the source grain.
        zero = pa.scalar(0, pa.int64())
        d = t["d"]
        if "d_r" in t.column_names:  # future Ray versions may keep both
            d = pc.coalesce(d, t["d_r"])
        return pa.table(
            {
                "d": d.cast(pa.timestamp("us")),
                "n_events": pc.coalesce(t["n_events"], zero),
                "n_orders": pc.coalesce(t["n_orders"], zero),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def _dlq_fixture() -> str:
    """Deterministic dirty-WAL fixture: one segment of 200 change events,
    ~1/4 malformed (null key / null ts / unknown op, round-robin).  The
    same file is both the engine input and the DuckDB oracle source, so
    the quarantine classification is externally checkable.  Atomic
    publish; fixed size at every sf (quarantine volume is a property of
    the feed, not the corpus)."""
    import tempfile

    import numpy as np
    import pyarrow.parquet as pq

    from ..gen import WAL_SCHEMA_V0, make_html

    root = os.path.join(tempfile.gettempdir(), "etlray_dlqwal_v1")
    seg = os.path.join(root, "wal", "segment-dirty-00001.parquet")
    if not os.path.exists(seg):
        tmp_root = f"{root}.tmp.{os.getpid()}"
        os.makedirs(os.path.join(tmp_root, "wal"), exist_ok=True)
        n = 200
        lsn = np.arange(1_000_001, 1_000_001 + n, dtype=np.int64)
        ops, urls, tss, htmls = [], [], [], []
        base_ts = 1_700_000_000_000_000
        for i in range(n):
            u = f"https://dirty.example.com/p/{i % 40}"
            kind = i % 8
            if kind == 1:
                urls.append(None); ops.append("insert"); tss.append(base_ts + i)
            elif kind == 3:
                urls.append(u); ops.append("update"); tss.append(None)
            elif kind == 5:
                urls.append(u); ops.append("frobnicate"); tss.append(base_ts + i)
            else:
                urls.append(u)
                ops.append("insert" if i % 2 == 0 else "update")
                tss.append(base_ts + i)
            htmls.append(make_html(u, 1 + i % 3))
        tbl = pa.table(
            {
                "lsn": pa.array(lsn, pa.int64()),
                "op": pa.array(ops, pa.string()),
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
            },
            schema=WAL_SCHEMA_V0,
        )
        pq.write_table(tbl, os.path.join(tmp_root, "wal", "segment-dirty-00001.parquet"))
        try:
            os.rename(tmp_root, root)
        except OSError:
            import shutil

            shutil.rmtree(tmp_root, ignore_errors=True)
    return root


def dlq_quarantine_pages(sf_dir: str):
    """Dead-letter queue end-to-end: replay a dirty WAL segment into a
    fresh lake — malformed events (null key / null ts / unknown op) are
    quarantined atomically with the committing transaction while valid
    events apply — then return the committed quarantine (lsn, reason).
    Oracle: the same classification in SQL over the same segment file.
    Fixed-size fixture at every sf (see _dlq_fixture)."""
    from .replay import bootstrap_lake, read_dlq, replay

    root = _dlq_fixture()
    lake_root = os.path.join(root, "lake", f"q{os.getpid()}", "pages")
    bootstrap_lake(lake_root, None, num_partitions=8)
    replay(lake_root, os.path.join(root, "wal"))
    dlq = read_dlq(lake_root)
    return dlq.select(["lsn", "reason"])


def _constraint_fixture() -> str:
    """Deterministic WAL fixture for CHECK-constraint enforcement: one
    segment of 240 change events cycling through built-in-malformed
    rows, violators of three declared constraints (html notnull, lang
    in the known set, url https-prefixed), exempt deletes with stale
    bad payloads, and null-lang rows that PASS (CHECK null semantics).
    The same file is engine input and DuckDB oracle source.  Fixed size
    at every sf."""
    import tempfile

    import numpy as np
    import pyarrow.parquet as pq

    from ..gen import _LANGS, WAL_SCHEMA_V1, make_html

    root = os.path.join(tempfile.gettempdir(), "etlray_constraintwal_v1")
    seg = os.path.join(root, "wal", "segment-mixed-00001.parquet")
    if not os.path.exists(seg):
        tmp_root = f"{root}.tmp.{os.getpid()}"
        os.makedirs(os.path.join(tmp_root, "wal"), exist_ok=True)
        n = 240
        lsn = np.arange(2_000_001, 2_000_001 + n, dtype=np.int64)
        base_ts = 1_750_000_000_000_000
        ops, urls, tss, htmls, langs = [], [], [], [], []
        for i in range(n):
            u = f"https://mixed.example.com/p/{i % 48}"
            op, ts, html = "insert" if i % 2 == 0 else "update", base_ts + i, make_html(u, 1 + i % 3)
            lang = _LANGS[i % len(_LANGS)]
            kind = i % 12
            if kind == 1:      # built-in: null key
                u = None
            elif kind == 3:    # built-in: null LWW ts
                ts = None
            elif kind == 5:    # built-in: unknown op
                op = "frobnicate"
            elif kind == 7:    # constraint:html_present (notnull)
                html = None
            elif kind == 9:    # constraint:lang_known
                lang = "zz"
            elif kind == 11:   # constraint:url_https
                u = f"http://mixed.example.com/p/{i % 48}"
            elif kind == 0:    # delete w/ stale bad payload: EXEMPT
                op, html, lang = "delete", None, "zz"
            elif kind == 2:    # null lang: CHECK passes
                lang = None
            ops.append(op); urls.append(u); tss.append(ts)
            htmls.append(html); langs.append(lang)
        tbl = pa.table(
            {
                "lsn": pa.array(lsn, pa.int64()),
                "op": pa.array(ops, pa.string()),
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
                "lang": pa.array(langs, pa.string()),
            },
            schema=WAL_SCHEMA_V1,
        )
        pq.write_table(tbl, os.path.join(tmp_root, "wal", "segment-mixed-00001.parquet"))
        try:
            os.rename(tmp_root, root)
        except OSError:
            import shutil

            shutil.rmtree(tmp_root, ignore_errors=True)
    return root


def constraint_quarantine_pages(sf_dir: str):
    """Declarative CHECK constraints end-to-end: declare three manifest
    invariants (html NOT NULL, lang IN the known set, url https-prefixed
    — pipelines/maintenance.set_constraint), replay a WAL that mixes
    violators with built-in-malformed rows, exempt deletes and null-lang
    passes, and return the committed quarantine (lsn, reason).  Reason
    precedence: built-in rules, then constraints in name order.  Oracle:
    the same classification in SQL over the same segment file.  Fixed
    fixture at every sf (see _constraint_fixture)."""
    from ..state.manifest import LakeTable
    from .maintenance import set_constraint
    from .replay import bootstrap_lake, read_dlq, replay

    from ..gen import _LANGS

    root = _constraint_fixture()
    lake_root = os.path.join(root, "lake", f"q{os.getpid()}", "pages")
    if not LakeTable(lake_root).exists():  # same-process re-entry safe
        bootstrap_lake(lake_root, None, num_partitions=8)
        set_constraint(lake_root, "html_present", "html", "notnull", None)
        set_constraint(lake_root, "lang_known", "lang", "in", list(_LANGS))
        set_constraint(lake_root, "url_https", "url", "prefix", "https://")
    replay(lake_root, os.path.join(root, "wal"))
    return read_dlq(lake_root).select(["lsn", "reason"])


def constraint_requeue_pages(sf_dir: str):
    """The full quarantine loop, SQL-checked end-state: replay the mixed
    fixture under three CHECK constraints (violators quarantine), then
    DROP all three and ``requeue_dlq`` — the constraint violators
    re-apply under their ORIGINAL (warc_ts, lsn), the built-in-malformed
    rows stay dead-lettered, and the final table equals the plain LWW
    window over every structurally-valid event, as if the constraints
    had never existed.  Oracle: that LWW window in SQL over the same
    segment file."""
    from ..state.manifest import LakeTable
    from .maintenance import drop_constraint, set_constraint
    from .replay import bootstrap_lake, read_table_arrow, replay, requeue_dlq

    from ..gen import _LANGS

    root = _constraint_fixture()
    lake_root = os.path.join(root, "lake", f"rq{os.getpid()}", "pages")
    if not LakeTable(lake_root).exists():  # same-process re-entry safe
        bootstrap_lake(lake_root, None, num_partitions=8)
        set_constraint(lake_root, "html_present", "html", "notnull", None)
        set_constraint(lake_root, "lang_known", "lang", "in", list(_LANGS))
        set_constraint(lake_root, "url_https", "url", "prefix", "https://")
        replay(lake_root, os.path.join(root, "wal"))
        for name in ("html_present", "lang_known", "url_https"):
            drop_constraint(lake_root, name)
    replay(lake_root, os.path.join(root, "wal"))  # no-op redelivery
    requeue_dlq(lake_root)
    out = read_table_arrow(lake_root)
    return out.select(["url", "warc_ts", "lang"])


def approx_distinct_events(sf_dir: str):
    """HyperLogLog approximate distinct count (stages/sketch.py) of the
    events table's event_id — one streaming pass, no key shuffle: tasks
    emit 16 KiB register partials, the driver max-merges them.  No SQL
    oracle (the estimate depends on the sketch hash); the error bound
    (~0.8% at p=14), merge associativity/order-freedom, and determinism
    are pinned by tests/test_sketch.py.  Returned alongside the exact
    count so the driver's rows-only check still sees a stable shape."""
    from ..stages.sketch import approx_distinct

    ds = _read_parquet(_p(sf_dir, "events"), columns=["event_id"])
    est = approx_distinct(ds, "event_id", p=14)
    return pa.table(
        {
            "approx_n": pa.array([int(round(est))], pa.int64()),
            "p": pa.array([14], pa.int64()),
        }
    )


def pack_sequences_docs(sf_dir: str):
    """Training sequence packing: assign documents to fixed token-budget
    training sequences by greedy CONTIGUOUS packing in doc_id order —
    ``seq_id = floor(running_tokens_before_doc / W)``.  The running sum
    is the distributed two-phase scan (stages/analytic.ordered_cumsum):
    per-range-bucket partials -> O(buckets) driver prefix -> in-bucket
    vectorized cumsum.  Exact integer arithmetic; the oracle is the same
    formula via a SQL window cumsum."""
    from ..stages.analytic import ordered_cumsum
    from ..stages.text import TokenCounter

    W = 2048
    toks = (
        _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
        .map_batches(TokenCounter, batch_format="pyarrow", concurrency=(1, 8))
        .map_batches(
            lambda t: t.select(["doc_id", "n_tokens"]), batch_format="pyarrow"
        )
    )
    cum = ordered_cumsum(toks, order_col="doc_id", value_col="n_tokens", n_buckets=64)

    def finish(t: pa.Table) -> pa.Table:
        c = t["cum_n_tokens"].to_numpy(zero_copy_only=False)
        v = t["n_tokens"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "seq_id", pa.array((c - v) // W, pa.int64())
        )

    return cum.map_batches(finish, batch_format="pyarrow")


def chunk_docs(sf_dir: str):
    """Context-window chunking of the documents corpus: 500-char windows
    every 400 chars (100 overlap), one (doc_id, chunk_id, chunk) row per
    window (stages/text.Chunker — vectorized by chunk index).  Oracle:
    substr over generate_series in SQL, byte-identical chunks."""
    from ..stages.text import Chunker

    return _read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "text"]
    ).map_batches(Chunker, batch_format="pyarrow", concurrency=(1, 8))


def bigram_counts_docs(sf_dir: str):
    """Per-document bigram frequencies (stages/text.BigramCounter) —
    vectorized adjacent-token joins; oracle: list-indexed pairs via
    unnest(range) in SQL, exact integer counts."""
    from ..stages.text import BigramCounter

    return _read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "text"]
    ).map_batches(BigramCounter, batch_format="pyarrow", concurrency=(1, 8))


def decontaminate_docs(sf_dir: str):
    """Benchmark decontamination: flag corpus documents whose token
    8-grams overlap a benchmark set (here: docs with doc_id % 50 == 0,
    so the oracle derives both sides from the same table in SQL).
    Output: (doc_id, n_overlap) for contaminated docs — n_overlap =
    distinct overlapping grams.

    Scale shape: the benchmark side is SMALL by nature (eval sets), so
    its distinct grams broadcast once via ray.put and every corpus batch
    probes vectorized (`pc.is_in`) — zero shuffle on the corpus.  A
    large benchmark side would switch to a hash-partitioned Dataset.join
    on gram, the MinHash-verify shape (stages/dedup.py)."""
    from ..stages.text import doc_ngrams

    N = 8

    def grams(t: pa.Table) -> pa.Table:
        return doc_ngrams(t, N)

    def bench_rows(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 50 == 0))

    bench = (
        _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
        .map_batches(bench_rows, batch_format="pyarrow")
        .map_batches(grams, batch_format="pyarrow")
    )
    bench_parts = [t for t in ray.get(bench.to_arrow_refs()) if t.num_rows]
    bench_tbl = (
        pa.concat_tables(bench_parts, promote_options="default")
        if bench_parts
        else pa.table({"gram": pa.array([], pa.string())})
    )
    bench_set = ray.put(pc.unique(bench_tbl["gram"].combine_chunks()))

    def overlap(t: pa.Table) -> pa.Table:
        g = grams(t)
        hit = pc.is_in(g["gram"], value_set=ray.get(bench_set))
        g = g.filter(hit)
        if g.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_overlap": pa.array([], pa.int64()),
                }
            )
        import numpy as np

        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        s = ids[order]
        heads = np.flatnonzero(np.concatenate(([True], s[1:] != s[:-1])))
        cnt = np.diff(np.append(heads, len(s)))
        return pa.table(
            {
                "doc_id": pa.array(s[heads], pa.int64()),
                "n_overlap": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    # per-batch partials then a tiny groupby-sum (a doc's grams can span
    # batches only at block boundaries; sum is exact because grams are
    # distinct per doc within ONE doc_ngrams call and docs never split
    # across batches under parquet row-group batching — sum anyway for
    # safety)
    return (
        _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
        .map_batches(overlap, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("n_overlap", alias_name="n_overlap"))
    )


def grouped_median_orders(sf_dir: str):
    """Exact per-group median (percentile_disc 0.5) of order totals in
    integer cents, grouped by order priority — a bounded-cardinality
    dimension (5 values), so one map_groups per group is the right
    shape (high-cardinality keys would use the hash_bucket pattern of
    stages/analytic.py).  Oracle: DuckDB quantile_disc."""
    import numpy as np

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "cents": pc.cast(
                    pc.floor(pc.multiply(t["o_totalprice"], 100.0)), pa.int64()
                ),
            }
        )

    def median(g: pa.Table) -> pa.Table:
        v = np.sort(g["cents"].to_numpy(zero_copy_only=False))
        # percentile_disc(0.5): smallest value with cume_dist >= 0.5
        m = int(v[(len(v) - 1) // 2])
        return pa.table(
            {
                "o_orderpriority": pa.array(
                    [g["o_orderpriority"][0].as_py()], pa.string()
                ),
                "median_cents": pa.array([m], pa.int64()),
            }
        )

    median.__name__ = "median"
    return (
        _read_parquet(
            _p(sf_dir, "orders"), columns=["o_orderpriority", "o_totalprice"]
        )
        .map_batches(to_cents, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .map_groups(median, batch_format="pyarrow")
    )


_SPARSE_TYPES = ("click", "error", "purchase", "signup", "view")


def sparse_attr_latest_events(sf_dir: str):
    """CDC partial-image fold: per user, the value of the LATEST event of
    each type (null if the user never emitted that type) plus the overall
    last event time — "last non-null per attribute", the composable form
    of a coalesce upsert (per-column filtered argmax; associative, so a
    per-batch combiner would be exact — here one bucketed pass suffices).
    Vectorized: one lexsort by (user, ts) per bucket, per-type masked run
    tails, zero per-row Python.  Oracle: arg_max(...) FILTER per type."""
    import numpy as np

    from ..stages.hashutil import hash_bucket

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("_b", hash_bucket(t["user_id"], 64))

    def fold(g: pa.Table) -> pa.Table:
        out_fields = [("user_id", pa.int64())] + [
            (f"last_{e}_value", pa.float64()) for e in _SPARSE_TYPES
        ] + [("ts_last", pa.timestamp("us"))]
        schema = pa.schema(out_fields)
        g = g.drop_columns(["_b"])
        if g.num_rows == 0:
            return schema.empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, uid))
        uid_s, ts_s = uid[order], ts[order]
        val_s = g["value"].to_numpy(zero_copy_only=False)[order]
        et = g["event_type"].to_numpy(zero_copy_only=False)[order]
        starts = np.flatnonzero(np.concatenate(([True], uid_s[1:] != uid_s[:-1])))
        ends = np.append(starts[1:], len(uid_s)) - 1
        run_id = np.zeros(len(uid_s), np.int64)
        run_id[starts[1:]] = 1
        run_id = np.cumsum(run_id)
        cols = {"user_id": pa.array(uid_s[starts], pa.int64())}
        pos = np.arange(len(uid_s))
        for e in _SPARSE_TYPES:
            mask = et == e
            marker = np.where(mask, pos, -1)
            acc = np.maximum.accumulate(marker)
            last = acc[ends]  # last matching position per run (global max ok:
            # runs are contiguous and pos increases, so a previous run's
            # marker is always < this run's start)
            valid = last >= starts
            vals = np.where(valid, val_s[np.maximum(last, 0)], np.nan)
            cols[f"last_{e}_value"] = pa.array(
                vals, pa.float64(), mask=~valid
            )
        cols["ts_last"] = pa.array(ts_s[ends], pa.int64()).cast(pa.timestamp("us"))
        return pa.table(cols, schema=schema)

    fold.__name__ = "sparse_fold"
    return (
        _read_parquet(
            _p(sf_dir, "events"), columns=["user_id", "ts", "event_type", "value"]
        )
        .map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(fold, batch_format="pyarrow")
    )


def lake_training_docs(sf_dir: str):
    """End-to-end webtext integration: CDC replay -> live lake ->
    training-doc prep, one streaming chain.  Replays the fixture WAL
    into a lake, streams the live pages (column-pruned read), computes
    token counts + normalized-text md5 in an actor pool, gates short
    docs, and EXACT-DEDUPS by content digest keeping the smallest url —
    the bucketed keep-min shape (hash_bucket(digest) shuffle, vectorized
    in-bucket lexsort heads; never one dispatch per distinct digest).
    Oracle: the LWW window SQL extended with the same expressions."""
    import numpy as np

    from ..stages.hashutil import hash_bucket
    from ..stages.text import Fingerprinter, TokenCounter
    from .replay import bootstrap_lake, read_table, replay

    n_urls, n_events = _CDC_SIZES.get(os.path.basename(sf_dir.rstrip("/")), (300, 1500))
    root = _cdc_fixture(n_urls, n_events)
    data_dir = os.path.join(root, "data")
    lake_root = os.path.join(root, "lake", f"train{os.getpid()}", "pages")
    bootstrap_lake(lake_root, os.path.join(data_dir, "base", "pages.parquet"), num_partitions=16)
    replay(lake_root, os.path.join(data_dir, "wal"))

    fp = Fingerprinter()

    def features(t: pa.Table) -> pa.Table:
        t = TokenCounter()(t)
        texts = t["text"].to_pylist()
        md5s = pa.array([fp.md5_norm(x) for x in texts], pa.string())
        keep = pc.greater_equal(t["n_tokens"], 5)  # quality gate
        out = pa.table(
            {"url": t["url"], "md5_norm": md5s, "n_tokens": t["n_tokens"]}
        ).filter(keep)
        return out.append_column("_b", hash_bucket(out["md5_norm"], 128))

    def keep_min(g: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("url", pa.string()), ("md5_norm", pa.string()), ("n_tokens", pa.int64())]
        )
        if g.num_rows == 0:
            return schema.empty_table()
        g = g.drop_columns(["_b"])
        dig = pc.dictionary_encode(g["md5_norm"].combine_chunks())
        codes = dig.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        urls = g["url"].to_numpy(zero_copy_only=False)
        order = np.lexsort((urls, codes))
        heads = np.flatnonzero(
            np.concatenate(([True], codes[order][1:] != codes[order][:-1]))
        )
        return g.take(pa.array(order[heads])).select(
            ["url", "md5_norm", "n_tokens"]
        )

    keep_min.__name__ = "dedup_keep_min_url"
    return (
        read_table(lake_root, columns=["url", "text"])
        .map_batches(features, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(keep_min, batch_format="pyarrow")
    )


def mixture_exact_k_docs(sf_dir: str):
    """Exact-count training-mixture subsample: per source, keep EXACTLY
    the k=10 documents with the smallest md5(doc_id) — deterministic,
    layout/parallelism-independent (the Bernoulli samplers give expected
    rates; curriculum mixtures often need exact per-source counts).
    Composition of the grouped-top-k stage over a hash ranking.  Oracle:
    row_number() over the same md5 order."""
    import hashlib

    from ..stages.topk import grouped_topk

    def rank_key(t: pa.Table) -> pa.Table:
        hs = [
            hashlib.md5(str(i).encode()).hexdigest()
            for i in t["doc_id"].to_pylist()
        ]
        return t.append_column("h", pa.array(hs, pa.string()))

    ds = _read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "source"]
    ).map_batches(rank_key, batch_format="pyarrow")
    out = grouped_topk(ds, group_col="source", order_by=[("h", "asc")], k=10)
    return out.map_batches(
        lambda t: t.select(["doc_id", "source", "rk"]), batch_format="pyarrow"
    )


def histogram_events(sf_dir: str):
    """Fixed-width histogram of the events value column: per-batch
    partial bin counts (the combiner — shuffle moves O(bins x batches)
    rows, never the data), then a tiny groupby-sum.  Oracle:
    floor(value/width) group count."""
    import numpy as np

    W = 50.0

    def partial(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        bins = np.floor(v / W).astype(np.int64)
        ub, inv = np.unique(bins, return_inverse=True)
        cnt = np.zeros(len(ub), np.int64)
        np.add.at(cnt, inv, 1)
        return pa.table(
            {"bin": pa.array(ub, pa.int64()), "n": pa.array(cnt, pa.int64())}
        )

    return (
        _read_parquet(_p(sf_dir, "events"), columns=["value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
    )


def percentile_gate_docs(sf_dir: str):
    """Quantile-gated corpus filter: keep documents at or above the
    corpus 25th-percentile token count — composition of the distributed
    exact-quantile operator (sort + metadata split selection, a scalar
    to the driver) with a broadcast filter.  The gate value is data-
    derived, not a constant.  Oracle: quantile_disc subquery."""
    from ..stages.quantiles import exact_quantiles
    from ..stages.text import TokenCounter

    toks = (
        _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
        .map_batches(TokenCounter, batch_format="pyarrow", concurrency=(1, 8))
        .map_batches(
            lambda t: t.select(["doc_id", "n_tokens"]), batch_format="pyarrow"
        )
        .materialize()  # narrow (id, int); consumed by quantile AND filter
    )
    q = exact_quantiles(toks, "n_tokens", [0.25])
    gate = int(q.column("value")[0].as_py())
    return toks.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_tokens"], gate)),
        batch_format="pyarrow",
    )


def _partial_wal_fixture() -> str:
    """Deterministic partial-image CDC WAL fixture (user profiles):
    4000 events over 200 users in 8 segments; updates set a random
    non-empty column subset (unset columns null = "unchanged"), ~8%
    deletes.  Shared by the engine query and the DuckDB oracle (the
    per-column arg_max SQL) — fixed size at every sf.  Atomic publish."""
    import random
    import tempfile

    import pyarrow.parquet as pq_

    root = os.path.join(tempfile.gettempdir(), "etlray_partialwal_v1")
    wal = os.path.join(root, "wal")
    if not os.path.exists(wal):
        tmp_root = f"{root}.tmp.{os.getpid()}"
        os.makedirs(os.path.join(tmp_root, "wal"), exist_ok=True)
        rng = random.Random(404)
        cols = ["email", "city", "score"]
        schema = pa.schema(
            [
                ("lsn", pa.int64()),
                ("op", pa.string()),
                ("user_id", pa.string()),
                ("ts", pa.timestamp("us")),
                ("email", pa.string()),
                ("city", pa.string()),
                ("score", pa.float64()),
            ]
        )
        evs = []
        for i in range(4000):
            uid = f"u{rng.randrange(200):04d}"
            ts = 1_700_000_000_000_000 + rng.randrange(20_000) * 1_000_000
            if rng.random() < 0.08:
                evs.append(dict(lsn=i + 1, op="delete", user_id=uid, ts=ts))
                continue
            ev = dict(
                lsn=i + 1,
                op=rng.choice(["insert", "update"]),
                user_id=uid,
                ts=ts,
            )
            subset = [c for c in cols if rng.random() < 0.5] or [
                rng.choice(cols)
            ]
            for c in subset:
                ev[c] = (
                    round(rng.uniform(0, 100), 6)
                    if c == "score"
                    else f"{c}-{rng.randrange(64)}"
                )
            evs.append(ev)
        per = 500
        for s in range(8):
            part = evs[s * per : (s + 1) * per]
            tbl = pa.table(
                {
                    f.name: pa.array([e.get(f.name) for e in part], f.type)
                    for f in schema
                },
                schema=schema,
            )
            pq_.write_table(
                tbl, os.path.join(tmp_root, "wal", f"seg-{s:05d}.parquet")
            )
        try:
            os.rename(tmp_root, root)
        except OSError:
            import shutil

            shutil.rmtree(tmp_root, ignore_errors=True)
    return root


def coalesce_upsert_users(sf_dir: str):
    """Column-level partial-image upserts end-to-end
    (TableSpec.coalesce_partial, stages/coalesce.py): replay the partial
    WAL fixture into a fresh lake — per key and per column the latest
    non-null value under (ts, lsn) after the key's last delete — and
    serve the live rows.  Oracle: per-column arg_max FILTER SQL over the
    same segment files.  Reference analogue: per-row ALTER TABLE UPDATE
    of selected columns (`src/pipeline/core/spark.py:160-176`)."""
    from ..config import TableSpec
    from .replay import bootstrap_lake, read_table_arrow, replay

    root = _partial_wal_fixture()
    spec = TableSpec(
        name="users_partial",
        key="user_id",
        ts_col="ts",
        schema_v0=pa.schema(
            [
                ("user_id", pa.string()),
                ("ts", pa.timestamp("us")),
                ("email", pa.string()),
                ("city", pa.string()),
                ("score", pa.float64()),
            ]
        ),
        derive_text=False,
        coalesce_partial=True,
    )
    lake_root = os.path.join(root, "lake", f"c{os.getpid()}", "users")
    bootstrap_lake(lake_root, None, num_partitions=8, schema=spec.schema_v0)
    replay(lake_root, os.path.join(root, "wal"), spec=spec)
    out = read_table_arrow(lake_root, key="user_id", ts_col="ts")
    return out.select(["user_id", "ts", "email", "city", "score"])


def coalesce_upsert_users_delta(sf_dir: str):
    """coalesce_upsert_users in merge-on-read delta mode, deliberately
    left unfolded (4 incremental transactions, chains in place): readers
    fold base ∪ chain under the associative coalesce fold, so the final
    state is identical to rewrite mode — same SQL oracle by design."""
    from ..config import TableSpec
    from .replay import bootstrap_lake, read_table_arrow, replay

    root = _partial_wal_fixture()
    spec = TableSpec(
        name="users_partial",
        key="user_id",
        ts_col="ts",
        schema_v0=pa.schema(
            [
                ("user_id", pa.string()),
                ("ts", pa.timestamp("us")),
                ("email", pa.string()),
                ("city", pa.string()),
                ("score", pa.float64()),
            ]
        ),
        derive_text=False,
        coalesce_partial=True,
    )
    lake_root = os.path.join(root, "lake", f"cd{os.getpid()}", "users")
    bootstrap_lake(lake_root, None, num_partitions=8, schema=spec.schema_v0)
    replay(
        lake_root, os.path.join(root, "wal"), spec=spec,
        merge_mode="delta", max_segments_per_tx=2,
    )
    out = read_table_arrow(lake_root, key="user_id", ts_col="ts")
    return out.select(["user_id", "ts", "email", "city", "score"])


# ---------------------------------------------------------------------------
# round-4 additions
# ---------------------------------------------------------------------------


def weighted_sample_docs(sf_dir: str):
    """Importance sample: keep each document with probability
    min(1, n_chars/400) — inclusion proportional to length, the standard
    quality/length-weighted training-mix draw.  INTEGER-EXACT md5
    predicate (stages/sampling.weighted_mask), so the identical
    arithmetic runs in DuckDB: shuffle-free, row-local, reproducible
    across runs and cluster widths."""
    from ..stages.sampling import weighted_sample

    ds = _read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"]
    )
    return weighted_sample(ds, "doc_id", "n_chars", scale=400)


def weighted_topk_docs(sf_dir: str):
    """Exactly-100-document weighted sample WITHOUT replacement
    (Efraimidis–Spirakis A-ES race over md5-derived uniforms, weights =
    n_chars).  Per-batch top-k prune bounds the final sort+limit to
    k × num_batches narrow rows.  The race key is a float (libm log), so
    this is pinned by a same-arithmetic differential pytest rather than
    a cross-engine SQL oracle — see stages/sampling.weighted_topk."""
    from ..stages.sampling import weighted_topk

    ds = _read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"]
    )
    return weighted_topk(ds, "doc_id", "n_chars", k=100)


def regex_extract_docs(sf_dir: str):
    """Span harvesting: explode every >=8-letter lowercase word into
    (doc_id, term, idx) rows in document order — the pattern-extraction
    flat_map (URLs/citations/identifiers in real corpora).  Actor pool
    compiles the pattern once; output is bounded by match count.
    Oracle: unnest(regexp_extract_all) zipped with its ordinal."""
    from ..stages.text import RegexExtractor

    ds = _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(
        RegexExtractor,
        fn_constructor_kwargs={"pattern": "[a-z]{8,}"},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def journey_concat_users(sf_dir: str):
    """Per-user ordered event-type journey string ("view,click,...") —
    SQL string_agg(event_type, ',' ORDER BY ts, event_id).  One bounded
    bucketed shuffle (stages/analytic.grouped_concat), vectorized
    ordering inside each bucket, one output row per user."""
    from ..stages.analytic import grouped_concat

    ds = _read_parquet(
        _p(sf_dir, "events"), columns=["user_id", "event_type", "ts", "event_id"]
    )
    return grouped_concat(
        ds,
        key="user_id",
        order_by=["ts", "event_id"],
        value_col="event_type",
        out_col="journey",
    )


def mad_outliers_events(sf_dir: str):
    """Robust outlier detection: events whose |value - median| exceeds
    3 x MAD (median absolute deviation) — composition of TWO distributed
    exact-quantile passes (median, then median of absolute deviations)
    with a broadcast filter.  Every arithmetic step (IEEE subtract, abs,
    3*MAD multiply, compare) is correctly-rounded and therefore
    BIT-IDENTICAL across engines — unlike mean/stddev, whose summation
    order differs — so the float gate is hash-checkable in SQL."""
    from ..stages.quantiles import exact_quantiles

    ds = _read_parquet(_p(sf_dir, "events"), columns=["event_id", "value"])
    med = exact_quantiles(ds, "value", [0.5]).column("value")[0].as_py()

    def absdev(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("value"),
            "value",
            pc.abs(pc.subtract(t["value"], pa.scalar(med, pa.float64()))),
        )

    mad = (
        exact_quantiles(ds.map_batches(absdev, batch_format="pyarrow"), "value", [0.5])
        .column("value")[0]
        .as_py()
    )
    gate = 3.0 * mad

    def flag(t: pa.Table) -> pa.Table:
        dev = pc.abs(pc.subtract(t["value"], pa.scalar(med, pa.float64())))
        return t.filter(pc.greater(dev, pa.scalar(gate, pa.float64())))

    return ds.map_batches(flag, batch_format="pyarrow")


def _real_media_fixture_path() -> str:
    """Deterministic REAL media fixture (PNG + WAV payloads with
    fixture-carried pre-encode truth), shared by the Ray pipelines and
    the DuckDB oracles.  Atomic publish, size-independent of sf."""
    import pyarrow.parquet as pq_

    from ..stages.multimodal import make_real_media_table

    path = "/tmp/etlray_media_real_v1.parquet"
    if not os.path.exists(path):
        tmp = f"{path}.tmp.{os.getpid()}"
        pq_.write_table(make_real_media_table(), tmp)
        os.replace(tmp, path)
    return path


def multimodal_decode_real(sf_dir: str):
    """REAL PNG decode roundtrip proof: the actor pool reconstructs each
    image's pixels from the encoded payload (pure-stdlib five-filter PNG
    decoder, stages/codecs.py) and emits dims + crc32 of the decoded
    bytes; the oracle simply reads the fixture-carried PRE-ENCODE truth.
    Equality == the decoder bit-exactly inverted the encoder for every
    size/channel-count/filter combination in the fixture."""
    from ..stages.multimodal import ImageDecoder

    ds = _read_parquet(_real_media_fixture_path())
    imgs = ds.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "image")), batch_format="pyarrow"
    )
    out = imgs.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"fake": False},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=(1, 8),
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "media_id": t["media_id"],
                "width": pc.cast(t["dec_width"], pa.int64()),
                "height": pc.cast(t["dec_height"], pa.int64()),
                "channels": pc.cast(t["dec_channels"], pa.int64()),
                "crc32": pc.cast(t["dec_crc32"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def multimodal_audio_real(sf_dir: str):
    """REAL WAV decode roundtrip proof (stdlib PCM decode): exact integer
    features (rate, frames, channels, peak, PCM crc32) vs the
    fixture-carried pre-encode values."""
    from ..stages.multimodal import AudioFeatures

    ds = _read_parquet(_real_media_fixture_path())
    aud = ds.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "audio")), batch_format="pyarrow"
    )
    out = aud.map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=16, concurrency=(1, 8)
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "media_id": t["media_id"],
                "sample_rate": t["dec_rate"],
                "n_samples": t["dec_samples"],
                "channels": t["dec_channels"],
                "peak": t["dec_peak"],
                "crc32": t["dec_crc32"],
            }
        ),
        batch_format="pyarrow",
    )


def _messy_urls_fixture() -> str:
    """Deterministic messy-URL fixture: mixed-case hosts, default and
    explicit ports, utm_* tracking params in every position, fragments,
    and a few non-URL strings — the shapes canonicalization must
    normalize.  Shared verbatim by the engine and the DuckDB oracle."""
    import random

    import pyarrow.parquet as pq_

    path = "/tmp/etlray_messy_urls_v1.parquet"
    if not os.path.exists(path):
        rng = random.Random(77)
        hosts = ["WWW.Example.COM", "site.Example.ORG", "cdn.example.NET",
                 "a.example.io", "B.EXAMPLE.DEV"]
        urls = []
        for i in range(600):
            scheme = rng.choice(["http", "https", "HTTP", "HTTPS"]).lower() \
                if rng.random() < 0.7 else rng.choice(["HTTP", "HTTPS"]).lower()
            # ~5% plain junk rows exercise the pass-through branch
            if rng.random() < 0.05:
                urls.append(f"not a url {i}")
                continue
            host = rng.choice(hosts)
            port = rng.choice(["", ":80", ":443", ":8080"])
            path_part = f"/p/{i}" if rng.random() < 0.9 else ""
            params = []
            for _ in range(rng.randrange(0, 4)):
                if rng.random() < 0.5:
                    params.append(f"utm_{rng.choice(['source','medium','campaign'])}=v{i}")
                else:
                    params.append(f"{rng.choice(['id','q','page'])}={rng.randrange(100)}")
            q = "?" + "&".join(params) if params else ""
            frag = f"#sec{i}" if rng.random() < 0.3 else ""
            urls.append(f"{scheme}://{host}{port}{path_part}{q}{frag}")
        tbl = pa.table(
            {
                "url_id": pa.array(range(len(urls)), pa.int64()),
                "url": pa.array(urls, pa.string()),
            }
        )
        tmp = f"{path}.tmp.{os.getpid()}"
        pq_.write_table(tbl, tmp)
        os.replace(tmp, path)
    return path


def canonical_urls(sf_dir: str):
    """URL canonicalization (stages/urlops.canonicalize_urls): fragment /
    utm-param / default-port / host-case normalization, fully vectorized
    RE2 kernels — the crawl-frontier dedup prerequisite.  Oracle runs the
    identical pattern chain in DuckDB (same regex engine)."""
    from ..stages.urlops import canonicalize_urls

    ds = _read_parquet(_messy_urls_fixture())
    return ds.map_batches(
        lambda t: canonicalize_urls(t).select(["url_id", "url_canon"]),
        batch_format="pyarrow",
    )


def first_event_per_user_hour(sf_dir: str):
    """Recrawl/refetch suppression shape: the FIRST event per (user,
    hour) window — composite-window dedup via grouped_topk k=1 on a
    derived composite key (no per-group Python; one bounded bucketed
    shuffle).  Oracle: row_number() over the same composite partition."""
    from ..stages.topk import grouped_topk

    ds = _read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "ts"]
    )

    def tag(t: pa.Table) -> pa.Table:
        hour = pc.divide(pc.cast(t["ts"], pa.int64()), pa.scalar(3_600_000_000, pa.int64()))
        grp = pc.binary_join_element_wise(
            pc.cast(t["user_id"], pa.string()), pc.cast(hour, pa.string()), "|"
        )
        return t.append_column("hour", pc.cast(hour, pa.int64())).append_column(
            "_grp", grp
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    first = grouped_topk(
        tagged,
        group_col="_grp",
        order_by=[("ts", "asc"), ("event_id", "asc")],
        k=1,
    )
    return first.map_batches(
        lambda t: t.select(["user_id", "hour", "event_id"]), batch_format="pyarrow"
    )


def incremental_dedup_docs(sf_dir: str):
    """STREAMING-INGEST dedup shape: dedupe newly-arrived documents
    against the already-ingested corpus, then among themselves — the
    per-poll operation a continuously-tailed training lake runs (the
    batch `dedup_docs_exact` is the bootstrap; this is the steady
    state).  Corpus = doc_id % 5 != 0, arrivals = doc_id % 5 == 0.

    Composition, no driver collect: content digests stream from the
    Fingerprinter actor pool; arrivals anti-join the corpus digest set
    (stages/joins.key_filter_join — broadcast / Bloom-prefiltered
    shuffle, chosen by size); survivors dedup among themselves with the
    same bucketed keep-min used everywhere."""
    from ..stages.joins import key_filter_join
    from ..stages.text import Fingerprinter

    def digest(t: pa.Table) -> pa.Table:
        fp = Fingerprinter()
        d = pa.array(
            [fp.md5_norm(x) for x in t.column("text").to_pylist()], pa.string()
        )
        return pa.table({"doc_id": t["doc_id"], "fp_md5": d})

    ds = _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def split_corpus(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(
            pc.subtract(
                t["doc_id"],
                pc.multiply(pc.divide(t["doc_id"], 5), pa.scalar(5, pa.int64())),
            ),
            0,
        )
        return t.filter(keep)

    def split_arrivals(t: pa.Table) -> pa.Table:
        keep = pc.equal(
            pc.subtract(
                t["doc_id"],
                pc.multiply(pc.divide(t["doc_id"], 5), pa.scalar(5, pa.int64())),
            ),
            0,
        )
        return t.filter(keep)

    corpus_fp = ds.map_batches(split_corpus, batch_format="pyarrow").map_batches(
        digest, batch_format="pyarrow"
    )
    arrivals_fp = ds.map_batches(split_arrivals, batch_format="pyarrow").map_batches(
        digest, batch_format="pyarrow"
    )
    fresh = key_filter_join(
        arrivals_fp, corpus_fp, left_on="fp_md5", right_on="fp_md5", anti=True
    )

    # dedup among the surviving arrivals: keep min doc_id per digest
    def keep_min(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_bucket"])
        import numpy as np

        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        d = t["fp_md5"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, d))
        dd, first = np.unique(d[order], return_index=True)
        return pa.table({"doc_id": pa.array(np.sort(ids[order][first]), pa.int64())})

    tagged = fresh.map_batches(
        lambda t: t.append_column("_bucket", hash_bucket(t["fp_md5"], 64)),
        batch_format="pyarrow",
    )
    return tagged.groupby("_bucket").map_groups(keep_min, batch_format="pyarrow")


def approx_quantiles_events(sf_dir: str):
    """Single-pass approximate quantiles (mergeable evenly-spaced
    order-statistic summary, deterministic rank error <= n/m per block —
    stages/sketch.approx_quantiles): the no-shuffle complement to the
    exact sort-based `quantiles_events` at 10^10-row scale.  Estimates
    are deterministic but summary-dependent, so correctness is
    pytest-pinned (rank bound, merge order-freedom, exactness when the
    summary covers the block) rather than SQL-checked."""
    from ..stages.sketch import approx_quantiles

    ds = _read_parquet(_p(sf_dir, "events"), columns=["value"])
    return approx_quantiles(ds, "value", [0.25, 0.5, 0.75, 0.95])


def dup_span_profile_docs(sf_dir: str):
    """Corpus-internal duplication profile (the train-data dedup
    analysis of Lee et al. 2021, "Deduplicating Training Data Makes
    Language Models Better", at n-gram granularity): for every document,
    the fraction of its distinct 8-grams that also appear in ANY other
    document.  Vectorized gram explode (stages/text.doc_ngrams), one
    bucketed per-gram doc count, shared-gram semi join
    (broadcast / Bloom-prefiltered by size), one bucketed per-doc
    reduce.  dup_ratio = n_shared/n_grams is a single int/int IEEE
    divide — bit-identical across engines."""
    import numpy as np

    from ..stages.joins import key_filter_join
    from ..stages.text import doc_ngrams

    ds = _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    grams = ds.map_batches(
        lambda t: doc_ngrams(t, 8), batch_format="pyarrow"
    ).materialize()  # narrow (id, gram); consumed by three branches

    # grams appearing in >= 2 documents (rows are per-doc distinct, so a
    # per-gram ROW count is a per-gram DOC count)
    def gram_counts(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_gb"])
        if g.num_rows == 0:
            return pa.table({"gram": pa.array([], pa.string())})
        v = g["gram"].to_numpy(zero_copy_only=False)
        u, c = np.unique(v, return_counts=True)
        return pa.table({"gram": pa.array(u[c >= 2], pa.string())})

    shared = (
        grams.map_batches(
            lambda t: t.append_column("_gb", hash_bucket(t["gram"], 256)),
            batch_format="pyarrow",
        )
        .groupby("_gb")
        .map_groups(gram_counts, batch_format="pyarrow")
    )
    sh_rows = key_filter_join(grams, shared, left_on="gram", right_on="gram")

    def mark(flag: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "shared": pa.array(
                        np.full(t.num_rows, flag, np.int64), pa.int64()
                    ),
                }
            )

        return f

    both = grams.map_batches(mark(0), batch_format="pyarrow").union(
        sh_rows.map_batches(mark(1), batch_format="pyarrow")
    )

    def per_doc(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_db"])
        schema_out = pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_grams", pa.int64()),
                ("n_shared", pa.int64()),
                ("dup_ratio", pa.float64()),
            ]
        )
        if g.num_rows == 0:
            return schema_out.empty_table()
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        sh = g["shared"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, sh = ids[order], sh[order]
        u, starts = np.unique(ids, return_index=True)
        ends = np.concatenate((starts[1:], [len(ids)]))
        csum = np.concatenate(([0], np.cumsum(sh)))
        n_sh = csum[ends] - csum[starts]
        n_tot = (ends - starts) - n_sh  # marker-0 rows count every gram once
        return pa.table(
            {
                "doc_id": pa.array(u, pa.int64()),
                "n_grams": pa.array(n_tot, pa.int64()),
                "n_shared": pa.array(n_sh, pa.int64()),
                "dup_ratio": pa.array(
                    n_sh.astype(np.float64) / n_tot.astype(np.float64), pa.float64()
                ),
            },
            schema=schema_out,
        )

    return (
        both.map_batches(
            lambda t: t.append_column("_db", hash_bucket(t["doc_id"], 128)),
            batch_format="pyarrow",
        )
        .groupby("_db")
        .map_groups(per_doc, batch_format="pyarrow")
    )


def grouped_quantiles_users(sf_dir: str):
    """Per-user exact value quantiles (p25/p50/p87.5 — binary-exact q so
    the rank arithmetic provably matches SQL quantile_disc): the
    grouped generalization of exact quantiles at key cardinality, one
    bounded bucketed shuffle (stages/quantiles.grouped_quantiles).
    Values pass through unchanged (selection, not arithmetic) — float
    columns are hash-safe."""
    from ..stages.quantiles import grouped_quantiles

    ds = _read_parquet(_p(sf_dir, "events"), columns=["user_id", "value"])
    return grouped_quantiles(
        ds,
        key="user_id",
        value_col="value",
        qs=[0.25, 0.5, 0.875],
        out_cols=["p25", "p50", "p875"],
    )


def ecdf_normalize_docs(sf_dir: str):
    """Rank / ECDF normalization of a bounded-domain integer feature
    (n_chars): pct = (# rows <= x) / n, the quantile-uniformizing
    transform feature pipelines apply before mixing heterogeneous
    scores.  Two-phase, shuffle-free: per-batch value-count partials
    (domain-bounded, tiny) merge on the driver into one cumulative
    table broadcast to a vectorized per-batch lookup.  Counts stay
    integer until a single IEEE divide — hash-safe vs SQL cume_dist."""
    import numpy as np

    ds = _read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "n_chars"]
    ).materialize()  # narrow (id,int); consumed by count pass AND transform

    def counts(t: pa.Table) -> pa.Table:
        u, c = np.unique(t["n_chars"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table(
            {"v": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())}
        )

    parts = ds.map_batches(counts, batch_format="pyarrow").take_all()
    vals = np.array([r["v"] for r in parts], np.int64)
    cnts = np.array([r["c"] for r in parts], np.int64)
    u = np.unique(vals)
    total_per = np.zeros(len(u), np.int64)
    np.add.at(total_per, np.searchsorted(u, vals), cnts)
    cum = np.cumsum(total_per)
    n = int(cum[-1]) if len(cum) else 0
    import ray as _ray

    ref = _ray.put((u, cum, n))

    def transform(t: pa.Table) -> pa.Table:
        uu, cc, nn = _ray.get(ref)
        x = t["n_chars"].to_numpy(zero_copy_only=False)
        le = cc[np.searchsorted(uu, x, side="left")]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": t["n_chars"],
                "pct": pa.array(le.astype(np.float64) / float(nn), pa.float64()),
            }
        )

    return ds.map_batches(transform, batch_format="pyarrow")


def user_event_mode(sf_dir: str):
    """Per-group MODE (most frequent value, ties broken by value
    ascending — made explicit so it is deterministic and
    SQL-reproducible, unlike bare mode()): the categorical-feature
    summarizer.  One bucketed shuffle on the group key; inside a bucket
    the (key, value) pair counts and the per-key argmax are one lexsort
    + reduceat — no per-key Python."""
    import numpy as np

    ds = _read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_type"])

    def mode_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_mb"])
        schema_out = pa.schema(
            [
                ("user_id", pa.int64()),
                ("mode_event", pa.string()),
                ("mode_count", pa.int64()),
            ]
        )
        if g.num_rows == 0:
            return schema_out.empty_table()
        ku = g["user_id"].to_numpy(zero_copy_only=False)
        ev = g["event_type"].to_numpy(zero_copy_only=False)
        # count distinct (user, event) pairs: lexsort by (event, user) so
        # pair runs are contiguous with EVENT ascending inside each user
        order = np.lexsort((ev, ku))
        ks, es = ku[order], ev[order]
        new_pair = np.ones(len(ks), bool)
        new_pair[1:] = (ks[1:] != ks[:-1]) | (es[1:] != es[:-1])
        starts = np.flatnonzero(new_pair)
        ends = np.concatenate((starts[1:], [len(ks)]))
        counts = ends - starts
        pk, pe = ks[starts], es[starts]
        # per-user argmax: order pairs (user, count desc, event asc) and
        # take each user-run's first row — fully vectorized
        order2 = np.lexsort((pe, -counts, pk))
        pk2, pe2, c2 = pk[order2], pe[order2], counts[order2]
        first = np.flatnonzero(np.concatenate(([True], pk2[1:] != pk2[:-1])))
        return pa.table(
            {
                "user_id": pa.array(pk2[first], pa.int64()),
                "mode_event": pa.array(pe2[first], pa.string()),
                "mode_count": pa.array(c2[first], pa.int64()),
            },
            schema=schema_out,
        )

    return (
        ds.map_batches(
            lambda t: t.append_column("_mb", hash_bucket(t["user_id"], 128)),
            batch_format="pyarrow",
        )
        .groupby("_mb")
        .map_groups(mode_bucket, batch_format="pyarrow")
    )


def unpivot_order_metrics(sf_dir: str):
    """UNPIVOT / melt: wide per-order numeric metrics into long
    (o_orderkey, metric, value_cents) rows — the long-format transform
    feature stores ingest.  Pure vectorized reshape inside map_batches
    (each metric column contributes one full-length slice; no shuffle,
    no row loop).  Money casts to integer cents first (shared
    determinism rule)."""
    import numpy as np

    ds = _read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_totalprice", "o_custkey"],
    )

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        cents = pc.cast(
            pc.floor(pc.multiply(t["o_totalprice"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        cust = pc.cast(t["o_custkey"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": pa.array(np.concatenate([keys, keys]), pa.int64()),
                "metric": pa.array(
                    ["total_cents"] * n + ["cust_key"] * n, pa.string()
                ),
                "value": pa.array(np.concatenate([cents, cust]), pa.int64()),
            }
        )

    return ds.map_batches(melt, batch_format="pyarrow")


def profile_documents(sf_dir: str):
    """Column profiling (data-quality pass): per-column null count and
    min/max over the documents table, computed as per-batch partials
    merged on the driver — one streaming pass, no shuffle, O(columns)
    driver state.  Restricted to int/string columns so the VARCHAR
    rendering of min/max is engine-independent (float formatting is
    not).  Oracle: one UNION ALL branch per column."""
    import numpy as np

    cols = ["doc_id", "lang", "source", "n_chars"]
    ds = _read_parquet(_p(sf_dir, "documents"), columns=cols)

    def partial(t: pa.Table) -> pa.Table:
        names, nulls, mins, maxs = [], [], [], []
        for c in cols:
            col = t[c]
            names.append(c)
            nulls.append(col.null_count)
            valid = col.drop_null()
            if len(valid) == 0:
                mins.append(None)
                maxs.append(None)
            else:
                mins.append(str(pc.min(valid).as_py()))
                maxs.append(str(pc.max(valid).as_py()))
        return pa.table(
            {
                "column": pa.array(names, pa.string()),
                "null_count": pa.array(nulls, pa.int64()),
                "min_v": pa.array(mins, pa.string()),
                "max_v": pa.array(maxs, pa.string()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    out = {c: {"null_count": 0, "min_v": None, "max_v": None} for c in cols}
    for r in parts:
        o = out[r["column"]]
        o["null_count"] += r["null_count"]
        for k, better in (("min_v", min), ("max_v", max)):
            if r[k] is None:
                continue
            # doc_id / n_chars are numeric: compare numerically, render
            # canonically (str(int) == CAST(int AS VARCHAR))
            cur = o[k]
            if r["column"] in ("doc_id", "n_chars"):
                o[k] = (
                    r[k]
                    if cur is None
                    else str(better(int(cur), int(r[k])))
                )
            else:
                o[k] = r[k] if cur is None else better(cur, r[k])
    return pa.table(
        {
            "column": pa.array(cols, pa.string()),
            "null_count": pa.array([out[c]["null_count"] for c in cols], pa.int64()),
            "min_v": pa.array([out[c]["min_v"] for c in cols], pa.string()),
            "max_v": pa.array([out[c]["max_v"] for c in cols], pa.string()),
        }
    )


def rolling_sum_events(sf_dir: str):
    """ROWS-frame rolling aggregate per user: running 4-row (3 PRECEDING
    + CURRENT) sum of value cents ordered by (ts, event_id) — the
    bounded-lookback activity feature.  stages/analytic.rolling_sum:
    bucketed shuffle, cumsum-difference frames, integer-exact."""
    from ..stages.analytic import rolling_sum

    ds = _read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "cents": pc.cast(
                    pc.floor(pc.multiply(t["value"], 100.0)), pa.int64()
                ),
            }
        )

    out = rolling_sum(
        ds.map_batches(to_cents, batch_format="pyarrow"),
        key="user_id",
        order_by=["ts", "event_id"],
        value_col="cents",
        preceding=3,
        out_col="roll4_cents",
    )
    return out.map_batches(
        lambda t: t.select(["event_id", "user_id", "roll4_cents"]),
        batch_format="pyarrow",
    )


def gapfill_daily_user_counts(sf_dir: str):
    """Time-series gap fill: per-user daily event counts with MISSING
    days materialized as zero rows between each user's first and last
    active day — the regularization step before any windowed/sequence
    model consumes per-entity activity.  One bucketed shuffle; inside a
    bucket the dense day grids are built as vectorized ragged ranges
    (global arange minus per-user offsets) and matched to observed
    counts via searchsorted — no per-user Python.  Integers throughout."""
    import numpy as np

    ds = _read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts"])

    def to_day(t: pa.Table) -> pa.Table:
        day = pc.divide(
            pc.cast(t["ts"], pa.int64()), pa.scalar(86_400_000_000, pa.int64())
        )
        return pa.table({"user_id": t["user_id"], "day": pc.cast(day, pa.int64())})

    def fill_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_gf"])
        schema_out = pa.schema(
            [("user_id", pa.int64()), ("day", pa.int64()), ("n_events", pa.int64())]
        )
        if g.num_rows == 0:
            return schema_out.empty_table()
        u = g["user_id"].to_numpy(zero_copy_only=False)
        d = g["day"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, u))
        us, dsrt = u[order], d[order]
        # observed (user, day) counts
        new = np.ones(len(us), bool)
        new[1:] = (us[1:] != us[:-1]) | (dsrt[1:] != dsrt[:-1])
        starts = np.flatnonzero(new)
        cnts = np.diff(np.concatenate((starts, [len(us)])))
        cu, cd = us[starts], dsrt[starts]
        # per-user [lo, hi] day spans
        ustart = np.flatnonzero(np.concatenate(([True], cu[1:] != cu[:-1])))
        uend = np.concatenate((ustart[1:], [len(cu)]))
        lo = cd[ustart]
        hi = cd[uend - 1]
        lens = hi - lo + 1
        # ragged ranges: one global arange, offset per user
        off = np.concatenate(([0], np.cumsum(lens)))
        total = int(off[-1])
        rep = np.repeat(np.arange(len(lens)), lens)
        days = np.arange(total, dtype=np.int64) - off[rep] + lo[rep]
        users = cu[ustart][rep]
        # match observed counts into the dense grid: composite key search
        # (user runs are contiguous and day-ascending in BOTH arrays)
        obs_key = cu.astype(np.int64) * np.int64(1 << 22) + cd
        grid_key = users * np.int64(1 << 22) + days
        pos = np.searchsorted(obs_key, grid_key)
        n = np.zeros(total, np.int64)
        hit = (pos < len(obs_key)) & (obs_key[np.minimum(pos, len(obs_key) - 1)] == grid_key)
        n[hit] = cnts[pos[hit]]
        return pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "day": pa.array(days, pa.int64()),
                "n_events": pa.array(n, pa.int64()),
            },
            schema=schema_out,
        )

    return (
        ds.map_batches(to_day, batch_format="pyarrow")
        .map_batches(
            lambda t: t.append_column("_gf", hash_bucket(t["user_id"], 128)),
            batch_format="pyarrow",
        )
        .groupby("_gf")
        .map_groups(fill_bucket, batch_format="pyarrow")
    )


def funnel_users_events(sf_dir: str):
    """Ordered funnel detection: users whose event history contains
    view -> click -> purchase IN ORDER (other events may interleave) —
    sequence-pattern mining as a composition of the journey aggregation
    (grouped_concat) and one vectorized RE2 match over the per-user
    trace strings.  The oracle runs the identical regex on the identical
    string_agg — same pattern, same engine (RE2) on both sides."""
    from ..stages.analytic import grouped_concat

    ds = _read_parquet(
        _p(sf_dir, "events"), columns=["user_id", "event_type", "ts", "event_id"]
    )
    journeys = grouped_concat(
        ds,
        key="user_id",
        order_by=["ts", "event_id"],
        value_col="event_type",
        out_col="journey",
    )
    pat = r"view(,[a-z]+)*,click(,[a-z]+)*,purchase"

    def match(t: pa.Table) -> pa.Table:
        keep = pc.match_substring_regex(t["journey"], pat)
        return t.filter(keep).select(["user_id"])

    return journeys.map_batches(match, batch_format="pyarrow")


def debounce_events(sf_dir: str):
    """Temporal dedup with tolerance (debounce): drop any event arriving
    within 60 s of the SAME user's previous event (threshold sized so
    the fixture actually exercises both branches) — the repeated-click /
    duplicate-beacon suppression pass.  Composition: per-user ordered
    lag (stages/analytic.partitioned_analytics) + one vectorized integer
    filter.  Microsecond integers end-to-end."""
    from ..stages.analytic import partitioned_analytics

    ds = _read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "ts"]
    )
    lagged = partitioned_analytics(
        ds, key="user_id", order_by=["ts", "event_id"], lag_cols=["ts"]
    )

    def keep(t: pa.Table) -> pa.Table:
        gap = pc.subtract(
            pc.cast(t["ts"], pa.int64()), pc.cast(t["ts_prev"], pa.int64())
        )
        first = pc.is_null(t["ts_prev"])
        ok = pc.or_kleene(
            first, pc.greater(gap, pa.scalar(60_000_000, pa.int64()))
        )
        return t.filter(ok).select(["event_id", "user_id"])

    return lagged.map_batches(keep, batch_format="pyarrow")


def weighted_avg_value_by_type(sf_dir: str):
    """Exact weighted mean per group with INTEGER sums: per event type,
    sum(cents × weight)/sum(weight) with weight = user_id % 7 + 1 (a
    deterministic integer weight).  Both accumulators are int64 (exact,
    order-free); the mean is ONE IEEE divide of identical operands —
    hash-safe across engines, unlike a float running mean."""
    import numpy as np

    ds = _read_parquet(
        _p(sf_dir, "events"), columns=["event_type", "user_id", "value"]
    )

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        cents = pc.cast(
            pc.floor(pc.multiply(t["value"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        w = t["user_id"].to_numpy(zero_copy_only=False) % 7 + 1
        u, inv = np.unique(et, return_inverse=True)
        sw = np.zeros(len(u), np.int64)
        swc = np.zeros(len(u), np.int64)
        np.add.at(sw, inv, w)
        np.add.at(swc, inv, w * cents)
        return pa.table(
            {
                "event_type": pa.array(u, pa.string()),
                "sw": pa.array(sw, pa.int64()),
                "swc": pa.array(swc, pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    agg: dict[str, list[int]] = {}
    for r in parts:
        a = agg.setdefault(r["event_type"], [0, 0])
        a[0] += r["sw"]
        a[1] += r["swc"]
    keys = sorted(agg)
    return pa.table(
        {
            "event_type": pa.array(keys, pa.string()),
            "w_total": pa.array([agg[k][0] for k in keys], pa.int64()),
            "wavg_cents": pa.array(
                [agg[k][1] / agg[k][0] for k in keys], pa.float64()
            ),
        }
    )


def corr_qty_price_by_retflag(sf_dir: str):
    """Exact grouped Pearson correlation, distributed: per l_returnflag,
    corr(quantity, extendedprice) over integer cents.  Per-batch int64
    moment partials (n, Σx, Σy, Σx², Σxy, Σy²) with ``batch_size``
    capped at 64k rows so Σy² (y ≤ 1e7 cents → y² ≤ 1e14/row) stays
    below 2⁶³ per batch; partials combine on the driver with Python
    arbitrary-precision ints, so the moments are EXACT at any scale.
    The only float ops — cast each moment combination to double, one
    multiply, one sqrt, one divide — are replicated operand-for-operand
    in the oracle (DuckDB sums BIGINT into HUGEINT, also exact), so the
    result is bit-identical.  Reference analogue: grouped numeric
    aggregates (A1 family) widened to second moments."""
    import math

    ds = _read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t["l_returnflag"].to_numpy(zero_copy_only=False)
        x = (
            pc.cast(pc.floor(pc.multiply(t["l_quantity"], 100.0)), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        y = (
            pc.cast(
                pc.floor(pc.multiply(t["l_extendedprice"], 100.0)), pa.int64()
            ).to_numpy(zero_copy_only=False)
        )
        u, inv = np.unique(g, return_inverse=True)
        cols = {"l_returnflag": pa.array(u, pa.string())}
        for name, v in (
            ("n", np.ones(len(x), np.int64)),
            ("sx", x),
            ("sy", y),
            ("sxx", x * x),
            ("sxy", x * y),
            ("syy", y * y),
        ):
            acc = np.zeros(len(u), np.int64)
            np.add.at(acc, inv, v)
            cols[name] = pa.array(acc, pa.int64())
        return pa.table(cols)

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).take_all()
    agg: dict[str, list[int]] = {}
    for r in parts:
        a = agg.setdefault(r["l_returnflag"], [0, 0, 0, 0, 0, 0])
        for i, k in enumerate(("n", "sx", "sy", "sxx", "sxy", "syy")):
            a[i] += int(r[k])
    keys = sorted(agg)
    corr = []
    for k in keys:
        n, sx, sy, sxx, sxy, syy = agg[k]
        num = n * sxy - sx * sy
        d1 = n * sxx - sx * sx
        d2 = n * syy - sy * sy
        # _hug2d: the oracle casts these from HUGEINT (sums of BIGINT)
        corr.append(_hug2d(num) / math.sqrt(_hug2d(d1) * _hug2d(d2)))
    return pa.table(
        {
            "l_returnflag": pa.array(keys, pa.string()),
            "n_rows": pa.array([agg[k][0] for k in keys], pa.int64()),
            "corr_qty_price": pa.array(corr, pa.float64()),
        }
    )


def event_transition_counts(sf_dir: str):
    """Markov transition matrix over per-user event sequences: count of
    (previous event_type → event_type) transitions, ordered by (ts,
    event_id) within each user.  Composition: per-user ordered lag
    (partitioned_analytics, one bucketed shuffle) + per-batch pyarrow
    group_by count partials + a tiny driver combine (≤ |types|² keys).
    Integer counts end-to-end — hash-safe."""
    from ..stages.analytic import partitioned_analytics

    ds = _read_parquet(
        _p(sf_dir, "events"), columns=["user_id", "event_type", "ts", "event_id"]
    )
    lagged = partitioned_analytics(
        ds, key="user_id", order_by=["ts", "event_id"], lag_cols=["event_type"]
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["event_type_prev"]))
        out = (
            t.select(["event_type_prev", "event_type"])
            .group_by(["event_type_prev", "event_type"])
            .aggregate([("event_type", "count")])
        )
        return out.rename_columns(["from_type", "to_type", "n"])

    parts = lagged.map_batches(partial, batch_format="pyarrow").take_all()
    agg: dict[tuple[str, str], int] = {}
    for r in parts:
        k = (r["from_type"], r["to_type"])
        agg[k] = agg.get(k, 0) + r["n"]
    keys = sorted(agg)
    return pa.table(
        {
            "from_type": pa.array([k[0] for k in keys], pa.string()),
            "to_type": pa.array([k[1] for k in keys], pa.string()),
            "n": pa.array([agg[k] for k in keys], pa.int64()),
        }
    )


def cohort_retention_events(sf_dir: str):
    """Cohort retention matrix: users grouped by first-seen ISO week
    (cohort), counted as active at each week offset — the classic
    product-analytics retention triangle.  Shape: per-batch distinct
    (user, week) partials shrink the exchange, ONE hash-bucket shuffle
    on user co-locates each user's history, per-bucket vectorized
    (cohort, offset) counting, driver combine over ≤ weeks² keys.  No
    join — the cohort lookup happens inside the user's own bucket."""
    WEEK_US = 604_800_000_000

    ds = _read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts"])

    def distinct_uw(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        wk = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False) // WEEK_US
        pairs = np.unique(np.stack([uid, wk], axis=1), axis=0)
        return pa.table(
            {
                "user_id": pa.array(pairs[:, 0], pa.int64()),
                "week": pa.array(pairs[:, 1], pa.int64()),
            }
        )

    uw = ds.map_batches(distinct_uw, batch_format="pyarrow")

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("_b", hash_bucket(t["user_id"], 64))

    def per_bucket(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        wk = g["week"].to_numpy(zero_copy_only=False)
        # batch partials may repeat a (user, week) pair across batches
        pairs = np.unique(np.stack([uid, wk], axis=1), axis=0)
        uid, wk = pairs[:, 0], pairs[:, 1]
        u, inv = np.unique(uid, return_inverse=True)
        cohort = np.full(len(u), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(cohort, inv, wk)
        co = cohort[inv]
        off = wk - co
        cells = np.stack([co, off], axis=1)
        uc, counts = np.unique(cells, axis=0, return_counts=True)
        return pa.table(
            {
                "cohort_week": pa.array(uc[:, 0], pa.int64()),
                "week_offset": pa.array(uc[:, 1], pa.int64()),
                "n": pa.array(counts, pa.int64()),
            }
        )

    parts = (
        uw.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pyarrow")
        .take_all()
    )
    agg: dict[tuple[int, int], int] = {}
    for r in parts:
        k = (r["cohort_week"], r["week_offset"])
        agg[k] = agg.get(k, 0) + r["n"]
    keys = sorted(agg)
    return pa.table(
        {
            "cohort_week": pa.array([k[0] for k in keys], pa.int64()),
            "week_offset": pa.array([k[1] for k in keys], pa.int64()),
            "n_users": pa.array([agg[k] for k in keys], pa.int64()),
        }
    )


def dense_topk_orders_per_priority(sf_dir: str):
    """Top-3-with-ties per group (dense_rank ≤ 3) WITHOUT a per-group
    sort: pass 1 computes each batch's top-3 DISTINCT total-price cents
    per o_orderpriority (any value in the global top-3 distinct is in
    its own batch's top-3 distinct, so the driver combine over
    |groups|×3×batches partials is exact); pass 2 re-streams the table,
    keeps rows ≥ the group's 3rd-distinct threshold, and assigns the
    dense rank by searchsorted against the broadcast 3-value ladder.
    Integer cents end-to-end."""

    def price_c(t: pa.Table):
        return (
            pc.cast(pc.floor(pc.multiply(t["o_totalprice"], 100.0)), pa.int64())
            .to_numpy(zero_copy_only=False)
        )

    ds = _read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )

    def partial_top(t: pa.Table) -> pa.Table:
        # Fully vectorized: lexsort (prio, value), dedup consecutive
        # pairs, keep each group's last <=3 distinct values by
        # position-from-group-end — no per-group Python loop, so the
        # partial survives high-cardinality group keys.
        pr = t["o_orderpriority"].to_numpy(zero_copy_only=False)
        pc_ = price_c(t)
        order = np.lexsort((pc_, pr))
        p_s, v_s = pr[order], pc_[order]
        first = np.ones(len(p_s), bool)
        first[1:] = (p_s[1:] != p_s[:-1]) | (v_s[1:] != v_s[:-1])
        p_u, v_u = p_s[first], v_s[first]
        grp_start = np.ones(len(p_u), bool)
        grp_start[1:] = p_u[1:] != p_u[:-1]
        starts = np.nonzero(grp_start)[0]
        ends = np.append(starts[1:], len(p_u))
        grp_id = np.cumsum(grp_start) - 1
        pos_from_end = ends[grp_id] - np.arange(len(p_u))  # 1 = group max
        keep = pos_from_end <= 3
        return pa.table(
            {
                "prio": pa.array(p_u[keep], pa.string()),
                "v": pa.array(v_u[keep], pa.int64()),
            }
        )

    parts = ds.map_batches(partial_top, batch_format="pyarrow").take_all()
    tops: dict[str, set[int]] = {}
    for r in parts:
        tops.setdefault(r["prio"], set()).add(r["v"])
    ladder = {p: np.array(sorted(vs)[-3:], np.int64) for p, vs in tops.items()}

    def rank_rows(t: pa.Table) -> pa.Table:
        pr = t["o_orderpriority"].to_numpy(zero_copy_only=False)
        pc_ = price_c(t)
        keep = np.zeros(len(pr), bool)
        rnk = np.zeros(len(pr), np.int64)
        for p, lad in ladder.items():
            m = (pr == p) & (pc_ >= lad[0])
            keep |= m
            rnk[m] = len(lad) - np.searchsorted(lad, pc_[m])
        out = t.filter(pa.array(keep)).select(["o_orderpriority", "o_orderkey"])
        out = out.append_column("price_c", pa.array(pc_[keep], pa.int64()))
        return out.append_column("rnk", pa.array(rnk[keep], pa.int64()))

    return ds.map_batches(rank_rows, batch_format="pyarrow")


def locf_daily_user_values(sf_dir: str):
    """Forward-fill (LOCF) regularization: per user per day, the cents
    value of that day's LAST event, with missing days between the
    user's first and last active day carried forward from the previous
    observed day — the other half of the gap-fill family
    (gapfill_daily_user_counts zero-fills; this one carries state).
    Shape: per-batch (user, day) argmax partials shrink the exchange,
    ONE bucketed shuffle on user, then a fully vectorized dense-grid +
    forward-fill inside each bucket (global maximum.accumulate is safe
    because each user's first grid day is observed by construction)."""
    DAY_US = 86_400_000_000

    ds = _read_parquet(
        _p(sf_dir, "events"), columns=["user_id", "ts", "event_id", "value"]
    )

    def day_last_partial(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        vc = (
            pc.cast(pc.floor(pc.multiply(t["value"], 100.0)), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        day = ts // DAY_US
        order = np.lexsort((eid, ts, day, u))
        u, day, ts, eid, vc = u[order], day[order], ts[order], eid[order], vc[order]
        last = np.ones(len(u), bool)
        last[:-1] = (u[1:] != u[:-1]) | (day[1:] != day[:-1])
        return pa.table(
            {
                "user_id": pa.array(u[last], pa.int64()),
                "day": pa.array(day[last], pa.int64()),
                "ts": pa.array(ts[last], pa.int64()),
                "event_id": pa.array(eid[last], pa.int64()),
                "value_c": pa.array(vc[last], pa.int64()),
            }
        )

    def fill_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_lf"])
        schema_out = pa.schema(
            [("user_id", pa.int64()), ("day", pa.int64()), ("value_c", pa.int64())]
        )
        if g.num_rows == 0:
            return schema_out.empty_table()
        u = g["user_id"].to_numpy(zero_copy_only=False)
        d = g["day"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        vc = g["value_c"].to_numpy(zero_copy_only=False)
        # combine batch partials: last (ts, event_id) per (user, day) wins
        order = np.lexsort((eid, ts, d, u))
        u, d, vc = u[order], d[order], vc[order]
        last = np.ones(len(u), bool)
        last[:-1] = (u[1:] != u[:-1]) | (d[1:] != d[:-1])
        cu, cd, cv = u[last], d[last], vc[last]
        # per-user [lo, hi] spans -> ragged dense grids
        ustart = np.flatnonzero(np.concatenate(([True], cu[1:] != cu[:-1])))
        uend = np.concatenate((ustart[1:], [len(cu)]))
        lo, hi = cd[ustart], cd[uend - 1]
        lens = hi - lo + 1
        off = np.concatenate(([0], np.cumsum(lens)))
        total = int(off[-1])
        rep = np.repeat(np.arange(len(lens)), lens)
        days = np.arange(total, dtype=np.int64) - off[rep] + lo[rep]
        users = cu[ustart][rep]
        obs_key = cu.astype(np.int64) * np.int64(1 << 22) + cd
        grid_key = users * np.int64(1 << 22) + days
        pos = np.searchsorted(obs_key, grid_key)
        hit = (pos < len(obs_key)) & (
            obs_key[np.minimum(pos, len(obs_key) - 1)] == grid_key
        )
        # forward fill: index of the latest observation at or before each
        # grid row; each user's first grid day is observed, so the global
        # running max never crosses a user boundary
        src = np.where(hit, pos, -1)
        src = np.maximum.accumulate(src)
        vals = cv[src]
        return pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "day": pa.array(days, pa.int64()),
                "value_c": pa.array(vals, pa.int64()),
            },
            schema=schema_out,
        )

    return (
        ds.map_batches(day_last_partial, batch_format="pyarrow")
        .map_batches(
            lambda t: t.append_column("_lf", hash_bucket(t["user_id"], 128)),
            batch_format="pyarrow",
        )
        .groupby("_lf")
        .map_groups(fill_bucket, batch_format="pyarrow")
    )


def revenue_by_region_star(sf_dir: str):
    """Star-schema rollup across a THREE-hop dimension chain: orders
    (fact, streamed) -> customer -> nation -> region, revenue in integer
    cents per region name.  The dim chain is pre-joined driver-side into
    one (custkey -> region name) lookup — tiny vs the fact — then
    ray.put ONCE and probed per batch with vectorized ``pc.index_in``;
    per-batch pre-aggregation shrinks the exchange to ≤|regions| rows
    per block.  At a scale where customer itself is too big to
    broadcast, the same query falls back to the hash-partitioned join
    path (stages/joins.key_filter_join's broadcast-limit switch is the
    template); the dim-chain PRE-join driver-side is the part that
    always holds (nation x region are bounded small)."""
    cust = pa.concat_tables(
        ray.get(
            _read_parquet(
                _p(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
            ).to_arrow_refs()
        )
    )
    nation = pa.concat_tables(
        ray.get(
            _read_parquet(
                _p(sf_dir, "nation"), columns=["n_nationkey", "n_regionkey"]
            ).to_arrow_refs()
        )
    )
    region = pa.concat_tables(
        ray.get(
            _read_parquet(
                _p(sf_dir, "region"), columns=["r_regionkey", "r_name"]
            ).to_arrow_refs()
        )
    )
    npos = pc.index_in(
        nation["n_regionkey"], value_set=region["r_regionkey"].combine_chunks()
    )
    n_rname = pc.take(region["r_name"].combine_chunks(), npos)
    cpos = pc.index_in(
        cust["c_nationkey"], value_set=nation["n_nationkey"].combine_chunks()
    )
    c_rname = pc.take(n_rname, cpos)
    dim_ref = ray.put((cust["c_custkey"].combine_chunks(), c_rname))

    def join_and_partial(t: pa.Table) -> pa.Table:
        keys, rnames = ray.get(dim_ref)
        pos = pc.index_in(t["o_custkey"], value_set=keys)
        rn = pc.take(rnames, pos)
        cents = pc.cast(
            pc.floor(pc.multiply(t["o_totalprice"], 100.0)), pa.int64()
        )
        tt = pa.table({"r_name": rn, "cents": cents}).filter(pc.is_valid(rn))
        return (
            tt.group_by("r_name")
            .aggregate([("cents", "sum"), ("cents", "count")])
            .rename_columns(["r_name", "partial_cents", "partial_n"])
        )

    return (
        _read_parquet(_p(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
        .map_batches(join_and_partial, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(
            Sum("partial_cents", alias_name="revenue_cents"),
            Sum("partial_n", alias_name="n_orders"),
        )
    )


def interarrival_quantiles_by_type(sf_dir: str):
    """Inter-arrival-time distribution per event type: exact p50/p87.5
    quantiles of the gap (microseconds) between a user's consecutive
    events, grouped by the CURRENT event's type — the latency-profile
    shape (time-since-last-action per action kind) behind engagement
    and rate-limit analytics.  Composition of two existing stages, one
    bucketed shuffle each: per-user ordered lag
    (stages/analytic.partitioned_analytics) -> vectorized int64 gap ->
    grouped exact quantiles (stages/quantiles.grouped_quantiles,
    binary-exact q so the selected rank provably matches SQL
    quantile_disc).  Gaps are integer microseconds passed through
    unchanged (selection, not arithmetic) — hash-safe.  Reference
    analogue: per-key ordered analytics (O2/A1 families) composed."""
    from ..stages.analytic import partitioned_analytics
    from ..stages.quantiles import grouped_quantiles

    ds = _read_parquet(
        _p(sf_dir, "events"),
        columns=["user_id", "event_type", "ts", "event_id"],
    )
    lagged = partitioned_analytics(
        ds, key="user_id", order_by=["ts", "event_id"], lag_cols=["ts"]
    )

    def gap(t: pa.Table) -> pa.Table:
        prev = t["ts_prev"]
        g = pc.subtract(
            pc.cast(t["ts"], pa.int64()), pc.cast(prev, pa.int64())
        )
        out = pa.table({"event_type": t["event_type"], "gap_us": g})
        return out.filter(pc.is_valid(prev))

    gaps = lagged.map_batches(gap, batch_format="pyarrow")
    return grouped_quantiles(
        gaps,
        key="event_type",
        value_col="gap_us",
        qs=[0.5, 0.875],
        out_cols=["p50_us", "p875_us"],
    )


def wow_event_counts(sf_dir: str):
    """Period-over-period deltas: weekly event counts per type with the
    week-over-week change — the trend-monitoring shape (WoW/MoM deltas
    per key) behind ingest-volume and drift dashboards.  Shape:
    per-batch (event_type, week) count partials shrink the exchange to
    ≤|types|×|weeks| rows per block, ONE small groupby combine, then
    the per-key ordered lag (stages/analytic.partitioned_analytics)
    over the aggregate — the lag shuffles only the tiny aggregate,
    never the fact table.  Integer counts end-to-end; the first week of
    each type has a null delta (SQL lag semantics)."""
    from ..stages.analytic import partitioned_analytics

    WEEK_US = 604_800_000_000

    ds = _read_parquet(_p(sf_dir, "events"), columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        wk = pc.cast(
            pc.divide(pc.cast(t["ts"], pa.int64()), WEEK_US), pa.int64()
        )
        tt = pa.table({"event_type": t["event_type"], "week": wk})
        return (
            tt.group_by(["event_type", "week"])
            .aggregate([("week", "count")])
            .rename_columns(["event_type", "week", "pn"])
        )

    weekly = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "week"])
        .aggregate(Sum("pn", alias_name="n"))
    )
    lagged = partitioned_analytics(
        weekly, key="event_type", order_by=["week"], lag_cols=["n"]
    )

    def delta(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "week": t["week"],
                "n": t["n"],
                "wow_delta": pc.subtract(t["n"], t["n_prev"]),
            }
        )

    return lagged.map_batches(delta, batch_format="pyarrow")


def distinct_users_per_type(sf_dir: str):
    """EXACT grouped COUNT(DISTINCT): distinct users per event type —
    the exact counterpart of approx_distinct_events (HLL), for when the
    audience count must be exact (billing, experiment gating).  Scale
    shape: per-batch distinct (type, user) partials (pyarrow group_by
    with no aggregates) shrink the exchange to unique pairs per block;
    ONE bucketed shuffle on user_id co-locates every occurrence of a
    pair (a pair can only appear in its user's bucket, so in-bucket
    dedup is global dedup); per-bucket vectorized pair-dedup + per-type
    counts; a tiny Sum combine over ≤ |types| × buckets rows.  The
    distinct-pair table never lands on the driver.  Integer counts —
    hash-safe."""
    from ..stages.hashutil import hash_bucket

    ds = _read_parquet(_p(sf_dir, "events"), columns=["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by(["event_type", "user_id"]).aggregate([])

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("_db", hash_bucket(t["user_id"], 256))

    def count_bucket(g: pa.Table) -> pa.Table:
        schema_out = pa.schema(
            [("event_type", pa.string()), ("pn", pa.int64())]
        )
        if g.num_rows == 0:
            return schema_out.empty_table()
        et = g["event_type"].to_numpy(zero_copy_only=False)
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        types, tcodes = np.unique(et, return_inverse=True)
        # batch partials may repeat a pair across batches: dedupe, then
        # count pairs per type in one vectorized pass
        pairs = np.unique(np.stack([tcodes, uid], axis=1), axis=0)
        cnt = np.bincount(pairs[:, 0], minlength=len(types))
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "pn": pa.array(cnt.astype(np.int64), pa.int64()),
            },
            schema=schema_out,
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(tag, batch_format="pyarrow")
        .groupby("_db")
        .map_groups(count_bucket, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("pn", alias_name="n_users"))
    )


def ntile_events_by_type(sf_dir: str):
    """Per-row NTILE(4) quartile assignment within each event type,
    ordered by (value cents, event_id) — the equal-frequency binning
    transform behind score calibration and cohort splits.  Exact SQL
    ntile semantics: with n rows and k tiles the first n % k tiles get
    ceil(n/k) rows (not the floor((rn-1)*k/n) approximation).  Shape:
    per-batch count partials give the tiny per-type sizes (broadcast
    once); per-type row numbers come from the existing ordered-window
    stage (ONE bucketed shuffle); the tile formula is a vectorized
    per-batch map.  The tie-break on event_id makes the order total, so
    the assignment is engine-independent.  Integer outputs — hash-safe."""
    from ..stages.analytic import partitioned_analytics

    K = 4
    ds = _read_parquet(
        _p(sf_dir, "events"), columns=["event_type", "event_id", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "event_id": t["event_id"],
                "value_c": _cents(t["value"]),
            }
        )

    narrow = ds.map_batches(prep, batch_format="pyarrow")

    def count_partial(t: pa.Table) -> pa.Table:
        return (
            t.select(["event_type"])
            .group_by("event_type")
            .aggregate([("event_type", "count")])
            .rename_columns(["event_type", "pn"])
        )

    sizes: dict[str, int] = {}
    for r in narrow.map_batches(count_partial, batch_format="pyarrow").take_all():
        sizes[r["event_type"]] = sizes.get(r["event_type"], 0) + r["pn"]
    size_ref = ray.put(sizes)

    ranked = partitioned_analytics(
        narrow, key="event_type", order_by=["value_c", "event_id"]
    )

    def assign(t: pa.Table) -> pa.Table:
        sz = ray.get(size_ref)
        keys = pa.array(list(sz.keys()), pa.string())
        ns = np.fromiter(sz.values(), np.int64, len(sz))
        pos = pc.index_in(t["event_type"], value_set=keys).to_numpy(
            zero_copy_only=False
        )
        n = ns[pos]
        rn = t["rn"].to_numpy(zero_copy_only=False)
        q, r = n // K, n % K
        big_span = r * (q + 1)
        in_big = rn <= big_span
        tile = np.where(
            in_big,
            (rn - 1) // np.maximum(q + 1, 1) + 1,
            r + (rn - 1 - big_span) // np.maximum(q, 1) + 1,
        )
        return pa.table(
            {
                "event_type": t["event_type"],
                "event_id": t["event_id"],
                "value_c": t["value_c"],
                "tile": pa.array(tile.astype(np.int64), pa.int64()),
            }
        )

    return ranked.map_batches(assign, batch_format="pyarrow")


def topk_frequent_users(sf_dir: str):
    """Exact top-20 most-frequent user_ids in events via the two-pass
    sketch-certified path (stages/sketch.exact_topk_frequent): pass 1
    merges per-task pruned exact counts into certified (lo, hi) count
    brackets, pass 2 recounts only the certified candidates — no
    all-to-all key shuffle, exact answer.  Ties broken (count DESC,
    item ASC) so the limit boundary is engine-independent."""
    from ..stages.sketch import exact_topk_frequent

    ds = _read_parquet(_p(sf_dir, "events"), columns=["user_id"])
    return exact_topk_frequent(ds, "user_id", k=20, m=4096)


def cdc_changelog_pages(sf_dir: str):
    """Debezium-style change-record stream between the bootstrap
    snapshot and the replayed head: (op, url, before/after warc_ts,
    before/after text md5 images), via the manifest-pruned shuffle-free
    per-partition changelog (pipelines/diff.table_changelog).  The
    reference consumes Debezium envelopes; this PRODUCES them from lake
    snapshots — the other half of a CDC contract."""
    from ..state.manifest import LakeTable
    from .diff import table_changelog
    from .replay import bootstrap_lake, replay

    n_urls, n_events = _CDC_SIZES.get(os.path.basename(sf_dir.rstrip("/")), (300, 1500))
    root = _cdc_fixture(n_urls, n_events)
    data_dir = os.path.join(root, "data")
    lake_root = os.path.join(root, "lake", f"clog{os.getpid()}", "pages")
    bootstrap_lake(lake_root, os.path.join(data_dir, "base", "pages.parquet"), num_partitions=16)
    tx_boot = LakeTable(lake_root).read_manifest()["txid"]
    replay(lake_root, os.path.join(data_dir, "wal"))
    tx_head = LakeTable(lake_root).read_manifest()["txid"]
    return table_changelog(lake_root, tx_boot, tx_head, image_cols=("text",))


def fuzzy_pairs_docs(sf_dir: str):
    """Levenshtein<=1 fuzzy-key self-join over the 32-char document
    prefixes — SymSpell deletion-neighborhood blocking (stages/fuzzy.py):
    variant flat-map, bucketed candidate groups, vectorized in-task
    distance verify, 256-bucket pair distinct.  No all-pairs scan;
    the oracle's quadratic levenshtein join is the fidelity check."""
    from ..stages.fuzzy import fuzzy_pairs_ed1

    ds = _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return fuzzy_pairs_ed1(ds, "doc_id", "text", key_len=32)


def entropy_event_types_per_user(sf_dir: str):
    """Shannon entropy (nats) of each user's event-type distribution —
    the behavioral-diversity profile feature.  Fully distributed: one
    partial-pre-agg groupby to (user, type) counts, a vectorized
    c*ln(c) map, then a second tiny groupby to per-user (n, s) and the
    closed form H = ln(n) - s/n.  No per-user collect."""
    ds = _read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["user_id", "event_type"])
            .aggregate([("event_type", "count")])
            .rename_columns(["user_id", "event_type", "pn"])
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(Sum("pn", alias_name="c"))
    )

    def clnc(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "user_id": t["user_id"],
                "c": t["c"],
                "clnc": pa.array(c * np.log(c), pa.float64()),
            }
        )

    per_user = (
        counts.map_batches(clnc, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("c", alias_name="n"), Sum("clnc", alias_name="s"))
    )

    def entropy(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = t["s"].to_numpy(zero_copy_only=False)
        # micro-nats as int64 (the suite's floor(x*scale) determinism
        # rule): many users share near-identical entropies, so a raw
        # float column would make the oracle row order 1-ulp unstable
        h = np.floor((np.log(n) - s / n) * 1e6).astype(np.int64)
        return pa.table(
            {
                "user_id": t["user_id"],
                "n_events": t["n"],
                "entropy_unats": pa.array(h, pa.int64()),
            }
        )

    return per_user.map_batches(entropy, batch_format="pyarrow")


def geomean_value_by_type(sf_dir: str):
    """Grouped geometric mean of positive event values:
    exp(mean(ln v)) per event type via log-sum partials — the
    multiplicative average that point summaries of skewed positive
    metrics (latency, size, price) need.  One tiny groupby."""
    ds = _read_parquet(_p(sf_dir, "events"), columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.greater(t["value"], pa.scalar(0.0)))
        v = keep["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": keep["event_type"],
                "lnv": pa.array(np.log(v), pa.float64()),
            }
        ).group_by("event_type").aggregate([("lnv", "sum"), ("lnv", "count")]).rename_columns(
            ["event_type", "s", "pn"]
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("s", alias_name="s"), Sum("pn", alias_name="n"))
    )

    def fin(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        # integer micros (suite floor(x*scale) rule): the log-sum order
        # differs between engines at the last ulp, so a raw float column
        # is not exactly comparable
        g = np.floor(np.exp(s / n) * 1e6).astype(np.int64)
        return pa.table(
            {
                "event_type": t["event_type"],
                "n_pos": t["n"],
                "geomean_micros": pa.array(g, pa.int64()),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


def chisq_type_by_daypart(sf_dir: str):
    """Chi-square contingency profile between event_type and day-part
    (6-hour buckets): observed count, expected count under independence,
    and the per-cell chi-square contribution.  The contingency marginals
    come from ONE partial-pre-agg groupby (cells = |types| x 4, tiny);
    expected/chi are exact float functions of integer cell counts, so
    the oracle comparison is engine-independent."""
    ds = _read_parquet(_p(sf_dir, "events"), columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        hour = pc.hour(t["ts"])
        part = pc.cast(pc.divide(hour, pa.scalar(6, pa.int64())), pa.int64())
        return (
            pa.table({"event_type": t["event_type"], "daypart": part})
            .group_by(["event_type", "daypart"])
            .aggregate([("daypart", "count")])
            .rename_columns(["event_type", "daypart", "pn"])
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "daypart"])
        .aggregate(Sum("pn", alias_name="n"))
    )

    # the contingency table is |types| x 4 — tiny by construction, so the
    # marginal join is a driver-side broadcast, not a shuffle
    tbl = cells.to_pandas()
    row_tot = tbl.groupby("event_type")["n"].transform("sum").to_numpy()
    col_tot = tbl.groupby("daypart")["n"].transform("sum").to_numpy()
    grand = float(tbl["n"].sum())
    exp = row_tot.astype(np.float64) * col_tot.astype(np.float64) / grand
    obs = tbl["n"].to_numpy().astype(np.float64)
    chi = (obs - exp) ** 2 / exp
    return pa.table(
        {
            "event_type": pa.array(tbl["event_type"], pa.string()),
            "daypart": pa.array(tbl["daypart"].to_numpy(), pa.int64()),
            "n": pa.array(tbl["n"].to_numpy(), pa.int64()),
            "expected": pa.array(exp, pa.float64()),
            "chi2_cell": pa.array(chi, pa.float64()),
        }
    )


def trailing_1h_sum_per_user(sf_dir: str):
    """Time-RANGE windowed aggregate: per user, the trailing-1-hour sum
    of value cents at every event (RANGE frame, peer-inclusive — SQL
    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW semantics).
    stages/analytic.rolling_sum_range: one bucketed shuffle, frame
    bounds from two vectorized searchsorteds on a per-run re-based time
    axis.  Integer-exact."""
    from ..stages.analytic import rolling_sum_range

    ds = _read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "cents": _cents(t["value"]),
            }
        )

    out = rolling_sum_range(
        ds.map_batches(to_cents, batch_format="pyarrow"),
        key="user_id",
        ts_col="ts",
        order_by=["ts", "event_id"],
        value_col="cents",
        window=3_600_000_000,  # 1 hour in microseconds
        out_col="trail_1h_cents",
    )
    return out.map_batches(
        lambda t: t.select(["event_id", "user_id", "trail_1h_cents"]),
        batch_format="pyarrow",
    )


def winsorize_values_by_type(sf_dir: str):
    """Per-group winsorization: clip each event's value cents to its
    event type's exact [p12.5, p87.5] band (binary-exact q, so the
    quantile_disc rank math provably matches SQL) — the outlier-capping
    transform feature pipelines apply before scaling.  The per-type
    bounds come from ONE bounded bucketed shuffle
    (stages/quantiles.grouped_quantiles, group count = |types|); the
    clip itself is a broadcast vectorized map — rows never shuffle."""
    from ..stages.quantiles import grouped_quantiles

    ds = _read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "event_type", "value"]
    )

    def narrow(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "cents": _cents(t["value"]),
            }
        )

    nds = ds.map_batches(narrow, batch_format="pyarrow")
    bounds = {
        r["event_type"]: (r["lo"], r["hi"])
        for r in grouped_quantiles(
            nds.select_columns(["event_type", "cents"]),
            key="event_type",
            value_col="cents",
            qs=[0.125, 0.875],
            out_cols=["lo", "hi"],
        ).take_all()
    }
    b_ref = ray.put(bounds)

    def clip(t: pa.Table) -> pa.Table:
        b = ray.get(b_ref)
        keys = pa.array(list(b), pa.string())
        lo = np.fromiter((v[0] for v in b.values()), np.int64, len(b))
        hi = np.fromiter((v[1] for v in b.values()), np.int64, len(b))
        pos = pc.index_in(t["event_type"], value_set=keys).to_numpy(
            zero_copy_only=False
        )
        v = t["cents"].to_numpy(zero_copy_only=False)
        clipped = np.minimum(np.maximum(v, lo[pos]), hi[pos])
        return pa.table(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "clipped_cents": pa.array(clipped.astype(np.int64), pa.int64()),
            }
        )

    return nds.map_batches(clip, batch_format="pyarrow")


def type_cooccurrence_users(sf_dir: str):
    """Co-occurrence matrix over a bounded vocabulary: for every
    unordered pair of event types, the number of users who performed
    BOTH — the co-engagement profile behind market-basket / feature-mix
    analyses.  Scale shape: one (user, type) distinct groupby, types
    mapped to BITS of a per-user mask (Sum == OR once rows are
    distinct), then per-batch vectorized popcount partials over the
    bounded pair grid — user rows never pair-join."""
    ds = _read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_type"])

    # bounded type vocabulary (tiny distinct pass)
    types = sorted(
        r["event_type"]
        for r in ds.map_batches(
            lambda t: t.select(["event_type"])
            .group_by("event_type")
            .aggregate([]),
            batch_format="pyarrow",
        )
        .groupby("event_type")
        .aggregate(Count(alias_name="_n"))
        .take_all()
    )
    if len(types) > 63:  # int64 mask holds 63 type bits; beyond that the
        # shift overflows silently — fail loud (chunked mask words would
        # be the extension path for a wider vocabulary).
        raise ValueError(
            f"type_cooccurrence_users: {len(types)} distinct event types "
            "exceed the 63-bit int64 mask; chunk the vocabulary"
        )
    t_ref = ray.put(types)

    def to_bit(t: pa.Table) -> pa.Table:
        tl = ray.get(t_ref)
        keys = pa.array(tl, pa.string())
        pos = pc.index_in(t["event_type"], value_set=keys).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "user_id": t["user_id"],
                "bit": pa.array(
                    (np.int64(1) << pos.astype(np.int64)), pa.int64()
                ),
            }
        )

    masks = (
        ds.map_batches(
            lambda t: t.group_by(["user_id", "event_type"]).aggregate([]),
            batch_format="pyarrow",
        )
        .groupby(["user_id", "event_type"])
        .aggregate(Count(alias_name="_n"))
        .map_batches(to_bit, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("bit", alias_name="mask"))
    )

    def pair_partial(t: pa.Table) -> pa.Table:
        tl = ray.get(t_ref)
        m = t["mask"].to_numpy(zero_copy_only=False)
        ia, ib, cnt = [], [], []
        for i in range(len(tl)):
            for j in range(i + 1, len(tl)):
                both = (np.int64(1) << i) | (np.int64(1) << j)
                ia.append(i)
                ib.append(j)
                cnt.append(int(((m & both) == both).sum()))
        return pa.table(
            {
                "ia": pa.array(ia, pa.int64()),
                "ib": pa.array(ib, pa.int64()),
                "pn": pa.array(cnt, pa.int64()),
            }
        )

    agg = (
        masks.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["ia", "ib"])
        .aggregate(Sum("pn", alias_name="n_users"))
    )

    def to_names(t: pa.Table) -> pa.Table:
        tl = ray.get(t_ref)
        names = pa.array(tl, pa.string())
        out = pa.table(
            {
                "type_a": names.take(t["ia"]),
                "type_b": names.take(t["ib"]),
                "n_users": t["n_users"],
            }
        )
        return out.filter(pc.greater(out["n_users"], pa.scalar(0, pa.int64())))

    return agg.map_batches(to_names, batch_format="pyarrow")


def quantiles_cont_events(sf_dir: str):
    """Interpolated exact quantiles (quantile_cont semantics) of the
    events value column — the continuous twin of quantiles_events,
    same one-sort + metadata-split shape (stages/quantiles)."""
    from ..stages.quantiles import exact_quantiles_cont

    ds = _read_parquet(_p(sf_dir, "events"), columns=["value"])
    return exact_quantiles_cont(ds, "value", [0.25, 0.5, 0.875])


def cumulative_new_users_daily(sf_dir: str):
    """User growth curve: per day, the number of FIRST-SEEN users and
    the running cumulative total — the acquisition metric every
    event-stream deployment tracks.  Distributed part: groupby(user)
    min(ts) (partial-pre-agg); the per-day rollup + running sum happen
    on the day-cardinality result (tiny by construction)."""
    ds = _read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "user_id": t["user_id"],
                    "day": pc.cast(
                        pc.divide(
                            pc.cast(t["ts"], pa.int64()),
                            pa.scalar(86_400_000_000, pa.int64()),
                        ),
                        pa.int64(),
                    ),
                }
            )
            .group_by("user_id")
            .aggregate([("day", "min")])
            .rename_columns(["user_id", "pday"])
        )

    from ray.data.aggregate import Min

    first_day = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("pday", alias_name="day"))
    )
    per_day: dict[int, int] = {}
    for r in first_day.map_batches(
        lambda t: t.select(["day"])
        .group_by("day")
        .aggregate([("day", "count")])
        .rename_columns(["day", "pn"]),
        batch_format="pyarrow",
    ).take_all():
        per_day[r["day"]] = per_day.get(r["day"], 0) + r["pn"]
    days = sorted(per_day)
    new = np.array([per_day[d] for d in days], np.int64)
    return pa.table(
        {
            "day": pa.array(days, pa.int64()),
            "new_users": pa.array(new, pa.int64()),
            "cum_users": pa.array(np.cumsum(new), pa.int64()),
        }
    )


def dq_violations_orders(sf_dir: str):
    """Data-quality rule scan over orders in ONE streaming pass: every
    rule is a vectorized Arrow-kernel mask, per-batch violation counts
    are partial sums, and only (rule, count) rows reach the reduce —
    the constraint-audit complement of the ingest-time DLQ
    (stages/validate.py quarantines; this measures).  Rules: null key,
    non-positive price, unknown status vocabulary, order date outside
    [1992, 2026)."""
    ds = _read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_totalprice", "o_orderstatus", "o_orderdate"],
    )
    statuses = pa.array(["O", "F", "P"], pa.string())
    lo = pa.scalar(694_224_000_000_000, pa.int64())  # 1992-01-01 in us
    hi = pa.scalar(1_767_225_600_000_000, pa.int64())  # 2026-01-01 in us

    def partial(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["o_orderdate"], pa.int64())
        rules = {
            "null_orderkey": pc.is_null(t["o_orderkey"]),
            "nonpositive_price": pc.fill_null(
                pc.less_equal(t["o_totalprice"], pa.scalar(0.0)), True
            ),
            "unknown_status": pc.invert(
                pc.fill_null(pc.is_in(t["o_orderstatus"], value_set=statuses), False)
            ),
            "date_out_of_range": pc.fill_null(
                pc.or_(pc.less(ts, lo), pc.greater_equal(ts, hi)), True
            ),
        }
        names, counts = [], []
        for rule, mask in rules.items():
            names.append(rule)
            counts.append(pc.sum(pc.cast(mask, pa.int64())).as_py() or 0)
        return pa.table(
            {
                "rule": pa.array(names, pa.string()),
                "pn": pa.array(counts, pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("rule")
        .aggregate(Sum("pn", alias_name="n_violations"))
    )


def brand_revenue_topk(sf_dir: str):
    """Revenue cents per part brand, top-10 (TPC-H Q14/Q17 flavor):
    the part dimension is SMALL-side, so it broadcasts once via
    ``ray.put`` (partkey -> brand array lookup) instead of shuffling
    lineitem — the canonical star-schema fact-to-dim pattern.  Tie-break
    on brand makes the limit boundary total."""
    import pyarrow.parquet as pq_

    part = pq_.read_table(_p(sf_dir, "part"), columns=["p_partkey", "p_brand"])
    pk = part["p_partkey"].to_numpy(zero_copy_only=False)
    order = np.argsort(pk)
    dim_ref = ray.put(
        (pk[order], part["p_brand"].take(pa.array(order, pa.int64())))
    )

    li = _read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        keys, brands = ray.get(dim_ref)
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        pos = np.searchsorted(keys, t["l_partkey"].to_numpy(zero_copy_only=False))
        return (
            pa.table(
                {
                    "p_brand": brands.take(pa.array(pos, pa.int64())),
                    "rev": _cents(rev),
                }
            )
            .group_by("p_brand")
            .aggregate([("rev", "sum")])
            .rename_columns(["p_brand", "prev"])
        )

    agg = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(Sum("prev", alias_name="revenue_cents"))
    )
    rows = sorted(
        ((r["p_brand"], int(r["revenue_cents"])) for r in agg.take_all()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    return pa.table(
        {
            "p_brand": pa.array([r[0] for r in rows], pa.string()),
            "revenue_cents": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


def supplier_nation_volume(sf_dir: str):
    """Revenue cents per SUPPLIER nation (TPC-H Q5 flavor): two chained
    small-side broadcasts (suppkey -> nationkey -> nation name) folded
    into one composed lookup shipped once — the fact table streams
    through a single vectorized map + tiny groupby, no join shuffle."""
    import pyarrow.parquet as pq_

    sup = pq_.read_table(_p(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    nat = pq_.read_table(_p(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    nk = nat["n_nationkey"].to_numpy(zero_copy_only=False)
    nm = nat["n_name"].to_pylist()
    name_of = dict(zip(nk.tolist(), nm))
    sk = sup["s_suppkey"].to_numpy(zero_copy_only=False)
    order = np.argsort(sk)
    snames = pa.array(
        [name_of[int(k)] for k in sup["s_nationkey"].to_numpy(zero_copy_only=False)[order]],
        pa.string(),
    )
    dim_ref = ray.put((sk[order], snames))

    li = _read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        keys, names = ray.get(dim_ref)
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        pos = np.searchsorted(keys, t["l_suppkey"].to_numpy(zero_copy_only=False))
        return (
            pa.table(
                {
                    "n_name": names.take(pa.array(pos, pa.int64())),
                    "rev": _cents(rev),
                }
            )
            .group_by("n_name")
            .aggregate([("rev", "sum"), ("rev", "count")])
            .rename_columns(["n_name", "prev", "pn"])
        )

    return (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(
            Sum("prev", alias_name="revenue_cents"),
            Sum("pn", alias_name="n_lineitems"),
        )
    )


def orders_priority_share(sf_dir: str):
    """Ratio-to-report: each order priority's share of total revenue
    (window SUM OVER () semantics).  Integer cents until one IEEE
    divide of identical operands — hash-safe.  The share computation
    runs on the |priorities|-row aggregate, never on fact rows."""
    ds = _read_parquet(
        _p(sf_dir, "orders"), columns=["o_orderpriority", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "o_orderpriority": t["o_orderpriority"],
                    "rev": _cents(t["o_totalprice"]),
                }
            )
            .group_by("o_orderpriority")
            .aggregate([("rev", "sum")])
            .rename_columns(["o_orderpriority", "prev"])
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("prev", alias_name="revenue_cents"))
    )
    t = pa.Table.from_pylist(agg.take_all())
    rev = t["revenue_cents"].to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(rev.sum())
    return pa.table(
        {
            "o_orderpriority": t["o_orderpriority"],
            "revenue_cents": pa.array(rev, pa.int64()),
            "share": pa.array(rev.astype(np.float64) / float(total), pa.float64()),
        }
    )


def lake_recent_hosts(sf_dir: str):
    """Flagship chain #2 — the freshness-serving shape: CDC replay ->
    Z-ORDER clustering rewrite on warc_ts (maintenance) -> predicate-
    pushdown read of only the recent half (row groups outside the band
    prune via the clustered stats) -> vectorized host rollup (pages per
    host + latest crawl ts in band).  The cutoff is the exact p50 of
    live event times (engine quantile == SQL quantile_disc at q=0.5),
    so the whole chain is oracle-checkable; equality also proves the
    z-order rewrite preserved table state under a predicate read.  The
    predicate rides the ``filters=`` tuple path, so it prunes at the
    manifest layer (writer-recorded stats, state/partstats.py) before
    the row-group pushdown the z-order clustering makes selective."""
    from ..stages.quantiles import exact_quantiles
    from ..stages.urlops import add_url_parts
    from .maintenance import zorder_rewrite
    from .replay import bootstrap_lake, read_table, replay

    n_urls, n_events = _CDC_SIZES.get(os.path.basename(sf_dir.rstrip("/")), (300, 1500))
    root = _cdc_fixture(n_urls, n_events)
    data_dir = os.path.join(root, "data")
    lake_root = os.path.join(root, "lake", f"zr{os.getpid()}", "pages")
    bootstrap_lake(lake_root, os.path.join(data_dir, "base", "pages.parquet"), num_partitions=16)
    replay(lake_root, os.path.join(data_dir, "wal"))
    zorder_rewrite(lake_root, ["warc_ts"], row_group_size=1 << 12)

    cut = exact_quantiles(
        read_table(lake_root, columns=["warc_ts"]), "warc_ts", [0.5]
    )["value"][0].as_py()

    recent = read_table(
        lake_root,
        columns=["url", "warc_ts"],
        filters=[("warc_ts", ">=", cut)],
    )

    def rollup(t: pa.Table) -> pa.Table:
        host = add_url_parts(t)["host"]
        return (
            pa.table(
                {
                    "host": host,
                    "ts": pc.cast(t["warc_ts"], pa.int64()),
                }
            )
            .group_by("host")
            .aggregate([("ts", "count"), ("ts", "max")])
            .rename_columns(["host", "pn", "pmax"])
        )

    from ray.data.aggregate import Max

    return (
        recent.map_batches(rollup, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Sum("pn", alias_name="n_pages"),
            Max("pmax", alias_name="latest_ts_us"),
        )
    )


def charlm_score_docs(sf_dir: str):
    """Train-then-score quality model (the CCNet/KenLM perplexity-filter
    shape reduced to its distributable core): pass 1 aggregates the
    corpus 256x256 byte-bigram counts as bincount partials (the model is
    512 KB — one tiny all-reduce); pass 2 is an actor-pool inference
    stage holding the broadcast Laplace-smoothed log-prob table, scoring
    each doc as one vectorized reduceat.  Scores in floor-micro-nats;
    the oracle recomputes the same smoothed bigram model in SQL."""
    from ..stages.text import CharLMScorer, charlm_counts, charlm_logp

    ds = _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    counts = charlm_counts(ds)
    logp_ref = ray.put(charlm_logp(counts))
    scored = ds.map_batches(
        CharLMScorer,
        fn_constructor_args=(logp_ref,),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    return scored.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_pairs"], pa.scalar(1, pa.int64()))),
        batch_format="pyarrow",
    )


def pca_project_embeddings(sf_dir: str):
    """Distributed PCA over the embedding corpus: moment partials
    (n, sum, X^T X — 33 KB/batch at d=64) reduce to a driver-side d x d
    eigendecomposition, the sign-normalized top-2 basis broadcasts back,
    and every vector projects with one centered matmul per batch.
    Rows-only registration (an eigenbasis is not SQL-expressible);
    fit/projection laws are pinned by a same-arithmetic differential
    pytest (tests/test_pca.py)."""
    from ..stages.similarity import pca_fit, pca_project

    ds = _read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    mean, w, _ = pca_fit(ds, "embedding", k=2)
    return pca_project(ds, mean, w)


def host_index_read(sf_dir: str):
    """Secondary-index serving path, driver-checked: replay the CDC
    lake, build the (host, pid, n) index (pipelines/hostindex.py), then
    serve the two lexicographically-smallest live hosts by reading ONLY
    the partitions the index names.  Oracle: LWW winners filtered to
    the same rule-selected hosts — equality proves both the index
    contents and the pruned read."""
    from .hostindex import build_host_index, read_hosts, read_index
    from .replay import bootstrap_lake, replay

    n_urls, n_events = _CDC_SIZES.get(os.path.basename(sf_dir.rstrip("/")), (300, 1500))
    root = _cdc_fixture(n_urls, n_events)
    data_dir = os.path.join(root, "data")
    lake_root = os.path.join(root, "lake", f"hidx{os.getpid()}", "pages")
    bootstrap_lake(lake_root, os.path.join(data_dir, "base", "pages.parquet"), num_partitions=16)
    replay(lake_root, os.path.join(data_dir, "wal"))
    idx_root = os.path.join(root, "lake", f"hidx{os.getpid()}", "host_index")
    build_host_index(idx_root, lake_root)

    hosts = sorted(set(read_index(idx_root).column("host").to_pylist()))[:2]
    rows, _pids = read_hosts(
        lake_root, idx_root, hosts, columns=["url", "warc_ts", "lang"]
    )
    return rows


def percent_rank_events_by_type(sf_dir: str):
    """SQL percent_rank() per event type: (rn - 1) / (n - 1) over the
    (value cents, event_id) total order — reuses the bucketed ordered
    row numbers (ONE shuffle) plus broadcast group sizes; the divide is
    IEEE-identical given identical integer operands."""
    from ..stages.analytic import partitioned_analytics

    ds = _read_parquet(
        _p(sf_dir, "events"), columns=["event_type", "event_id", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "event_id": t["event_id"],
                "value_c": _cents(t["value"]),
            }
        )

    narrow = ds.map_batches(prep, batch_format="pyarrow")
    sizes: dict[str, int] = {}
    for r in narrow.map_batches(
        lambda t: t.select(["event_type"])
        .group_by("event_type")
        .aggregate([("event_type", "count")])
        .rename_columns(["event_type", "pn"]),
        batch_format="pyarrow",
    ).take_all():
        sizes[r["event_type"]] = sizes.get(r["event_type"], 0) + r["pn"]
    size_ref = ray.put(sizes)

    ranked = partitioned_analytics(
        narrow, key="event_type", order_by=["value_c", "event_id"]
    )

    def pr(t: pa.Table) -> pa.Table:
        sz = ray.get(size_ref)
        keys = pa.array(list(sz), pa.string())
        ns = np.fromiter(sz.values(), np.int64, len(sz))
        pos = pc.index_in(t["event_type"], value_set=keys).to_numpy(
            zero_copy_only=False
        )
        n = ns[pos]
        rn = t["rn"].to_numpy(zero_copy_only=False)
        out = (rn - 1).astype(np.float64) / np.maximum(n - 1, 1).astype(np.float64)
        return pa.table(
            {
                "event_type": t["event_type"],
                "event_id": t["event_id"],
                "pct_rank": pa.array(out, pa.float64()),
            }
        )

    return ranked.map_batches(pr, batch_format="pyarrow")


def top_unshipped_orders(sf_dir: str):
    """TPC-H Q3 flavor: top-10 orders by pending revenue for one market
    segment — a selective dim filter (customer segment, broadcast), a
    fact-side date filter pushed to the scan, the native hash join, and
    a grouped sum + deterministic top-k.  The integration query for the
    join + filter + topk path."""
    import pyarrow.parquet as pq_

    cust = pq_.read_table(
        _p(sf_dir, "customer"),
        columns=["c_custkey", "c_mktsegment"],
        filters=[("c_mktsegment", "=", "BUILDING")],
    )
    ck = np.sort(cust["c_custkey"].to_numpy(zero_copy_only=False))
    ck_ref = ray.put(ck)

    cutoff = pa.scalar(883_612_800_000_000, pa.int64())  # 1998-01-01 in us

    orders = _read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    def o_prep(t: pa.Table) -> pa.Table:
        keys = ray.get(ck_ref)
        ts = pc.cast(t["o_orderdate"], pa.int64())
        t = t.filter(pc.less(ts, cutoff))
        ok = t["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, ok)
        pos = np.clip(pos, 0, max(len(keys) - 1, 0))
        hit = keys[pos] == ok if len(keys) else np.zeros(len(ok), bool)
        t = t.filter(pa.array(hit))
        return t.select(["o_orderkey", "o_orderdate"])

    o = orders.map_batches(o_prep, batch_format="pyarrow")

    li = _read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def li_prep(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["l_shipdate"], pa.int64())
        t = t.filter(pc.greater_equal(ts, cutoff))
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table(
            {"l_orderkey": t["l_orderkey"], "rev": _cents(rev)}
        )

    l = li.map_batches(li_prep, batch_format="pyarrow")
    joined = o.join(
        l, "inner", num_partitions=16, on=("o_orderkey",), right_on=("l_orderkey",)
    )
    agg = joined.groupby("o_orderkey").aggregate(
        Sum("rev", alias_name="revenue_cents")
    )
    rows = sorted(
        (
            (int(r["o_orderkey"]), int(r["revenue_cents"]))
            for r in agg.take_all()
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    return pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "revenue_cents": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


def pmi_bigrams_docs(sf_dir: str):
    """Collocation mining: pointwise mutual information for every
    corpus bigram above a count gate — the association statistic behind
    phrase detection.  Fully distributed: the MINC gate applies INSIDE
    the bigram-count dataset (filter after the groupby), unigram counts
    for the two slots resolve via two hash-partitioned ``Dataset.join``s
    against the vocab-bounded unigram table (the ``tfidf_docs`` shape),
    and PMI evaluates per batch with the SQL's exact float op sequence
    (identical divisions, ln, subtraction order -> bit-identical),
    emitted as floor micro-nats.  Only the two scalar totals (N, B)
    touch the driver; the count tables stay sharded in the object store
    (``materialize()`` on the DISTINCT-key tables, not the corpus), so
    the pipeline survives a billions-of-bigrams vocabulary."""
    from ..stages.text import BigramCounter

    ds = _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    big = (
        ds.map_batches(BigramCounter, batch_format="pyarrow", concurrency=(1, 8))
        .map_batches(
            lambda t: t.select(["bigram", "n"]), batch_format="pyarrow"
        )
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="c12"))
        .materialize()  # distinct bigrams, sharded — reused by sum + gate
    )

    def uni_partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(
                t["text"].combine_chunks(), pattern="[ \t\n\r\f\v]+"
            )
        )
        toks = toks.filter(pc.not_equal(toks, pa.scalar("", pa.string())))
        return (
            pa.table({"tok": toks})
            .group_by("tok")
            .aggregate([("tok", "count")])
            .rename_columns(["tok", "pn"])
        )

    uni = (
        ds.map_batches(uni_partial, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("pn", alias_name="c"))
        .materialize()  # vocab-bounded — reused by sum + two join probes
    )

    # Global totals: scalar aggregates over the materialized count
    # tables — two numbers cross to the driver, nothing else does.
    N = float(uni.sum("c"))
    B = float(big.sum("c12"))
    MINC = 20

    def gate_and_split(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["c12"], pa.scalar(MINC, pa.int64())))
        parts = pc.split_pattern(t["bigram"], " ", max_splits=1)
        return pa.table(
            {
                "bigram": t["bigram"],
                "c12": t["c12"],
                "t1": pc.list_element(parts, 0),
                "t2": pc.list_element(parts, 1),
            }
        )

    gated = big.map_batches(gate_and_split, batch_format="pyarrow")
    j1 = gated.join(
        uni, "inner", num_partitions=8, on=("t1",), right_on=("tok",)
    )
    j1 = j1.map_batches(
        lambda t: pa.table(
            {
                "bigram": t["bigram"],
                "c12": t["c12"],
                "t2": t["t2"],
                "c1": t["c"],
            }
        ),
        batch_format="pyarrow",
    )
    j2 = j1.join(
        uni, "inner", num_partitions=8, on=("t2",), right_on=("tok",)
    )

    def finish(t: pa.Table) -> pa.Table:
        c12 = t["c12"].to_numpy(zero_copy_only=False).astype(np.float64)
        c1 = t["c1"].to_numpy(zero_copy_only=False).astype(np.float64)
        c2 = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        # EXACT SQL op sequence: ln(c12/B) - ln(c1/N) - ln(c2/N)
        pmi = np.log(c12 / B) - np.log(c1 / N) - np.log(c2 / N)
        return pa.table(
            {
                "bigram": t["bigram"],
                "c12": t["c12"],
                "pmi_unats": pa.array(
                    np.floor(pmi * 1e6).astype(np.int64), pa.int64()
                ),
            }
        )

    return j2.map_batches(finish, batch_format="pyarrow")


def dow_hour_heatmap_events(sf_dir: str):
    """Activity heatmap cells: event counts per (day-of-week, hour) —
    the 2-D binned profile behind load dashboards.  One partial-pre-agg
    groupby over 7x24 bounded cells; dow matches SQL dayofweek
    (Sunday=0) via the (epoch_days + 4) % 7 identity."""
    ds = _read_parquet(_p(sf_dir, "events"), columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        days = us // 86_400_000_000
        dow = (days + 4) % 7  # 1970-01-01 was a Thursday
        hour = (us // 3_600_000_000) % 24
        cell = dow * 24 + hour
        cnt = np.bincount(cell.astype(np.int64), minlength=168)
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {
                "cell": pa.array(nz.astype(np.int64), pa.int64()),
                "pn": pa.array(cnt[nz], pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("pn", alias_name="n"))
    )

    def expand(t: pa.Table) -> pa.Table:
        cell = t["cell"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "dow": pa.array(cell // 24, pa.int64()),
                "hour": pa.array(cell % 24, pa.int64()),
                "n": t["n"],
            }
        )

    return agg.map_batches(expand, batch_format="pyarrow")


def wal_update_depth(sf_dir: str):
    """CDC churn profile: how many keys receive exactly d change events
    across the WAL — the update-depth histogram that sizes merge fanout
    and delta-chain policies.  Reads the raw segments as a Dataset,
    counts per-url events with partial pre-agg, then histograms the
    counts (two bounded groupbys; urls never leave their buckets as
    anything wider than (url, n))."""
    from .replay import list_segments

    n_urls, n_events = _CDC_SIZES.get(os.path.basename(sf_dir.rstrip("/")), (300, 1500))
    root = _cdc_fixture(n_urls, n_events)
    segs = list_segments(os.path.join(root, "data", "wal"))
    ds = _read_parquet(segs, columns=["url"])

    per_url = (
        ds.map_batches(
            lambda t: t.group_by("url")
            .aggregate([("url", "count")])
            .rename_columns(["url", "pn"]),
            batch_format="pyarrow",
        )
        .groupby("url")
        .aggregate(Sum("pn", alias_name="n"))
    )

    def depth_partial(t: pa.Table) -> pa.Table:
        return (
            t.select(["n"])
            .group_by("n")
            .aggregate([("n", "count")])
            .rename_columns(["depth", "pk"])
        )

    return (
        per_url.map_batches(depth_partial, batch_format="pyarrow")
        .groupby("depth")
        .aggregate(Sum("pk", alias_name="n_keys"))
    )


# ---------------------------------------------------------------------------
# round-5 additions: paragraph-level dedup, Gopher quality gate, BM25
# ---------------------------------------------------------------------------


def paragraph_dedup_docs(sf_dir: str):
    """C4-style paragraph-level exact dedup + document reassembly: each
    distinct 16-word paragraph survives only at its FIRST corpus
    occurrence in (doc_id, para_idx) order (stages/dedup.paragraph_dedup
    — one bounded digest-bucket shuffle, winners decided locally), then
    surviving paragraphs rejoin into per-document clean text
    (analytic.grouped_concat ORDER BY para_idx).  Docs whose every
    paragraph was seen earlier disappear — the C4 semantics.  Oracle:
    row_number() OVER (PARTITION BY para ORDER BY doc_id, para_idx)=1
    + ordered string_agg."""
    from ..stages.analytic import grouped_concat
    from ..stages.dedup import paragraph_dedup

    ds = _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    kept = paragraph_dedup(ds, words_per_para=16)
    return grouped_concat(
        kept,
        key="doc_id",
        order_by=["para_idx"],
        value_col="para",
        sep=" ",
        out_col="clean_text",
    )


def gopher_quality_docs(sf_dir: str):
    """Gopher-rule quality gate (stages/text.GopherQuality): integer
    word/length/stopword signals plus the keep decision with the mean-
    word-length band as an integer cross-multiply (3*n <= sum_len <=
    10*n) — no float rounding anywhere, so the whole gate is SQL-hash-
    checkable."""
    from ..stages.text import GopherQuality

    ds = _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(
        GopherQuality, batch_format="pyarrow", concurrency=(1, 8)
    )


def bm25_docs(sf_dir: str):
    """BM25 (k1=1.2, b=0.75, Lucene idf = ln(1 + (N-df+0.5)/(df+0.5)))
    per (doc, token) over the whole corpus — the retrieval-scoring
    extension of tfidf_docs.  Same two-pass streaming shape: the tf pass
    also derives per-doc length dl batch-locally (documents arrive whole,
    so dl = run-sum of tf — no extra shuffle); df aggregates the posting
    stream; corpus scalars N and sumdl are the only driver values.  The
    score is emitted as floor(1e6 * bm25) int64 with every float step
    identically ordered in the SQL oracle (idf via libm ln on both
    engines; all other steps are single correctly-rounded IEEE ops)."""
    from ..stages.text import PostingLister, TermCounter

    docs_path = _p(sf_dir, "documents")

    tc = TermCounter()

    def tf_dl(t: pa.Table) -> pa.Table:
        out = tc(t)
        did = out.column("doc_id").to_numpy(zero_copy_only=False)
        tf = out.column("tf").to_numpy(zero_copy_only=False)
        # doc runs are contiguous in TermCounter output (lexsort by
        # (doc, token)); dl = per-run tf sum scattered back to rows
        starts = np.flatnonzero(np.concatenate(([True], did[1:] != did[:-1])))
        sums = np.add.reduceat(tf, starts) if len(tf) else np.array([], np.int64)
        dl = np.repeat(sums, np.diff(np.append(starts, len(tf))))
        return out.append_column("dl", pa.array(dl.astype(np.int64)))

    tf = _read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
        tf_dl, batch_format="pyarrow"
    )
    df = (
        _read_parquet(docs_path, columns=["doc_id", "text"])
        .map_batches(PostingLister, batch_format="pyarrow", concurrency=(1, 8))
        .groupby("token")
        .aggregate(Count(alias_name="df"))
    )
    # corpus scalars: N from parquet row-count metadata, sumdl from one
    # narrow streaming aggregate (total whitespace tokens)
    n_docs = _read_parquet(docs_path, columns=["doc_id"]).count()
    from ..stages.text import TokenCounter

    sumdl = int(
        _read_parquet(docs_path, columns=["doc_id", "text"])
        .map_batches(TokenCounter, batch_format="pyarrow", concurrency=(1, 8))
        .map_batches(lambda t: t.select(["n_tokens"]), batch_format="pyarrow")
        .sum("n_tokens")
    )

    import ray as _ray

    ncpu = int(_ray.cluster_resources().get("CPU", 8))
    joined = tf.join(
        df, "inner", num_partitions=max(2, min(64, ncpu // 2)),
        on=("token",), right_on=("token",), right_suffix="_r",
    )

    import math

    def score(t: pa.Table) -> pa.Table:
        tfv = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        dlv = t["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        # idf via libm (math.log) on the few distinct df values — numpy's
        # SIMD log is NOT ulp-identical to DuckDB's libm ln
        uniq = np.unique(dfv)
        idf_u = np.array(
            [
                math.log(1.0 + (float(n_docs - d) + 0.5) / (float(d) + 0.5))
                for d in uniq
            ],
            np.float64,
        )
        idf = idf_u[np.searchsorted(uniq, dfv)]
        den = tfv + 1.2 * (0.25 + 0.75 * ((dlv * n_docs).astype(np.float64) / float(sumdl)))
        s = (idf * (tfv * 2.2)) / den
        fp = np.floor(1_000_000.0 * s).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "token": t["token"],
                "tf": t["tf"],
                "df": t["df"],
                "dl": t["dl"],
                "bm25_fp": pa.array(fp),
            }
        )

    return joined.map_batches(score, batch_format="pyarrow")


def lake_clean_corpus(sf_dir: str):
    """Flagship #3 — full training-data chain over the CDC lake: replay
    the fixture WAL into a pages lake, stream the live pages, split each
    page into REAL newline paragraphs (stages/dedup.LineSplitter —
    para_idx counts lines INCLUDING empties, then empties drop, matching
    SQL unnest-with-ordinality), C4-style first-occurrence paragraph
    dedup across the whole lake (generic string-key path: boilerplate
    headers/footers shared between pages survive only at their first
    (url, para_idx) occurrence), reassemble per-url clean text, then a
    Gopher-style integer-exact quality gate (min 40 words, mean word
    length in [3,10] by cross-multiply) on the CLEANED text.  One
    digest-bucket shuffle + one concat-bucket shuffle; signals are
    bincount-vectorized.  Reference analogue: the dedup + validity gates
    of the mapper chain (`src/pipeline/core/client_clickhouse.py:181`,
    `src/pipeline/etl/avax/*_etl.py`) composed into one pipeline."""
    from ..stages.analytic import grouped_concat
    from ..stages.dedup import LineSplitter, paragraph_dedup
    from ..stages.text import GopherQuality
    from .replay import bootstrap_lake, read_table, replay

    n_urls, n_events = _CDC_SIZES.get(os.path.basename(sf_dir.rstrip("/")), (300, 1500))
    root = _cdc_fixture(n_urls, n_events)
    data_dir = os.path.join(root, "data")
    lake_root = os.path.join(root, "lake", f"clean{os.getpid()}", "pages")
    bootstrap_lake(lake_root, os.path.join(data_dir, "base", "pages.parquet"), num_partitions=16)
    replay(lake_root, os.path.join(data_dir, "wal"))

    kept = paragraph_dedup(
        read_table(lake_root, columns=["url", "text"]),
        splitter=LineSplitter(id_col="url"),
    )
    clean = grouped_concat(
        kept,
        key="doc_id",
        order_by=["para_idx"],
        value_col="para",
        sep="\n",
        out_col="clean_text",
    )

    gq = GopherQuality(text_col="clean_text", id_col="doc_id", min_words=40, min_stop=0)

    def gate(t: pa.Table) -> pa.Table:
        sig = gq(t)  # row-aligned with the input batch
        return pa.table(
            {
                "url": t["doc_id"],
                "clean_text": t["clean_text"],
                "n_words": sig["n_words"],
                "sum_word_len": sig["sum_word_len"],
                "keep": sig["keep"],
            }
        )

    return clean.map_batches(gate, batch_format="pyarrow")


def encode_docs(sf_dir: str):
    """Token-id encoding — the corpus-encode step between vocabulary
    building and sequence packing in a training-data pipeline: build the
    count-gated vocabulary (count >= 5), assign dense ids by frequency
    rank (ties broken by token text; ids start at 1), then re-stream the
    corpus mapping every token position to its id, OOV -> 0.  Output one
    (doc_id, pos, token_id) row per token occurrence.

    Scale shape: the vocab aggregate is gated INSIDE the distributed
    groupby (count >= MINC bounds it to the head of the Zipf curve —
    the same bounded-broadcast contract as decontaminate_docs, with the
    same documented fallback: an ungated or giant vocabulary would
    switch to a hash-partitioned join on token).  The gated vocab
    broadcasts once via ray.put; per batch the encode is one
    `pc.index_in` hash-probe kernel over the flattened token stream —
    no Python loop, no second shuffle.  Reference analogue: the
    surrogate-id mapping stages (`src/pipeline/etl/avax/*_etl.py`
    M7-style id assignment) applied at token granularity."""
    from ..stages.text import flatten_tokens

    MINC = 5
    docs_path = _p(sf_dir, "documents")

    def tok_rows(t: pa.Table) -> pa.Table:
        flat, par, pos = flatten_tokens(t["text"])
        return pa.table(
            {
                "doc_id": t["doc_id"].take(pa.array(par)),
                "pos": pa.array(pos),
                "token": flat,
            }
        )

    counts = (
        _read_parquet(docs_path, columns=["doc_id", "text"])
        .map_batches(tok_rows, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Count(alias_name="c"))
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t["c"], MINC)),
            batch_format="pyarrow",
        )
    )
    vocab_parts = [t for t in ray.get(counts.to_arrow_refs()) if t.num_rows]
    vocab = (
        pa.concat_tables(vocab_parts, promote_options="default")
        if vocab_parts
        else pa.table({"token": pa.array([], pa.string()), "c": pa.array([], pa.int64())})
    )
    # deterministic dense ids: frequency desc, token asc, starting at 1
    vocab = vocab.sort_by([("c", "descending"), ("token", "ascending")])
    tokens = vocab["token"].combine_chunks()
    ids = np.arange(1, len(tokens) + 1, dtype=np.int64)
    vocab_ref = ray.put((tokens, ids))

    def encode(t: pa.Table) -> pa.Table:
        toks, tids = ray.get(vocab_ref)
        rows = tok_rows(t)
        idx = pc.index_in(rows["token"], value_set=toks)
        idx_np = idx.to_numpy(zero_copy_only=False)
        tid = np.zeros(len(rows), dtype=np.int64)
        hit = idx.is_valid().to_numpy(zero_copy_only=False)
        tid[hit] = tids[idx_np[hit].astype(np.int64)]
        return pa.table(
            {
                "doc_id": rows["doc_id"],
                "pos": rows["pos"],
                "token_id": pa.array(tid),
            }
        )

    return _read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
        encode, batch_format="pyarrow"
    )


def normalize_text_docs(sf_dir: str):
    """Unicode text normalization — the first mapper of every web-text
    pipeline: NFC-normalize(lower(text)), strip leading/trailing ASCII
    whitespace, collapse internal whitespace runs to single spaces.
    Entirely Arrow kernels (utf8_lower / utf8_normalize /
    replace_substring_regex — RE2, same engine family as DuckDB's
    regexp_replace), zero Python per row.  Reference analogue: the
    per-record string-cleaning mappers in the ETL chains
    (`src/pipeline/etl/avax/*_etl.py` projection steps)."""

    def norm(t: pa.Table) -> pa.Table:
        s = t.column("text").combine_chunks()
        s = pc.utf8_normalize(pc.utf8_lower(s), form="NFC")
        s = pc.replace_substring_regex(
            s, pattern=r"^[ \t\n\r\f\v]+|[ \t\n\r\f\v]+$", replacement=""
        )
        s = pc.replace_substring_regex(
            s, pattern=r"[ \t\n\r\f\v]+", replacement=" "
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "norm_text": s,
                "n_chars_norm": pc.cast(pc.utf8_length(s), pa.int64()),
            }
        )

    ds = _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(norm, batch_format="pyarrow")


def neardup_keep_docs(sf_dir: str):
    """Near-dup RETENTION (the RefinedWeb/C4 'keep one representative
    per duplicate cluster' decision, not just pair listing): shingle-
    Jaccard pairs -> distributed connected components -> keep the
    min-doc_id member of each cluster; docs in no cluster survive
    untouched.  The corpus-vs-clusters resolution is a hash-partitioned
    LEFT join (the cluster table is O(duplicated docs) — NOT broadcast,
    at 100 TB it can be a third of the corpus).  Output: (doc_id, keep)
    for every document."""
    from ..stages.blockutil import drop_empty_blocks
    from ..stages.dedup import dup_clusters, shingle_jaccard_pairs

    ds = _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    pairs = shingle_jaccard_pairs(ds, ngram=3, max_df=64, threshold=0.5)
    # (doc_id, cluster_id), one row per clustered doc; narrow — the
    # materialize exists so the trailing sort's schemaless empty blocks
    # can be stripped before this feeds a join side (blockutil note)
    clusters = drop_empty_blocks(dup_clusters(pairs).materialize())
    ids = ds.map_batches(
        lambda t: t.select(["doc_id"]), batch_format="pyarrow"
    )
    joined = ids.join(
        clusters, "left_outer", num_partitions=8,
        on=("doc_id",), right_suffix="_r",
    )

    def decide(t: pa.Table) -> pa.Table:
        did = t.column("doc_id")
        cid = pc.coalesce(t.column("cluster_id"), did)
        return pa.table(
            {
                "doc_id": did,
                "keep": pc.cast(pc.equal(cid, did), pa.int64()),
            }
        )

    return joined.map_batches(decide, batch_format="pyarrow")


def ccnet_bucket_docs(sf_dir: str):
    """CCNet-style perplexity bucketing: score every doc with the
    corpus-trained char-bigram LM (charlm_score_docs machinery), derive
    the per-byte mean log-prob, and split the corpus at its exact
    1/3 / 2/3 quantiles into head / middle / tail buckets (head = most
    probable text).  The scored intermediate is narrow (doc_id + two
    ints) and materialized once so the quantile pass does not re-run
    inference; thresholds are two scalars on the driver (same
    floor(q*(n-1)) rank selection as quantiles_events, so the SQL
    oracle reproduces them exactly).  Bucket comparison is on integer
    floor-mean-micro-nats — cross-engine exact."""
    from ..stages.quantiles import exact_quantiles
    from ..stages.text import CharLMScorer, charlm_counts, charlm_logp

    ds = _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    counts = charlm_counts(ds)
    logp_ref = ray.put(charlm_logp(counts))

    def mean_unats(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["n_pairs"], pa.scalar(1, pa.int64())))
        a = t.column("lm_score_unats").to_numpy(zero_copy_only=False)
        b = t.column("n_pairs").to_numpy(zero_copy_only=False)
        m = np.floor(a.astype(np.float64) / b.astype(np.float64)).astype(np.int64)
        return pa.table(
            {"doc_id": t.column("doc_id"), "mean_unats": pa.array(m)}
        )

    scored = (
        ds.map_batches(
            CharLMScorer,
            fn_constructor_args=(logp_ref,),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .map_batches(mean_unats, batch_format="pyarrow")
        .materialize()  # narrow (doc_id, int64); quantile pass must not re-run inference
    )
    third = 1.0 / 3.0
    qt = exact_quantiles(scored, "mean_unats", [third, 2.0 * third])
    vals = qt.column("value").to_pylist()
    t1, t2 = int(vals[0]), int(vals[1])

    def bucket(t: pa.Table) -> pa.Table:
        m = t.column("mean_unats")
        head = pc.greater_equal(m, pa.scalar(t2, pa.int64()))
        mid = pc.greater_equal(m, pa.scalar(t1, pa.int64()))
        b = pc.if_else(
            head,
            pa.scalar("head", pa.string()),
            pc.if_else(
                mid,
                pa.scalar("middle", pa.string()),
                pa.scalar("tail", pa.string()),
            ),
        )
        return pa.table(
            {"doc_id": t.column("doc_id"), "mean_unats": m, "bucket": b}
        )

    return scored.map_batches(bucket, batch_format="pyarrow")


def dsir_weights_docs(sf_dir: str):
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling" — the hashed-ngram
    variant, unigram features): log-ratio of a TARGET hashed-token
    distribution (lang='en' docs) to the RAW corpus distribution,
    Laplace-smoothed over 4096 md5 buckets, summed per document.

    Distributed shape (the train-then-score two-pass, like charlm):
    pass 1 aggregates per-bucket (raw, target) token counts — nonzero
    buckets only per batch, one tiny groupby, <=4096 rows reach the
    driver BY CONSTRUCTION (the feature space is the bound, not the
    corpus).  The driver derives floor-micro-nat log-ratios per bucket
    (libm ln — the bm25 determinism rule) and broadcasts the 32 KB
    table; pass 2 re-tokenizes and accumulates each doc's weight as an
    INTEGER dot product (order-free exact, so the SQL oracle hash-
    matches).  Output: (doc_id, n_tokens, weight_fp)."""
    import math

    from ..stages.text import flatten_tokens, md5_bucket

    NB = 4096
    docs_path = _p(sf_dir, "documents")

    def bucket_counts(t: pa.Table) -> pa.Table:
        flat, par, _ = flatten_tokens(t.column("text"))
        b = md5_bucket(flat, NB)
        en = np.asarray(
            pc.equal(t.column("lang"), pa.scalar("en", pa.string())).to_numpy(
                zero_copy_only=False
            ),
            bool,
        )[par]
        cr = np.bincount(b, minlength=NB)
        ct = np.bincount(b[en], minlength=NB)
        nz = np.flatnonzero(cr)
        return pa.table(
            {
                "bucket": pa.array(nz.astype(np.int64)),
                "cr": pa.array(cr[nz].astype(np.int64)),
                "ct": pa.array(ct[nz].astype(np.int64)),
            }
        )

    stats = (
        _read_parquet(docs_path, columns=["lang", "text"])
        .map_batches(bucket_counts, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("cr", alias_name="cr"), Sum("ct", alias_name="ct"))
        .take_all()
    )  # <= 4096 rows by construction of the hashed feature space
    bk = np.array([r["bucket"] for r in stats], np.int64)
    cr = np.array([r["cr"] for r in stats], np.int64)
    ct = np.array([r["ct"] for r in stats], np.int64)
    nr, nt = int(cr.sum()), int(ct.sum())
    fp = np.zeros(NB, np.int64)
    for b, c_r, c_t in zip(bk, cr, ct):
        # float sequence mirrored op-for-op in the SQL oracle
        fp[b] = math.floor(
            1_000_000.0
            * math.log(
                ((c_t + 1.0) * (nr + 4096.0)) / ((c_r + 1.0) * (nt + 4096.0))
            )
        )
    fp_ref = ray.put(fp)

    class _Score:
        def __init__(self, ref):
            self.__name__ = "_Score"
            self.fp = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            flat, par, _ = flatten_tokens(t.column("text"))
            b = md5_bucket(flat, NB)
            n = t.num_rows
            ntok = np.bincount(par, minlength=n).astype(np.int64)
            w = np.zeros(n, np.int64)
            np.add.at(w, par, self.fp[b])  # int64 accumulation: exact
            keep = ntok >= 1
            return pa.table(
                {
                    "doc_id": t.column("doc_id").filter(pa.array(keep)),
                    "n_tokens": pa.array(ntok[keep]),
                    "weight_fp": pa.array(w[keep]),
                }
            )

    return _read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
        _Score, fn_constructor_args=(fp_ref,), batch_format="pyarrow",
        concurrency=(1, 8),
    )


def budget_select_docs(sf_dir: str):
    """Quality-ordered BUDGET SELECTION — the final cut every training-
    data pipeline makes: rank the corpus by a quality score (the charlm
    byte-bigram mean, best first) and keep documents while the running
    byte total fits the budget (here: half the scorable corpus bytes).

    Distributed shape: the running total over a GLOBAL order is the
    two-phase prefix scan (`analytic.ordered_cumsum` — range-bucketed
    partials, driver prefix over <=256 bucket sums, one offset-broadcast
    pass; the data never single-threads).  The order key packs
    (-mean_unats, doc_id) into one int64 — contract: mean in (-2^24, 0]
    micro-nats/byte (byte-bigram log-probs are > -16.6 nats by
    construction of Laplace smoothing over 256 symbols) and doc_id <
    2^39, ASSERTED per batch, never silently truncated.  Output one row
    per kept doc: (doc_id, mean_unats, n_bytes, cum_bytes); the oracle
    is SUM() OVER (ORDER BY mean DESC, doc_id) <= budget."""
    from ..stages.analytic import ordered_cumsum
    from ..stages.text import CharLMScorer, charlm_counts, charlm_logp

    MEAN_BITS, ID_BITS = 24, 39
    ds = _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    counts = charlm_counts(ds)
    logp_ref = ray.put(charlm_logp(counts))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["n_pairs"], pa.scalar(1, pa.int64())))
        lm = t.column("lm_score_unats").to_numpy(zero_copy_only=False)
        npair = t.column("n_pairs").to_numpy(zero_copy_only=False)
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        mean = np.floor(lm.astype(np.float64) / npair.astype(np.float64)).astype(np.int64)
        if len(mean):
            if mean.min() <= -(1 << MEAN_BITS) or mean.max() > 0:
                raise ValueError("budget_select_docs: mean_unats out of packed-order contract")
            if did.min() < 0 or did.max() >= (1 << ID_BITS):
                raise ValueError("budget_select_docs: doc_id out of packed-order contract")
        okey = ((-mean) << ID_BITS) | did
        return pa.table(
            {
                "okey": pa.array(okey),
                "doc_id": pa.array(did),
                "mean_unats": pa.array(mean),
                "n_bytes": pa.array((npair + 1).astype(np.int64)),
            }
        )

    scored = (
        ds.map_batches(
            CharLMScorer,
            fn_constructor_args=(logp_ref,),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .map_batches(prep, batch_format="pyarrow")
        # consumed twice (budget scalar + the scan's three passes): pin
        # the narrow 4-int table once so the scorer pool never re-runs
        .materialize()
    )
    # budget: half the scorable corpus bytes (one scalar aggregate)
    budget = int(scored.sum("n_bytes")) // 2
    cum = ordered_cumsum(
        scored, order_col="okey", value_col="n_bytes", out_col="cum_bytes"
    )
    return cum.map_batches(
        lambda t: t.filter(
            pc.less_equal(t["cum_bytes"], pa.scalar(budget, pa.int64()))
        ).select(["doc_id", "mean_unats", "n_bytes", "cum_bytes"]),
        batch_format="pyarrow",
    )


def global_shuffle_docs(sf_dir: str):
    """Deterministic GLOBAL training shuffle with explicit positions and
    round-robin shard assignment — the step that turns a curated corpus
    into a training-ready layout (epoch order must be reproducible
    across reruns and cluster widths, so hash order, not
    random_shuffle).

    Shape: shuffle key = md5 prefix of the salted doc id, packed with
    the id into one int64 order key ((h24 << 39) | doc_id, contract
    ASSERTED per batch); global position = `analytic.ordered_cumsum`
    over a ones column (the two-phase distributed prefix scan — rank
    assignment without a single-threaded pass); shard = (pos-1) % 16.
    Oracle: row_number() OVER (ORDER BY the same two keys)."""
    import hashlib

    from ..stages.analytic import ordered_cumsum

    ID_BITS, N_SHARDS = 39, 16

    def key(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        if len(did) and (did.min() < 0 or did.max() >= (1 << ID_BITS)):
            raise ValueError("global_shuffle_docs: doc_id outside 39-bit pack contract")
        h = np.fromiter(
            (
                int(hashlib.md5(f"shuf:{i}".encode()).hexdigest()[:6], 16)
                for i in did
            ),
            np.int64,
            len(did),
        )
        return pa.table(
            {
                "okey": pa.array((h << ID_BITS) | did),
                "doc_id": pa.array(did),
                "one": pa.array(np.ones(len(did), np.int64)),
            }
        )

    ds = _read_parquet(_p(sf_dir, "documents"), columns=["doc_id"]).map_batches(
        key, batch_format="pyarrow"
    )
    cum = ordered_cumsum(ds, order_col="okey", value_col="one", out_col="pos")

    def out(t: pa.Table) -> pa.Table:
        pos = t.column("pos").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "pos": pa.array(pos),
                "shard_id": pa.array((pos - 1) % N_SHARDS),
            }
        )

    return cum.map_batches(out, batch_format="pyarrow")


def temperature_mix_docs(sf_dir: str):
    """Temperature-based source rebalancing (the multilingual-corpus
    mixing rule, tau=0.7): per-language keep rate (c_min / c_lang)^(1-tau)
    — the smallest language keeps everything, dominant languages are downsampled
    toward the tempered distribution.  Deterministic acceptance by
    32-bit md5 threshold (same predicate family as `sample_docs_hash`,
    so reruns and cluster widths agree).

    Shape: one tiny groupby for per-language counts (bounded by #languages
    BY CONSTRUCTION — for open-domain hosts use the hash-partitioned
    join form of `neardup_keep_docs` instead; documented, not silent),
    thresholds broadcast in the closure, one row-local vectorized
    filter.  Rate floats mirror the oracle op-for-op (libm pow, floor
    to integer threshold)."""
    import hashlib
    import math

    cnt = (
        _read_parquet(_p(sf_dir, "documents"), columns=["lang"])
        .groupby("lang")
        .count()
        .take_all()
    )  # rows == #distinct sources (single digits in this corpus)
    cmin = min(r["count()"] for r in cnt)
    thr = {
        r["lang"]: int(
            math.floor(
                math.pow(float(cmin) / float(r["count()"]), 0.3) * 4294967296.0
            )
        )
        for r in cnt
    }

    def f(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_pylist()
        h = np.fromiter(
            (int(hashlib.md5(f"mix:{i}".encode()).hexdigest()[:8], 16) for i in did),
            np.int64,
            len(did),
        )
        row_thr = np.fromiter(
            (thr[s] for s in t.column("lang").to_pylist()), np.int64, t.num_rows
        )
        return t.filter(pa.array(h < row_thr))

    return _read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "lang"]
    ).map_batches(f, batch_format="pyarrow")


def quality_calibration_docs(sf_dir: str):
    """Calibration table for the charlm quality score: split the corpus
    into 10 exact-decile score bins and report per-bin document count
    and `lang='en'` count — the reliability curve a filtering threshold
    is read off of.  Thresholds come from the distributed exact-quantile
    operator (9 scalars to the driver, same floor(q*(n-1)) rank rule as
    `ccnet_bucket_docs`, so the SQL oracle reproduces them exactly);
    bin = #thresholds <= score (vectorized searchsorted); one tiny
    groupby ends the pipeline."""
    from ..stages.quantiles import exact_quantiles
    from ..stages.text import CharLMScorer, charlm_counts, charlm_logp

    ds = _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text", "lang"])
    counts = charlm_counts(ds)
    logp_ref = ray.put(charlm_logp(counts))

    def mean_unats(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["n_pairs"], pa.scalar(1, pa.int64())))
        a = t.column("lm_score_unats").to_numpy(zero_copy_only=False)
        b = t.column("n_pairs").to_numpy(zero_copy_only=False)
        m = np.floor(a.astype(np.float64) / b.astype(np.float64)).astype(np.int64)
        en = pc.equal(t.column("lang"), pa.scalar("en", pa.string()))
        return pa.table(
            {
                "mean_unats": pa.array(m),
                "is_en": pc.cast(en, pa.int64()),
            }
        )

    scored = (
        ds.map_batches(
            CharLMScorer,
            fn_constructor_args=(logp_ref,),
            fn_constructor_kwargs={"keep_cols": ("lang",)},
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .map_batches(mean_unats, batch_format="pyarrow")
        .materialize()  # narrow 2-int table; quantiles must not re-run inference
    )
    qs = [i / 10.0 for i in range(1, 10)]
    thr = np.array(
        exact_quantiles(scored, "mean_unats", qs).column("value").to_pylist(),
        np.int64,
    )

    def binned(t: pa.Table) -> pa.Table:
        m = t.column("mean_unats").to_numpy(zero_copy_only=False)
        b = np.searchsorted(thr, m, side="right").astype(np.int64)
        return pa.table(
            {
                "bin": pa.array(b),
                "n": pa.array(np.ones(len(m), np.int64)),
                "n_en": t.column("is_en"),
            }
        )

    return (
        scored.map_batches(binned, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n_docs"), Sum("n_en", alias_name="n_en"))
    )


def bpe_merges_docs(sf_dir: str):
    """Distributed BPE tokenizer training over the corpus (stages/bpe.py:
    word-type compression pass, then per-merge broadcast-resegment-
    count-argmax rounds).  Returns the learned 12-merge table (rank,
    left, right, n).  Iterative by nature — no SQL oracle; pinned by a
    plain-python same-rule differential in tests/test_round5_ops.py."""
    from ..stages.bpe import bpe_train

    ds = _read_parquet(_p(sf_dir, "documents"), columns=["text"])
    return bpe_train(ds, n_merges=12)


def bpe_encode_docs(sf_dir: str):
    """Encode the corpus under the trained 12-merge BPE table: per-doc
    piece counts (doc_id, n_pieces) — the round-trip proof that the
    learned merges drive a working encoder (broadcast merge table,
    actor-pool segmentation with per-actor word cache).  Shares the
    trainer's determinism, so it is pinned by the same differential."""
    from ..stages.bpe import bpe_segment_counts, bpe_train

    ds = _read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    merges = bpe_train(
        _read_parquet(_p(sf_dir, "documents"), columns=["text"]), n_merges=12
    )
    return bpe_segment_counts(ds, merges)


def badwords_filter_docs(sf_dir: str):
    """C4-style blocklist filter (Raffel et al. 2020 drop any page
    containing a banned word): remove every document whose whitespace
    tokens intersect the blocklist.  The list is broadcast in-closure
    (bounded by construction — real blocklists are a few thousand
    entries); membership is one vectorized ``pc.is_in`` over the
    flattened token stream, any-per-doc via bincount on the parent
    index.  Row-local, shuffle-free, streaming.  Oracle: NOT EXISTS
    over the same unnested tokens."""
    from ..stages.text import flatten_tokens

    BLOCK = ("dup",)  # rare in the fixture corpus, so the filter is
    # non-degenerate (the soup vocabulary is 31 tokens; common tokens
    # appear in ~80% of docs and would empty the corpus)
    block_arr = pa.array(list(BLOCK), pa.string())

    def f(t: pa.Table) -> pa.Table:
        flat, par, _ = flatten_tokens(t.column("text"))
        hit = pc.is_in(flat, value_set=block_arr).to_numpy(zero_copy_only=False)
        bad = np.zeros(t.num_rows, bool)
        if len(par):
            np.logical_or.at(bad, par, hit)
        return t.select(["doc_id", "lang"]).filter(pa.array(~bad))

    return _read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "lang", "text"]
    ).map_batches(f, batch_format="pyarrow")


def domain_gate_docs(sf_dir: str):
    """Domain-reputation gate — the domain-level curation cut (keep
    documents from sources whose average document length is at or above
    the corpus average): per-source (sum_chars, n) partials -> one tiny
    groupby (bounded by #sources; for open-domain hosts swap the
    broadcast for the hash-partitioned join of `neardup_keep_docs`),
    gate on INTEGER floor-means (exact in both engines — float averages
    are order-sensitive), broadcast the surviving source set, row-local
    filter.  Output: kept (doc_id, source, n_chars)."""
    cnt = (
        _read_parquet(_p(sf_dir, "documents"), columns=["source", "n_chars"])
        .groupby("source")
        .aggregate(Sum("n_chars", alias_name="s"), Count(alias_name="n"))
        .take_all()
    )  # rows == #distinct sources
    tot_s = sum(r["s"] for r in cnt)
    tot_n = sum(r["n"] for r in cnt)
    gate = tot_s // tot_n
    keep = {r["source"] for r in cnt if r["s"] // r["n"] >= gate}
    keep_arr = pa.array(sorted(keep), pa.string())

    def f(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["source"], value_set=keep_arr))

    return _read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "source", "n_chars"]
    ).map_batches(f, batch_format="pyarrow")


def pagerank_user_props(sf_dir: str):
    """Distributed PageRank, 3 synchronous iterations, INTEGER
    arithmetic end-to-end so the result is exact and order-free (the
    suite's cross-engine determinism rule): ranks carry 1e9 fixed-point
    units, per-edge contribution is ``rank // out_degree`` (integer
    division), damping is ``150_000_000 + (85 * sum) // 100``.

    Graph: the bipartite user <-> props.k co-occurrence graph from the
    events table (distinct (user_id, k) pairs, one directed edge each
    way) — every node has out-edges by construction, so there is no
    dangling-mass term.

    Distributed shape (the one that survives billions of edges): edges
    join out-degrees ONCE (materialized); each iteration is one
    hash-partitioned ``Dataset.join`` of the narrow (node, r) rank
    table against the edge table, a vectorized contribution map, and a
    ``groupby(dst).sum`` — ranks never visit the driver.  The rank
    table is materialized per iteration to keep each join in its own
    execution plan.  Oracle: the same three iterations unrolled as SQL
    CTEs (exact integer ops)."""
    from ..stages.blockutil import drop_empty_blocks

    N_ITER = 3

    def pairs(t: pa.Table) -> pa.Table:
        ks = [json.loads(p).get("k") if p else None for p in t["props"].to_pylist()]
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        k = np.array([x if x is not None else -1 for x in ks], np.int64)
        ok = k >= 0
        un = np.char.add("u:", u[ok].astype("U20"))
        kn = np.char.add("k:", k[ok].astype("U20"))
        return pa.table(
            {
                "src": pa.array(np.concatenate([un, kn])),
                "dst": pa.array(np.concatenate([kn, un])),
            }
        )

    edges = drop_empty_blocks(
        _read_parquet(_p(sf_dir, "events"), columns=["user_id", "props"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .count()  # distinct edges
        .map_batches(lambda t: t.select(["src", "dst"]), batch_format="pyarrow")
        .materialize()
    )
    deg = (
        edges.groupby("src")
        .count()
        .map_batches(
            lambda t: pa.table({"src": t["src"], "outdeg": t["count()"]}),
            batch_format="pyarrow",
        )
    )
    ew = drop_empty_blocks(
        edges.join(
            drop_empty_blocks(deg.materialize()),
            "inner",
            num_partitions=8,
            on=("src",),
        ).materialize()
    )

    ranks = drop_empty_blocks(
        edges.map_batches(
            lambda t: pa.table(
                {
                    "node": t["src"],
                    "r": pa.array(
                        np.full(t.num_rows, 1_000_000_000, np.int64)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("node")
        .aggregate(Min("r", alias_name="r"))
        .materialize()
    )
    for _ in range(N_ITER):
        joined = ranks.join(
            ew, "inner", num_partitions=8, on=("node",), right_on=("src",)
        )
        contrib = joined.map_batches(
            lambda t: pa.table(
                {
                    "node": t["dst"],
                    "c": pa.array(
                        t.column("r").to_numpy(zero_copy_only=False)
                        // t.column("outdeg").to_numpy(zero_copy_only=False)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        ranks = drop_empty_blocks(
            contrib.groupby("node")
            .aggregate(Sum("c", alias_name="s"))
            .map_batches(
                lambda t: pa.table(
                    {
                        "node": t["node"],
                        "r": pa.array(
                            150_000_000
                            + (
                                85
                                * t.column("s").to_numpy(zero_copy_only=False)
                            )
                            // 100
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
    return ranks


def cube_orders_status_priority(sf_dir: str):
    """CUBE(o_orderstatus, o_orderpriority) over orders — all four
    grouping sets (detail, each single-key subtotal, grand total; null
    marks a rolled-up key) with count + integer-cent revenue.

    The classic cube optimization: only the FINEST level aggregates the
    corpus (one distributed shuffle of partial pre-aggregates); every
    coarser level re-aggregates the finest RESULT, which is bounded by
    |statuses| x |priorities| — driver-side by design, not a scale
    leak (same rule as rollup_customers_region_segment)."""
    base = (
        _read_parquet(
            _p(sf_dir, "orders"),
            columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "o_orderstatus": t["o_orderstatus"],
                    "o_orderpriority": t["o_orderpriority"],
                    "rev_cents": _cents(t["o_totalprice"]),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(Count(alias_name="n_orders"), Sum("rev_cents", alias_name="revenue_cents"))
        .take_all()
    )  # bounded by |statuses| x |priorities|
    import collections

    def roll(keyfn):
        acc = collections.defaultdict(lambda: [0, 0])
        for r in base:
            k = keyfn(r)
            acc[k][0] += r["n_orders"]
            acc[k][1] += r["revenue_cents"]
        return acc

    rows = []
    for r in base:
        rows.append((r["o_orderstatus"], r["o_orderpriority"], r["n_orders"], r["revenue_cents"]))
    for k, (n, s) in roll(lambda r: r["o_orderstatus"]).items():
        rows.append((k, None, n, s))
    for k, (n, s) in roll(lambda r: r["o_orderpriority"]).items():
        rows.append((None, k, n, s))
    for k, (n, s) in roll(lambda r: None).items():
        rows.append((None, None, n, s))
    return pa.table(
        {
            "o_orderstatus": pa.array([r[0] for r in rows], pa.string()),
            "o_orderpriority": pa.array([r[1] for r in rows], pa.string()),
            "n_orders": pa.array([r[2] for r in rows], pa.int64()),
            "revenue_cents": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def approx_distinct_users_per_type(sf_dir: str):
    """Per-group HLL: approximate distinct users per event type (the
    grouped composition of the global HLL — register rows shuffle, user
    ids never do; see stages/sketch.approx_distinct_grouped).  Estimate
    output — rows-only in the registry (like the global HLL), with the
    5-sigma error bound pinned against exact distincts in pytest."""
    from ..stages.sketch import approx_distinct_grouped

    ds = _read_parquet(_p(sf_dir, "events"), columns=["event_type", "user_id"])
    return approx_distinct_grouped(ds, "event_type", "user_id", p=12)


def approx_quantiles_values_per_type(sf_dir: str):
    """Per-group mergeable quantile summaries: p25/p50/p90 of `value`
    per event type (grouped composition of approx_quantiles — summary
    rows shuffle, raw values never do).  Estimate output — rows-only in
    the registry; the per-group rank-error bound is pinned against
    exact quantiles in pytest."""
    from ..stages.sketch import approx_quantiles_grouped

    ds = _read_parquet(_p(sf_dir, "events"), columns=["event_type", "value"])
    return approx_quantiles_grouped(ds, "event_type", "value", [0.25, 0.5, 0.9])


def curation_pipeline_docs(sf_dir: str):
    """FLAGSHIP #4 — the full corpus-curation chain, end-to-end and
    SQL-checked as ONE query: C4 blocklist filter -> domain-reputation
    gate -> temperature (tau=0.7) language rebalance -> charlm-quality
    byte-budget cut.  Every stage re-derives its statistics from the
    corpus THAT SURVIVED the previous stage (gates move as upstream
    filters change — the real pipeline semantics, and what makes this a
    composition test rather than four independent filters).

    Scale shape per stage: blocklist is row-local; the domain and
    language stats are tiny bounded groupbys broadcast in-closure; the
    quality model is the 512 KB charlm all-reduce trained on survivors
    only; the budget cut is the `ordered_cumsum` distributed prefix
    scan.  Output: (doc_id, lang, source, mean_unats, n_bytes,
    cum_bytes) for every kept document."""
    import hashlib
    import math

    from ..stages.analytic import ordered_cumsum
    from ..stages.text import CharLMScorer, charlm_counts, charlm_logp, flatten_tokens

    BLOCK = pa.array(["dup"], pa.string())  # see badwords_filter_docs

    def no_badwords(t: pa.Table) -> pa.Table:
        flat, par, _ = flatten_tokens(t.column("text"))
        hit = pc.is_in(flat, value_set=BLOCK).to_numpy(zero_copy_only=False)
        bad = np.zeros(t.num_rows, bool)
        if len(par):
            np.logical_or.at(bad, par, hit)
        return t.filter(pa.array(~bad))

    s1 = _read_parquet(
        _p(sf_dir, "documents"),
        columns=["doc_id", "lang", "source", "n_chars", "text"],
    ).map_batches(no_badwords, batch_format="pyarrow")

    # stage 2: domain gate from S1's stats (bounded by #sources)
    c2 = (
        s1.map_batches(
            lambda t: t.select(["source", "n_chars"]), batch_format="pyarrow"
        )
        .groupby("source")
        .aggregate(Sum("n_chars", alias_name="s"), Count(alias_name="n"))
        .take_all()
    )
    gate = sum(r["s"] for r in c2) // sum(r["n"] for r in c2)
    keep_src = pa.array(
        sorted(r["source"] for r in c2 if r["s"] // r["n"] >= gate), pa.string()
    )
    s2 = s1.map_batches(
        lambda t: t.filter(pc.is_in(t["source"], value_set=keep_src)),
        batch_format="pyarrow",
    )

    # stage 3: temperature rebalance from S2's language counts
    c3 = (
        s2.map_batches(lambda t: t.select(["lang"]), batch_format="pyarrow")
        .groupby("lang")
        .count()
        .take_all()
    )
    cmin = min(r["count()"] for r in c3)
    thr = {
        r["lang"]: int(
            math.floor(
                math.pow(float(cmin) / float(r["count()"]), 0.3) * 4294967296.0
            )
        )
        for r in c3
    }

    def mix(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_pylist()
        h = np.fromiter(
            (int(hashlib.md5(f"mix:{i}".encode()).hexdigest()[:8], 16) for i in did),
            np.int64,
            len(did),
        )
        row_thr = np.fromiter(
            (thr[s] for s in t.column("lang").to_pylist()), np.int64, t.num_rows
        )
        return t.filter(pa.array(h < row_thr))

    s3 = s2.map_batches(mix, batch_format="pyarrow")

    # stage 4: quality model trained ON SURVIVORS, budget cut by scan
    MEAN_BITS, ID_BITS = 24, 39
    logp_ref = ray.put(charlm_logp(charlm_counts(s3)))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["n_pairs"], pa.scalar(1, pa.int64())))
        lm = t.column("lm_score_unats").to_numpy(zero_copy_only=False)
        npair = t.column("n_pairs").to_numpy(zero_copy_only=False)
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        mean = np.floor(lm.astype(np.float64) / npair.astype(np.float64)).astype(np.int64)
        if len(mean):
            if mean.min() <= -(1 << MEAN_BITS) or mean.max() > 0:
                raise ValueError("curation_pipeline_docs: mean out of pack contract")
            if did.min() < 0 or did.max() >= (1 << ID_BITS):
                raise ValueError("curation_pipeline_docs: doc_id out of pack contract")
        return pa.table(
            {
                "okey": pa.array(((-mean) << ID_BITS) | did),
                "doc_id": pa.array(did),
                "lang": t.column("lang"),
                "source": t.column("source"),
                "mean_unats": pa.array(mean),
                "n_bytes": pa.array((npair + 1).astype(np.int64)),
            }
        )

    scored = (
        s3.map_batches(
            CharLMScorer,
            fn_constructor_args=(logp_ref,),
            fn_constructor_kwargs={"keep_cols": ("lang", "source")},
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .map_batches(prep, batch_format="pyarrow")
        .materialize()  # narrow; consumed by budget scalar + 3-pass scan
    )
    budget = int(scored.sum("n_bytes")) // 2
    cum = ordered_cumsum(
        scored, order_col="okey", value_col="n_bytes", out_col="cum_bytes"
    )
    return cum.map_batches(
        lambda t: t.filter(
            pc.less_equal(t["cum_bytes"], pa.scalar(budget, pa.int64()))
        ).select(
            ["doc_id", "lang", "source", "mean_unats", "n_bytes", "cum_bytes"]
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# round-5 batch 3: regression / higher-moment / inequality statistics
# ---------------------------------------------------------------------------


def regr_price_on_qty_by_retflag(sf_dir: str):
    """Grouped ordinary-least-squares regression, distributed: per
    l_returnflag, slope / intercept / r² of extendedprice (cents) on
    quantity (cents) — the ``regr_slope / regr_intercept / regr_r2``
    family, computed from EXACT integer moment partials (same shape as
    corr_qty_price_by_retflag: per-batch int64 (n, Σx, Σy, Σx², Σxy,
    Σy²) combined on the driver with arbitrary-precision ints).  The
    only float ops — cast the combined integer moments to double, one
    divide for the slope, a multiply-subtract-divide for the intercept,
    two multiplies + a divide for r² — are replicated
    operand-for-operand in the oracle, so results are bit-identical.
    Reference analogue: grouped numeric aggregates (A1 family,
    /root/reference/src/pipeline/jobs/transform.py) widened to second
    moments."""
    ds = _read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t["l_returnflag"].to_numpy(zero_copy_only=False)
        x = _cents(t["l_quantity"]).to_numpy(zero_copy_only=False)
        y = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        u, inv = np.unique(g, return_inverse=True)
        cols = {"l_returnflag": pa.array(u, pa.string())}
        for name, v in (
            ("n", np.ones(len(x), np.int64)),
            ("sx", x),
            ("sy", y),
            ("sxx", x * x),
            ("sxy", x * y),
            ("syy", y * y),
        ):
            acc = np.zeros(len(u), np.int64)
            np.add.at(acc, inv, v)
            cols[name] = pa.array(acc, pa.int64())
        return pa.table(cols)

    # batch cap keeps per-batch Σy² below 2^63 (y ≤ 1e7 cents); the
    # cross-batch combine runs in Python ints, exact at any scale.
    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).take_all()
    agg: dict[str, list[int]] = {}
    for r in parts:
        a = agg.setdefault(r["l_returnflag"], [0, 0, 0, 0, 0, 0])
        for i, k in enumerate(("n", "sx", "sy", "sxx", "sxy", "syy")):
            a[i] += int(r[k])
    keys = sorted(agg)
    rows = {"l_returnflag": [], "n_rows": [], "slope": [], "intercept": [], "r2": []}
    for k in keys:
        n, sx, sy, sxx, sxy, syy = agg[k]
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        dy = n * syy - sy * sy
        # _hug2d mirrors the oracle's HUGEINT->DOUBLE casts (sums and
        # their combinations); n is a BIGINT count -> plain float()
        slope = _hug2d(num) / _hug2d(den)
        rows["l_returnflag"].append(k)
        rows["n_rows"].append(n)
        rows["slope"].append(slope)
        rows["intercept"].append((_hug2d(sy) - slope * _hug2d(sx)) / float(n))
        rows["r2"].append(_hug2d(num) * _hug2d(num) / (_hug2d(den) * _hug2d(dy)))
    return pa.table(
        {
            "l_returnflag": pa.array(rows["l_returnflag"], pa.string()),
            "n_rows": pa.array(rows["n_rows"], pa.int64()),
            "slope": pa.array(rows["slope"], pa.float64()),
            "intercept": pa.array(rows["intercept"], pa.float64()),
            "r2": pa.array(rows["r2"], pa.float64()),
        }
    )


def skew_kurtosis_quantity_by_retflag(sf_dir: str):
    """Grouped skewness + excess kurtosis (population), distributed via
    EXACT integer raw moments: per-batch int64 partials (n, Σx, Σx²,
    Σx³, Σx⁴) over l_quantity (small integers ≤ 50, so x⁴ ≤ 6.25e6 and
    a 65536-row batch sum stays far below 2^63), combined on the driver
    with Python arbitrary-precision ints.  Scaled central moments are
    integer-exact:

        M2 = n·Σx² − (Σx)²               (= n²·variance·n⁰… = n·Σd²)
        M3 = n²·Σx³ − 3n·Σx·Σx² + 2(Σx)³ (= n²·Σd³)
        M4 = n³·Σx⁴ − 4n²·Σx·Σx³ + 6n·(Σx)²·Σx² − 3(Σx)⁴ (= n³·Σd⁴)

    then skewness g1 = M3 / (M2·√M2) and kurtosis_excess g2 = M4/M2² − 3
    — identities that hold because the n-powers cancel.  The float tail
    (casts, one sqrt, multiplies, divides) is replicated
    operand-for-operand in the oracle (DuckDB's HUGEINT keeps the
    integer part exact up to ~1.7e38; the Ray side is exact at ANY
    scale).  Reference analogue: A1 grouped aggregates widened to
    third/fourth moments."""
    import math

    ds = _read_parquet(
        _p(sf_dir, "lineitem"), columns=["l_returnflag", "l_quantity"]
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t["l_returnflag"].to_numpy(zero_copy_only=False)
        x = (
            pc.cast(pc.floor(t["l_quantity"]), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        u, inv = np.unique(g, return_inverse=True)
        cols = {"l_returnflag": pa.array(u, pa.string())}
        x2 = x * x
        for name, v in (
            ("n", np.ones(len(x), np.int64)),
            ("s1", x),
            ("s2", x2),
            ("s3", x2 * x),
            ("s4", x2 * x2),
        ):
            acc = np.zeros(len(u), np.int64)
            np.add.at(acc, inv, v)
            cols[name] = pa.array(acc, pa.int64())
        return pa.table(cols)

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).take_all()
    agg: dict[str, list[int]] = {}
    for r in parts:
        a = agg.setdefault(r["l_returnflag"], [0, 0, 0, 0, 0])
        for i, k in enumerate(("n", "s1", "s2", "s3", "s4")):
            a[i] += int(r[k])
    keys = sorted(agg)
    out = {"l_returnflag": [], "n_rows": [], "skewness": [], "kurtosis_excess": []}
    for k in keys:
        n, s1, s2, s3, s4 = agg[k]
        m2 = n * s2 - s1 * s1
        m3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1**3
        m4 = n**3 * s4 - 4 * n * n * s1 * s3 + 6 * n * s1 * s1 * s2 - 3 * s1**4
        out["l_returnflag"].append(k)
        out["n_rows"].append(n)
        out["skewness"].append(_hug2d(m3) / (_hug2d(m2) * math.sqrt(_hug2d(m2))))
        out["kurtosis_excess"].append(_hug2d(m4) / (_hug2d(m2) * _hug2d(m2)) - 3.0)
    return pa.table(
        {
            "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
            "n_rows": pa.array(out["n_rows"], pa.int64()),
            "skewness": pa.array(out["skewness"], pa.float64()),
            "kurtosis_excess": pa.array(out["kurtosis_excess"], pa.float64()),
        }
    )


def gini_user_spend(sf_dir: str):
    """Gini coefficient of per-user total event spend — a global
    rank-weighted statistic (G = (2·Σᵢ rankᵢ·xᵢ − (n+1)·Σx) / (n·Σx)
    over ascending-sorted x), distributed WITHOUT a global sort of the
    data:

      1. per-user spend in exact integer cents (one hash groupby);
      2. global ascending rank via the two-phase range-bucketed prefix
         scan (``analytic.ordered_cumsum`` with value≡1 over a packed
         (spend, user_id) order key — bucket order == global order, the
         shuffle moves only O(batches × buckets) partial counts);
      3. per-batch int64 partials of (n, Σx, Σ rank·x) combined on the
         driver in Python ints — exact at any scale.

    Ties in spend are broken by user_id in BOTH engines (the packed key
    is lexicographic because user_id occupies the low bits), and since
    tied values are equal, Σ rank·x is tie-order-invariant anyway.  The
    single float op — one cast-and-divide — is replicated
    operand-for-operand in the oracle.  Pack contract (asserted):
    user_id < 2^24, per-user cents < 2^38."""
    from ..stages.analytic import ordered_cumsum

    ID_BITS = 24

    ds = _read_parquet(_p(sf_dir, "events"), columns=["user_id", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"], "x": _cents(t["value"])})

    spend = (
        ds.map_batches(to_cents, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("x", alias_name="x"))
    )

    def pack(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(uid):
            if uid.min() < 0 or uid.max() >= (1 << ID_BITS):
                raise ValueError("gini_user_spend: user_id outside pack contract")
            if x.min() < 0 or x.max() >= (1 << (62 - ID_BITS)):
                raise ValueError("gini_user_spend: spend outside pack contract")
        return pa.table(
            {
                "okey": pa.array((x << ID_BITS) | uid, pa.int64()),
                "x": pa.array(x, pa.int64()),
                "one": pa.array(np.ones(len(uid), np.int64)),
            }
        )

    ranked = ordered_cumsum(
        spend.map_batches(pack, batch_format="pyarrow"),
        order_col="okey",
        value_col="one",
        out_col="rank",  # inclusive running count == ascending rank, 1-based
    )

    def partial(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        rk = t["rank"].to_numpy(zero_copy_only=False)
        # Σ rank·x: vectorized int64 when the batch provably fits
        # (max_rank · max_x · rows < 2^63, checked in Python ints so the
        # check itself can't overflow); exact Python-int fold otherwise
        # — no silent overflow at any n·spend combination.
        if len(x) and int(rk.max()) * int(x.max()) * len(x) >= (1 << 63):
            srx_val = sum(int(a) * int(b) for a, b in zip(rk.tolist(), x.tolist()))
        else:
            srx_val = int((rk * x).sum())
        # ship srx as two base-2^62 limbs so the partial row itself can
        # never overflow the int64 column when the fallback produced a
        # wider-than-64-bit sum
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "srx_hi": pa.array([srx_val >> 62], pa.int64()),
                "srx_lo": pa.array([srx_val & ((1 << 62) - 1)], pa.int64()),
            }
        )

    # batch cap bounds per-batch Σ rank·x below 2^63; cross-batch sums
    # run in Python ints.
    parts = ranked.map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).take_all()
    n = sum(int(r["n"]) for r in parts)
    sx = sum(int(r["sx"]) for r in parts)
    srx = sum((int(r["srx_hi"]) << 62) + int(r["srx_lo"]) for r in parts)
    gini = _hug2d(2 * srx - (n + 1) * sx) / _hug2d(n * sx)
    return pa.table(
        {
            "n_users": pa.array([n], pa.int64()),
            "gini": pa.array([gini], pa.float64()),
        }
    )


def gini_spend_by_type(sf_dir: str):
    """Per-group Gini: inequality of per-user spend WITHIN each
    event_type — the grouped variant of ``gini_user_spend``, ranked with
    the bucketed window machinery (``analytic.partitioned_analytics``)
    instead of the global range scan: one bounded hash-bucket shuffle on
    event_type, in-bucket vectorized lexsort ranks, then per-batch
    integer partials (n, Σx, Σ rank·x as two base-2^62 limbs) combined
    per group on the driver (≤ |types| keys).  Ties in spend break by
    user_id in both engines; the one float op per group is
    operand-mirrored in the oracle."""
    from ..stages.analytic import partitioned_analytics

    ds = _read_parquet(
        _p(sf_dir, "events"), columns=["event_type", "user_id", "value"]
    )

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "user_id": t["user_id"],
                "x": _cents(t["value"]),
            }
        )

    spend = (
        ds.map_batches(to_cents, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(Sum("x", alias_name="x"))
    )
    ranked = partitioned_analytics(
        spend, key="event_type", order_by=["x", "user_id"], rn_col="rk"
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t["event_type"].to_numpy(zero_copy_only=False)
        x = t["x"].to_numpy(zero_copy_only=False)
        rk = t["rk"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(g, return_inverse=True)
        n = np.zeros(len(u), np.int64)
        np.add.at(n, inv, 1)
        sx = np.zeros(len(u), np.int64)
        np.add.at(sx, inv, x)
        if len(x) and int(rk.max()) * int(x.max()) * len(x) >= (1 << 63):
            srx = [0] * len(u)
            for i, a, b in zip(inv.tolist(), rk.tolist(), x.tolist()):
                srx[i] += int(a) * int(b)
        else:
            acc = np.zeros(len(u), np.int64)
            np.add.at(acc, inv, rk * x)
            srx = [int(v) for v in acc]
        return pa.table(
            {
                "event_type": pa.array(u, pa.string()),
                "n": pa.array(n, pa.int64()),
                "sx": pa.array(sx, pa.int64()),
                "srx_hi": pa.array([v >> 62 for v in srx], pa.int64()),
                "srx_lo": pa.array([v & ((1 << 62) - 1) for v in srx], pa.int64()),
            }
        )

    parts = ranked.map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).take_all()
    agg: dict[str, list[int]] = {}
    for r in parts:
        a = agg.setdefault(r["event_type"], [0, 0, 0])
        a[0] += int(r["n"])
        a[1] += int(r["sx"])
        a[2] += (int(r["srx_hi"]) << 62) + int(r["srx_lo"])
    keys = sorted(agg)
    gini = [
        _hug2d(2 * agg[k][2] - (agg[k][0] + 1) * agg[k][1])
        / _hug2d(agg[k][0] * agg[k][1])
        for k in keys
    ]
    return pa.table(
        {
            "event_type": pa.array(keys, pa.string()),
            "n_users": pa.array([agg[k][0] for k in keys], pa.int64()),
            "gini": pa.array(gini, pa.float64()),
        }
    )


def mannwhitney_click_vs_purchase(sf_dir: str):
    """Mann-Whitney rank-sum statistics for click vs purchase event
    values — a two-sample test needing GLOBAL ranks over the combined
    sample, distributed via the same two-phase range-bucketed prefix
    scan as the Gini (no global data sort).  Ranks are the deterministic
    row_number over (value_cents, event_id) — tie order is pinned and
    mirrored in the oracle (midrank tie-averaging is NOT applied; this
    is the engine-parity statistic, exact integers end-to-end).
    U = rank_sum − n(n+1)/2 per side; U_click + U_purchase =
    n_click·n_purchase by construction (asserted in tests).  Pack
    contract (asserted): value_cents < 2^23, event_id < 2^39; u_stat
    emitted as int64 (exact below ~4.3e9 rows per side; the partial
    combine itself is Python-int exact at any scale)."""
    from ..stages.analytic import ordered_cumsum

    ID_BITS = 39

    ds = _read_parquet(
        _p(sf_dir, "events"), columns=["event_type", "value", "event_id"]
    )

    def pack(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"], pa.array(["click", "purchase"])))
        x = _cents(t["value"]).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(x):
            if eid.min() < 0 or eid.max() >= (1 << ID_BITS):
                raise ValueError("mannwhitney: event_id outside pack contract")
            if x.min() < 0 or x.max() >= (1 << (62 - ID_BITS)):
                raise ValueError("mannwhitney: value outside pack contract")
        return pa.table(
            {
                "okey": pa.array((x << ID_BITS) | eid, pa.int64()),
                "event_type": t["event_type"],
                "one": pa.array(np.ones(len(x), np.int64)),
            }
        )

    ranked = ordered_cumsum(
        ds.map_batches(pack, batch_format="pyarrow"),
        order_col="okey",
        value_col="one",
        out_col="rk",
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t["event_type"].to_numpy(zero_copy_only=False)
        rk = t["rk"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(g, return_inverse=True)
        n = np.zeros(len(u), np.int64)
        np.add.at(n, inv, 1)
        sr = np.zeros(len(u), np.int64)
        np.add.at(sr, inv, rk)
        return pa.table(
            {
                "event_type": pa.array(u, pa.string()),
                "n": pa.array(n, pa.int64()),
                "sr": pa.array(sr, pa.int64()),
            }
        )

    parts = ranked.map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).take_all()
    agg: dict[str, list[int]] = {}
    for r in parts:
        a = agg.setdefault(r["event_type"], [0, 0])
        a[0] += int(r["n"])
        a[1] += int(r["sr"])
    keys = sorted(agg)
    return pa.table(
        {
            "event_type": pa.array(keys, pa.string()),
            "n_rows": pa.array([agg[k][0] for k in keys], pa.int64()),
            "rank_sum": pa.array([agg[k][1] for k in keys], pa.int64()),
            "u_stat": pa.array(
                [agg[k][1] - agg[k][0] * (agg[k][0] + 1) // 2 for k in keys],
                pa.int64(),
            ),
        }
    )


def theil_index_user_spend(sf_dir: str):
    """Theil-T inequality index of per-user spend, distributed with NO
    ranking at all (contrast with the Gini): T = (Σ x·ln x)/(n·μ) − ln μ.
    The order-sensitive float Σ x·ln x is made engine-order-free the
    repo's standard way (charlm/DSIR): each row contributes the INTEGER
    floor(x·ln(x)·1e6) micro-unit term, summed exactly (two base-2^62
    limbs per partial so no batch overflows int64); the float tail
    (one divide, one ln, one subtract on identical operands) is
    mirrored in the oracle.  Per-row term bound: x < 2^38 cents keeps
    floor(x·ln x·1e6) < 2^63 (asserted via the same pack contract)."""
    import math

    ds = _read_parquet(_p(sf_dir, "events"), columns=["user_id", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"], "x": _cents(t["value"])})

    spend = (
        ds.map_batches(to_cents, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("x", alias_name="x"))
    )

    def partial(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(x) and (x.min() < 1 or x.max() >= (1 << 38)):
            raise ValueError("theil_index: spend outside [1, 2^38) contract")
        xd = x.astype(np.float64)
        term = np.floor(xd * np.log(xd) * 1e6).astype(np.int64)
        s = sum(int(v) for v in term) if len(term) and int(term.max()) * len(
            term
        ) >= (1 << 63) else int(term.sum())
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sxl_hi": pa.array([s >> 62], pa.int64()),
                "sxl_lo": pa.array([s & ((1 << 62) - 1)], pa.int64()),
            }
        )

    parts = spend.map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).take_all()
    n = sum(int(r["n"]) for r in parts)
    sx = sum(int(r["sx"]) for r in parts)
    sxl = sum((int(r["sxl_hi"]) << 62) + int(r["sxl_lo"]) for r in parts)
    mu = _hug2d(sx) / float(n)
    theil = (_hug2d(sxl) / 1000000.0) / (float(n) * mu) - math.log(mu)
    return pa.table(
        {
            "n_users": pa.array([n], pa.int64()),
            "theil_t": pa.array([theil], pa.float64()),
        }
    )


def scan_prune_recent_pages(sf_dir: str):
    """Stats-pruned filtered lake read through the ``filters=`` tuple
    API (pipelines/replay.read_table + state/partstats.py): CDC replay,
    then serve the recent half of the live table as
    ``(url, ts_us)`` with the warc_ts >= p50 predicate applied at all
    three pruning layers — manifest-level partition skipping from
    writer-recorded column stats (zero footer reads), row-group
    pushdown via the derived expression, and the in-task filter.  The
    oracle recomputes the same LWW winners + quantile cut in SQL, so
    hash equality proves the stats planner never skips a partition it
    needs.  The plan itself is sanity-checked via explain_scan (kept +
    skipped must tile the manifest)."""
    from ..stages.quantiles import exact_quantiles
    from .replay import bootstrap_lake, explain_scan, read_table, replay

    n_urls, n_events = _CDC_SIZES.get(os.path.basename(sf_dir.rstrip("/")), (300, 1500))
    root = _cdc_fixture(n_urls, n_events)
    data_dir = os.path.join(root, "data")
    lake_root = os.path.join(root, "lake", f"sp{os.getpid()}", "pages")
    bootstrap_lake(lake_root, os.path.join(data_dir, "base", "pages.parquet"), num_partitions=16)
    replay(lake_root, os.path.join(data_dir, "wal"))

    cut = exact_quantiles(
        read_table(lake_root, columns=["warc_ts"]), "warc_ts", [0.5]
    )["value"][0].as_py()

    plan = explain_scan(lake_root, [("warc_ts", ">=", cut)])
    if plan["partitions_skipped"] > plan["partitions_total"]:
        raise AssertionError(f"inconsistent scan plan: {plan}")

    recent = read_table(
        lake_root,
        columns=["url", "warc_ts"],
        filters=[("warc_ts", ">=", cut)],
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t.column("url"),
                "ts_us": pc.cast(t.column("warc_ts"), pa.int64()),
            }
        )

    return recent.map_batches(project, batch_format="pyarrow")


def meta_count_recent_pages(sf_dir: str):
    """Metadata-only counting (pipelines/metaquery.count_rows): exact
    live-row count of the recent half of the CDC lake, answered from
    manifest column stats wherever a partition's range falls wholly
    inside or outside the predicate, scanning only boundary partitions
    (the Iceberg/Delta metadata-only-query shape).  The SQL oracle
    recomputes count(*) over the LWW winners, so equality proves both
    the skip rule (never drops a matching partition) and the all-match
    rule (never double-counts)."""
    from ..stages.quantiles import exact_quantiles
    from .metaquery import count_rows
    from .replay import bootstrap_lake, read_table, replay

    n_urls, n_events = _CDC_SIZES.get(os.path.basename(sf_dir.rstrip("/")), (300, 1500))
    root = _cdc_fixture(n_urls, n_events)
    data_dir = os.path.join(root, "data")
    lake_root = os.path.join(root, "lake", f"mcnt{os.getpid()}", "pages")
    bootstrap_lake(lake_root, os.path.join(data_dir, "base", "pages.parquet"), num_partitions=16)
    replay(lake_root, os.path.join(data_dir, "wal"))

    cut = exact_quantiles(
        read_table(lake_root, columns=["warc_ts"]), "warc_ts", [0.5]
    )["value"][0].as_py()

    rep = count_rows(lake_root, [("warc_ts", ">=", cut)])
    return pa.table({"n_recent": pa.array([int(rep["count"])], pa.int64())})
