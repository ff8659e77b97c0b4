"""Metadata-only queries: answers computed from the manifest, touching
data files only where metadata cannot decide.

The companion to stats pruning (state/partstats.py).  Pruning uses
column stats negatively — "no live row here can match, skip the file".
This module also uses them POSITIVELY — "every live row here matches,
take the partition's exact live-row count without opening it".  The
scan then degenerates to the boundary partitions whose ranges straddle
the predicate, which is the Iceberg/Delta "metadata-only query" shape:
``count(*) WHERE ts >= X`` on a 100 TB lake should read a handful of
files, not 100 TB.  Reference analogue: the loader's bookkeeping
count-checks against ClickHouse system tables
(/root/reference/src/pipeline/core/client_clickhouse.py:176-199) — the
table format itself is the system table here.

Also exposes the manifest as queryable Arrow tables (``files`` /
``partitions_table`` / ``history``) — the ``information_schema`` of the
lake, driver-local because manifests are O(partitions) metadata, never
data-sized.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc

from ..state.manifest import LakeTable, partition_file_list
from ..state.partstats import _norm_value, partition_excluded


def _resolve(lake_root, at_txid, fs):
    lake = LakeTable(lake_root, fs=fs)
    m = lake.manifest_at(at_txid) if at_txid is not None else lake.read_manifest()
    return lake, m


# -- metadata-only count --------------------------------------------------


def _all_match(stats: dict | None, filters, schema: pa.Schema) -> bool:
    """True iff the stats PROVE every live row satisfies every filter
    conjunct.  Dual of partstats.file_excluded: bounds must lie INSIDE
    the predicate range and the column must be null-free (SQL
    comparisons never match null, so one null row breaks all-match)."""
    if not stats:
        return False
    for col, op, value in filters:
        ent = stats.get(col)
        if ent is None or "min" not in ent or int(ent.get("nulls", 0)) != 0:
            return False
        t = schema.field(col).type
        try:
            if op == "in":
                vs = [_norm_value(x, t) for x in value]
            else:
                v = _norm_value(value, t)
        except (pa.ArrowInvalid, ValueError, TypeError, OverflowError):
            return False
        lo, hi = ent["min"], ent.get("max")
        if hi is None:
            return False  # unbounded above: cannot prove containment
        trunc = bool(ent.get("trunc"))
        if op in ("==", "="):
            if trunc or not (lo == hi == v):
                return False
        elif op == ">":
            if not lo > v:
                return False
        elif op == ">=":
            if not lo >= v:
                return False
        elif op == "<":
            if not hi < v:
                return False
        elif op == "<=":
            if not hi <= v:
                return False
        elif op == "in":
            if trunc or lo != hi or lo not in vs:
                return False
        elif op == "!=":
            if not (v < lo or v > hi):
                return False
        else:
            return False
    return True


def count_rows(
    lake_root: str,
    filters=None,
    at_txid: str | None = None,
    key: str = "url",
    ts_col: str = "warc_ts",
    fs=None,
) -> dict:
    """Exact live-row count under optional ``filters``, reading as
    little data as metadata allows.

    Per partition, in order of preference:

    * stats EXCLUDE the filters → contributes 0 (nothing read);
    * flat partition (no delta chain) whose stats prove ALL-MATCH →
      contributes its manifest live-row count (nothing read);
    * otherwise → scanned.  Boundary partitions read only the filter
      columns; delta-chain partitions can never count from metadata
      (base rows + delta rows double-count superseded versions), so
      they always scan through the LWW merge path.

    Returns ``{"count", "partitions_total", "from_stats", "scanned",
    "skipped"}`` so callers (and tests) can see how much metadata
    decided.  With no filters, flat partitions all count from the
    manifest — the O(1)-I/O ``SELECT count(*)``."""
    from .replay import read_table

    lake, m = _resolve(lake_root, at_txid, fs)
    schema = lake.schema(m)
    filters = filters or []
    renames = m.get("renames", [])
    from ..state.partstats import check_filters, rename_blocks_pruning

    if filters:
        check_filters(filters, schema)
    stats_usable = not rename_blocks_pruning(filters, renames)

    total = 0
    scan_pids: list[str] = []
    rep = {
        "partitions_total": len(m["partitions"]),
        "from_stats": 0,
        "scanned": 0,
        "skipped": 0,
    }
    for pid, meta in m["partitions"].items():
        chain = meta.get("deltas")
        live = int(meta.get("rows", 0))
        if not filters and not chain:
            # manifest live count is exact on flat partitions (post-
            # merge unique keys); renames are metadata-only, irrelevant
            total += live
            rep["from_stats"] += 1
            continue
        if filters and stats_usable and partition_excluded(meta, filters, schema):
            rep["skipped"] += 1
            continue
        if (
            filters
            and stats_usable
            and not chain
            and not renames
            and _all_match(meta.get("stats"), filters, schema)
        ):
            total += live
            rep["from_stats"] += 1
            continue
        scan_pids.append(pid)
    if scan_pids:
        rep["scanned"] = len(scan_pids)
        # count only the boundary/merged partitions, projecting only the
        # filter columns (or the key for a bare count)
        cols = sorted({c for c, _, _ in filters}) or None
        sub = dict(m)
        sub["partitions"] = {p: m["partitions"][p] for p in scan_pids}
        total += _count_subset(
            lake_root, sub, schema, cols, filters, lake, key, ts_col
        )
    rep["count"] = int(total)
    return rep


def _count_subset(lake_root, m_sub, schema, cols, filters, lake, key, ts_col):
    """Count matching live rows across the given partition subset using
    the standard read machinery (merged path for delta chains, flat
    scans otherwise)."""
    import ray
    import ray.data

    from ..state.partstats import filters_to_expr
    from .replay import _MergedPartitionRead

    renames = m_sub.get("renames", [])
    expr = filters_to_expr(filters, schema) if filters else None
    if renames or any(p.get("deltas") for p in m_sub["partitions"].values()):
        items = [
            {"pid": int(pid), "meta": json.dumps(meta)}
            for pid, meta in sorted(
                m_sub["partitions"].items(), key=lambda kv: int(kv[0])
            )
        ]
        ds = ray.data.from_items(items, override_num_blocks=len(items))
        out = ds.map_batches(
            _MergedPartitionRead(
                lake_root, schema, key, ts_col,
                columns=cols or [key],
                fs_spec=lake.fs.spec, renames=renames,
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        if expr is not None:
            out = out.map_batches(
                lambda t: t.filter(expr), batch_format="pyarrow"
            )
        return out.count()
    files = [
        os.path.join(lake_root, rel)
        for p in m_sub["partitions"].values()
        for rel in partition_file_list(p)
    ]
    if not files:
        return 0
    read_cols = list(cols) if cols else []
    read_schema = pa.schema(
        [schema.field(c) for c in read_cols] + [pa.field("_deleted", pa.bool_())]
    )
    ds = ray.data.read_parquet(
        files, schema=read_schema, filter=expr, filesystem=lake.fs.pyarrow_fs
    )

    def live_n(t: pa.Table) -> pa.Table:
        n = t.num_rows - (pc.sum(t.column("_deleted")).as_py() or 0)
        return pa.table({"n": pa.array([n], pa.int64())})

    parts = ds.map_batches(live_n, batch_format="pyarrow").take_all()
    return int(sum(r["n"] for r in parts))


# -- manifest as queryable tables ----------------------------------------


def files(lake_root: str, at_txid: str | None = None, fs=None) -> pa.Table:
    """One row per referenced data file: pid, kind (base|delta), rows,
    checksum, lsn_hi, stats presence, on-disk bytes."""
    lake, m = _resolve(lake_root, at_txid, fs)
    rows = []
    for pid, meta in sorted(m["partitions"].items(), key=lambda kv: int(kv[0])):
        ents = []
        if meta.get("file"):
            ents.append(("base", meta))
        for d in meta.get("deltas", []) or []:
            ents.append(("delta", d))
        for kind, e in ents:
            path = os.path.join(lake_root, e["file"])
            try:
                size = os.path.getsize(path)
            except OSError:
                try:  # non-local adapter: ask pyarrow fs
                    size = lake.fs.pyarrow_fs.get_file_info(path).size
                except Exception:
                    size = None
            rows.append(
                {
                    "pid": int(pid),
                    "kind": kind,
                    "file": e["file"],
                    "rows": int(e.get("rows", 0)),
                    "checksum": int(e.get("checksum", 0)),
                    "lsn_hi": int(e.get("lsn_hi", 0)),
                    "has_stats": bool(e.get("stats")),
                    "bytes": size,
                }
            )
    sch = pa.schema(
        [
            ("pid", pa.int64()),
            ("kind", pa.string()),
            ("file", pa.string()),
            ("rows", pa.int64()),
            ("checksum", pa.uint64()),
            ("lsn_hi", pa.int64()),
            ("has_stats", pa.bool_()),
            ("bytes", pa.int64()),
        ]
    )
    return pa.Table.from_pylist(rows, schema=sch)


def partitions_table(
    lake_root: str, at_txid: str | None = None, fs=None
) -> pa.Table:
    """One row per partition: row versions, delta-chain length, stats
    coverage — the operator's skew / chain-health view.

    ``version_rows`` counts stored live row VERSIONS (base + delta
    change rows).  On a chained partition that is an upper bound on the
    served rows — a delta row superseding a base row contributes twice
    until the chain folds — so it is deliberately NOT named live_rows;
    exact live counts come from ``count_rows`` (which scans chains)."""
    _, m = _resolve(lake_root, at_txid, fs)
    rows = []
    for pid, meta in sorted(m["partitions"].items(), key=lambda kv: int(kv[0])):
        chain = meta.get("deltas", []) or []
        rows.append(
            {
                "pid": int(pid),
                "version_rows": int(meta.get("rows", 0))
                + sum(int(d.get("rows", 0)) for d in chain),
                "base_rows": int(meta.get("rows", 0)),
                "delta_files": len(chain),
                "has_stats": bool(meta.get("stats")),
                "lsn_hi": int(meta.get("lsn_hi", 0)),
            }
        )
    sch = pa.schema(
        [
            ("pid", pa.int64()),
            ("version_rows", pa.int64()),
            ("base_rows", pa.int64()),
            ("delta_files", pa.int64()),
            ("has_stats", pa.bool_()),
            ("lsn_hi", pa.int64()),
        ]
    )
    return pa.Table.from_pylist(rows, schema=sch)


def history(lake_root: str, fs=None) -> pa.Table:
    """The committed transaction log as a table: txid, committed_at
    (epoch µs), rows_total, events_applied, merge_mode — time travel's
    table of contents."""
    _, m = _resolve(lake_root, None, fs)
    rows = []
    for rec in m.get("lineage", []):
        rows.append(
            {
                "txid": rec.get("txid"),
                "committed_at_us": int(rec.get("committed_at", 0)),
                "rows_total": int(rec.get("rows_total", 0)),
                "events_applied": int(rec.get("events_applied", 0)),
                "partitions_rewritten": int(rec.get("partitions_rewritten", 0)),
                "merge_mode": rec.get("merge_mode"),
                "seconds": float(rec.get("seconds", 0.0)),
            }
        )
    sch = pa.schema(
        [
            ("txid", pa.string()),
            ("committed_at_us", pa.int64()),
            ("rows_total", pa.int64()),
            ("events_applied", pa.int64()),
            ("partitions_rewritten", pa.int64()),
            ("merge_mode", pa.string()),
            ("seconds", pa.float64()),
        ]
    )
    return pa.Table.from_pylist(rows, schema=sch)


def column_range(
    lake_root: str,
    column: str,
    at_txid: str | None = None,
    key: str = "url",
    ts_col: str = "warc_ts",
    fs=None,
) -> dict:
    """Exact live-table min/max of one column, from metadata where the
    encoding permits.

    Numeric / timestamp bounds are recorded exactly, so on flat
    partitions the global range is a pure manifest fold (zero data
    I/O).  Three cases force a real (column-projected) scan, and the
    report says which partitions took it:

    * delta chains — a superseded version may hold the recorded
      extreme, so the union bound is not the live bound;
    * string columns with truncated bounds — the recorded min is <= the
      true min by construction (state/partstats.py), not equal;
    * partitions without stats (pre-stats manifests).

    Returns ``{"min", "max", "nulls", "from_stats", "scanned"}``; min /
    max are None for an all-null or empty table.  The
    ``SELECT min(c), max(c)`` that touches no data — the partner of
    ``count_rows`` and the probe a scan planner uses to pick
    partitioning cuts on a 100 TB table without reading it."""
    from ..state.partstats import rename_blocks_pruning
    from .replay import _MergedPartitionRead

    lake, m = _resolve(lake_root, at_txid, fs)
    schema = lake.schema(m)
    t = schema.field(column).type
    ticks = (
        pa.types.is_timestamp(t) or pa.types.is_date(t) or pa.types.is_time(t)
    )
    stats_usable = not rename_blocks_pruning(
        [(column, "==", None)], m.get("renames", [])
    )

    # stats fold runs in the ENCODED domain (int ticks for temporals);
    # scans return logical values — keep the accumulators apart and
    # decode the stats side before merging
    s_lo = s_hi = None  # encoded (stats) bounds
    d_lo = d_hi = None  # logical (scanned) bounds
    nulls = 0
    scan_pids = []
    rep = {"from_stats": 0, "scanned": 0}
    for pid, meta in m["partitions"].items():
        chain = meta.get("deltas")
        ent = (meta.get("stats") or {}).get(column)
        rows = int(meta.get("rows", 0)) + sum(
            int(d.get("rows", 0)) for d in chain or []
        )
        if rows == 0:
            rep["from_stats"] += 1
            continue
        if (
            stats_usable
            and not chain
            and ent is not None
            and not ent.get("trunc")
            and ("min" not in ent or "max" in ent)
        ):
            nulls += int(ent.get("nulls", 0))
            if "min" in ent:
                s_lo = ent["min"] if s_lo is None else min(s_lo, ent["min"])
                s_hi = ent["max"] if s_hi is None else max(s_hi, ent["max"])
            rep["from_stats"] += 1
            continue
        scan_pids.append(pid)
    if scan_pids:
        rep["scanned"] = len(scan_pids)
        import ray.data

        items = [
            {"pid": int(pid), "meta": json.dumps(m["partitions"][pid])}
            for pid in sorted(scan_pids, key=int)
        ]
        ds = ray.data.from_items(items, override_num_blocks=len(items))
        out = ds.map_batches(
            _MergedPartitionRead(
                lake_root, schema, key, ts_col, columns=[column],
                fs_spec=lake.fs.spec, renames=m.get("renames", []),
            ),
            batch_format="pyarrow",
            batch_size=None,
        )

        def partial(tb: pa.Table) -> pa.Table:
            col = tb.column(column)
            mm = pc.min_max(col)
            return pa.table(
                {
                    "lo": pa.array([mm["min"].as_py()]),
                    "hi": pa.array([mm["max"].as_py()]),
                    "nulls": pa.array([col.null_count], pa.int64()),
                }
            )

        for r in out.map_batches(partial, batch_format="pyarrow").take_all():
            nulls += int(r["nulls"])
            if r["lo"] is not None:
                d_lo = r["lo"] if d_lo is None else min(d_lo, r["lo"])
            if r["hi"] is not None:
                d_hi = r["hi"] if d_hi is None else max(d_hi, r["hi"])
    if s_lo is not None and ticks:
        s_lo = pa.scalar(s_lo, t).as_py()
        s_hi = pa.scalar(s_hi, t).as_py()
    lo = s_lo if d_lo is None else (d_lo if s_lo is None else min(s_lo, d_lo))
    hi = s_hi if d_hi is None else (d_hi if s_hi is None else max(s_hi, d_hi))
    rep.update({"min": lo, "max": hi, "nulls": int(nulls)})
    return rep
