"""Incremental view maintenance: keep an aggregate VIEW of the lake
current by applying signed deltas instead of rescanning the table.

The flagship consumer of ``diff.table_delta``: a materialized per-host
rollup (``host, n_pages, text_chars``) over the replayed pages lake.
``build_view`` does one full scan at a snapshot; every subsequent
``refresh_view`` costs O(rewritten partitions) + O(view rows) — at
100 TB the table rescan is the thing you can never afford per refresh,
while the view (one row per host) is millions of rows, not billions.

Correctness rests on the retraction algebra: count and sum are
commutative-group aggregates, so applying (+new, -old) signed
contributions in ANY order yields exactly the full recompute — the
driver oracle (`incremental_domain_stats`) checks the incrementally
maintained view value-for-value against a full SQL recompute at head.

Scale shape follows the repo's bounded-shuffle rule: per-batch partial
aggregation (dictionary-encode + bincount at C speed) -> shuffle only
(bucket, host, partial) rows on 256 hash buckets -> vectorized in-bucket
sum.  The stored view is plain Parquet + an atomically swapped
``VIEW.json`` recording the lake txid it is consistent with; a crashed
refresh leaves the previous view intact (same manifest discipline as
`state/manifest.py`).

The reference has no analogue (it re-reads ClickHouse tables per query);
this is the operation its downstream consumers would actually need.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..stages.hashutil import hash_bucket
from ..stages.urlops import add_url_parts
from ..state.manifest import LakeTable

_VIEW_SCHEMA = pa.schema(
    [("host", pa.string()), ("n_pages", pa.int64()), ("text_chars", pa.int64())]
)
_NUM_BUCKETS = 256


def _partial(t: pa.Table, signed: bool) -> pa.Table:
    """Per-batch partial: (bucket, host, n_pages, text_chars).  With
    ``signed`` the batch carries a ``sign`` column (retraction stream);
    without, every row is one live page (+1)."""
    hosts = add_url_parts(t.select(["url"]), "url").column("host")
    chars = pc.fill_null(pc.utf8_length(t.column("text")), 0).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    sign = (
        t.column("sign").to_numpy(zero_copy_only=False).astype(np.int64)
        if signed
        else np.ones(t.num_rows, np.int64)
    )
    arr = hosts.combine_chunks().dictionary_encode()
    idx = arr.indices.to_numpy(zero_copy_only=False)
    valid = ~np.isnan(idx) if idx.dtype.kind == "f" else np.ones(len(idx), bool)
    idx = idx[valid].astype(np.int64)
    n = len(arr.dictionary)
    pages = np.bincount(idx, weights=sign[valid], minlength=n).astype(np.int64)
    tchars = np.bincount(idx, weights=(sign * chars)[valid], minlength=n).astype(
        np.int64
    )
    out = pa.table(
        {
            "host": arr.dictionary,
            "n_pages": pa.array(pages, pa.int64()),
            "text_chars": pa.array(tchars, pa.int64()),
        }
    )
    return out.append_column("bucket", hash_bucket(out.column("host"), _NUM_BUCKETS))


def _sum_bucket(g: pa.Table) -> pa.Table:
    arr = g.column("host").combine_chunks().dictionary_encode()
    idx = arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(arr.dictionary)
    pages = np.bincount(
        idx, weights=g.column("n_pages").to_numpy(zero_copy_only=False), minlength=n
    ).astype(np.int64)
    chars = np.bincount(
        idx, weights=g.column("text_chars").to_numpy(zero_copy_only=False), minlength=n
    ).astype(np.int64)
    keep = pages > 0  # a host whose last page was deleted leaves the view
    return pa.table(
        {
            "host": arr.dictionary.filter(pa.array(keep)),
            "n_pages": pa.array(pages[keep], pa.int64()),
            "text_chars": pa.array(chars[keep], pa.int64()),
        }
    )


def _reduce(parts: ray.data.Dataset) -> ray.data.Dataset:
    return parts.groupby("bucket").map_groups(
        _sum_bucket, batch_format="pyarrow"
    )


def _view_head(fs, view_root: str) -> tuple[int, dict] | None:
    """Highest committed (seq, meta) in the view commit log; falls back
    to the VIEW.json pointer for pre-commit-log view dirs (seq 0)."""
    cdir = os.path.join(view_root, "commits")
    if fs.exists(cdir):
        seqs = [
            int(n[:-5])
            for n in fs.listdir(cdir)
            if n.endswith(".json") and n[:-5].isdigit()
        ]
        if seqs:
            s = max(seqs)
            return s, fs.read_json(os.path.join(cdir, f"{s:09d}.json"))
    meta_path = os.path.join(view_root, "VIEW.json")
    if fs.exists(meta_path):
        meta = fs.read_json(meta_path)
        return int(meta.get("seq", 0)), meta
    return None


def _view_file(view_root: str) -> tuple[str, str] | None:
    from ..state.fs import resolve

    head = _view_head(resolve(None), view_root)
    if head is None:
        return None
    meta = head[1]
    return os.path.join(view_root, meta["file"]), meta["txid"]


_NO_EXPECT = object()  # sentinel: publish unconditionally (full rebuild)


def _publish(
    view_root: str, ds: ray.data.Dataset, txid: str,
    expect_base=_NO_EXPECT,
) -> dict:
    """Commit a new view snapshot via conditional put.  ``expect_base``
    (a lake txid or None for "no view yet") guards incremental
    refreshes: the rows being published were derived FROM that base, so
    if another refresher advanced the head first, this publish must lose
    — it raises CommitConflict and the caller re-runs against the new
    head.  ``build_view`` passes no expectation (a full rebuild is valid
    on top of anything).  Parquet goes to a writer-unique dir first; the
    put decides which dir the view points at, so a losing writer's files
    are orphan garbage, never mixed into the winning snapshot."""
    from ..state.fs import resolve
    from ..state.manifest import CommitConflict

    fs = resolve(None)
    fs.makedirs(view_root)
    cdir = os.path.join(view_root, "commits")
    fs.makedirs(cdir)
    head = _view_head(fs, view_root)
    if expect_base is not _NO_EXPECT:
        head_txid = head[1]["txid"] if head else None
        if head_txid != expect_base:
            raise CommitConflict(
                f"view at {view_root} moved to {head_txid} (expected "
                f"{expect_base}); re-run the refresh against the new head"
            )
    seq = (head[0] + 1) if head else 1
    rel = f"view-{txid}-w{os.getpid()}"
    ds.write_parquet(os.path.join(view_root, rel))
    meta = {"txid": txid, "file": rel, "seq": seq}
    try:
        fs.create_exclusive_json(os.path.join(cdir, f"{seq:09d}.json"), meta)
    except FileExistsError:
        raise CommitConflict(
            f"view seq {seq} at {view_root} was committed by another "
            "writer; re-run the refresh against the new head"
        ) from None
    fs.write_json_atomic(os.path.join(view_root, "VIEW.json"), meta)
    return meta


def build_view(view_root: str, lake_root: str, at_txid: str | None = None) -> dict:
    """Full-scan build of the per-host stats view at a lake snapshot."""
    from .replay import read_table

    txid = at_txid or LakeTable(lake_root).read_manifest()["txid"]
    live = read_table(lake_root, at_txid=txid, columns=["url", "text"])
    parts = live.map_batches(
        lambda t: _partial(t.select(["url", "text"]), signed=False),
        batch_format="pyarrow",
    )
    return _publish(view_root, _reduce(parts), txid)


def refresh_view(view_root: str, lake_root: str, to_txid: str | None = None) -> dict:
    """Advance the stored view to ``to_txid`` by summing the signed
    delta stream with the stored rows — no table rescan.  No-op (and no
    rewrite) when the view is already at ``to_txid``."""
    from .diff import table_delta

    cur = _view_file(view_root)
    if cur is None:
        return build_view(view_root, lake_root, to_txid)
    cur_file, cur_txid = cur
    to_txid = to_txid or LakeTable(lake_root).read_manifest()["txid"]
    if to_txid == cur_txid:
        return {"txid": cur_txid, "file": os.path.basename(cur_file), "noop": True}

    delta = table_delta(lake_root, cur_txid, to_txid, value_cols=("text",))
    delta_parts = delta.map_batches(
        lambda t: _partial(t, signed=True), batch_format="pyarrow"
    )
    stored = ray.data.read_parquet(cur_file).map_batches(
        lambda t: t.append_column(
            "bucket", hash_bucket(t.column("host").combine_chunks(), _NUM_BUCKETS)
        ),
        batch_format="pyarrow",
    )
    return _publish(
        view_root, _reduce(stored.union(delta_parts)), to_txid,
        expect_base=cur_txid,
    )


def read_view(view_root: str) -> pa.Table:
    cur = _view_file(view_root)
    if cur is None:
        return _VIEW_SCHEMA.empty_table()
    ds = ray.data.read_parquet(cur[0])
    tbl = pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow")]
        or [_VIEW_SCHEMA.empty_table()]
    )
    cols = [c for c in tbl.column_names if c != "bucket"]
    return tbl.select(cols)
