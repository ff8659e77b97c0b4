"""Secondary index maintained UNDER CDC: host -> {partition ids holding
live pages of that host}, with live counts.

The lake is hash-partitioned by url, so a "read everything for host X"
query has no pruning handle — every partition may hold the host's urls
and a naive serve scans all of them.  This index keeps per-(host, pid)
LIVE-row counts, built once with a full scan and then advanced from the
SIGNED delta stream (``diff.table_delta``) in O(rewritten partitions)
per refresh — the same commutative-group retraction algebra as the
per-host stats view (``pipelines/views.py``), extended with the
partition dimension so it can answer "WHICH partitions must a host read
touch".  A (host, pid) whose count falls to zero leaves the index, so
serving never reads a partition that holds only the host's tombstones.

Serving (:func:`read_hosts`) unions the index's pids for the requested
hosts and loads ONLY those partitions (base ∪ delta chain, LWW-reduced
— the same loader the point-lookup path uses), then filters rows to the
hosts.  Cost is O(partitions that actually hold the hosts), not
O(num_partitions): on a 256-partition lake a single-host read touches
however many partitions that host's urls hash to — for small hosts a
handful, never the full ring.

The reference has no secondary-index story at all (every ClickHouse
query rescans); this is the serving-side structure its consumers would
need at 10^10 rows.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..stages.hashutil import hash_bucket
from ..stages.partition import url_pid
from ..stages.urlops import add_url_parts
from ..state.manifest import LakeTable

_IDX_SCHEMA = pa.schema(
    [("host", pa.string()), ("pid", pa.int32()), ("n", pa.int64())]
)
_NUM_BUCKETS = 256


def _partial(t: pa.Table, num_partitions: int, signed: bool) -> pa.Table:
    """Per-batch (bucket, host, pid, n) partial counts.  pid is
    recomputed from the url (crc32 % P — the table's own partitioner),
    so delta rows need no extra columns."""
    urls = t.column("url")
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    hosts = add_url_parts(t.select(["url"]), "url").column("host").combine_chunks()
    pids = np.fromiter(
        (url_pid(u, num_partitions) for u in urls.to_pylist()),
        np.int64,
        len(urls),
    )
    sign = (
        t.column("sign").to_numpy(zero_copy_only=False).astype(np.int64)
        if signed
        else np.ones(t.num_rows, np.int64)
    )
    enc = hosts.dictionary_encode()
    idx = enc.indices.to_numpy(zero_copy_only=False)
    valid = ~np.isnan(idx) if idx.dtype.kind == "f" else np.ones(len(idx), bool)
    idx = idx.astype(np.int64)
    nd = len(enc.dictionary)
    combined = idx[valid] * num_partitions + pids[valid]
    cnt = np.bincount(
        combined, weights=sign[valid], minlength=nd * num_partitions
    ).astype(np.int64)
    nz = np.nonzero(cnt)[0]
    out = pa.table(
        {
            "host": enc.dictionary.take(pa.array(nz // num_partitions)),
            "pid": pa.array((nz % num_partitions).astype(np.int32), pa.int32()),
            "n": pa.array(cnt[nz], pa.int64()),
        }
    )
    return out.append_column("bucket", hash_bucket(out.column("host"), _NUM_BUCKETS))


def _sum_bucket(g: pa.Table) -> pa.Table:
    enc = g.column("host").combine_chunks().dictionary_encode()
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    pid = g.column("pid").to_numpy(zero_copy_only=False).astype(np.int64)
    pmax = int(pid.max()) + 1 if len(pid) else 1
    combined = idx * pmax + pid
    cnt = np.bincount(
        combined,
        weights=g.column("n").to_numpy(zero_copy_only=False),
        minlength=len(enc.dictionary) * pmax,
    ).astype(np.int64)
    nz = np.nonzero(cnt > 0)[0]  # zero/negative-count cells leave the index
    return pa.table(
        {
            "host": enc.dictionary.take(pa.array(nz // pmax)),
            "pid": pa.array((nz % pmax).astype(np.int32), pa.int32()),
            "n": pa.array(cnt[nz], pa.int64()),
        }
    )


_sum_bucket.__name__ = "_sum_bucket"


def _idx_file(index_root: str) -> tuple[str, str] | None:
    from ..state.fs import resolve

    fs = resolve(None)
    meta_path = os.path.join(index_root, "INDEX.json")
    if not fs.exists(meta_path):
        return None
    meta = fs.read_json(meta_path)
    return os.path.join(index_root, meta["file"]), meta["txid"]


def _publish(index_root: str, ds: ray.data.Dataset, txid: str) -> dict:
    from ..state.fs import resolve

    fs = resolve(None)
    fs.makedirs(index_root)
    out_dir = os.path.join(index_root, f"idx-{txid}")
    ds.write_parquet(out_dir)
    meta = {"txid": txid, "file": f"idx-{txid}"}
    fs.write_json_atomic(os.path.join(index_root, "INDEX.json"), meta)
    return meta


def build_host_index(index_root: str, lake_root: str, at_txid: str | None = None) -> dict:
    """Full-scan build of the (host, pid, n) index at a lake snapshot."""
    from .replay import read_table

    lake = LakeTable(lake_root)
    m = lake.read_manifest()
    txid = at_txid or m["txid"]
    P = int(m["num_partitions"])
    live = read_table(lake_root, at_txid=txid, columns=["url"])
    parts = live.map_batches(
        lambda t: _partial(t, P, signed=False), batch_format="pyarrow"
    )
    reduced = parts.groupby("bucket").map_groups(_sum_bucket, batch_format="pyarrow")
    return _publish(index_root, reduced, txid)


def refresh_host_index(
    index_root: str, lake_root: str, to_txid: str | None = None
) -> dict:
    """Advance the index by summing the signed url delta stream with the
    stored (host, pid, n) rows — no table rescan."""
    from .diff import table_delta

    cur = _idx_file(index_root)
    if cur is None:
        return build_host_index(index_root, lake_root, to_txid)
    cur_file, cur_txid = cur
    m = LakeTable(lake_root).read_manifest()
    to_txid = to_txid or m["txid"]
    if to_txid == cur_txid:
        return {"txid": cur_txid, "file": os.path.basename(cur_file), "noop": True}
    P = int(m["num_partitions"])

    delta = table_delta(lake_root, cur_txid, to_txid)
    delta_parts = delta.map_batches(
        lambda t: _partial(t, P, signed=True), batch_format="pyarrow"
    )
    stored = ray.data.read_parquet(cur_file).map_batches(
        lambda t: t.append_column(
            "bucket", hash_bucket(t.column("host").combine_chunks(), _NUM_BUCKETS)
        ),
        batch_format="pyarrow",
    )
    reduced = stored.union(delta_parts).groupby("bucket").map_groups(
        _sum_bucket, batch_format="pyarrow"
    )
    return _publish(index_root, reduced, to_txid)


def read_index(index_root: str) -> pa.Table:
    cur = _idx_file(index_root)
    if cur is None:
        return _IDX_SCHEMA.empty_table()
    ds = ray.data.read_parquet(cur[0])
    tbl = pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow")]
        or [_IDX_SCHEMA.empty_table()]
    )
    return tbl.select(["host", "pid", "n"])


def lookup_pids(index_root: str, hosts: list[str]) -> list[int]:
    """Partition ids holding any live page of the given hosts."""
    idx = read_index(index_root)
    want = pa.array(sorted(set(hosts)), pa.string())
    hit = idx.filter(pc.is_in(idx.column("host"), value_set=want))
    return sorted(set(hit.column("pid").to_pylist()))


def read_hosts(
    lake_root: str,
    index_root: str,
    hosts: list[str],
    columns: list[str] | None = None,
) -> tuple[pa.Table, int]:
    """All live rows of the given hosts, reading ONLY the partitions the
    index names.  Returns (rows, partitions_read) so callers (and tests)
    can see the pruning.  Served at the INDEX's txid — the consistent
    snapshot the counts describe."""
    from ..stages.merge import INTERNAL_COLS as _IC
    from ..stages.merge import load_partition_state

    cur = _idx_file(index_root)
    if cur is None:
        raise FileNotFoundError("index not built")
    _, txid = cur
    lake = LakeTable(lake_root)
    m = lake.manifest_at(txid)
    schema = lake.schema(m)
    pids = lookup_pids(index_root, hosts)
    want = pa.array(sorted(set(hosts)), pa.string())
    hits = []
    for pid in pids:
        meta = m["partitions"].get(str(pid))
        if meta is None:
            continue
        t = load_partition_state(lake_root, meta, schema, "url", "warc_ts")
        t = t.filter(pc.invert(t.column("_deleted")))
        h = add_url_parts(t.select(["url"]), "url").column("host").combine_chunks()
        t = t.filter(pc.is_in(h, value_set=want))
        t = t.drop_columns([c for c in _IC if c in t.column_names])
        if columns is not None:
            t = t.select(columns)
        hits.append(t)
    if not hits:
        base = schema if columns is None else pa.schema(
            [schema.field(c) for c in columns]
        )
        return base.empty_table(), 0
    out = pa.concat_tables(hits, promote_options="default")
    return (
        out.take(pc.sort_indices(out, sort_keys=[("url", "ascending")])),
        len(pids),
    )
