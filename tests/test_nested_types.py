"""Nested Arrow types (list<float32> embeddings, struct metadata)
through the full CDC path: bootstrap -> replay (rewrite AND delta
modes) -> LWW state -> point lookup.  The merge/read machinery must be
type-agnostic — multimodal tables carry typed metadata structs and
embedding vectors next to binary payloads (SURVEY §2 multimodal axis).
"""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from etl_ray.config import TableSpec

_EMB = pa.list_(pa.float32())
_META = pa.struct([("w", pa.int32()), ("h", pa.int32()), ("fmt", pa.string())])


def _schema():
    return pa.schema(
        [
            ("item_id", pa.string()),
            ("ts", pa.timestamp("us")),
            ("embedding", _EMB),
            ("meta", _META),
        ]
    )


def _wal_schema():
    return pa.schema(
        [("lsn", pa.int64()), ("op", pa.string())]
        + list(_schema())
        + [("segment", pa.string())]
    )


def _mk_segment(path, rows):
    tbl = pa.table(
        {
            "lsn": pa.array([r["lsn"] for r in rows], pa.int64()),
            "op": pa.array([r["op"] for r in rows], pa.string()),
            "item_id": pa.array([r["item_id"] for r in rows], pa.string()),
            "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
            "embedding": pa.array([r.get("embedding") for r in rows], _EMB),
            "meta": pa.array([r.get("meta") for r in rows], _META),
            "segment": pa.array([r["segment"] for r in rows], pa.string()),
        },
        schema=_wal_schema(),
    )
    pq.write_table(tbl, path)


def _spec() -> TableSpec:
    return TableSpec(
        name="items",
        key="item_id",
        ts_col="ts",
        schema_v0=_schema(),
        derive_text=False,
    )


def _base(path):
    pq.write_table(
        pa.table(
            {
                "item_id": pa.array(["a", "b"], pa.string()),
                "ts": pa.array([10, 10], pa.timestamp("us")),
                "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]], _EMB),
                "meta": pa.array(
                    [{"w": 8, "h": 8, "fmt": "png"}, {"w": 4, "h": 4, "fmt": "png"}],
                    _META,
                ),
            },
            schema=_schema(),
        ),
        path,
    )


def _wal(wal_dir):
    os.makedirs(wal_dir, exist_ok=True)
    _mk_segment(
        os.path.join(wal_dir, "seg-00000.parquet"),
        [
            dict(lsn=1, op="update", item_id="a", ts=20,
                 embedding=[0.5, 0.5, 0.5], meta={"w": 16, "h": 16, "fmt": "webp"},
                 segment="seg-00000"),
            dict(lsn=2, op="insert", item_id="c", ts=15,
                 embedding=[9.0], meta={"w": 1, "h": 1, "fmt": "wav"},
                 segment="seg-00000"),
        ],
    )
    _mk_segment(
        os.path.join(wal_dir, "seg-00001.parquet"),
        [
            dict(lsn=3, op="delete", item_id="b", ts=30,
                 embedding=None, meta=None, segment="seg-00001"),
            # late (older-ts) update for a: must LOSE under LWW (ts, lsn)
            dict(lsn=4, op="update", item_id="a", ts=12,
                 embedding=[-1.0], meta={"w": 0, "h": 0, "fmt": "x"},
                 segment="seg-00001"),
        ],
    )


def _expected():
    return {
        "a": ([0.5, 0.5, 0.5], {"w": 16, "h": 16, "fmt": "webp"}),
        "c": ([9.0], {"w": 1, "h": 1, "fmt": "wav"}),
    }


import pytest


@pytest.mark.parametrize("mode", ["rewrite", "delta"])
def test_nested_columns_through_cdc(ray_session, tmp_path, mode):
    from etl_ray.pipelines.replay import (
        bootstrap_lake, get_rows, read_table_arrow, replay,
    )

    base = str(tmp_path / "base.parquet")
    wal = str(tmp_path / "wal")
    _base(base)
    _wal(wal)

    root = str(tmp_path / f"lake_{mode}" / "items")
    spec = _spec()
    bootstrap_lake(root, base, num_partitions=4, spec=spec)
    stats = replay(root, wal, spec=spec, merge_mode=mode)
    assert stats.events_applied == 4

    got = read_table_arrow(root, key="item_id", ts_col="ts")
    exp = _expected()
    assert got.num_rows == len(exp)
    for i in range(got.num_rows):
        iid = got["item_id"][i].as_py()
        emb, meta = exp[iid]
        # float32 roundtrip: compare at float32 precision
        assert [round(x, 5) for x in got["embedding"][i].as_py()] == emb
        assert got["meta"][i].as_py() == meta

    # nested types through the point-lookup path too
    hit = get_rows(root, ["a"], key="item_id", ts_col="ts")
    assert hit.num_rows == 1
    assert hit["meta"][0].as_py() == exp["a"][1]
    assert get_rows(root, ["b"], key="item_id", ts_col="ts").num_rows == 0
