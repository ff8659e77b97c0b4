"""Additive schema evolution: `lang` appears mid-stream (FIXTURES.md F1/F2).

Bootstrap the lake WITHOUT `lang`; v0 segments keep schema_version 0;
the first transaction containing a v1 segment widens the schema, bumps
the version, and null-backfills pre-existing rows.
"""

import pyarrow as pa
import pytest

from etl_ray.gen import PAGES_SCHEMA
from etl_ray.oracle import replay_oracle
from etl_ray.state.schema_registry import SchemaEvolutionError, conform, evolve

SCHEMA_NO_LANG = pa.schema([f for f in PAGES_SCHEMA if f.name != "lang"])


def test_evolve_additive_and_reject_type_change():
    s0 = pa.schema([("a", pa.int64())])
    s1 = evolve(s0, pa.schema([("a", pa.int64()), ("b", pa.string())]))
    assert s1.names == ["a", "b"]
    with pytest.raises(SchemaEvolutionError):
        evolve(s0, pa.schema([("a", pa.string())]))


def test_conform_null_backfill_and_order():
    t = pa.table({"b": ["x"], "a": [1]})
    target = pa.schema([("a", pa.int64()), ("b", pa.string()), ("c", pa.float64())])
    out = conform(t, target)
    assert out.schema.equals(target)
    assert out.column("c").null_count == 1


def test_replay_schema_evolution_mid_stream(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines import replay as R
    from etl_ray.state.manifest import LakeTable

    spec = small_wal["spec"]
    v1 = spec.resolved_v1_start()
    segs = small_wal["segments"][: spec.n_segments]  # drop redelivered tail
    root = str(tmp_path / "lake" / "pages")

    # lake born without `lang`
    R.bootstrap_lake(root, None, num_partitions=8, schema=SCHEMA_NO_LANG)

    # tx 1: only v0 segments -> no evolution
    R.replay(root, small_wal["wal_dir"], segments=segs[:v1])
    m = LakeTable(root).read_manifest()
    assert m["schema_version"] == 0
    assert "lang" not in [f[0] for f in m["schema"]["fields"]]

    # tx 2: v1 segments arrive -> additive evolution + null backfill
    stats = R.replay(root, small_wal["wal_dir"], segments=segs)
    assert stats.schema_version == 1
    m2 = LakeTable(root).read_manifest()
    assert [f[0] for f in m2["schema"]["fields"]] == [
        "url", "warc_ts", "html", "text", "lang",
    ]

    engine = R.read_table_arrow(root)
    oracle = replay_oracle(None, segs)
    assert engine.schema.names == oracle.schema.names
    assert engine.equals(oracle)
    # rows whose winner predates v1 must have null lang; some v1 winners non-null
    langs = engine.column("lang")
    assert langs.null_count > 0
    assert langs.null_count < engine.num_rows


def test_time_travel_across_schema_evolution(ray_session, small_wal, tmp_path):
    """A snapshot taken BEFORE the schema widened must read back with the
    old (lang-less) schema; the current read carries the widened one."""
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay
    from etl_ray.state.manifest import LakeTable

    spec = small_wal["spec"]
    v1 = spec.resolved_v1_start()
    segs = small_wal["segments"][: spec.n_segments]  # drop redelivered tail

    root = str(tmp_path / "lake_se_tt" / "pages")
    bootstrap_lake(root, None, num_partitions=4, schema=SCHEMA_NO_LANG)
    replay(root, small_wal["wal_dir"], segments=segs[:v1])  # v0-only tx
    lake = LakeTable(root)
    pre_tx = lake.read_manifest()["txid"]
    assert lake.read_manifest()["schema_version"] == 0

    replay(root, small_wal["wal_dir"], segments=segs[v1:])  # brings `lang`
    assert lake.read_manifest()["schema_version"] == 1

    old = read_table_arrow(root, at_txid=pre_tx)
    assert "lang" not in old.column_names
    assert old.num_rows > 0
    now = read_table_arrow(root)
    assert "lang" in now.column_names
    # old snapshot rows equal the oracle over the v0 prefix (minus lang)
    oracle_v0 = replay_oracle(None, segs[:v1]).drop_columns(["lang"])
    assert old.equals(oracle_v0)


def test_widen_type_lattice():
    from etl_ray.state.schema_registry import widen_type

    assert widen_type(pa.int32(), pa.int64()) == pa.int64()
    assert widen_type(pa.int64(), pa.int32()) == pa.int64()  # direction-free
    assert widen_type(pa.uint16(), pa.uint32()) == pa.uint32()
    assert widen_type(pa.uint32(), pa.int32()) == pa.int64()  # mixed sign
    assert widen_type(pa.uint64(), pa.int64()) is None        # no exact home
    assert widen_type(pa.float32(), pa.float64()) == pa.float64()
    assert widen_type(pa.int32(), pa.float64()) == pa.float64()
    assert widen_type(pa.int64(), pa.float64()) is None       # 53-bit mantissa
    assert widen_type(pa.timestamp("s"), pa.timestamp("us")) == pa.timestamp("us")
    assert widen_type(pa.string(), pa.int64()) is None


def test_evolve_widens_types():
    s0 = pa.schema([("a", pa.int32()), ("t", pa.timestamp("ms"))])
    s1 = evolve(s0, pa.schema([("a", pa.int64()), ("t", pa.timestamp("us")), ("b", pa.string())]))
    assert s1.field("a").type == pa.int64()
    assert s1.field("t").type == pa.timestamp("us")
    assert s1.names == ["a", "t", "b"]
    # a NARROWER incoming keeps the current wide type (no flapping)
    s2 = evolve(s1, pa.schema([("a", pa.int32())]))
    assert s2.field("a").type == pa.int64()
    with pytest.raises(SchemaEvolutionError):
        evolve(s0, pa.schema([("a", pa.string())]))


def test_replay_type_widening_mid_stream(ray_session, tmp_path):
    """A custom table whose `score` column widens int32 -> int64 in a
    later WAL segment: stored rows cast up at merge, schema version
    bumps, final LWW state exact."""
    import pyarrow.parquet as pq

    from etl_ray.config import TableSpec
    from etl_ray.pipelines.replay import bootstrap_lake, replay
    from etl_ray.state.manifest import LakeTable

    def seg(path, rows, int_type):
        pq.write_table(
            pa.table(
                {
                    "lsn": pa.array([r[0] for r in rows], pa.int64()),
                    "op": pa.array([r[1] for r in rows], pa.string()),
                    "k": pa.array([r[2] for r in rows], pa.string()),
                    "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
                    "score": pa.array([r[4] for r in rows], int_type),
                }
            ),
            path,
        )

    spec = TableSpec(
        name="widen",
        key="k",
        ts_col="ts",
        schema_v0=pa.schema(
            [("k", pa.string()), ("ts", pa.timestamp("us")), ("score", pa.int32())]
        ),
        derive_text=False,
    )
    wal = tmp_path / "wal"
    wal.mkdir()
    seg(str(wal / "seg-00000.parquet"),
        [(1, "insert", "a", 100, 7), (2, "insert", "b", 100, 8)], pa.int32())
    # second segment carries int64 scores (upstream column widened),
    # including a value that does not fit int32
    seg(str(wal / "seg-00001.parquet"),
        [(3, "update", "a", 200, 2**40), (4, "insert", "c", 100, 9)], pa.int64())

    root = str(tmp_path / "lake" / "widen")
    bootstrap_lake(root, None, num_partitions=4, schema=spec.schema_v0)
    # apply segments as TWO transactions so the widening happens against
    # committed int32 state (the stored-file cast-up path)
    replay(root, str(wal), spec=spec, max_segments_per_tx=1)

    from etl_ray.pipelines.replay import read_table

    rows = {r["k"]: r["score"] for r in read_table(root).take_all()}
    assert rows == {"a": 2**40, "b": 8, "c": 9}
    m = LakeTable(root).read_manifest()
    assert m["schema_version"] == 1  # the widening bumped the version
    assert LakeTable(root).schema(m).field("score").type == pa.int64()


def test_replay_type_widening_delta_mode(ray_session, tmp_path):
    """Widening works identically when the second transaction lands as a
    merge-on-read DELTA (the chain-merging read casts old-type base
    files up)."""
    import pyarrow.parquet as pq

    from etl_ray.config import TableSpec
    from etl_ray.pipelines.replay import bootstrap_lake, read_table, replay
    from etl_ray.state.manifest import LakeTable

    def seg(path, rows, int_type):
        pq.write_table(
            pa.table(
                {
                    "lsn": pa.array([r[0] for r in rows], pa.int64()),
                    "op": pa.array([r[1] for r in rows], pa.string()),
                    "k": pa.array([r[2] for r in rows], pa.string()),
                    "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
                    "score": pa.array([r[4] for r in rows], int_type),
                }
            ),
            path,
        )

    spec = TableSpec(
        name="widen_delta",
        key="k",
        ts_col="ts",
        schema_v0=pa.schema(
            [("k", pa.string()), ("ts", pa.timestamp("us")), ("score", pa.int32())]
        ),
        derive_text=False,
    )
    wal = tmp_path / "wal_wd"
    wal.mkdir()
    seg(str(wal / "seg-00000.parquet"),
        [(1, "insert", "a", 100, 7), (2, "insert", "b", 100, 8)], pa.int32())
    seg(str(wal / "seg-00001.parquet"),
        [(3, "update", "a", 200, 2**40), (4, "insert", "c", 100, 9)], pa.int64())

    root = str(tmp_path / "lake" / "widen_delta")
    bootstrap_lake(root, None, num_partitions=4, schema=spec.schema_v0)
    # tx1 rewrite (int32 base), tx2 DELTA carrying the widened int64
    replay(root, str(wal), spec=spec,
           segments=[str(wal / "seg-00000.parquet")])
    replay(root, str(wal), spec=spec, merge_mode="delta",
           segments=[str(wal / "seg-00000.parquet"), str(wal / "seg-00001.parquet")])
    rows = {r["k"]: r["score"] for r in
            read_table(root, key="k", ts_col="ts").take_all()}
    assert rows == {"a": 2**40, "b": 8, "c": 9}
    m = LakeTable(root).read_manifest()
    assert LakeTable(root).schema(m).field("score").type == pa.int64()
