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
