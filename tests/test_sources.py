"""Source/reader coverage: csv/json converters (S7), WAL helpers (S4)."""

import glob
import os

import pyarrow.parquet as pq


def test_csv_and_json_to_parquet(ray_session, tmp_path):
    from etl_ray.sources.readers import csv_to_parquet, json_to_parquet

    csv = tmp_path / "in.csv"
    csv.write_text("a,b\n1,x\n2,y\n")
    n = csv_to_parquet(str(csv), str(tmp_path / "csv_out"))
    assert n == 2
    import pyarrow as pa

    out = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(str(tmp_path / "csv_out" / "*.parquet")))]
    )
    assert sorted(out.column("a").to_pylist()) == [1, 2]

    js = tmp_path / "in.json"
    js.write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    n = json_to_parquet(str(js), str(tmp_path / "json_out"))
    assert n == 2


def test_wal_segment_helpers(small_wal):
    from etl_ray.sources.wal import list_segments, segment_lsn_range, segment_row_count

    segs = list_segments(small_wal["wal_dir"])
    assert segs == sorted(segs)
    assert len(segs) == len(small_wal["segments"])
    lo0, hi0 = segment_lsn_range(segs[0])
    assert lo0 == 1
    assert segment_row_count(segs[0]) == hi0 - lo0 + 1
    # redelivered tail duplicates segment 0's range
    lo_r, hi_r = segment_lsn_range(segs[-1])
    assert (lo_r, hi_r) == (lo0, hi0)


def test_written_parts_have_parquet_magic(ray_session, small_wal, tmp_path):
    """FIXTURES.md F6 — same assertion style as the reference
    (tests/test_kafka_consumer.py:58 in /root/reference)."""
    from etl_ray.pipelines.replay import bootstrap_lake, replay
    from etl_ray.state.manifest import LakeTable

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=4)
    replay(root, small_wal["wal_dir"])
    lake = LakeTable(root)
    files = lake.data_files()
    assert files
    for f in files:
        with open(f, "rb") as fh:
            assert fh.read(4) == b"PAR1"


def test_orc_and_feather_roundtrip(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.feather as feather
    import pyarrow.orc as orc
    import pyarrow.parquet as pq

    from etl_ray.sources.readers import feather_to_parquet, orc_to_parquet

    t = pa.table(
        {
            "id": pa.array(range(100), pa.int64()),
            "name": pa.array([f"n{i}" for i in range(100)], pa.string()),
            "score": pa.array([i * 0.5 for i in range(100)], pa.float64()),
        }
    )
    # two files each: the reader's parallelism unit is the file
    for i, sl in enumerate((t.slice(0, 60), t.slice(60))):
        orc.write_table(sl, str(tmp_path / f"part{i}.orc"))
        feather.write_feather(sl, str(tmp_path / f"part{i}.feather"))

    n = orc_to_parquet(
        [str(tmp_path / "part0.orc"), str(tmp_path / "part1.orc")],
        str(tmp_path / "from_orc"),
    )
    assert n == 100
    got = pq.read_table(str(tmp_path / "from_orc")).sort_by("id")
    assert got.equals(t)

    n = feather_to_parquet(
        [str(tmp_path / "part0.feather"), str(tmp_path / "part1.feather")],
        str(tmp_path / "from_feather"),
    )
    assert n == 100
    got = pq.read_table(str(tmp_path / "from_feather")).sort_by("id")
    assert got.equals(t)
