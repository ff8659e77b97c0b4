import pyarrow.parquet as pq

from etl_ray.gen import WAL_SCHEMA_V0, WAL_SCHEMA_V1
from etl_ray.oracle import replay_oracle


def test_wal_is_deterministic(small_wal, tmp_path):
    from etl_ray.gen import generate_dataset

    again = generate_dataset(str(tmp_path / "again"), small_wal["spec"])
    for a, b in zip(small_wal["segments"], again["segments"]):
        ta, tb = pq.read_table(a), pq.read_table(b)
        assert ta.equals(tb), f"{a} differs"


def test_wal_schema_evolution_fixture(small_wal):
    spec = small_wal["spec"]
    v1 = spec.resolved_v1_start()
    for i, seg in enumerate(small_wal["segments"][: spec.n_segments]):
        sch = pq.read_schema(seg)
        expected = WAL_SCHEMA_V1 if i >= v1 else WAL_SCHEMA_V0
        assert sch.equals(expected), f"segment {i}"


def test_wal_adversarial_fixtures(small_wal):
    import pyarrow as pa

    segs = [pq.read_table(s) for s in small_wal["segments"]]
    full = pa.concat_tables(segs, promote_options="default")
    lsns = full.column("lsn").to_pylist()
    # redelivered segment => duplicate lsns present
    assert len(lsns) != len(set(lsns))
    # exact warc_ts ties exist
    ts = full.column("warc_ts").to_pylist()
    assert len(ts) != len(set(ts))
    ops = set(full.column("op").to_pylist())
    assert ops == {"insert", "update", "delete"}


def test_oracle_idempotent_under_redelivery(small_wal):
    segs = small_wal["segments"]
    once = replay_oracle(small_wal["base"], segs[:-1])  # without redelivered seg
    twice = replay_oracle(small_wal["base"], segs)  # with duplicate of seg 0
    assert once.equals(twice)


def test_oracle_lww_tiebreak():
    """Hand-computed golden record (FIXTURES.md F3 analogue)."""
    import pyarrow as pa

    from etl_ray.extract import extract_text
    from etl_ray.gen import WAL_SCHEMA_V1

    url = "https://x.example.com/p/0"
    h1, h2, h3 = b"<p>one</p>", b"<p>two</p>", b"<p>three</p>"
    tbl = pa.table(
        {
            "lsn": pa.array([1, 2, 3, 4], pa.int64()),
            "op": ["insert", "update", "update", "delete"],
            "url": [url] * 4,
            # lsn2 and lsn3 tie on warc_ts -> lsn3 wins; delete at older ts loses
            "warc_ts": pa.array([100, 200, 200, 150], pa.timestamp("us")),
            "html": pa.array([h1, h2, h3, None], pa.binary()),
            "lang": ["en", "en", "de", None],
        },
        schema=WAL_SCHEMA_V1,
    )
    import pyarrow.parquet as pq_
    import tempfile, os

    d = tempfile.mkdtemp()
    p = os.path.join(d, "seg-00000.parquet")
    pq_.write_table(tbl, p)
    out = replay_oracle(None, [p])
    assert out.num_rows == 1
    row = out.to_pylist()[0]
    assert row["html"] == h3
    assert row["lang"] == "de"
    assert row["text"] == extract_text(h3) == "three"


def test_oracle_delete_wins_when_latest(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from etl_ray.gen import WAL_SCHEMA_V0

    url = "https://x.example.com/p/1"
    tbl = pa.table(
        {
            "lsn": pa.array([1, 2], pa.int64()),
            "op": ["insert", "delete"],
            "url": [url, url],
            "warc_ts": pa.array([100, 300], pa.timestamp("us")),
            "html": pa.array([b"<p>a</p>", None], pa.binary()),
        },
        schema=WAL_SCHEMA_V0,
    )
    p = str(tmp_path / "seg.parquet")
    pq_.write_table(tbl, p)
    assert replay_oracle(None, [p]).num_rows == 0
