"""FIXTURES.md F4: each scalar normalize transform vs expected output."""

import pyarrow as pa

from etl_ray.stages import normalize as N


def _chains_fixture() -> pa.Table:
    """The golden chain event (FIXTURES.md F3 / reference
    tests/e2e/mock_data_producer.py:11-42)."""
    return pa.table(
        {
            "chainId": ["test-chain-001"],
            "chainName": ["TestChain Alpha"],
            "isTestnet": [True],
            "private": pa.array([None], pa.bool_()),
            "enabledFeatures": pa.array([["nftIndexing"]], pa.list_(pa.string())),
            "networkToken": pa.array(
                [{"name": "Wrapped AVAX", "symbol": "WAVAX", "decimals": 18}],
                pa.struct([("name", pa.string()), ("symbol", pa.string()), ("decimals", pa.int64())]),
            ),
        }
    )


def test_project_rename_cast_nested_const():
    t = _chains_fixture()
    out = N.project(
        t,
        [
            ("chainId", "chain_id", pa.string()),
            ("chainName", "chain_name", None),
            ("networkToken.symbol", "token_symbol", pa.string()),
            (("const", 0), "removed", pa.uint8()),
        ],
    )
    assert out.column_names == ["chain_id", "chain_name", "token_symbol", "removed"]
    row = out.to_pylist()[0]
    assert row == {
        "chain_id": "test-chain-001",
        "chain_name": "TestChain Alpha",
        "token_symbol": "WAVAX",
        "removed": 0,
    }


def test_flatten_and_rebuild_struct():
    t = _chains_fixture()
    flat = N.flatten_struct(t, "networkToken", prefix="token_")
    assert "token_symbol" in flat.column_names and "networkToken" not in flat.column_names
    rebuilt = N.rebuild_struct(flat, ["token_name", "token_symbol", "token_decimals"], "networkToken")
    assert rebuilt.column("networkToken").to_pylist()[0]["token_symbol"] == "WAVAX"


def test_index_list_column_out_of_range_null():
    t = pa.table({"topics": pa.array([["a", "b"], ["c"]], pa.list_(pa.string()))})
    out = N.index_list_column(t, "topics", 4, name_fmt="topic{i}")
    assert out.column_names == ["topic0", "topic1", "topic2", "topic3"]
    assert out.to_pylist()[1] == {"topic0": "c", "topic1": None, "topic2": None, "topic3": None}


def test_list_to_json_null_safe():
    t = pa.table({"enabledFeatures": pa.array([["x"], None, []], pa.list_(pa.string()))})
    out = N.list_to_json(t, "enabledFeatures")
    assert out.column("enabledFeatures").to_pylist() == ['["x"]', "[]", "[]"]


def test_bool_to_uint8_null_is_zero():
    t = _chains_fixture()
    out = N.bool_to_uint8(t, ["isTestnet", "private"])
    assert out.column("isTestnet").to_pylist() == [1]
    assert out.column("private").to_pylist() == [0]
    assert out.column("isTestnet").type == pa.uint8()


def test_unwrap_envelope():
    t = pa.table(
        {"block": pa.array([{"height": 7, "hash": "0xab"}],
                           pa.struct([("height", pa.int64()), ("hash", pa.string())]))}
    )
    out = N.unwrap_envelope(t, "block")
    assert out.to_pylist() == [{"height": 7, "hash": "0xab"}]


def test_strip_filename_tag():
    assert (
        N.strip_filename_tag("avalanche_blocks_01_02_2024_10_11_12.parquet")
        == "avalanche_blocks"
    )
    assert N.strip_filename_tag("plain.parquet") == "plain"


def test_add_provenance_and_surrogate_id():
    t = pa.table({"lsn": pa.array([1, 2], pa.int64()), "url": ["a", "b"]})
    out = N.add_provenance(t, "/x/wal/seg-00001.parquet")
    assert out.column("source_tag").to_pylist() == ["seg-00001", "seg-00001"]
    out = N.add_surrogate_id(out, ["source_tag", "lsn"])
    ids = out.column("id").to_pylist()
    assert len(set(ids)) == 2
    # deterministic: same inputs -> same ids
    again = N.add_surrogate_id(N.add_provenance(t, "/y/seg-00001.parquet"), ["source_tag", "lsn"])
    assert again.column("id").to_pylist() == ids


def test_to_json_envelope():
    t = pa.table({"a": [1], "b": ["x"]})
    out = N.to_json_envelope(t, tag="working_data", ingestion_ts_us=123_000_000)
    row = out.to_pylist()[0]
    assert row["tag"] == "working_data"
    assert row["data_row"] == '{"a":1,"b":"x"}'


def test_derived_columns():
    import pyarrow.compute as pc

    t = pa.table({"txCount": pa.array([10], pa.int64())})
    out = N.add_derived(t, "tps_avg", lambda b: pc.cast(b.column("txCount"), pa.float32()))
    assert out.column("tps_avg").type == pa.float32()


def test_project_decimal_casts():
    """Decimal cast path (SURVEY §1.2): the reference casts amounts to
    decimal(38,0) (`src/pipeline/core/spark.py:431`) and DDLs UInt256
    (`src/pipeline/sql/create_tables.sql:47,63`) — decimal128/256
    projections cover both."""
    import pyarrow as pa

    from etl_ray.stages.normalize import project

    tbl = pa.table(
        {
            "amount": pa.array([10**18, 25, 0], pa.int64()),
            "price": pa.array([1.25, 2.5, 0.0], pa.float64()),
        }
    )
    out = project(
        tbl,
        [
            ("amount", "amount_dec", pa.decimal128(38, 0)),
            ("amount", "amount_wide", pa.decimal256(76, 0)),
            ("price", "price_dec", pa.decimal128(18, 2)),
        ],
    )
    assert out.schema.types == [pa.decimal128(38, 0), pa.decimal256(76, 0), pa.decimal128(18, 2)]
    assert out.column("amount_dec").to_pylist()[0] == 10**18
    assert str(out.column("price_dec").to_pylist()[0]) == "1.25"
