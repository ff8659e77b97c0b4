"""stages/windows: tumbling/sliding/sessionize edge semantics."""

import numpy as np
import pyarrow as pa


def _events(rows):
    return pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_id": pa.array(list(range(len(rows))), pa.int64()),
            "v": pa.array([1] * len(rows), pa.int64()),
        }
    )


H = 3_600_000_000  # 1h in us


def test_tumbling_boundaries(ray_session):
    import ray.data

    from etl_ray.stages.windows import tumbling

    # ts exactly on a boundary belongs to the window it starts
    tbl = _events([(1, 0), (1, H - 1), (1, H), (1, 2 * H + 1)])
    out = tumbling(
        ray.data.from_arrow(tbl), ts_col="ts", value_col="v", out_col="w"
    ).take_all()
    got = {r["w"].timestamp() * 1e6 if hasattr(r["w"], "timestamp") else r["w"]: r["n_events"] for r in out}
    by_start = {int(k): v for k, v in got.items()}
    assert by_start == {0: 2, H: 1, 2 * H: 1}
    assert all(r["sum_v"] == r["n_events"] for r in out)


def test_sliding_each_event_in_width_over_step_windows(ray_session):
    import ray.data

    from etl_ray.stages.windows import sliding

    tbl = _events([(1, int(2.5 * H))])
    out = sliding(
        ray.data.from_arrow(tbl), ts_col="ts", width_us=2 * H, step_us=H
    ).take_all()
    starts = sorted(int(r["window_start"].timestamp() * 1e6) for r in out)
    assert starts == [H, 2 * H]  # windows [1h,3h) and [2h,4h)


def test_sessionize_gap_semantics(ray_session):
    import ray.data

    from etl_ray.stages.windows import sessionize

    gap = 1_800_000_000
    rows = [
        (7, 0),
        (7, gap),          # exactly gap -> SAME session (strictly greater splits)
        (7, 2 * gap + 1),  # gap exceeded -> new session
        (8, 5),            # other user -> own session
    ]
    out = sessionize(
        ray.data.from_arrow(_events(rows)), key_col="user_id", ts_col="ts",
        order_cols=("event_id",), gap_us=gap,
    ).take_all()
    sess = sorted(
        (r["user_id"], int(r["session_start"].timestamp() * 1e6), r["n_events"])
        for r in out
    )
    assert sess == [(7, 0, 2), (7, 2 * gap + 1, 1), (8, 5, 1)]


def test_sessionize_string_keys(ray_session):
    # a url/uuid-keyed stream must sessionize identically to int keys:
    # hash_bucket hashes string keys instead of requiring a uint64 cast
    import ray.data

    from etl_ray.stages.windows import sessionize

    gap = 1_800_000_000
    rows = [
        ("https://a.example/x", 0),
        ("https://a.example/x", gap),
        ("https://a.example/x", 2 * gap + 1),
        ("https://b.example/y", 5),
    ]
    tbl = pa.table(
        {
            "sess_key": pa.array([r[0] for r in rows], pa.string()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_id": pa.array(list(range(len(rows))), pa.int64()),
        }
    )
    out = sessionize(
        ray.data.from_arrow(tbl), key_col="sess_key", ts_col="ts",
        order_cols=("event_id",), gap_us=gap,
    ).take_all()
    sess = sorted(
        (r["sess_key"], int(r["session_start"].timestamp() * 1e6), r["n_events"])
        for r in out
    )
    assert sess == [
        ("https://a.example/x", 0, 2),
        ("https://a.example/x", 2 * gap + 1, 1),
        ("https://b.example/y", 5, 1),
    ]
