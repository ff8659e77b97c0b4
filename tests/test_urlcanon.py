"""URL canonicalization + windowed first-seen: edge cases beyond the
sweep's DuckDB differential."""

import pyarrow as pa

from etl_ray.stages.urlops import canonicalize_urls


def _canon(urls):
    t = pa.table({"url": pa.array(urls, pa.string())})
    return canonicalize_urls(t).column("url_canon").to_pylist()


def test_canonicalize_core_shapes():
    got = _canon(
        [
            "HTTP://WWW.Example.COM:80/Path?utm_source=x&id=3#frag",
            "https://Site.example.ORG:443/a?utm_medium=z",
            "https://ok.example.net/a?b=1&c=2",
            "http://Host.example.com:8080/q?utm_x=1&k=2",
            "https://e.example.io/?utm_source=only",
        ]
    )
    assert got == [
        "http://www.example.com/Path?id=3",
        "https://site.example.org/a",
        "https://ok.example.net/a?b=1&c=2",
        "http://host.example.com:8080/q?k=2",
        "https://e.example.io/",
    ]


def test_canonicalize_passthrough_and_idempotence():
    junk = ["not a url", "", "ftp://MIXED.Case.Host/x"]
    got = _canon(junk)
    assert got[0] == "not a url"
    assert got[1] == ""
    assert got[2] == "ftp://mixed.case.host/x"  # scheme+host lowering is generic
    # canonicalization is idempotent: canon(canon(x)) == canon(x)
    assert _canon(got) == got


def test_canonicalize_only_leading_utm():
    # every param is utm -> query gone entirely, no dangling separators
    assert _canon(["http://a.example.com/p?utm_a=1&utm_b=2"]) == [
        "http://a.example.com/p"
    ]


def test_first_event_per_user_hour_matches_pandas(ray_session):
    import pandas as pd

    from etl_ray.pipelines.queries import first_event_per_user_hour

    got = first_event_per_user_hour("/root/testdata/sf0.001").to_pandas()
    ev = pd.read_parquet(
        "/root/testdata/sf0.001/events.parquet",
        columns=["event_id", "user_id", "ts"],
    )
    ev["hour"] = ev["ts"].astype("int64") // 3_600_000_000
    want = (
        ev.sort_values(["user_id", "hour", "ts", "event_id"])
        .groupby(["user_id", "hour"], as_index=False)
        .first()[["user_id", "hour", "event_id"]]
    )
    g = got.sort_values(["user_id", "hour"]).reset_index(drop=True)
    w = want.sort_values(["user_id", "hour"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g[["user_id", "hour", "event_id"]], w, check_dtype=False
    )
