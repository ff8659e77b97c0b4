"""Text analysis + multimodal plumbing over /root/testdata documents."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs_tbl():
    return pq.read_table(DOCS)


def test_token_counter_matches_python_split(docs_tbl):
    from etl_ray.stages.text import TokenCounter

    out = TokenCounter()(docs_tbl.slice(0, 50))
    for row in out.to_pylist():
        assert row["n_tokens"] == len((row["text"] or "").split())
        assert row["n_bpe_est"] >= row["n_tokens"]  # subword >= word count


def test_quality_scorer_bounds(docs_tbl):
    from etl_ray.stages.text import QualityScorer

    out = QualityScorer()(docs_tbl.slice(0, 50))
    for row in out.to_pylist():
        assert 0 <= row["alpha_ratio"] <= 1
        assert 0 <= row["stop_ratio_en"] <= 1
        assert row["n_alpha"] + row["n_punct"] <= row["n_chars_counted"] + 1


def test_langid_deterministic_and_plausible(docs_tbl):
    from etl_ray.stages.text import LangId

    li = LangId()
    out1 = li(docs_tbl.slice(0, 100))
    out2 = li(docs_tbl.slice(0, 100))
    assert out1.column("lang_pred").equals(out2.column("lang_pred"))
    assert li.classify("the cat sat on the mat and it is that") == "en"
    assert li.classify("") == "und"


def test_fingerprinter_stability_and_shift(docs_tbl):
    from etl_ray.stages.text import Fingerprinter

    fp = Fingerprinter()
    t = "some document body here with enough bytes to roll over windows"
    assert fp.md5_norm("  X  ") == fp.md5_norm("x")
    # rolling-min hash is shift-invariant once content overlaps fully
    assert fp.rolling_min("PREFIX " + t) != 0
    assert fp.rolling_min(t) == fp.rolling_min(t)
    out = fp(docs_tbl.slice(0, 20))
    assert out.column("fp_md5").null_count == 0


def test_image_decoder_and_features_plumbing(ray_session):
    import ray.data

    from etl_ray.stages.multimodal import (
        FeatureExtractor,
        FrameSampler,
        ImageDecoder,
        make_fake_media_table,
    )

    tbl = make_fake_media_table(48)
    ds = ray.data.from_arrow(tbl)
    out = (
        ds.map_batches(ImageDecoder, batch_format="pyarrow", batch_size=16, concurrency=2)
        .map_batches(FeatureExtractor, batch_format="pyarrow", batch_size=16, concurrency=2)
        .map_batches(FrameSampler, batch_format="pyarrow", batch_size=16, concurrency=2)
    )
    got = out.take_all()
    assert len(got) == 48
    r = got[0]
    assert r["dec_channels"] == 3 and len(r["features"]) == 32
    assert all(f["length"] > 0 for f in r["frames"])
    # determinism across runs
    got2 = (
        ray.data.from_arrow(tbl)
        .map_batches(ImageDecoder, batch_format="pyarrow", batch_size=16, concurrency=2)
        .take_all()
    )
    assert [g["dec_height"] for g in got2] == [g["dec_height"] for g in got]


def test_real_decode_contract():
    """Round 4: fake=False is a REAL code path now — PNG payloads decode
    via the pure-stdlib codec; non-PNG payloads raise (strict mode)
    instead of fabricating dims.  The fake path still pseudo-decodes."""
    import numpy as np
    import pyarrow as pa

    from etl_ray.stages.codecs import encode_png
    from etl_ray.stages.multimodal import ImageDecoder

    png = encode_png(np.zeros((5, 7, 3), np.uint8))
    strict = ImageDecoder(fake=False)
    out = strict(pa.table({"payload": pa.array([png], pa.binary())}))
    assert out["dec_height"][0].as_py() == 5
    assert out["dec_width"][0].as_py() == 7
    with pytest.raises(ValueError, match="unsupported image format"):
        strict(pa.table({"payload": pa.array([b"JFIF garbage"], pa.binary())}))
    # fake path unchanged for opaque payloads
    fake = ImageDecoder(fake=True)
    t = fake(pa.table({"payload": pa.array([b"JFIF garbage"], pa.binary())}))
    assert t["dec_channels"][0].as_py() == 3


def test_unicode_whitespace_matches_duckdb_dialect():
    """Python regexes here are pinned to ASCII semantics so the DuckDB
    (RE2) oracles agree on documents containing Unicode whitespace
    (U+00A0 etc.) — Python \\S and bare .strip() are Unicode-aware."""
    import duckdb
    import pyarrow as pa

    from etl_ray.stages.text import Fingerprinter, TokenCounter

    texts = [
        "plain ascii words",
        "nbsp\u00a0joined\u00a0words",  # U+00A0 is NOT a token break in RE2 \S
        "\u00a0leading nbsp kept",  # trim must not remove U+00A0
        "ideographic　space",
        " \t mixed   ws \n",
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    con = duckdb.connect()
    con.register("docs", tbl)
    odf = con.execute(r"""
        SELECT doc_id,
               len(regexp_extract_all(text, '\S+')) AS n_tokens,
               md5(lower(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)))) AS fp_md5
        FROM docs ORDER BY doc_id
    """).fetchdf()

    tc = TokenCounter()
    got_tokens = tc(tbl).column("n_tokens").to_pylist()
    fp = Fingerprinter()
    got_md5 = [fp.md5_norm(t) for t in texts]
    assert got_tokens == odf["n_tokens"].astype(int).tolist()
    assert got_md5 == odf["fp_md5"].tolist()


def test_url_parts_and_top_domains(ray_session):
    import ray

    from etl_ray.stages.urlops import add_url_parts, top_domains

    urls = [
        "https://a.example.com/p/1",
        "https://a.example.com/p/2?q=3",
        "http://b.example.org",          # no path
        "https://c.sub.example.net/#frag",
        "not-a-url",                     # malformed -> nulls
        None,
    ]
    t = pa.table({"url": pa.array(urls, pa.string())})
    p = add_url_parts(t)
    assert p.column("host").to_pylist() == [
        "a.example.com", "a.example.com", "b.example.org",
        "c.sub.example.net", None, None,
    ]
    assert p.column("reg_domain").to_pylist() == [
        "example.com", "example.com", "example.org", "example.net", None, None,
    ]
    # optional RE2 group: absent path extracts as "" (not null)
    assert p.column("path").to_pylist() == [
        "/p/1", "/p/2?q=3", "", "/#frag", None, None,
    ]
    ds = ray.data.from_arrow(t)
    top = top_domains(ds, k=2, key="host").to_pandas()
    assert list(top.domain) == ["a.example.com", "b.example.org"]
    assert list(top.n_pages) == [2, 1]
