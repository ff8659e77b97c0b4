"""Round-3 text stages: vocabulary partials, repetition profile,
posting lists, PII redaction."""

import pyarrow as pa

from etl_ray.stages.text import (
    PiiRedactor,
    PostingLister,
    RepetitionProfiler,
    VocabPartials,
)


def _docs(*texts):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(list(texts), pa.string()),
        }
    )


def test_vocab_partials_counts_batch_tokens():
    out = VocabPartials()(_docs("a b a", "b\tc", None, "")).to_pydict()
    got = dict(zip(out["token"], out["n"]))
    assert got == {"a": 2, "b": 2, "c": 1}


def test_vocab_partials_empty_batch_typed():
    out = VocabPartials()(_docs())
    assert out.schema.names == ["token", "n"]
    assert out.num_rows == 0


def test_repetition_profiler():
    out = RepetitionProfiler()(_docs("x x x y", "", None, "a b c")).to_pydict()
    assert out["n_tokens"] == [4, 0, 0, 3]
    assert out["top_token_n"] == [3, 0, 0, 1]
    assert out["n_distinct"] == [2, 0, 0, 3]


def test_posting_lister_dedups_within_doc():
    out = PostingLister()(_docs("b a b a", "a")).to_pydict()
    pairs = set(zip(out["token"], out["doc_id"]))
    assert pairs == {("a", 0), ("b", 0), ("a", 1)}


def test_pii_redactor_counts_and_text():
    t = _docs(
        "mail me at jane.doe+x@corp.example.org now",
        "call 555-123-4567 or +1 555-765-4321 x",
        "clean text",
        None,
    )
    out = PiiRedactor()(t).to_pydict()
    assert out["n_emails"] == [1, 0, 0, 0]
    # "+1 555-765-4321": the +1 prefix is not part of the match (the
    # pattern wants 3 digits right after the optional +)
    assert out["n_phones"] == [0, 2, 0, 0]
    assert out["text_redacted"][0] == "mail me at <EMAIL> now"
    assert out["text_redacted"][1] == "call <PHONE> or +1 <PHONE> x"
    assert out["text_redacted"][3] == ""


def test_term_counter_tf_per_doc_token():
    from etl_ray.stages.text import TermCounter

    t = TermCounter()(_docs("a b a c", "b b"))
    got = {
        (i, tok): tf
        for i, tok, tf in zip(
            t["doc_id"].to_pylist(), t["token"].to_pylist(), t["tf"].to_pylist()
        )
    }
    assert got == {(0, "a"): 2, (0, "b"): 1, (0, "c"): 1, (1, "b"): 2}


def test_term_counter_empty_and_null_text_typed():
    from etl_ray.stages.text import TermCounter

    t = TermCounter()(
        pa.table(
            {
                "doc_id": pa.array([7, 8], pa.int64()),
                "text": pa.array(["", None], pa.string()),
            }
        )
    )
    assert t.num_rows == 0
    assert t.schema.field("token").type == pa.string()
    assert t.schema.field("tf").type == pa.int64()


def test_chunker_window_stride_edges():
    from etl_ray.stages.text import Chunker

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["x" * 1000, "short", "", None], pa.string()),
        }
    )
    out = Chunker(window=500, stride=400)(t)
    rows = list(
        zip(out["doc_id"].to_pylist(), out["chunk_id"].to_pylist(),
            [len(c) for c in out["chunk"].to_pylist()])
    )
    assert sorted(rows) == [(1, 0, 500), (1, 1, 500), (1, 2, 200), (2, 0, 5)]


def test_chunker_empty_batch_typed():
    from etl_ray.stages.text import Chunker

    out = Chunker()(pa.table({"doc_id": pa.array([], pa.int64()),
                              "text": pa.array([], pa.string())}))
    assert out.num_rows == 0
    assert out.schema.field("chunk").type == pa.string()


def test_bigram_counter():
    from etl_ray.stages.text import BigramCounter

    t = BigramCounter()(_docs("a b c a b", "x", ""))
    got = sorted(
        zip(t["doc_id"].to_pylist(), t["bigram"].to_pylist(), t["n"].to_pylist())
    )
    assert got == [(0, "a b", 2), (0, "b c", 1), (0, "c a", 1)]


def test_doc_ngrams_windows_and_distinct():
    from etl_ray.stages.text import doc_ngrams

    t = doc_ngrams(_docs("a b c d", "x y", "a a a"), 3)
    got = sorted(zip(t["doc_id"].to_pylist(), t["gram"].to_pylist()))
    assert got == [(0, "a b c"), (0, "b c d"), (2, "a a a")]
    # distinct=False keeps duplicates
    t2 = doc_ngrams(_docs("a a a a"), 2, distinct=False)
    assert t2["gram"].to_pylist() == ["a a", "a a", "a a"]
    t3 = doc_ngrams(_docs("short"), 3)
    assert t3.num_rows == 0 and t3.schema.field("gram").type == pa.string()
