"""Round-5 operators: paragraph-level exact dedup (C4 semantics),
Gopher-rule quality gate, BM25 scoring.

Differentials against plain-Python references on crafted corpora (the
repo's standard pattern); the sf0.01 DuckDB hash checks live in the
sweep (tools/sweep_correctness.py)."""

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# ParagraphSplitter
# ---------------------------------------------------------------------------


def test_paragraph_splitter_windows():
    from etl_ray.stages.dedup import ParagraphSplitter

    toks = [f"w{i}" for i in range(37)]
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [" ".join(toks), "  lone  ", ""],
        }
    )
    out = ParagraphSplitter(words_per_para=16)(t)
    rows = list(zip(*[out[c].to_pylist() for c in out.column_names]))
    # doc 1: 37 tokens -> windows of 16/16/5; doc 2: one 1-word window
    # (whitespace-trimmed); doc 3: empty -> no rows
    assert rows == [
        (1, 0, " ".join(toks[0:16])),
        (1, 1, " ".join(toks[16:32])),
        (1, 2, " ".join(toks[32:37])),
        (2, 0, "lone"),
    ]


def test_paragraph_dedup_first_occurrence(ray_session):
    """Duplicate paragraphs across docs AND within one doc: only the
    first (doc_id, para_idx) occurrence corpus-wide survives."""
    import ray.data

    from etl_ray.stages.dedup import paragraph_dedup

    A = " ".join(f"a{i}" for i in range(16))
    B = " ".join(f"b{i}" for i in range(16))
    C = " ".join(f"c{i}" for i in range(16))
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            # doc1 = A B; doc2 = B C B (intra-doc dup too); doc3 = A C
            "text": [f"{A} {B}", f"{B} {C} {B}", f"{A} {C}"],
        }
    )
    kept = paragraph_dedup(ray.data.from_arrow(t), words_per_para=16)
    got = sorted(
        zip(
            kept.to_pandas()["doc_id"],
            kept.to_pandas()["para_idx"],
            kept.to_pandas()["para"],
        )
    )
    # A first at (1,0); B first at (1,1); C first at (2,1).  Doc 3 keeps
    # nothing (both its paragraphs seen earlier).
    assert got == [(1, 0, A), (1, 1, B), (2, 1, C)]


# ---------------------------------------------------------------------------
# GopherQuality
# ---------------------------------------------------------------------------


def test_gopher_quality_matches_reference():
    from etl_ray.stages.text import _STOPWORDS, GopherQuality

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    out = GopherQuality()(tbl)
    stop = _STOPWORDS["en"]
    for i in range(tbl.num_rows):
        words = (tbl["text"][i].as_py() or "").split()
        n, s = len(words), sum(len(w) for w in words)
        hits = sum(w.lower() in stop for w in words)
        keep = int(50 <= n <= 100_000 and 3 * n <= s <= 10 * n and hits >= 2)
        assert out["n_words"][i].as_py() == n
        assert out["sum_word_len"][i].as_py() == s
        assert out["stop_hits"][i].as_py() == hits
        assert out["keep"][i].as_py() == keep
    # the gate must actually discriminate on this corpus
    kept = sum(out["keep"].to_pylist())
    assert 0 < kept < tbl.num_rows


def test_gopher_quality_rule_boundaries():
    from etl_ray.stages.text import GopherQuality

    g = GopherQuality()
    mk = lambda words: pa.table(
        {"doc_id": pa.array([0], pa.int64()), "text": [" ".join(words)]}
    )
    # exactly 50 words, mean length exactly 3, two stopwords -> keep
    ok = ["the", "for"] + ["abc"] * 48
    assert g(mk(ok))["keep"][0].as_py() == 1
    # 49 words -> word-count floor fails
    assert g(mk(ok[1:]))["keep"][0].as_py() == 0
    # one stopword -> stopword floor fails
    assert g(mk(["the"] + ["abc"] * 49))["keep"][0].as_py() == 0
    # mean word length just under 3 (3n-1 chars) -> fails
    under = ["the", "for"] + ["abc"] * 47 + ["ab"]
    assert g(mk(under))["keep"][0].as_py() == 0


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def test_bm25_matches_plain_reference(ray_session, tmp_path):
    from etl_ray.pipelines.queries import bm25_docs

    docs = {
        1: "cat sat on the mat",
        2: "cat cat dog",
        3: "dog runs far away from the mat today",
    }
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(sorted(docs), pa.int64()),
                "text": [docs[k] for k in sorted(docs)],
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = bm25_docs(str(tmp_path)).to_pandas()

    # plain reference
    N = len(docs)
    toks = {d: t.split() for d, t in docs.items()}
    sumdl = sum(len(v) for v in toks.values())
    tf = {(d, w): toks[d].count(w) for d in toks for w in set(toks[d])}
    df = {}
    for d, w in tf:
        df[w] = df.get(w, 0) + 1
    expect = {}
    for (d, w), f in tf.items():
        dl = len(toks[d])
        idf = math.log(1.0 + (float(N - df[w]) + 0.5) / (float(df[w]) + 0.5))
        den = f + 1.2 * (0.25 + 0.75 * (float(dl * N) / float(sumdl)))
        expect[(d, w)] = math.floor(1e6 * ((idf * (f * 2.2)) / den))

    got = {
        (r.doc_id, r.token): (r.tf, r.df, r.dl, r.bm25_fp)
        for r in out.itertuples()
    }
    assert set(got) == set(expect)
    for (d, w), (f, dfl, dl, fp) in got.items():
        assert f == tf[(d, w)]
        assert dfl == df[w]
        assert dl == len(toks[d])
        assert fp == expect[(d, w)], (d, w)


# ---------------------------------------------------------------------------
# LineSplitter + string-key paragraph dedup (flagship #3 building blocks)
# ---------------------------------------------------------------------------


def test_line_splitter_positions():
    from etl_ray.stages.dedup import LineSplitter

    t = pa.table(
        {"url": ["u1", "u2", "u3"], "text": ["a b\n\nc d\ne", "x\na b", ""]}
    )
    out = LineSplitter(id_col="url")(t)
    rows = list(zip(*[out[c].to_pylist() for c in out.column_names]))
    # para_idx counts lines INCLUDING the empty ones (SQL ordinality),
    # then empty lines drop; the empty doc contributes nothing
    assert rows == [
        ("u1", 0, "a b"),
        ("u1", 2, "c d"),
        ("u1", 3, "e"),
        ("u2", 0, "x"),
        ("u2", 1, "a b"),
    ]


def test_paragraph_dedup_string_keys(ray_session):
    """Generic (string doc key) path: first occurrence in (url,
    para_idx) lexicographic order wins, across and within docs."""
    import ray.data

    from etl_ray.stages.dedup import LineSplitter, paragraph_dedup

    t = pa.table(
        {
            "url": ["b.com", "a.com", "c.com"],
            # 'hdr' appears in all three; a.com sorts first so wins;
            # 'x' repeats within c.com (intra-doc dup)
            "text": ["hdr\nbodyB", "hdr\nbodyA", "hdr\nx\nx"],
        }
    )
    kept = paragraph_dedup(
        ray.data.from_arrow(t), splitter=LineSplitter(id_col="url")
    )
    got = sorted(
        zip(
            kept.to_pandas()["doc_id"],
            kept.to_pandas()["para_idx"],
            kept.to_pandas()["para"],
        )
    )
    assert got == [
        ("a.com", 0, "hdr"),
        ("a.com", 1, "bodyA"),
        ("b.com", 1, "bodyB"),
        ("c.com", 1, "x"),
    ]


def test_gopher_quality_custom_thresholds():
    from etl_ray.stages.text import GopherQuality

    g = GopherQuality(min_words=2, min_stop=0)
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()), "text": ["abc def", "abc"]})
    out = g(t)
    assert out["keep"].to_pylist() == [1, 0]


# ---------------------------------------------------------------------------
# flatten_tokens + encode_docs
# ---------------------------------------------------------------------------


def test_flatten_tokens_positions():
    from etl_ray.stages.text import flatten_tokens

    flat, par, pos = flatten_tokens(
        pa.array(["a b  c", "  x ", "", "d"], pa.string())
    )
    assert flat.to_pylist() == ["a", "b", "c", "x", "d"]
    assert par.tolist() == [0, 0, 0, 1, 3]
    # positions number the surviving tokens 0.. per row (SQL unnest
    # ordinals over regexp_extract_all, which never yields empties)
    assert pos.tolist() == [0, 1, 2, 0, 0]


def test_encode_docs_matches_reference(ray_session, tmp_path):
    import pyarrow.parquet as _pq

    from etl_ray.pipelines.queries import encode_docs

    docs = {
        1: "cat sat on the mat",          # freq: cat(5+?) ...
        2: "cat cat cat dog mat",
        3: "cat mat cat rare",
    }
    _pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(sorted(docs), pa.int64()),
                "text": [docs[k] for k in sorted(docs)],
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = encode_docs(str(tmp_path)).to_pandas()

    # plain reference: vocab = tokens with count >= 5, ids by (count
    # DESC, token ASC) starting at 1; here only 'cat' (6) qualifies
    counts = {}
    for t in docs.values():
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    vocab = sorted(
        [(w, c) for w, c in counts.items() if c >= 5],
        key=lambda x: (-x[1], x[0]),
    )
    ids = {w: i + 1 for i, (w, _) in enumerate(vocab)}
    expect = {}
    for d, t in docs.items():
        for p, w in enumerate(t.split()):
            expect[(d, p)] = ids.get(w, 0)
    got = {(r.doc_id, r.pos): r.token_id for r in out.itertuples()}
    assert got == expect
    assert ids == {"cat": 1}  # sanity: the fixture exercises both paths


# ---------------------------------------------------------------------------
# normalization / near-dup retention / CCNet bucketing (round-5 batch 2)
# ---------------------------------------------------------------------------


def test_normalize_text_docs(ray_session, tmp_path, monkeypatch):
    """NFC(lower) + edge trim + whitespace-run collapse, vs plain
    Python unicodedata reference."""
    import unicodedata

    from etl_ray.pipelines.queries import normalize_text_docs

    texts = [
        "  Hello   WORLD \t x ",
        "tabs\tand\nnewlines\r\fhere",
        "already clean",
        "",
        "   ",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": texts,
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = normalize_text_docs(str(tmp_path)).to_pandas().sort_values("doc_id")

    def ref(s):
        s = unicodedata.normalize("NFC", s.lower())
        s = " ".join(s.split())  # splits on all ASCII whitespace, trims
        return s

    for did, got, n in zip(out["doc_id"], out["norm_text"], out["n_chars_norm"]):
        want = ref(texts[did])
        assert got == want, (did, got, want)
        assert n == len(want)


def test_neardup_keep_representative(ray_session, tmp_path):
    """Exact-duplicate trio + singleton: only the min-doc_id member of
    the cluster keeps=1; untouched docs keep=1."""
    from etl_ray.pipelines.queries import neardup_keep_docs

    dup = "the quick brown fox jumps over the lazy dog again and again"
    texts = {7: dup, 3: dup, 9: dup, 1: "completely different text about databases and streams"}
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(texts), pa.int64()),
                "text": list(texts.values()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = neardup_keep_docs(str(tmp_path)).to_pandas()
    keep = dict(zip(out["doc_id"], out["keep"]))
    assert keep == {1: 1, 3: 1, 7: 0, 9: 0}


def test_ccnet_buckets_partition_corpus(ray_session):
    """Buckets cover the whole (scorable) corpus, thresholds are the
    exact tertile ranks, and bucket order respects the score order."""
    from etl_ray.pipelines.queries import ccnet_bucket_docs

    out = ccnet_bucket_docs(SF).to_pandas()
    assert set(out["bucket"]) == {"head", "middle", "tail"}
    assert len(out) == 500  # every sf0.001 doc has >= 2 bytes
    h = out[out["bucket"] == "head"]["mean_unats"]
    m = out[out["bucket"] == "middle"]["mean_unats"]
    t = out[out["bucket"] == "tail"]["mean_unats"]
    assert h.min() > m.max() or h.min() >= m.max()  # head >= t2 > middle
    assert m.min() >= t.max() or m.min() > t.max()
    # tertile sizes within one rank of n/3 on each side
    import numpy as _np

    v = _np.sort(out["mean_unats"].values)
    n = len(v)
    t1, t2 = v[int((1.0 / 3.0) * (n - 1))], v[int((2.0 * (1.0 / 3.0)) * (n - 1))]
    assert (out["mean_unats"] >= t2).sum() == len(h)
    assert ((out["mean_unats"] >= t1) & (out["mean_unats"] < t2)).sum() == len(m)


def test_md5_bucket_matches_duckdb():
    """Engine bucketing == the oracle's md5-prefix expression."""
    import duckdb

    from etl_ray.stages.text import md5_bucket

    toks = pa.array(["hello", "world", "a", "Ünïcode", "x1", "hello"])
    got = md5_bucket(toks, 4096)
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT CAST(concat('0x', substr(md5(?),1,8)) AS BIGINT) % 4096",
            [t],
        ).fetchone()[0]
        for t in toks.to_pylist()
    ]
    assert got.tolist() == want


def test_dsir_weights_matches_reference(ray_session, tmp_path):
    """Plain-python DSIR reference (same hashing, smoothing, libm ln,
    integer sum) on a crafted bilingual corpus."""
    import hashlib
    import math

    from etl_ray.pipelines.queries import dsir_weights_docs

    docs = {
        0: ("en", "the cat sat on the mat"),
        1: ("en", "the dog ran fast"),
        2: ("de", "der hund lief schnell"),
        3: ("de", "die katze sass auf der matte"),
        4: ("en", ""),  # zero tokens -> absent from output
    }
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(docs), pa.int64()),
                "lang": [v[0] for v in docs.values()],
                "text": [v[1] for v in docs.values()],
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    NB = 4096
    bucket = lambda t: int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % NB
    cr, ct = {}, {}
    for lang, text in docs.values():
        for t in text.split():
            b = bucket(t)
            cr[b] = cr.get(b, 0) + 1
            if lang == "en":
                ct[b] = ct.get(b, 0) + 1
    nr, nt = sum(cr.values()), sum(ct.values())
    fp = {
        b: math.floor(
            1_000_000.0
            * math.log(
                ((ct.get(b, 0) + 1.0) * (nr + 4096.0))
                / ((c + 1.0) * (nt + 4096.0))
            )
        )
        for b, c in cr.items()
    }
    want = {}
    for did, (lang, text) in docs.items():
        toks = text.split()
        if toks:
            want[did] = (len(toks), sum(fp[bucket(t)] for t in toks))

    out = dsir_weights_docs(str(tmp_path)).to_pandas()
    got = {
        r.doc_id: (r.n_tokens, r.weight_fp) for r in out.itertuples()
    }
    assert got == want
    # target-language docs should score higher on average than raw
    en_w = [w for d, (n, w) in want.items() if docs[d][0] == "en" and n]
    de_w = [w for d, (n, w) in want.items() if docs[d][0] == "de"]
    assert min(en_w) > max(de_w)


def test_ordered_cumsum_large_packed_keys(ray_session):
    """Regression: order keys near 2^60 overflowed the exact integer
    bucket mapping ((arr-lo)*B); the monotone float fallback must keep
    bucket order == global order."""
    import ray.data

    from etl_ray.stages.analytic import ordered_cumsum

    rng = np.random.default_rng(5)
    keys = rng.choice(np.int64(1) << 60, size=500, replace=False).astype(np.int64)
    vals = rng.integers(1, 100, size=500).astype(np.int64)
    t = pa.table({"k": keys, "v": vals})
    out = (
        ordered_cumsum(ray.data.from_arrow(t), order_col="k", value_col="v")
        .to_pandas()
        .sort_values("k")
    )
    order = np.argsort(keys)
    assert (out["cum_v"].values == np.cumsum(vals[order])).all()


def test_budget_select_laws(ray_session):
    """Selection is the maximal quality-ordered prefix within budget:
    cum is monotone along (mean DESC, doc_id), total <= half the
    scorable bytes, and no further doc fits."""
    from etl_ray.pipelines.queries import budget_select_docs

    out = (
        budget_select_docs(SF)
        .to_pandas()
        .sort_values(["mean_unats", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
    )
    assert len(out) > 0
    assert (out["cum_bytes"].values == out["n_bytes"].cumsum().values).all()
    # reconstruct the budget: half of all scorable bytes
    import pyarrow.parquet as _pq

    texts = _pq.read_table(
        os.path.join(SF, "documents.parquet"), columns=["text"]
    )["text"].to_pylist()
    total = sum(len(t.encode()) for t in texts if t and len(t.encode()) >= 2)
    budget = total // 2
    assert out["cum_bytes"].iloc[-1] <= budget
    # the NEXT doc in quality order would overflow the budget (prefix
    # maximality): every non-selected scorable doc appended would exceed
    assert out["n_bytes"].sum() == out["cum_bytes"].iloc[-1]


# ---------------------------------------------------------------------------
# BPE training / encoding (stages/bpe.py)
# ---------------------------------------------------------------------------


def _bpe_reference(word_counts: dict[str, int], n_merges: int):
    """Plain-python textbook BPE trainer with the engine's exact rules:
    segmentation replays merges lowest-rank-first (leftmost tie-break);
    each round picks (count desc, then lexicographic pair asc)."""

    def segment(word, ranks):
        syms = list(word)
        while len(syms) > 1:
            best, bi = None, -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            syms[bi : bi + 2] = [syms[bi] + syms[bi + 1]]
        return syms

    merges, ranks = [], {}
    for k in range(n_merges):
        pc_: dict[tuple[str, str], int] = {}
        for w, n in word_counts.items():
            syms = segment(w, ranks)
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pc_[p] = pc_.get(p, 0) + n
        if not pc_:
            break
        best = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((best[0][0], best[0][1], best[1]))
        ranks[best[0]] = k
    return merges, ranks


def test_bpe_train_matches_reference(ray_session, tmp_path):
    import ray.data

    from etl_ray.stages.bpe import bpe_train

    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest lowly",
        "low new wide lower newer",
    ]
    t = pa.table({"text": texts})
    pq.write_table(t, str(tmp_path / "docs.parquet"))
    ds = ray.data.read_parquet(str(tmp_path / "docs.parquet"))
    got = bpe_train(ds, n_merges=10)

    wc: dict[str, int] = {}
    for s in texts:
        for w in s.split():
            wc[w] = wc.get(w, 0) + 1
    want, _ = _bpe_reference(wc, 10)
    rows = list(
        zip(
            got.column("left").to_pylist(),
            got.column("right").to_pylist(),
            got.column("n").to_pylist(),
        )
    )
    assert rows == want
    assert got.column("rank").to_pylist() == list(range(len(want)))


def test_bpe_encode_matches_reference(ray_session, tmp_path):
    import ray.data

    from etl_ray.stages.bpe import _segment, bpe_segment_counts, bpe_train

    texts = ["low lower newest", "widest new low", ""]
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()), "text": texts})
    pq.write_table(t, str(tmp_path / "docs.parquet"))
    ds = ray.data.read_parquet(str(tmp_path / "docs.parquet"))
    merges = bpe_train(ds, n_merges=6)
    out = bpe_segment_counts(ds, merges).to_pandas().set_index("doc_id")

    ranks = {
        (l, r): k
        for k, l, r in zip(
            merges.column("rank").to_pylist(),
            merges.column("left").to_pylist(),
            merges.column("right").to_pylist(),
        )
    }
    for did, s in enumerate(texts):
        want = sum(len(_segment(w, ranks)) for w in s.split())
        assert int(out.loc[did, "n_pieces"]) == want


# ---------------------------------------------------------------------------
# global shuffle / temperature mix / calibration laws
# ---------------------------------------------------------------------------


def test_global_shuffle_is_permutation(ray_session):
    from etl_ray.pipelines.queries import global_shuffle_docs

    df = global_shuffle_docs(SF).to_pandas()
    n = len(df)
    assert sorted(df["pos"]) == list(range(1, n + 1))
    assert df["doc_id"].is_unique
    assert ((df["pos"] - 1) % 16 == df["shard_id"]).all()
    # shards are balanced to within one document by construction
    sizes = df.groupby("shard_id").size()
    assert sizes.max() - sizes.min() <= 1


def test_temperature_mix_keeps_smallest_lang(ray_session):
    import pyarrow.parquet as _pq

    from etl_ray.pipelines.queries import temperature_mix_docs

    full = _pq.read_table(os.path.join(SF, "documents.parquet"), columns=["lang"])
    counts = {}
    for v in full.column("lang").to_pylist():
        counts[v] = counts.get(v, 0) + 1
    smallest = min(counts, key=lambda k: (counts[k], k))
    kept = temperature_mix_docs(SF).to_pandas().groupby("lang").size().to_dict()
    # rate for the smallest language is exactly 1.0 -> all kept
    assert kept[smallest] == counts[smallest]
    # dominant languages are strictly downsampled at tau=0.7
    biggest = max(counts, key=lambda k: (counts[k], k))
    assert kept[biggest] < counts[biggest]
    # every stratum's keep count never exceeds its population
    assert all(kept[l] <= counts[l] for l in kept)


def test_quality_calibration_partitions_corpus(ray_session):
    import pyarrow.parquet as _pq

    from etl_ray.pipelines.queries import quality_calibration_docs

    out = quality_calibration_docs(SF).to_pandas()
    full = _pq.read_table(os.path.join(SF, "documents.parquet"), columns=["text"])
    scorable = sum(
        1 for s in full.column("text").to_pylist() if s and len(s.encode()) >= 2
    )
    assert out["n_docs"].sum() == scorable
    assert (out["n_en"] <= out["n_docs"]).all()
    assert out["bin"].between(0, 9).all()


def test_badwords_filter_excludes_hits(ray_session, tmp_path):
    import ray.data

    from etl_ray.pipelines.queries import badwords_filter_docs

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "lang": ["en"] * 5,
            "text": [
                "clean text only",
                "this has dup inside",     # blocked: dup
                "duplicate but not dup-token dupx",  # 'dupx' != 'dup' -> kept
                "dup",                     # blocked: dup
                "",                        # empty -> kept
            ],
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = badwords_filter_docs(str(tmp_path)).to_pandas()
    assert sorted(out["doc_id"]) == [0, 2, 4]


def test_domain_gate_keeps_above_average_sources(ray_session, tmp_path):
    import ray.data

    from etl_ray.pipelines.queries import domain_gate_docs

    rows = []
    # source a: mean 100; source b: mean 10 -> corpus floor-mean 55
    for i in range(4):
        rows.append((i, "a", 100))
    for i in range(4, 8):
        rows.append((i, "b", 10))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "lang": ["en"] * len(rows),
            "source": [r[1] for r in rows],
            "n_chars": pa.array([r[2] for r in rows], pa.int64()),
            "text": ["x"] * len(rows),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = domain_gate_docs(str(tmp_path)).to_pandas()
    assert set(out["source"]) == {"a"}
    assert len(out) == 4


def test_pagerank_matches_plain_python(ray_session, tmp_path):
    """Integer PageRank on a crafted two-user / two-k graph vs a plain
    dict implementation of the same fixed-point rules."""
    import json as _json

    from etl_ray.pipelines.queries import pagerank_user_props

    rows = [
        (0, 1, 5), (1, 1, 5), (2, 1, 7),  # user 1 -> k5, k7
        (3, 2, 7), (4, 2, 7),             # user 2 -> k7
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "props": [_json.dumps({"k": r[2]}) for r in rows],
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = (
        pagerank_user_props(str(tmp_path))
        .to_pandas()
        .set_index("node")["r"]
        .to_dict()
    )

    edges = set()
    for _, u, k in rows:
        edges.add((f"u:{u}", f"k:{k}"))
        edges.add((f"k:{k}", f"u:{u}"))
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = {n: 1_000_000_000 for n in deg}
    for _ in range(3):
        acc = {}
        for s, d in edges:
            acc[d] = acc.get(d, 0) + r[s] // deg[s]
        r = {n: 150_000_000 + (85 * v) // 100 for n, v in acc.items()}
    assert got == r


def test_cube_levels_are_consistent(ray_session):
    from etl_ray.pipelines.queries import cube_orders_status_priority

    df = cube_orders_status_priority(SF).to_pandas()
    detail = df[df.o_orderstatus.notna() & df.o_orderpriority.notna()]
    by_status = df[df.o_orderstatus.notna() & df.o_orderpriority.isna()]
    by_prio = df[df.o_orderstatus.isna() & df.o_orderpriority.notna()]
    grand = df[df.o_orderstatus.isna() & df.o_orderpriority.isna()]
    assert len(grand) == 1
    g = grand.iloc[0]
    for lvl in (detail, by_status, by_prio):
        assert lvl["n_orders"].sum() == g["n_orders"]
        assert lvl["revenue_cents"].sum() == g["revenue_cents"]


def test_grouped_hll_within_bound(ray_session):
    """Per-group HLL estimates vs exact distincts: every group inside
    5 sigma (sigma ~= 1.04/sqrt(2^p))."""
    import duckdb

    from etl_ray.pipelines.queries import approx_distinct_users_per_type

    got = (
        approx_distinct_users_per_type(SF)
        .to_pandas()
        .set_index("event_type")["approx_distinct"]
        .to_dict()
    )
    con = duckdb.connect()
    exact = dict(
        con.execute(
            "SELECT event_type, count(DISTINCT user_id) "
            f"FROM '{SF}/events.parquet' GROUP BY 1"
        ).fetchall()
    )
    assert set(got) == set(exact)
    sigma = 1.04 / (1 << 12) ** 0.5
    for k, e in exact.items():
        assert abs(got[k] - e) <= max(5 * sigma * e, 3.0), (k, got[k], e)


def test_grouped_quantiles_within_rank_bound(ray_session):
    """Per-group quantile estimates vs exact: rank error of each answer
    within the summary's epsilon class (generous 5% of group size)."""
    import duckdb

    from etl_ray.pipelines.queries import approx_quantiles_values_per_type

    got = approx_quantiles_values_per_type(SF).to_pandas()
    con = duckdb.connect()
    vals = {}
    for et, v in con.execute(
        f"SELECT event_type, value FROM '{SF}/events.parquet'"
    ).fetchall():
        vals.setdefault(et, []).append(v)
    for _, row in got.iterrows():
        sv = sorted(vals[row["event_type"]])
        n = len(sv)
        import bisect

        # rank of the returned value inside the exact sorted group
        r = bisect.bisect_left(sv, row["value"])
        target = row["q"] * n
        assert abs(r - target) <= max(0.05 * n, 2.0), (
            row["event_type"], row["q"], r, target, n,
        )
