"""Deterministic synthetic Common-Crawl-style base table + WAL generator.

Produces (seed-stable, platform-stable) the two inputs mandated by
BASELINE.json / FIXTURES.md:

* ``pages`` base lake table: ``(url, warc_ts, html, text, lang)``
* ``wal/seg-NNNNN.parquet`` ordered change-event segments:
  ``(lsn, op, url, warc_ts, html[, lang])`` — ``lang`` only from schema
  version v1 segments onward (additive schema evolution fixture).

Adversarial cases baked in (FIXTURES.md F2): Zipf-skewed domains, one hot
url receiving a burst of events, out-of-order ``warc_ts`` including exact
ties (resolved by ``lsn``), update-after-delete, delete-of-nonexistent-key,
and a replayed (duplicate-LSN) segment for idempotence testing.

Reference analogue: the mock producer `tests/e2e/mock_data_producer.py:44-77`
in /root/reference plays this role (deterministic synthetic events in).
"""

from __future__ import annotations

import os
import zlib
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .extract import extract_text

_TLDS = ["com", "org", "net", "io", "dev"]
_LANGS = ["en", "pt", "de", "es", "fr", "ja"]
_WORDS = (
    "alpha beta gamma delta epsilon web data crawl page index content "
    "stream engine ray arrow lake upsert merge schema partition shuffle "
    "domain title body corpus token"
).split()

EPOCH_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z base, microseconds

WAL_SCHEMA_V0 = pa.schema(
    [
        ("lsn", pa.int64()),
        ("op", pa.string()),
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
    ]
)
WAL_SCHEMA_V1 = WAL_SCHEMA_V0.append(pa.field("lang", pa.string()))

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def _stable_u32(s: str) -> int:
    return zlib.crc32(s.encode("utf-8")) & 0xFFFFFFFF


def make_html(url: str, version: int) -> bytes:
    """Deterministic synthetic HTML for (url, version) — pure function.

    Cheap splitmix-style hash chain instead of a numpy Generator: the
    bench generator calls this millions of times."""
    h = _stable_u32(f"{url}|{version}")

    def nxt(x: int) -> int:
        x = (x + 0x9E3779B9) & 0xFFFFFFFF
        x = ((x ^ (x >> 16)) * 0x85EBCA6B) & 0xFFFFFFFF
        return (x ^ (x >> 13)) & 0xFFFFFFFF

    s = h
    nw = len(_WORDS)
    s = nxt(s)
    n_paras = 1 + s % 4
    title_ws = []
    for _ in range(3):
        s = nxt(s)
        title_ws.append(_WORDS[s % nw])
    title = " ".join(title_ws)
    paras = []
    for _ in range(n_paras):
        s = nxt(s)
        n_words = 8 + s % 32
        ws = []
        for _ in range(n_words):
            s = nxt(s)
            ws.append(_WORDS[s % nw])
        paras.append("<p>" + " ".join(ws) + "</p>")
    body = "\n".join(paras)
    doc = (
        f"<html><head><title>{title} v{version}</title>"
        f"<script>var x = {h};</script>"
        f"<style>p {{ color: red }}</style></head>"
        f"<body><!-- {url} --><h1>{title}</h1>\n{body}"
        f"<div>&amp; footer &#169; {h % 2024}</div></body></html>"
    )
    return doc.encode("utf-8")


@dataclass
class WalSpec:
    """Knobs for the deterministic generator (seed fixes everything)."""

    n_urls: int = 1_000
    n_events: int = 5_000
    n_segments: int = 8
    seed: int = 42
    zipf_s: float = 1.1
    hot_frac: float = 0.10  # fraction of events hitting the single hot url
    op_weights: tuple = (0.6, 0.3, 0.1)  # insert/update/delete
    v1_start_segment: int | None = None  # first segment carrying `lang`; default n_segments//2
    redeliver_segment: bool = True  # append a duplicate of segment 0 at the end
    base_frac: float = 0.5  # fraction of urls present in the base pages table

    def resolved_v1_start(self) -> int:
        return self.n_segments // 2 if self.v1_start_segment is None else self.v1_start_segment


def _urls(spec: WalSpec) -> list[str]:
    rng = np.random.default_rng(spec.seed)
    n_domains = max(2, spec.n_urls // 20)
    domains = [
        f"d{i}.example.{_TLDS[i % len(_TLDS)]}" for i in range(n_domains)
    ]
    # Zipf-skewed domain choice per url
    ranks = rng.zipf(spec.zipf_s, size=spec.n_urls) % n_domains
    return [f"https://{domains[int(r)]}/p/{i}" for i, r in enumerate(ranks)]


def _base_chunk(spec: WalSpec, urls: list[str], ts: np.ndarray, lo: int, hi: int) -> pa.Table:
    chunk_urls = urls[lo:hi]
    html = [make_html(u, 0) for u in chunk_urls]
    text = [extract_text(h) for h in html]
    lang = [_LANGS[_stable_u32(u) % len(_LANGS)] for u in chunk_urls]
    return pa.table(
        {
            "url": chunk_urls,
            "warc_ts": pa.array(ts[lo:hi], pa.timestamp("us")),
            "html": pa.array(html, pa.binary()),
            "text": pa.array(text, pa.string()),
            "lang": pa.array(lang, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def generate_base_pages(out_path: str, spec: WalSpec, parallel: bool = False) -> pa.Table:
    """Write the base `pages` table (the pre-existing lake state).

    ``parallel=True`` fans the (deterministic) per-row work out as Ray
    tasks — identical output bytes either way."""
    urls = _urls(spec)
    rng = np.random.default_rng(spec.seed + 1)
    n_base = int(spec.n_urls * spec.base_frac)
    base_urls = urls[:n_base]
    ts = EPOCH_US + rng.integers(0, 86_400_000_000, size=max(n_base, 1))[:n_base]
    if parallel and n_base > 20_000:
        import ray

        chunk = 20_000
        bounds = list(range(0, n_base, chunk)) + [n_base]
        fn = ray.remote(_base_chunk)
        urls_ref = ray.put(base_urls)
        ts_ref = ray.put(ts)
        parts = ray.get(
            [fn.remote(spec, urls_ref, ts_ref, bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]
        )
        tbl = pa.concat_tables(parts)
    else:
        tbl = _base_chunk(spec, base_urls, ts, 0, n_base)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    pq.write_table(tbl, out_path)
    return tbl


def _event_arrays(spec: WalSpec) -> dict:
    """Global event arrays, one vectorized draw — shared by all segments."""
    rng = np.random.default_rng(spec.seed + 2)
    n = spec.n_events
    idx = rng.zipf(spec.zipf_s, size=n) % spec.n_urls
    hot = rng.random(n) < spec.hot_frac
    hot_url_idx = int(rng.integers(0, spec.n_urls))
    idx[hot] = hot_url_idx
    ops = rng.choice(np.array(["insert", "update", "delete"]), size=n, p=list(spec.op_weights))
    ghost = rng.random(n) < 0.01
    ts = EPOCH_US + 90_000_000_000 + rng.integers(0, 86_400_000_000, size=n)
    tie = rng.random(n) < 0.01
    ts[tie] = EPOCH_US + 100_000_000_000
    return {
        "idx": idx,
        "ops": ops,
        "ghost": ghost,
        "ts": ts,
        "lsn": np.arange(1, n + 1, dtype=np.int64),
        "version": rng.integers(1, 6, size=n),
    }


def _build_segment(spec: WalSpec, urls: list[str], arr: dict, s: int, lo: int, hi: int) -> pa.Table:
    idx, ops, ghost = arr["idx"], arr["ops"], arr["ghost"]
    ts, lsn, version = arr["ts"], arr["lsn"], arr["version"]
    rows_url, rows_html, rows_lang = [], [], []
    for i in range(lo, hi):
        u = (
            f"https://ghost.example.com/p/{int(lsn[i])}"
            if (ghost[i] and ops[i] == "delete")
            else urls[int(idx[i])]
        )
        rows_url.append(u)
        if ops[i] == "delete":
            rows_html.append(None)
            rows_lang.append(None)
        else:
            rows_html.append(make_html(u, int(version[i])))
            rows_lang.append(_LANGS[_stable_u32(u) % len(_LANGS)])
    cols = {
        "lsn": pa.array(lsn[lo:hi], pa.int64()),
        "op": pa.array(ops[lo:hi].tolist(), pa.string()),
        "url": pa.array(rows_url, pa.string()),
        "warc_ts": pa.array(ts[lo:hi], pa.timestamp("us")),
        "html": pa.array(rows_html, pa.binary()),
    }
    schema = WAL_SCHEMA_V0
    if s >= spec.resolved_v1_start():
        cols["lang"] = pa.array(rows_lang, pa.string())
        schema = WAL_SCHEMA_V1
    return pa.table(cols, schema=schema)


def _write_segment(spec: WalSpec, urls, arr, s: int, lo: int, hi: int, path: str) -> str:
    tbl = _build_segment(spec, urls, arr, s, lo, hi)
    pq.write_table(tbl, path)
    return path


def generate_wal(wal_dir: str, spec: WalSpec, parallel: bool = False) -> list[str]:
    """Write ordered WAL segments; returns segment paths in order.

    Deterministic for a given spec (parallel or not).  Events are
    strictly ordered by lsn across segments, except the optional trailing
    redelivered segment (exact copy of segment 0 — duplicate LSNs,
    idempotence fixture)."""
    os.makedirs(wal_dir, exist_ok=True)
    urls = _urls(spec)
    arr = _event_arrays(spec)
    seg_bounds = np.linspace(0, spec.n_events, spec.n_segments + 1, dtype=int)
    paths = [
        os.path.join(wal_dir, f"seg-{s:05d}.parquet") for s in range(spec.n_segments)
    ]
    if parallel and spec.n_events > 50_000:
        import ray

        fn = ray.remote(_write_segment)
        urls_ref = ray.put(urls)
        arr_ref = ray.put(arr)
        ray.get(
            [
                fn.remote(spec, urls_ref, arr_ref, s, int(seg_bounds[s]), int(seg_bounds[s + 1]), paths[s])
                for s in range(spec.n_segments)
            ]
        )
    else:
        for s in range(spec.n_segments):
            _write_segment(spec, urls, arr, s, int(seg_bounds[s]), int(seg_bounds[s + 1]), paths[s])

    if spec.redeliver_segment and spec.n_segments > 0:
        # exact duplicate of segment 0, re-delivered later (at-least-once)
        path = os.path.join(wal_dir, f"seg-{spec.n_segments:05d}-redelivered.parquet")
        import shutil as _sh

        _sh.copyfile(paths[0], path)
        paths.append(path)
    return paths


def generate_dataset(root: str, spec: WalSpec, parallel: bool = False) -> dict:
    """Generate base pages + WAL under ``root``; returns paths dict."""
    base = os.path.join(root, "base", "pages.parquet")
    wal = os.path.join(root, "wal")
    generate_base_pages(base, spec, parallel=parallel)
    segs = generate_wal(wal, spec, parallel=parallel)
    return {"base": base, "wal_dir": wal, "segments": segs}
