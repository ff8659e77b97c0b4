"""Single-process reference replay (the differential-correctness oracle).

Plain Python dict replay of the WAL over the base `pages` table under the
engine's exact semantics:

* key = ``url``; last-writer-wins ordered by ``(warc_ts, lsn)`` — ``lsn`` is
  the total-order tie-breaker (the reference's upsert is
  last-file-processed-wins, `src/pipeline/core/spark.py:160-176` in
  /root/reference; we make the rule explicit per SURVEY.md §7).
* base rows carry ``lsn = 0`` so any WAL event at the same ``warc_ts`` wins.
* ``delete`` wins if it is the latest event for the key -> row absent.
* ``text`` = ``extract_text(html)`` (shared deterministic function).
* additive schema evolution: ``lang`` missing in v0 segments -> None.
* duplicate-LSN redelivery is a no-op (max-by is order-insensitive).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from .extract import extract_text
from .gen import PAGES_SCHEMA


def replay_oracle(base_path: str | None, segment_paths: list[str]) -> pa.Table:
    """Replay WAL segments over the base table; return final lake state.

    Rows sorted by url; schema = PAGES_SCHEMA.  Single-process, O(events)
    memory — the oracle is for small-scale differential testing only.
    """
    state: dict[str, tuple] = {}  # url -> (warc_ts_us, lsn, op, html, lang)

    if base_path is not None:
        base = pq.read_table(base_path)
        for row in base.to_pylist():
            ts = row["warc_ts"]
            ts_us = _to_us(ts)
            state[row["url"]] = (ts_us, 0, "insert", row["html"], row.get("lang"))

    for seg in segment_paths:
        tbl = pq.read_table(seg)
        has_lang = "lang" in tbl.schema.names
        for row in tbl.to_pylist():
            url = row["url"]
            key = (_to_us(row["warc_ts"]), row["lsn"])
            cur = state.get(url)
            if cur is not None and (cur[0], cur[1]) >= key:
                continue
            lang = row.get("lang") if has_lang else None
            state[url] = (key[0], key[1], row["op"], row["html"], lang)

    urls = sorted(u for u, v in state.items() if v[2] != "delete")
    rows = {
        "url": urls,
        "warc_ts": [state[u][0] for u in urls],
        "html": [state[u][3] for u in urls],
        "text": [extract_text(state[u][3]) for u in urls],
        "lang": [state[u][4] for u in urls],
    }
    return pa.table(
        {
            "url": pa.array(rows["url"], pa.string()),
            "warc_ts": pa.array(rows["warc_ts"], pa.timestamp("us")),
            "html": pa.array(rows["html"], pa.binary()),
            "text": pa.array(rows["text"], pa.string()),
            "lang": pa.array(rows["lang"], pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def flat_events_table(base_path: str | None, segment_paths: list[str]) -> pa.Table:
    """Flatten base + WAL into one event table (url, warc_ts, lsn, op,
    text, lang) for the DuckDB driver oracle: the SQL then expresses the
    replay semantics itself (LWW by (warc_ts, lsn) DESC, delete wins,
    schema-evolution null-fill) as a window query, with ``text`` supplied
    per event by the shared pure ``extract_text`` (not SQL-expressible —
    regex backreferences + HTML entity unescape)."""
    import numpy as np

    tables = []
    if base_path is not None:
        base = pq.read_table(base_path)
        tables.append(
            pa.table(
                {
                    "url": base.column("url"),
                    "warc_ts": base.column("warc_ts"),
                    "lsn": pa.array(np.zeros(base.num_rows, np.int64)),
                    "op": pa.array(["insert"] * base.num_rows, pa.string()),
                    "text": base.column("text"),
                    "lang": base.column("lang"),
                }
            )
        )
    for seg in segment_paths:
        t = pq.read_table(seg)
        ops = t.column("op").to_pylist()
        htmls = t.column("html").to_pylist()
        texts = [
            None if op == "delete" else extract_text(h) for op, h in zip(ops, htmls)
        ]
        lang = (
            t.column("lang")
            if "lang" in t.schema.names
            else pa.array([None] * t.num_rows, pa.string())
        )
        tables.append(
            pa.table(
                {
                    "url": t.column("url"),
                    "warc_ts": t.column("warc_ts"),
                    "lsn": t.column("lsn"),
                    "op": t.column("op"),
                    "text": pa.array(texts, pa.string()),
                    "lang": lang,
                }
            )
        )
    return pa.concat_tables(tables)


def _to_us(ts) -> int:
    if isinstance(ts, int):
        return ts
    # datetime from to_pylist(); timestamps are tz-naive UTC microseconds
    import datetime as _dt

    if isinstance(ts, _dt.datetime):
        td = ts - _dt.datetime(1970, 1, 1)
        return td.days * 86_400_000_000 + td.seconds * 1_000_000 + td.microseconds
    raise TypeError(f"unsupported ts {type(ts)}")
