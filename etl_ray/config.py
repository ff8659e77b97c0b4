"""Table registry — the user-extension surface (SURVEY.md §2.11).

The reference's de-facto plugin API is the topic->transform dispatch
table ``spark_functions`` (`src/pipeline/core/client_clickhouse.py:39-58`
in /root/reference) with per-topic normalize projections.  Here the
registry entry is a ``TableSpec``: upsert key, LWW ordering column, an
optional Arrow-in/Arrow-out normalize callable (pluggable into
``map_batches``), and the v0 schema.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

import pyarrow as pa

from .gen import PAGES_SCHEMA


@dataclass(frozen=True)
class TableSpec:
    name: str
    key: str                      # upsert key column
    ts_col: str                   # LWW ordering column (lsn tie-breaks)
    schema_v0: pa.Schema
    normalize: Callable[[pa.Table], pa.Table] | None = None  # batch fn
    derive_text: bool = True      # run extract_text(html) on merge winners
    # optional custom event classifier for dead-letter routing: batch ->
    # string array (reason per row, null = valid).  None = built-in rules
    # (null key, null ts, op outside insert/update/delete) —
    # stages/validate.event_reasons
    validate: Callable[[pa.Table], pa.Array] | None = None
    # column-level partial-image upserts: update events carry only the
    # changed columns non-null; the merge coalesces per column (latest
    # non-null under (ts_col, lsn), deletes reset) instead of whole-row
    # LWW — stages/coalesce.py.  Rewrite merge mode only; incompatible
    # with derive_text (a coalesced html could silently orphan text).
    coalesce_partial: bool = False


REGISTRY: dict[str, TableSpec] = {}


def register(spec: TableSpec) -> TableSpec:
    REGISTRY[spec.name] = spec
    return spec


def get(name: str) -> TableSpec:
    return REGISTRY[name]


# the flagship table (BASELINE.json input_hint shape)
PAGES = register(
    TableSpec(
        name="pages",
        key="url",
        ts_col="warc_ts",
        schema_v0=PAGES_SCHEMA,
        normalize=None,
        derive_text=True,
    )
)
