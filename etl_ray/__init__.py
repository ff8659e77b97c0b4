"""etl_ray — Ray-Data-native CDC / incremental-ingest engine.

Public surface (the names a pipeline author needs; every deeper module
stays importable directly):

    from etl_ray import (
        WalSpec, generate_dataset,            # deterministic fixtures
        TableSpec, register,                  # table registry (§2.11)
        bootstrap_lake, replay, follow,       # write path
        read_table, read_table_arrow,         # read path (streaming / test)
        get_rows, read_dlq,                   # point lookup / quarantine
        compact, compact_deltas, vacuum, fsck # maintenance
        export_partitioned,                   # resumable partitioned export
    )
"""

from .config import PAGES, REGISTRY, TableSpec, register  # noqa: F401
from .gen import WalSpec, generate_dataset  # noqa: F401


def __getattr__(name):  # lazy: keep `import etl_ray` free of Ray imports
    if name in (
        "bootstrap_lake", "replay", "follow", "replay_many", "StreamSpec",
        "read_table", "read_table_arrow", "get_rows", "read_dlq",
    ):
        from .pipelines import replay as _r

        return getattr(_r, name)
    if name in ("compact", "compact_deltas", "vacuum", "fsck", "repartition",
                "backfill", "export_partitioned"):
        from .pipelines import maintenance as _m

        return getattr(_m, name)
    raise AttributeError(name)
