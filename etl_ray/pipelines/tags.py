"""Named snapshot tags (lake refs): pin a committed txid under a
human name, read it back by name, and have vacuum protect the pinned
file sets automatically — the Iceberg-tag / git-tag shape for the lake.

Why a separate store instead of a manifest field: tags change on their
own cadence (release marks, audit pins) and must never contend with the
replay writer's commit path.  They live in ``<lake>/tags/commits/`` and
use the SAME conditional-put (create-exclusive sequence file) protocol
as the cross-table group pointer (``pipelines/groups.py``): two
concurrent taggers race on ``commits/{seq}.json``, exactly one wins,
the loser reloads the winner's record and retries on top of it — no
lost tag under any interleaving, no advisory lock needed.

Durability model matches the manifest: per-txid snapshots under
``manifests/{txid}.json`` are immutable and never vacuumed, so a tag
resolves for as long as its FILES survive; ``maintenance.vacuum``
unions the tagged txids into its keep-set, so tagging IS the retention
policy.  Reference analogue: the reference keeps no snapshot refs at
all (its ClickHouse state is overwrite-in-place,
/root/reference/src/pipeline/core/client_clickhouse.py) — target-added
lake capability.
"""

from __future__ import annotations

import os

from ..state.fs import resolve as _resolve_fs
from ..state.manifest import CommitConflict, LakeTable

_TAGS_DIRNAME = "tags"
_RETRIES = 16


def _fs(fs):
    """Spec string / None -> adapter; adapter objects pass through
    (same convention as LakeTable)."""
    return fs if fs is not None and not isinstance(fs, str) else _resolve_fs(fs)


def _tags_root(lake_root: str) -> str:
    return os.path.join(lake_root, _TAGS_DIRNAME)


def _head(f, lake_root: str) -> tuple[int, dict] | None:
    cdir = os.path.join(_tags_root(lake_root), "commits")
    if not f.exists(cdir):
        return None
    seqs = [
        int(n[:-5])
        for n in f.listdir(cdir)
        if n.endswith(".json") and n[:-5].isdigit()
    ]
    if not seqs:
        return None
    s = max(seqs)
    return s, f.read_json(os.path.join(cdir, f"{s:09d}.json"))


def list_tags(lake_root: str, fs=None) -> dict[str, str]:
    """Current {tag_name: txid} map (empty if nothing tagged)."""
    f = _fs(fs)
    head = _head(f, lake_root)
    return dict(head[1]["tags"]) if head else {}


def _publish(f, lake_root: str, update) -> dict[str, str]:
    """CAS loop: read head tags, apply ``update`` (a dict->dict pure
    function), win the next sequence file or retry on a racer's win."""
    cdir = os.path.join(_tags_root(lake_root), "commits")
    f.makedirs(cdir)
    for _ in range(_RETRIES):
        head = _head(f, lake_root)
        seq = (head[0] + 1) if head else 1
        tags = dict(head[1]["tags"]) if head else {}
        tags = update(tags)
        rec = {"seq": seq, "tags": tags}
        try:
            f.create_exclusive_json(os.path.join(cdir, f"{seq:09d}.json"), rec)
        except FileExistsError:
            continue  # lost the race — reload the winner's map and retry
        return tags
    raise CommitConflict(
        f"tag publish at {lake_root} lost {_RETRIES} consecutive races"
    )


def create_tag(
    lake_root: str,
    name: str,
    txid: str | None = None,
    *,
    replace: bool = False,
    fs=None,
) -> dict[str, str]:
    """Pin ``name`` to ``txid`` (default: the current committed head).

    Validates the txid resolves to a committed snapshot BEFORE
    publishing; refuses to move an existing tag unless ``replace=True``
    (retagging silently would un-protect the old snapshot's files at
    the next vacuum).  Returns the full tag map after the publish."""
    f = _fs(fs)
    lake = LakeTable(lake_root, fs=fs)
    if txid is None:
        txid = lake.read_manifest()["txid"]
    else:
        lake.manifest_at(txid)  # raises for unknown txids

    def update(tags: dict) -> dict:
        if not replace and name in tags and tags[name] != txid:
            raise ValueError(
                f"tag {name!r} already pins {tags[name]} (pass replace=True)"
            )
        tags[name] = txid
        return tags

    return _publish(f, lake_root, update)


def delete_tag(lake_root: str, name: str, fs=None) -> dict[str, str]:
    """Remove ``name``; its snapshot's files become vacuum-reclaimable
    (unless another tag or keep_txids still pins them).  Missing names
    raise KeyError."""
    f = _fs(fs)

    def update(tags: dict) -> dict:
        if name not in tags:
            raise KeyError(f"tag {name!r} does not exist")
        del tags[name]
        return tags

    return _publish(f, lake_root, update)


def resolve_tag(lake_root: str, name: str, fs=None) -> str:
    """The txid a tag pins.  Missing names raise KeyError."""
    tags = list_tags(lake_root, fs=fs)
    if name not in tags:
        raise KeyError(f"tag {name!r} does not exist (have: {sorted(tags)})")
    return tags[name]
