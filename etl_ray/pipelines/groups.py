"""Cross-table transaction groups: one atomically-published pointer
maps every member table to a committed txid, giving readers a
CONSISTENT multi-table snapshot.

The reference runs 18 topic consumers with NO cross-topic consistency —
a reader joining two of its tables can see topic A's latest batch next
to topic B's hour-old state (`kafka_multi_consumer.py:100-129` in
/root/reference commits each consumer independently).  Here the
per-table manifests stay independent (a member failing mid-replay never
corrupts the others, and per-table exactly-once/resume semantics are
unchanged), but a GROUP pointer file is swapped atomically only after
EVERY member's transaction committed.  Readers that resolve tables
through :func:`group_snapshot` + ``read_table(at_txid=...)`` therefore
see member states that were published together — never a torn pair.

Crash semantics (the two-phase shape, replayed instead of locked):

* crash after some member commits, before the group publish — the group
  pointer still names the previous consistent set; each member's commit
  is durable and idempotent, so re-running :func:`replay_group` no-ops
  the already-applied segments and publishes the pointer;
* the pointer write itself is one ``write_json_atomic`` (tmp +
  ``os.replace``), the same primitive the per-table manifest uses.

Time travel composes: any historical group entry (``history``) can be
read consistently as long as ``vacuum`` has not reclaimed the member
snapshots it names.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from ..state.fs import resolve as _resolve
from ..state.manifest import LakeTable
from .replay import ReplayStats, StreamSpec, replay_many

_HISTORY_CAP = 256


@dataclass
class GroupSnapshot:
    gtxid: str
    members: dict[str, dict]  # name -> {"lake_root": ..., "txid": ...}


def _group_path(group_root: str) -> str:
    return os.path.join(group_root, "GROUP.json")


def read_group(group_root: str, fs=None) -> dict:
    """The raw committed group record (gtxid, members, history)."""
    return _resolve(fs).read_json(_group_path(group_root))


def group_snapshot(group_root: str, gtxid: str | None = None, fs=None) -> GroupSnapshot:
    """Resolve a consistent multi-table snapshot: the latest published
    group, or a historical one by gtxid."""
    rec = read_group(group_root, fs=fs)
    if gtxid is None or gtxid == rec["gtxid"]:
        return GroupSnapshot(rec["gtxid"], rec["members"])
    for h in rec["history"]:
        if h["gtxid"] == gtxid:
            return GroupSnapshot(h["gtxid"], h["members"])
    raise FileNotFoundError(f"group txid {gtxid!r} not in history")


def read_group_table(group_root: str, name: str, fs=None, **read_kwargs):
    """Stream one member table AT the group-consistent txid (delegates
    to ``read_table(at_txid=...)``)."""
    from .replay import read_table

    snap = group_snapshot(group_root, fs=fs)
    m = snap.members[name]
    return read_table(m["lake_root"], at_txid=m["txid"], fs=fs, **read_kwargs)


def replay_group(
    streams: dict[str, StreamSpec],
    group_root: str,
    fs=None,
    max_workers: int | None = None,
) -> dict[str, ReplayStats]:
    """Apply every member stream's pending WAL (concurrently, one
    manifest transaction chain per table — exactly the
    :func:`replay_many` path), then publish the group pointer naming
    each member's new head txid in ONE atomic swap.  Idempotent: re-runs
    no-op the replays and republish the same heads."""
    f = _resolve(fs)
    stats = replay_many(streams, max_workers=max_workers)

    members = {}
    for name, s in streams.items():
        members[name] = {
            "lake_root": s.lake_root,
            "txid": LakeTable(s.lake_root, fs=fs).read_manifest()["txid"],
        }

    path = _group_path(group_root)
    try:
        prev = f.read_json(path)
    except FileNotFoundError:
        prev = None
    seq = (int(prev["gtxid"][3:]) + 1) if prev else 1
    history = []
    if prev:
        history = ([{"gtxid": prev["gtxid"], "members": prev["members"]}]
                   + prev.get("history", []))[:_HISTORY_CAP]
    f.makedirs(group_root)
    f.write_json_atomic(
        path,
        {
            "gtxid": f"gtx{seq:06d}",
            "members": members,
            "history": history,
        },
    )
    return stats
