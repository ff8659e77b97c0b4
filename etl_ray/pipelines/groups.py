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
* the pointer publish is a conditional put of the next sequenced record
  under ``commits/`` (the same put-if-absent primitive the per-table
  manifest commit uses, ``state/fs.py``): two concurrent publishers
  cannot mint the same gtxid, and the loser retries on top of the
  winner — ``GROUP.json`` is just a cache of the commit-log head.

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


def _group_head(f, group_root: str) -> tuple[int, dict] | None:
    """Highest committed (seq, record) in the group commit log; falls
    back to the GROUP.json pointer for pre-commit-log group dirs."""
    cdir = os.path.join(group_root, "commits")
    if f.exists(cdir):
        seqs = [
            int(n[:-5])
            for n in f.listdir(cdir)
            if n.endswith(".json") and n[:-5].isdigit()
        ]
        if seqs:
            s = max(seqs)
            return s, f.read_json(os.path.join(cdir, f"{s:09d}.json"))
    try:
        rec = f.read_json(_group_path(group_root))
        return int(rec["gtxid"][3:]), rec
    except FileNotFoundError:
        return None


def read_group(group_root: str, fs=None) -> dict:
    """The raw committed group record (gtxid, members, history).
    GROUP.json is a cache of the commit-log head; if a publisher crashed
    between winning the conditional put and refreshing the pointer, the
    head is adopted (and the cache repaired, best-effort)."""
    f = _resolve(fs)
    rec = f.read_json(_group_path(group_root))
    head = _group_head(f, group_root)
    if head is not None and head[0] > int(rec["gtxid"][3:]):
        rec = head[1]
        try:
            f.write_json_atomic(_group_path(group_root), rec)
        except OSError:
            pass
    return rec


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
    cdir = os.path.join(group_root, "commits")
    f.makedirs(group_root)
    f.makedirs(cdir)
    # Mint the next gtxid via conditional put: two concurrent group
    # publishers both reading head S race on commits/{S+1}.json; exactly
    # one wins, the loser re-reads the winner's record and re-publishes
    # on top of it (its members are already durably committed, so the
    # retry is pure pointer work — no lost history entry either way).
    from ..state.manifest import CommitConflict

    for _ in range(16):
        head = _group_head(f, group_root)
        seq = (head[0] + 1) if head else 1
        prev = head[1] if head else None
        history = []
        if prev:
            history = ([{"gtxid": prev["gtxid"], "members": prev["members"]}]
                       + prev.get("history", []))[:_HISTORY_CAP]
        rec = {
            "gtxid": f"gtx{seq:06d}",
            "members": members,
            "history": history,
        }
        try:
            f.create_exclusive_json(
                os.path.join(cdir, f"{seq:09d}.json"), rec
            )
        except FileExistsError:
            continue  # another publisher won this seq — reload and retry
        f.write_json_atomic(path, rec)  # pointer cache refresh
        return stats
    raise CommitConflict(
        f"group publish at {group_root} lost 16 consecutive races"
    )
