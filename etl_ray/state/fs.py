"""Filesystem adapter for the lake data path.

The reference keeps all data in MinIO via s3a
(`src/pipeline/core/minio_client.py:83-116`, `spark.py:621-625` in
/root/reference).  This adapter threads a ``pyarrow.fs.FileSystem``
through every lake I/O (manifest read/swap, staging writes, part-file
promotion, vacuum) so an object-store lake is a CONFIGURATION, not a
rewrite.  Two implementations ship:

* ``local-os`` (default): plain ``os``/``shutil`` calls — byte-for-byte
  the historical behavior, atomic ``os.replace`` publish.
* ``pyarrow-local``: the same laid over ``pyarrow.fs.LocalFileSystem``
  — the sandbox stand-in for a remote ``pyarrow.fs`` store.  The whole
  test suite runs green on it (ETLRAY_FS=pyarrow-local).

Atomic publish on a real object store: ``move`` on S3 is copy+delete —
NOT atomic.  The commit protocol therefore does NOT depend on rename
atomicity for correctness: every transaction is decided by
``create_exclusive_json`` — an atomic PUT-IF-ABSENT of the next
sequenced commit record (``commits/{seq:09d}.json``) — which maps 1:1
onto the object stores' native conditional put (S3 ``If-None-Match: *``,
GCS ``ifGenerationMatch=0``, Azure ``If-None-Match: *``).  Exactly one
of two racing writers creates the record; the loser gets
``FileExistsError`` and must reload + retry.  The mutable root
(``MANIFEST.json`` / ``GROUP.json`` / ``VIEW.json``) is demoted to a
read-optimized CACHE of the commit head: readers repair it from the
commit log when it lags, so a non-atomic root swap can never lose or
tear a transaction.  The local adapters emulate the conditional put
with ``os.link`` (atomic fail-if-exists on POSIX, including NFS); a
remote adapter overrides ``create_exclusive_json`` with the store's
native conditional write.

Adapters are addressed by a SPEC STRING so Ray tasks can reconstruct
them worker-side without shipping filesystem handles: ``resolve(spec)``.
"""

from __future__ import annotations

import json
import os
import shutil


class OsFS:
    """Plain-os adapter (default): atomic rename publish."""

    spec = "local-os"
    #: pass to pyarrow.parquet / ray.data readers as filesystem=
    pyarrow_fs = None

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def replace(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def remove(self, path: str) -> None:
        try:
            os.remove(path)
        except FileNotFoundError:
            pass

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def read_json(self, path: str) -> dict:
        with open(path) as f:
            return json.load(f)

    def write_json_atomic(self, path: str, obj: dict) -> None:
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(obj, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def write_json(self, path: str, obj: dict) -> None:
        with open(path, "w") as f:
            json.dump(obj, f, indent=1)

    def create_exclusive_json(self, path: str, obj: dict) -> None:
        """Atomic put-if-absent — the object-store conditional put.
        Raises FileExistsError when an object already exists at ``path``
        (the CAS loss signal).  ``os.link`` is the POSIX emulation: the
        link either creates ``path`` or fails EEXIST, atomically."""
        _link_exclusive_json(path, obj)


class PyArrowFS:
    """pyarrow.fs-backed adapter; LocalFileSystem here, any
    pyarrow.fs.FileSystem (S3/GCS) by extension via ``resolve``."""

    def __init__(self, fs=None, spec: str = "pyarrow-local"):
        import pyarrow.fs as pafs

        self.fs = fs or pafs.LocalFileSystem()
        self.spec = spec

    @property
    def pyarrow_fs(self):
        return self.fs

    def exists(self, path: str) -> bool:
        import pyarrow.fs as pafs

        return self.fs.get_file_info(path).type != pafs.FileType.NotFound

    def makedirs(self, path: str) -> None:
        self.fs.create_dir(path, recursive=True)

    def replace(self, src: str, dst: str) -> None:
        # LocalFileSystem.move is rename(2) (atomic); on S3-like stores
        # it is copy+delete — see module docstring for the commit story
        self.fs.move(src, dst)

    def remove(self, path: str) -> None:
        try:
            self.fs.delete_file(path)
        except FileNotFoundError:
            pass

    def rmtree(self, path: str) -> None:
        try:
            self.fs.delete_dir(path)
        except FileNotFoundError:
            pass

    def listdir(self, path: str) -> list[str]:
        import pyarrow.fs as pafs

        sel = pafs.FileSelector(path, recursive=False)
        return [os.path.basename(i.path) for i in self.fs.get_file_info(sel)]

    def read_json(self, path: str) -> dict:
        with self.fs.open_input_stream(path) as f:
            return json.loads(f.read().decode())

    def write_json_atomic(self, path: str, obj: dict) -> None:
        tmp = f"{path}.tmp.{os.getpid()}"
        with self.fs.open_output_stream(tmp) as f:
            f.write(json.dumps(obj, indent=1).encode())
        self.fs.move(tmp, path)

    def write_json(self, path: str, obj: dict) -> None:
        with self.fs.open_output_stream(path) as f:
            f.write(json.dumps(obj, indent=1).encode())

    def create_exclusive_json(self, path: str, obj: dict) -> None:
        """Atomic put-if-absent.  pyarrow's filesystem API exposes no
        conditional write, so the LocalFileSystem stand-in uses the same
        ``os.link`` emulation as OsFS (paths are local).  A remote
        S3/GCS adapter MUST override this with the store's native
        conditional put (If-None-Match / ifGenerationMatch=0) — the
        loud error below is the port checklist item."""
        import pyarrow.fs as pafs

        if not isinstance(self.fs, pafs.LocalFileSystem):
            raise NotImplementedError(
                "conditional put requires the store's native API; "
                "override create_exclusive_json in the remote adapter"
            )
        _link_exclusive_json(path, obj)


import itertools as _itertools

_cas_counter = _itertools.count()


def _link_exclusive_json(path: str, obj: dict) -> None:
    """Write ``obj`` to a tmp file, then atomically link it to ``path``.
    ``os.link`` fails with EEXIST if ``path`` exists — exactly one of N
    racing callers wins, with no lock and no TOCTOU window."""
    import threading

    tmp = (
        f"{path}.cas.{os.getpid()}.{threading.get_ident()}"
        f".{next(_cas_counter)}"
    )
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, path)
    finally:
        os.unlink(tmp)


def resolve(spec: str | None = None):
    """Adapter from a spec string (worker-side reconstruction).  None
    consults ``ETLRAY_FS`` (default ``local-os``)."""
    spec = spec or os.environ.get("ETLRAY_FS", "local-os")
    if spec == "local-os":
        return OsFS()
    if spec == "pyarrow-local":
        return PyArrowFS()
    raise ValueError(f"unknown filesystem spec {spec!r}")
