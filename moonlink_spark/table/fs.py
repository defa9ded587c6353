"""Filesystem seam for the table control plane.

The DATA plane (parquet scan/write) already goes through Spark's Hadoop
filesystem layer, so ``s3a://`` / ``gs://`` data paths work wherever the
cluster has the connector jars. The CONTROL plane — manifest publication,
adopting shuffle-written files into the table layout, WAL journals,
vacuum — uses this seam instead of raw ``os`` calls, so an object-storage
warehouse needs exactly one new class, not a rewrite.

Parity note: the reference isolates all storage access behind a
``BaseFileSystemAccess`` trait with local/S3/GCS implementations
(``src/moonlink/src/storage/filesystem/accessor_config.rs``,
``filesystem/accessor/``); this module is that seam re-expressed at the
scale this engine needs (the atomic-publish primitive plus a handful of
directory ops).

The one primitive with real semantics is ``publish_exclusive``: commit
N must fail cleanly if another writer already published N. LocalFS uses
``os.link`` (EEXIST on the loser). An S3 implementation would use a
conditional PUT (``If-None-Match: *``); GCS, ``x-goods-if-generation-
match: 0``. Everything else is plain file IO.
"""

from __future__ import annotations

import os
import shutil
from typing import BinaryIO, TextIO

from moonlink_spark.errors import TableConfigError


class CommitRaceLost(FileExistsError):
    """publish_exclusive lost: the target version already exists."""


class LocalFS:
    """POSIX implementation — the only one bundled (no object-store creds
    or connector jars in this environment)."""

    # -- directories --------------------------------------------------------

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    # -- files --------------------------------------------------------------

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def getsize(self, path: str) -> int:
        return os.path.getsize(path)

    def open_read(self, path: str) -> TextIO:
        return open(path)

    def open_read_binary(self, path: str) -> BinaryIO:
        return open(path, "rb")

    def write_text_durable(self, path: str, data: str) -> None:
        """Write + flush + fsync (WAL/manifest durability)."""
        with open(path, "w") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())

    def append_text_durable(self, path: str, data: str) -> None:
        with open(path, "a") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())

    def unlink(self, path: str) -> None:
        os.unlink(path)

    def rename(self, src: str, dst: str) -> None:
        """Move within the store (adopting a shuffle-written file)."""
        os.rename(src, dst)

    def copyfile(self, src: str, dst: str) -> None:
        shutil.copyfile(src, dst)

    def publish_exclusive(self, tmp: str, final: str) -> None:
        """Atomically publish ``tmp`` as ``final``; raise CommitRaceLost if
        ``final`` already exists. Loser never leaves a half-written file.
        ``tmp`` is always consumed (removed)."""
        try:
            os.link(tmp, final)
        except FileExistsError as e:
            raise CommitRaceLost(final) from e
        finally:
            os.unlink(tmp)


def fs_for(path: str) -> LocalFS:
    """Resolve the filesystem for a table/warehouse root. Only local paths
    are implemented in this build; object-store URIs fail loudly here (the
    single place to plug an S3/GCS class in) instead of corrupting state
    with POSIX calls against a URI string."""
    if "://" in path and not path.startswith("file://"):
        raise TableConfigError(
            f"object-storage warehouse {path!r} needs a TableFS "
            "implementation for this scheme (see moonlink_spark/table/fs.py "
            "and README 'Object storage'); only local paths are bundled"
        )
    return LocalFS()
