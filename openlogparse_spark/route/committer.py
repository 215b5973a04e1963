"""Sink-commit seam: how a finished staging directory becomes a visible sink.

The reference's writer confirms output via its own protocol (confirmed
scn/idx heap, /root/reference/src/writer/Writer.cpp:106-165,364-445); here the
analogue is a snapshot commit. On the sandbox's local FS that is a POSIX
rename; on the 100 TB deployment it would be an Iceberg table commit or an
S3A magic-committer finalize. `route_stage`/`atomic_overwrite` only ever talk
to this interface, so swapping the storage layer never touches the dataflow.

Implementations:
  - RenameCommitter: atomic POSIX dir rename (local FS, HDFS).
  - CopyCommitter: stages are *copied* file-by-file into a second staging
    area and renamed in one final step — models an object store where the
    staging area and the table live in different prefixes (no same-dir
    rename). Byte-identical results; used by tests to prove the seam.
"""

from __future__ import annotations

import os
import shutil


class Committer:
    """Make `staging_dir`'s contents the committed content of `path`."""

    def commit(self, staging_dir: str, path: str) -> None:  # pragma: no cover
        raise NotImplementedError

    def sweep(self, path: str) -> None:
        """Remove leftover uncommitted state for `path` from a prior crash."""
        for stale in (path + ".__tmp__", path + ".__old__"):
            if os.path.exists(stale):
                shutil.rmtree(stale)


class RenameCommitter(Committer):
    """Crash-safe rename swap: old aside → new in → old gone.

    No committed data is ever lost and readers never see a half-written mix;
    the single non-atomic instant (between the two renames) leaves the old
    snapshot recoverable at `<path>.__old__`.
    """

    def commit(self, staging_dir: str, path: str) -> None:
        old = path + ".__old__"
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(staging_dir, path)
        shutil.rmtree(old, ignore_errors=True)


class CopyCommitter(Committer):
    """Object-store-shaped commit: copy staged files under a fresh prefix,
    then a single final swap. Slower (full byte copy) but never assumes
    same-directory rename between staging and table locations."""

    def commit(self, staging_dir: str, path: str) -> None:
        shadow = path + ".__copy__"
        if os.path.exists(shadow):
            shutil.rmtree(shadow)
        shutil.copytree(staging_dir, shadow)
        RenameCommitter().commit(shadow, path)
        shutil.rmtree(staging_dir, ignore_errors=True)

    def sweep(self, path: str) -> None:
        super().sweep(path)
        if os.path.exists(path + ".__copy__"):
            shutil.rmtree(path + ".__copy__")


DEFAULT_COMMITTER = RenameCommitter()
