"""Metadata filesystem abstraction for the catalog.

The Library's *data* paths are already backend-transparent (Spark and
pyarrow both speak s3a://, abfss://, file:// URIs); this interface covers
the *metadata* operations (small JSON manifests) so an object-store backend
is an 8-method implementation:

* ``write_json_atomic`` — local: temp file + rename; S3: single PUT (PUTs
  are atomic per key).
* ``write_json_if_absent`` — the version-commit CAS. Local: ``os.link``
  (fails EEXIST on a lost race); S3: conditional PUT with
  ``If-None-Match: *``; GCS: ``x-goods-if-generation-match: 0``; Azure:
  ``If-None-Match: *``. This is the exact analogue of the reference's
  VERSION_REF compare-and-swap (``version/version_map.hpp``).

Only ``LocalFileSystem`` ships (no object store reachable from this
container); the catalog takes any implementation of this protocol.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid


class LocalFileSystem:
    """Posix-mounted metadata store (also covers NFS/FUSE-mounted buckets)."""

    def join(self, *parts: str) -> str:
        return os.path.join(*parts)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def listdir(self, path: str) -> list[str]:
        return sorted(os.listdir(path))

    def remove(self, path: str) -> None:
        os.remove(path)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def read_json(self, path: str):
        with open(path) as f:
            return json.load(f)

    def write_json_atomic(self, path: str, obj) -> None:
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(obj, f)
        os.replace(tmp, path)

    def write_json_if_absent(self, path: str, obj) -> bool:
        """Create-if-absent CAS; returns False if another writer won."""
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(obj, f)
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            os.remove(tmp)
