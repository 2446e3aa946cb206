"""Key-level library introspection and admin surface.

Mirrors the reference's debugging toolbox (``python/arcticdb/toolbox/
library_tool.py`` LibraryTool; ``python/arcticdb/version_store/library.py:845``
AdminTools.remove_incompletes, ``library.py:852`` Library.library_tool): list
the physical "keys" behind a symbol, read any of them raw, and clean up
staged (incomplete) data in bulk.

Spark-first mapping of the reference's key types onto this engine's layout:

==================  =====================================================
reference KeyType   this engine
==================  =====================================================
VERSION_REF         ``_ref.json`` per symbol (latest-version pointer)
VERSION             one manifest JSON per committed version
TABLE_DATA          the parquet data files a version's manifest points at
APPEND_DATA         staged (incomplete) parquet chunks awaiting finalize
SNAPSHOT_REF        one snapshot JSON per named snapshot
==================  =====================================================
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

KEY_TYPES = ["VERSION_REF", "VERSION", "TABLE_DATA", "APPEND_DATA",
             "SNAPSHOT_REF"]


@dataclass(frozen=True)
class Key:
    """One physical object behind a symbol (reference AtomKey analogue:
    ``toolbox/library_tool.py:31`` props_dict_to_atom_key)."""
    key_type: str
    symbol: str | None
    path: str
    version: int | None = None
    rows: int | None = None
    ts_min: Any = None
    ts_max: Any = None


class LibraryTool:
    """Reference ``LibraryTool`` analogue bound to one Library."""

    def __init__(self, lib):
        self._lib = lib

    @staticmethod
    def key_types() -> list[str]:
        return list(KEY_TYPES)

    def _version_numbers(self, symbol: str) -> list[int]:
        """Every committed version number on disk, including tombstoned
        ones still awaiting GC — a debugging tool shows physical state."""
        lib = self._lib
        vdir = lib._fs.join(lib._sym_dir(symbol), "_versions")
        if not lib._fs.isdir(vdir):
            return []
        return sorted(int(fn[1:-5]) for fn in lib._fs.listdir(vdir)
                      if fn.startswith("v") and fn.endswith(".json"))

    # -- key discovery ----------------------------------------------------
    def find_keys_for_symbol(self, key_type: str, symbol: str) -> list[Key]:
        """All keys of ``key_type`` for ``symbol`` (reference
        find_keys_for_symbol, toolbox/library_tool.py:67)."""
        lib = self._lib
        if key_type == "VERSION_REF":
            try:
                gen, _ref = lib._load_ref_gen(symbol)
            except Exception:
                return []
            return [Key("VERSION_REF", symbol,
                        lib._ref_gen_path(symbol, gen))]
        if key_type == "VERSION":
            out = []
            for v in self._version_numbers(symbol):
                try:
                    m = lib._load_manifest(symbol, v)
                except Exception:
                    # GC tombstone stub: physical key exists, no manifest
                    out.append(Key("VERSION", symbol,
                                   lib._ver_path(symbol, v), version=v))
                    continue
                out.append(Key("VERSION", symbol, lib._ver_path(symbol, v),
                               version=v, rows=m.total_rows,
                               ts_min=m.ts_min, ts_max=m.ts_max))
            return out
        if key_type == "TABLE_DATA":
            m = lib._resolve_version(symbol, None)
            return [Key("TABLE_DATA", symbol, fe.path, version=m.version,
                        rows=fe.rows, ts_min=fe.ts_min, ts_max=fe.ts_max)
                    for fe in m.files]
        if key_type == "APPEND_DATA":
            return [Key("APPEND_DATA", symbol, p)
                    for p in lib._staged_segment_files(symbol)]
        if key_type == "SNAPSHOT_REF":
            out = []
            for s in lib.list_snapshots():
                snap = lib._load_snapshot(s)
                if symbol in snap.get("symbols", {}):
                    out.append(Key("SNAPSHOT_REF", symbol,
                                   lib._snap_path(s),
                                   version=snap["symbols"][symbol]))
            return out
        raise ValueError(f"unknown key type {key_type!r} "
                         f"(one of {KEY_TYPES})")

    def find_keys(self, key_type: str) -> list[Key]:
        """All keys of a type across the library."""
        out = []
        for sym in self._lib.list_symbols():
            out.extend(self.find_keys_for_symbol(key_type, sym))
        return out

    # -- raw reads --------------------------------------------------------
    def read_to_dataframe(self, key: Key):
        """Read one key's physical content: parquet keys come back as a
        pandas frame (reference read_to_dataframe); JSON keys as a dict."""
        if key.key_type in ("TABLE_DATA", "APPEND_DATA"):
            import pyarrow.parquet as pq
            return pq.read_table(key.path).to_pandas()
        return self._lib._fs.read_json(key.path)

    def version_layout(self, symbol: str, as_of=None) -> list[dict]:
        """File-level layout of one version: path, rows, row-id range, ts
        range, schema epoch — the 'which segment holds row N / time T'
        question the reference answers with read_index + key listing."""
        m = self._lib._resolve_version(symbol, as_of)
        return [{"path": fe.path, "rows": fe.rows,
                 "row_start": fe.row_start,
                 "row_end": fe.row_start + fe.rows,
                 "ts_min": fe.ts_min, "ts_max": fe.ts_max,
                 "content_hash": fe.content_hash,
                 "schema_epoch": bool(fe.schema_json
                                      and fe.schema_json != m.schema_json)}
                for fe in m.files]

