"""LazyDataFrame surface — reference ``library.py:442-817`` (``lazy=True``
reads, ``col()``, ``LazyDataFrameCollection``, ``concat``).

Spark DataFrames are lazy natively; this wrapper exists for API parity: it
records QueryBuilder clauses *after* a read was requested and materializes
on ``collect()``. ``collect()`` returns the distributed DataFrame (call
``.toPandas()``/``.toArrow()`` for local data) — at 100 TB you almost never
want driver-side collection."""

from __future__ import annotations

from arcticdb_spark.query import QueryBuilder
from arcticdb_spark.expr import ExpressionNode


class LazyDataFrame(QueryBuilder):
    """A pending read + clause chain. Supports the same fluent ops as
    QueryBuilder plus ``collect()``."""

    def __init__(self, lib, symbol: str, read_kwargs: dict | None = None):
        super().__init__()
        self._lib = lib
        self._symbol = symbol
        self._read_kwargs = read_kwargs or {}

    def __repr__(self):
        return (f"LazyDataFrame({self._symbol!r}, "
                f"clauses={[k for k, _ in self._clauses]})")

    # -- pickling (reference test_lazy_dataframe.py::test_lazy_pickling):
    # the clause chain and read params serialize; the Library handle is
    # re-opened on unpickle (local-fs libraries only — an object-store fs
    # holds a live client and must be re-created by the caller)
    def __getstate__(self):
        from arcticdb_spark.sources.filesystem import LocalFileSystem
        if not isinstance(self._lib._fs, LocalFileSystem):
            raise TypeError("LazyDataFrame over an object-store library "
                            "cannot be pickled; collect() first")
        st = dict(self.__dict__)
        lib = st.pop("_lib")
        st["_lib_ref"] = (lib.root.rsplit("/", 1)[0], lib.name)
        return st

    def __setstate__(self, st):
        ref = st.pop("_lib_ref")
        self.__dict__.update(st)
        self.__dict__["_lib"] = None
        self.__dict__["_lib_pending"] = ref

    def collect(self):
        if self.__dict__.get("_lib") is None and "_lib_pending" in self.__dict__:
            from arcticdb_spark.catalog import Library
            from arcticdb_spark.session import get_spark
            root, name = self.__dict__.pop("_lib_pending")
            self.__dict__["_lib"] = Library(get_spark(), root, name)
        kw = dict(self._read_kwargs)
        kw["query_builder"] = self
        return self._lib.read(self._symbol, **kw)


class LazyDataFrameCollection:
    """Reference ``LazyDataFrameCollection``: N lazy reads sharing an
    optional clause chain; ``concat`` merges them into one LazyDataFrame."""

    def __init__(self, lazy_dfs: list[LazyDataFrame]):
        self._dfs = list(lazy_dfs)

    def lazy_dataframes(self) -> list[LazyDataFrame]:
        return self._dfs

    def collect(self):
        return [df.collect() for df in self._dfs]

    def concat(self, join: str = "outer"):
        from arcticdb_spark.operators.concat import concat as _concat
        frames = [df.collect() for df in self._dfs]
        return _concat(frames, join=join)


def concat(collection_or_dfs, join: str = "outer"):
    if isinstance(collection_or_dfs, LazyDataFrameCollection):
        return collection_or_dfs.concat(join)
    from arcticdb_spark.operators.concat import concat as _concat
    return _concat(list(collection_or_dfs), join=join)
