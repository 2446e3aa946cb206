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

    __str__ = __repr__

    def _collect_schema(self):
        """Reference private spelling (test_lazy_dataframe.py uses it)."""
        return self.collect_schema()

    # -- pickling (reference test_lazy_dataframe.py::test_lazy_pickling):
    # the clause chain and read params serialize; the Library handle is
    # re-opened on unpickle (local-fs libraries only — an object-store fs
    # holds a live client and must be re-created by the caller)
    def __getstate__(self):
        from arcticdb_spark.sources.filesystem import LocalFileSystem
        if self.__dict__.get("_lib") is None:
            # already in reduced form (a deepcopy of a deepcopy — read()
            # copies the builder once per clause-appending kwarg): the
            # state is picklable as-is, _lib_pending included
            return dict(self.__dict__)
        if not isinstance(self._lib._fs, LocalFileSystem):
            raise TypeError("LazyDataFrame over an object-store library "
                            "cannot be pickled; collect() first")
        st = dict(self.__dict__)
        lib = st.pop("_lib")
        st["_lib_ref"] = (lib.root.rsplit("/", 1)[0], lib.name)
        return st

    def __setstate__(self, st):
        if "_lib_ref" not in st:
            # state was already in reduced form (see __getstate__)
            self.__dict__.update(st)
            return
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

    def collect_schema(self):
        """Result schema WITHOUT executing (reference LazyDataFrame
        ``_collect_schema``, test_collect_schema.py): Spark plans are lazy,
        so building the read plan and taking its analyzed schema runs
        catalog/metadata work only — no data job. Returns the Spark
        ``StructType`` (engine-native schema form); honors as_of /
        date_range / columns and the pending clause chain."""
        kw = dict(self._read_kwargs)
        kw["query_builder"] = self
        kw["output_format"] = "spark"  # schema only — never materialize
        return self._lib.read(self._symbol, **kw).schema


class LazyDataFrameCollection:
    """Reference ``LazyDataFrameCollection``: N lazy reads sharing an
    optional clause chain; ``concat`` merges them into one LazyDataFrame."""

    def __init__(self, lazy_dfs: list[LazyDataFrame]):
        self._dfs = list(lazy_dfs)

    def __repr__(self):
        return f"LazyDataFrameCollection({self._dfs!r})"

    __str__ = __repr__

    def lazy_dataframes(self) -> list[LazyDataFrame]:
        return self._dfs

    def split(self) -> list[LazyDataFrame]:
        """Reference ``LazyDataFrameCollection.split`` (library.py:616):
        separate into per-symbol LazyDataFrames, keeping each frame's
        already-applied clause chain."""
        return list(self._dfs)

    def __iter__(self):
        return iter(self._dfs)

    def __len__(self):
        return len(self._dfs)

    def __getitem__(self, i):
        return self._dfs[i]

    def collect(self):
        return [df.collect() for df in self._dfs]

    def concat(self, join: str = "outer"):
        return ConcatLazyFrame(self._dfs, join)


class ConcatLazyFrame(QueryBuilder):
    """``concat()`` over lazy reads — reference ``adb.concat`` returning a
    LazyDataFrame (library.py; pinned by test_symbol_concatenation.py).

    Further QueryBuilder clauses chain onto the concatenated frame; the
    index/schema validation the reference performs at collect() time runs
    here too:

    * all symbols must share an index *kind* — range vs timestamp vs
      multiindex (and level count) — else SchemaException
      (test_symbol_concat_symbols_with_different_indexes);
    * pickled / recursively-normalized symbols refuse to concat
      (test_symbol_concat_pickled_data);
    * a missing symbol/version raises NoSuchVersionException at collect
      (test_symbol_concat_non_existent_symbol);
    * index level names merge positionally — kept when identical across all
      symbols, demoted to the unnamed convention otherwise
      (test_symbol_concat_differently_named_timeseries /
      _multiindexes).
    """

    def __init__(self, lazy_dfs: list[LazyDataFrame], join: str = "outer"):
        super().__init__()
        self._dfs = list(lazy_dfs)
        self._join = join

    def collect(self, output_format: str | None = None):
        from arcticdb_spark.catalog import SchemaException
        from arcticdb_spark.operators.concat import concat as _concat

        descs = []
        for ldf in self._dfs:
            lib, sym = ldf._lib, ldf._symbol
            m = lib._resolve_version(sym, ldf._read_kwargs.get("as_of"))
            if lib._is_pickled(m) or lib._is_recursive(m):
                raise SchemaException(
                    f"{sym!r} holds pickled/recursive data and cannot be "
                    "concatenated")
            nm = m.norm_meta or {}
            tzs = dict(nm.get("tzs") or {})
            if nm.get("index_type") == "multiindex":
                descs.append(("multiindex", list(nm["physical"]),
                              list(nm["level_names"]), tzs))
            elif m.index_column is None:
                descs.append(("range", [], [], tzs))
            else:
                # display name: None when the symbol's index was unnamed
                display = (None if nm.get("fake_name")
                           else nm.get("orig_name", m.index_column))
                descs.append(("ts", [m.index_column], [display], tzs))
        kinds = {d[0] for d in descs}
        if len(kinds) > 1 or len({len(d[1]) for d in descs}) > 1:
            raise SchemaException(
                "cannot concatenate symbols with incompatible index types: "
                + ", ".join(f"{ldf._symbol}={d[0]}({len(d[1])})"
                            for ldf, d in zip(self._dfs, descs)))

        kind = descs[0][0]
        nlev = len(descs[0][1])
        # merge physical index column names positionally: identical names
        # survive, mismatches demote to the unnamed convention ("ts" for
        # level 0, __fkidx__<i> beyond)
        merged_phys, merged_names = [], []
        for i in range(nlev):
            names_i = {d[1][i] for d in descs}
            display_i = {d[2][i] for d in descs}
            if len(names_i) == 1:
                merged_phys.append(descs[0][1][i])
                merged_names.append(descs[0][2][i]
                                    if len(display_i) == 1 else None)
            else:
                merged_phys.append("ts" if i == 0 else f"__fkidx__{i}")
                merged_names.append(None)

        # timezone merge (reference test_symbol_concat_timezone_handling /
        # _multiindex_timezone_handling): a column keeps its zone only when
        # EVERY symbol stores the same zone for it; any disagreement (or a
        # naive participant) demotes to naive UTC values
        all_tzs = []
        for d in descs:
            ren = dict(zip(d[1], merged_phys))
            all_tzs.append({ren.get(c, c): tz for c, tz in d[3].items()})
        merged_tzs = {}
        for c in set().union(*all_tzs) if all_tzs else set():
            zones = {t.get(c) for t in all_tzs}
            if len(zones) == 1 and None not in zones:
                merged_tzs[c] = zones.pop()

        frames = []
        for ldf, d in zip(self._dfs, descs):
            # intermediate frames are ALWAYS Spark (the library's default
            # output format must not leak pandas frames into the union)
            kw = dict(ldf._read_kwargs)
            kw["query_builder"] = ldf
            kw["output_format"] = "spark"
            df = ldf._lib.read(ldf._symbol, **kw)
            for old, new in zip(d[1], merged_phys):
                if old != new:
                    df = df.withColumnRenamed(old, new)
            frames.append(df)
        out = _concat(frames, join=self._join, index_cols=merged_phys)
        idx_col = merged_phys[0] if merged_phys else None
        out = self._run(out, idx_col)
        fmt = output_format or getattr(
            self._dfs[0]._lib, "_default_output_format", "spark")
        if fmt == "spark":
            return out
        if kind == "multiindex":
            norm = {"index_type": "multiindex", "physical": merged_phys,
                    "level_names": merged_names}
        elif kind == "ts":
            # pandas output re-promotes the datetime index like a single
            # read would (reference assert_frame_equal against pd.concat
            # with the index intact; unnamed when symbols disagree)
            norm = {"index_type": "datetime", "physical": merged_phys[0],
                    "fake_name": merged_names[0] is None}
            if (merged_names[0] is not None
                    and merged_names[0] != merged_phys[0]):
                norm["orig_name"] = merged_names[0]
        else:
            norm = None
        if merged_tzs:
            norm = {**(norm or {}), "tzs": merged_tzs}
        from arcticdb_spark.catalog import Library
        return Library._format_output(out, fmt, norm)


def concat(collection_or_dfs, join: str = "outer"):
    if isinstance(collection_or_dfs, LazyDataFrameCollection):
        return collection_or_dfs.concat(join)
    items = list(collection_or_dfs)
    if items and isinstance(items[0], LazyDataFrame):
        return ConcatLazyFrame(items, join)
    from arcticdb_spark.operators.concat import concat as _concat
    return _concat(items, join=join)
