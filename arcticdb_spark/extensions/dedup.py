"""Deduplication operators for training-data pipelines.

Every stage is built from JVM-side column expressions (md5 / array ops /
joins) — no Python in the hot path — and every shuffle is on a key designed
to stay small:

* **exact_dedup** — hash-groupBy on a normalized fingerprint. One shuffle on
  a 32-char key; at 100 TB combine map-side, or pre-bucket by fingerprint.
* **MinHash + LSH** — shingle -> per-seed min of md5(seed||shingle) ->
  band keys -> self-join on band key. The expensive O(n²) similarity join is
  reduced to equi-joins on short band-hash keys (standard LSH banding), which
  Spark executes as ordinary shuffle joins with AQE skew handling.
  md5 is used as the hash family (seeded by prefixing) because it is
  available and bit-identical in Spark, DuckDB and Python — so the whole
  pipeline is oracle-checkable; lexicographic min over hex strings is a
  valid uniform min-hash.
* **SimHash** — 64-bit (here 32-bit for portable integer math) weighted
  bit-vote over token hashes; near-dups = same value in any rotated band.
* **n-gram Jaccard** — exact verify step on LSH candidates (array_intersect /
  array_union on token-set arrays).
* **embedding near-dup** — cosine over the embedding column; see
  similarity.py for the ANN path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from arcticdb_spark.extensions.text import fingerprint, tokens
from arcticdb_spark.extensions.text import quality_score as _quality_score

# Persisted intermediates (signature / band tables) registered here so a
# long-lived session doing repeated dedup can release executor memory:
# call unpersist_all() after consuming the result (bench.py does).
_PERSISTED: list[DataFrame] = []


def _persist(df: DataFrame) -> DataFrame:
    df = df.persist()
    _PERSISTED.append(df)
    return df


def unpersist_all() -> None:
    """Release every cached dedup intermediate (safe to call any time after
    the result DataFrames have been consumed)."""
    while _PERSISTED:
        try:
            _PERSISTED.pop().unpersist()
        except Exception:
            pass


def _materialize(df: DataFrame) -> DataFrame:
    """Persist AND populate the cache now. Required before a self-join:
    persist() alone is lazy, so both join sides race to compute the (still
    empty) cache and the expensive signature expression runs twice."""
    df = _persist(df)
    df.count()
    return df


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                keep: str = "min") -> DataFrame:
    """One row per distinct normalized text: the min (or max) id survives,
    with the duplicate count. Reference analogue: segment-level content-hash
    dedup on write (SURVEY §2.8) — here generalized to row granularity."""
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    return (df.groupBy(fingerprint(F.col(text_col)).alias("fingerprint"))
              .agg(agg.alias(id_col), F.count(F.lit(1)).alias("dup_count")))


def keep_best_per_dup_group(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id",
                            quality: Column | None = None) -> DataFrame:
    """Retention policy over exact-duplicate groups: ONE surviving document
    per distinct normalized text, the winner chosen by (quality DESC,
    n_chars DESC, id ASC) — i.e. keep the best-quality, then longest, then
    lowest-id copy. This is the standard "which copy do we train on" step
    that follows dedup in a pre-training pipeline (exact_dedup only reports
    the min-id, which may be the worst copy).

    Physical plan: a single hash shuffle on the fingerprint with MAP-SIDE
    combine — the winner is selected by ``max_by`` over a lexicographic
    struct key, so partial aggregation picks per-partition winners before
    the shuffle and each group moves at most one row per map partition
    (a per-group sort via a row_number window would shuffle every duplicate
    row). At 100 TB this is the same cost class as exact_dedup itself."""
    q = quality if quality is not None else _quality_score(F.col(text_col))
    n_chars = F.length(F.col(text_col)).cast("long")
    # maximize (quality, n_chars, -id): struct comparison is field-by-field
    rank = F.struct(q.alias("q"), n_chars.alias("nc"),
                    (-F.col(id_col).cast("long")).alias("neg_id"))
    payload = F.struct(F.col(id_col).cast("long").alias("id"),
                       q.alias("quality"), n_chars.alias("n_chars"))
    return (df.groupBy(fingerprint(F.col(text_col)).alias("fingerprint"))
              .agg(F.max_by(payload, rank).alias("best"),
                   F.count(F.lit(1)).alias("dup_count"))
              .select("fingerprint",
                      F.col("best.id").alias(id_col),
                      F.col("best.quality").alias("quality"),
                      F.col("best.n_chars").alias("n_chars"),
                      "dup_count"))


def _bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """Optimal (m_bits, k_hashes) for an n-item Bloom filter at the given
    false-positive rate: m = -n ln p / ln²2, k = (m/n) ln 2."""
    import math
    n = max(int(n_items), 1)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(m, 64)
    k = max(1, int(round(m / n * math.log(2))))
    return m, k


def _bloom_indices(fps: pd.Series, m: int, k: int) -> np.ndarray:
    """(rows, k) bit indices for md5-hex fingerprints via Kirsch-
    Mitzenmacher double hashing: h1/h2 are the two 64-bit halves of the
    md5 itself — no extra hash pass, deterministic everywhere."""
    h = np.frombuffer(
        bytes.fromhex("".join(fps.astype(str))), dtype=">u8").reshape(-1, 2)
    h1, h2 = h[:, 0], h[:, 1] | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m))


def incremental_dedup(new_df: DataFrame, seen_df: DataFrame,
                      text_col: str = "text", id_col: str = "doc_id",
                      broadcast_bytes_max: int = 64 << 20,
                      bloom_fpp: float = 0.01,
                      n_seen: int | None = None) -> DataFrame:
    """Incremental (new-vs-seen) exact dedup: the rows of ``new_df`` whose
    normalized-text fingerprint does NOT occur anywhere in ``seen_df`` —
    the "only ingest what yesterday's crawl didn't already have" step of a
    continuously-fed corpus. EXACT result on every path (the Bloom filter
    is a prefilter, never the decider).

    Physical strategies (byte-gated, logged in GATE_LOG):

    * seen fingerprint set fits the broadcast budget (~32 B/row) ->
      collect the distinct fingerprints once via Arrow and filter new rows
      map-side against a broadcast set — ZERO shuffle of either side.
    * above budget -> distributed Bloom prefilter + exact verify: each
      seen partition builds a partial m-bit bitmap (mapInPandas), the
      driver ORs the partials (m/8 bytes each — 1.2 MB at 1M seen /
      fpp=0.01; at 1B seen either raise fpp or accept the ~1.2 GB task
      broadcast), new rows test k bits map-side, and only the ~fpp
      false-positive fraction plus the true duplicates anti-join against
      the seen fingerprints for the exact verdict. The O(new) bulk never
      shuffles; the anti-join input is |new|*(dup_rate+fpp) rows.
    """
    fp_new = new_df.select(F.col(id_col),
                           fingerprint(F.col(text_col)).alias("fingerprint"))
    fp_seen = seen_df.select(fingerprint(F.col(text_col)).alias("fingerprint"))
    if n_seen is None:
        # ONE row-capped Arrow job decides the gate AND delivers the seen
        # set (was: a separate seen_df.count() job before the collect);
        # above the cap the transfer stops at cap+1 rows and the bloom
        # path takes over with an exact count for its sizing
        cap_rows = max(broadcast_bytes_max // 32, 0)
        tbl = fp_seen.distinct().limit(cap_rows + 1).toArrow()
        if tbl.num_rows <= cap_rows:
            _gate("incremental_dedup", "broadcast_set", n_seen=tbl.num_rows,
                  est_bytes=tbl.num_rows * 32, budget=broadcast_bytes_max)
            seen_set = frozenset(tbl.column("fingerprint").to_pylist())

            @F.pandas_udf("boolean")
            def is_seen(s: pd.Series) -> pd.Series:
                return s.isin(seen_set)

            return fp_new.filter(~is_seen(F.col("fingerprint")))
        n = seen_df.count()
    else:
        n = n_seen
        est_bytes = n * 32
        if est_bytes <= broadcast_bytes_max:
            _gate("incremental_dedup", "broadcast_set", n_seen=n,
                  est_bytes=est_bytes, budget=broadcast_bytes_max)
            tbl = fp_seen.distinct().toArrow()
            seen_set = frozenset(tbl.column("fingerprint").to_pylist())

            @F.pandas_udf("boolean")
            def is_seen(s: pd.Series) -> pd.Series:
                return s.isin(seen_set)

            return fp_new.filter(~is_seen(F.col("fingerprint")))
    est_bytes = n * 32

    m, k = _bloom_params(n, bloom_fpp)
    _gate("incremental_dedup", "bloom_prefilter", n_seen=n,
          est_bytes=est_bytes, budget=broadcast_bytes_max,
          bloom_bits=m, bloom_hashes=k, fpp=bloom_fpp)

    def build(batches):
        bits = np.zeros((m + 7) // 8, dtype=np.uint8)
        any_rows = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            any_rows = True
            idx = _bloom_indices(pdf["fingerprint"], m, k).ravel()
            np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64),
                             np.left_shift(1, (idx & np.uint64(7))
                                           .astype(np.uint8)).astype(np.uint8))
        if any_rows:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    partials = fp_seen.mapInPandas(build, "bits binary").collect()
    bitmap = np.zeros((m + 7) // 8, dtype=np.uint8)
    for row in partials:
        bitmap |= np.frombuffer(row.bits, dtype=np.uint8)

    @F.pandas_udf("boolean")
    def maybe_seen(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype=bool)
        idx = _bloom_indices(s, m, k)
        byte = bitmap[(idx >> np.uint64(3)).astype(np.int64)]
        bit = np.left_shift(1, (idx & np.uint64(7)).astype(np.uint8))
        return pd.Series(((byte & bit) != 0).all(axis=1))

    flagged = _materialize(fp_new.withColumn(
        "maybe_seen", maybe_seen(F.col("fingerprint"))))
    certain_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    verified_new = (flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
                    .join(fp_seen, "fingerprint", "left_anti"))
    return certain_new.unionByName(verified_new)


def segment_dedup(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", *,
                  delimiter: str | None = None, window: int | None = None,
                  min_docs: int = 2,
                  dup_broadcast_rows_max: int = 2_000_000) -> DataFrame:
    """Segment-level exact dedup with document reassembly — the CCNet /
    RefinedWeb "remove boilerplate lines that repeat across pages" pass,
    a finer granularity than whole-document dedup (reference analogue:
    segment content-hash dedup on write, SURVEY §2.8, here applied INSIDE
    documents). A segment is either a ``delimiter``-split span (e.g.
    ``r"\\n+"`` for line-level on real corpora) or, for corpora without
    structural delimiters, a fixed ``window``-token span. Any segment whose
    exact text occurs in >= ``min_docs`` DISTINCT documents is removed from
    every document; surviving segments are reassembled in original order.

    Returns one row per input document: ``(id, n_segments, n_removed,
    text)`` where ``text`` is the cleaned reassembly ('' when everything
    was boilerplate).

    Physical shape, 100 TB honest: one posexplode (narrow, linear) -> the
    duplicate-segment table is a groupBy on the segment with a
    count_distinct(id) — map-side combinable, output ~ O(#distinct
    boilerplate segments), far smaller than the corpus -> re-attach by an
    equi-join that BROADCASTS the dup set while it is under
    ``dup_broadcast_rows_max`` rows (so the exploded side never shuffles),
    degrading to a shuffle join above -> one groupBy on the id with a
    sort_array over (pos, segment) structs to reassemble (map-side
    combinable; no window function, no per-doc sort shuffle beyond the one
    id shuffle). Segment strings travel the join as md5 fingerprints
    (16 B) rather than full text."""
    if (delimiter is None) == (window is None):
        raise ValueError("segment_dedup: exactly one of delimiter= or "
                         "window= is required")
    if delimiter is not None:
        segs = F.filter(F.split(F.trim(F.col(text_col)), delimiter),
                        lambda s: F.length(s) > 0)
    else:
        toks = tokens(F.col(text_col))
        n_seg = F.ceil(F.size(toks) / F.lit(window)).cast("int")
        # sequence(0, -1) would yield [0, -1] (descending step), so guard
        # the empty-document case explicitly
        segs = F.when(F.size(toks) == 0, F.array().cast("array<string>")) \
                .otherwise(F.transform(
                    F.sequence(F.lit(0), n_seg - 1),
                    lambda i: F.array_join(
                        F.slice(toks, i * window + 1, window), " ")))
    base = df.select(F.col(id_col), segs.alias("__segs__"))
    # lazy persist: the gate count below fills the cache while computing
    # the dup table in the SAME job (an eager materialize here was a whole
    # extra pass over the exploded segments)
    exploded = _persist(
        base.select(id_col, F.posexplode_outer("__segs__")
                            .alias("pos", "seg"))
            .withColumn("__fp__", F.md5(F.col("seg"))))
    dup = _persist(
        exploded.filter(F.col("seg").isNotNull())
                .groupBy("__fp__")
                .agg(F.count_distinct(F.col(id_col)).alias("__nd__"))
                .filter(F.col("__nd__") >= min_docs)
                .select("__fp__"))
    n_dup = dup.count()
    broadcast = n_dup <= dup_broadcast_rows_max
    _gate("segment_dedup", "broadcast" if broadcast else "join",
          n_dup_segments=n_dup, budget_rows=dup_broadcast_rows_max,
          min_docs=min_docs)
    rhs = F.broadcast(dup) if broadcast else dup
    marked = (exploded.join(rhs.withColumn("__dup__", F.lit(True)),
                            "__fp__", "left")
                      .withColumn("__dup__",
                                  F.coalesce(F.col("__dup__"),
                                             F.lit(False))))
    keep_struct = F.when(
        F.col("seg").isNotNull() & ~F.col("__dup__"),
        F.struct(F.col("pos"), F.col("seg")))
    out = (marked.groupBy(id_col)
                 .agg(F.count(F.col("seg")).alias("n_segments"),
                      F.count(F.when(F.col("__dup__"), 1))
                       .alias("n_removed"),
                      F.sort_array(F.collect_list(keep_struct))
                       .alias("__kept__"))
                 .select(id_col, "n_segments", "n_removed",
                         F.array_join(F.transform("__kept__",
                                                  lambda s: s["seg"]), " ")
                          .alias(text_col)))
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """k-token shingles from an ALREADY-MATERIALIZED token-array column;
    documents shorter than k tokens get a single shingle of all tokens.
    Like :func:`ngrams_from_tokens`, the positional transform references the
    token array inside its lambda, so a raw tokenize expression here would
    be re-evaluated O(tokens) times per document."""
    n = F.size(toks)
    full = F.array_join(toks, " ")
    sh = F.transform(F.sequence(F.lit(1), n - (k - 1)),
                     lambda i: F.array_join(F.slice(toks, i, k), " "))
    return F.when(n >= k, sh).otherwise(F.array(full))


def shingles(text: Column, k: int = 3) -> Column:
    """k-token shingles as strings; prefer projecting the token array to a
    column and calling :func:`shingles_from_tokens` in hot paths."""
    return shingles_from_tokens(tokens(F.lower(text)), k)


def minhash_signature(text: Column, num_hashes: int = 16, k: int = 3) -> Column:
    """Array of ``num_hashes`` min-hashes.

    Hash family: one seeded md5 per shingle yields FOUR independent 32-bit
    hashes (8-hex-char substrings of the 128-bit digest) — 4x fewer digest
    computations than one md5 per signature position; Catalyst subexpression
    elimination shares the md5 across the 4 chunk extractions. Min over hex
    strings is a valid uniform min-hash; identical SQL exists in DuckDB, so
    the whole construction stays oracle-checkable."""
    sh = shingles(text, k)
    def chunk_hash(seed: int, chunk: int):
        # single-arg lambda required (Spark maps lambda arity to HOF args)
        return lambda s: F.substring(
            F.md5(F.concat(F.lit(f"h{seed}:"), s)), chunk * 8 + 1, 8)

    sigs = []
    for i in range(num_hashes):
        seed, chunk = divmod(i, 4)
        sigs.append(F.array_min(F.transform(sh, chunk_hash(seed, chunk))))
    return F.array(*sigs)


def band_keys(sig: Column, bands: int, rows: int) -> Column:
    """LSH banding: split the signature into ``bands`` groups of ``rows``
    hashes; each band key = band index + md5 of the concatenated group."""
    keys = []
    for b in range(bands):
        seg = F.slice(sig, b * rows + 1, rows)
        keys.append(F.concat(F.lit(f"b{b}:"), F.md5(F.array_join(seg, "|"))))
    return F.array(*keys)


def _scan_partitions_estimate(df: DataFrame) -> int | None:
    """Exact scan-partition count for the few-local-files case, from file
    sizes + Spark's split-packing math (FilePartition.getFilePartitions):
    ``maxSplitBytes = min(maxPartitionBytes, max(openCostInBytes,
    (totalBytes + files*openCost) / defaultParallelism))``, files split
    into maxSplitBytes chunks, chunks greedy-packed largest-first with
    openCost charged per chunk (ADVICE r13: the previous
    ``total <= maxPartitionBytes -> 1`` shortcut said 1 for a 120 MB file
    that really scans as ~30 partitions, adding a repartition Spark did
    not need). Returns None whenever the count cannot be decided cheaply —
    the caller then falls back to the precise ``.rdd`` probe, which costs
    a full RDD plan conversion (~100 ms per fresh plan)."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files or len(files) > 64:
        return None
    import os
    from urllib.parse import unquote, urlparse

    def _conf_bytes(key: str, default: int) -> int:
        try:
            v = df.sparkSession.conf.get(key)
            return int(str(v).lower().rstrip("b"))
        except Exception:
            return default
    mpb = _conf_bytes("spark.sql.files.maxPartitionBytes", 128 << 20)
    opencost = _conf_bytes("spark.sql.files.openCostInBytes", 4 << 20)
    sizes = []
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("", "file"):
            return None
        p = unquote(u.path)
        if not os.path.exists(p):
            return None
        sizes.append(os.path.getsize(p))
    total = sum(sizes) + len(sizes) * opencost
    par = max(1, df.sparkSession.sparkContext.defaultParallelism)
    max_split = min(mpb, max(opencost, total // par))
    chunks = []
    for size in sizes:
        off = 0
        while off < size:
            chunks.append(min(max_split, size - off))
            off += max_split
    if not chunks:
        return 1
    # greedy pack, largest first; the close test charges the incoming
    # chunk's LENGTH only, the accumulator adds length + openCost —
    # exactly FilePartition.getFilePartitions
    chunks.sort(reverse=True)
    parts, cur = 0, 0
    for c in chunks:
        if cur and cur + c > max_split:
            parts += 1
            cur = 0
        cur += c + opencost
    return parts + 1


def _spread(df: DataFrame) -> DataFrame:
    """Single-file parquet scans arrive as 1 partition — spread the heavy
    hash computation across cores before the narrow map."""
    target = df.sparkSession.sparkContext.defaultParallelism
    est = _scan_partitions_estimate(df)
    nparts = est if est is not None else df.rdd.getNumPartitions()
    if nparts < max(2, target // 2):
        return df.repartition(target)
    return df


def minhash_band_table(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 16,
                       bands: int = 4, k: int = 3) -> DataFrame:
    """(id, band_key) rows. Lazy since r14: the only consumer
    (minhash_near_dup_pairs) groups rather than self-joins, so the
    expensive signature expression (num_hashes × md5 per shingle) is
    evaluated exactly once per row with no persist/materialize job."""
    rows = num_hashes // bands
    n_seeds = -(-num_hashes // 4)
    # ONE array traversal computes all digests (n_seeds md5 per shingle,
    # concatenated to one hex string); separate per-position lambdas would
    # re-run md5 per signature position (no CSE across HOF lambdas).
    digests = F.transform(
        shingles_from_tokens(F.col("__toks__"), k),
        lambda s: F.concat(*[F.md5(F.concat(F.lit(f"h{j}:"), s))
                             for j in range(n_seeds)]))
    hs_df = (_spread(df.select(F.col(id_col).alias("id"), text_col))
             .select("id", tokens(F.lower(F.col(text_col))).alias("__toks__"))
             .select("id", digests.alias("hs")))
    # signature position i = 8-hex-char chunk at offset i*8 of the concat
    # (== substring(md5(h{i//4}:s), (i%4)*8+1, 8) — same family as
    # minhash_signature and the DuckDB oracle). Band keys are built straight
    # from the per-position mins so every position is traversed exactly once.
    def sig_i(i: int):
        off = i * 8 + 1
        return F.array_min(F.transform(F.col("hs"),
                                       lambda h: F.substring(h, off, 8)))

    keys = [F.concat(F.lit(f"b{b}:"),
                     F.md5(F.concat_ws("|", *[sig_i(b * rows + r)
                                              for r in range(rows)])))
            for b in range(bands)]
    return hs_df.select("id", F.explode(F.array(*keys)).alias("band"))


def _minhash_band_table_canonical(df: DataFrame, text_col: str,
                                  id_col: str, num_hashes: int,
                                  bands: int, k: int) -> DataFrame:
    """``minhash_band_table`` variant for canonical-band pair emission:
    (id, bi, band, ek) rows where ``bi`` is the band index and ``ek`` the
    row's EARLIER band keys (slice [0, bi) of the key array). Carrying
    ~(bands-1)/2 x 35 B of earlier keys per keyed row lets the pair
    generator suppress re-emissions in-group, removing the pair-stream
    ``distinct()`` exchange — the stream that goes quadratic on hot
    bands, far larger than the keyed table whenever dedup pressure is
    real. Same key construction as ``minhash_band_table`` (the md5
    signature family is oracle-pinned)."""
    rows = num_hashes // bands
    n_seeds = -(-num_hashes // 4)
    digests = F.transform(
        shingles_from_tokens(F.col("__toks__"), k),
        lambda s: F.concat(*[F.md5(F.concat(F.lit(f"h{j}:"), s))
                             for j in range(n_seeds)]))
    hs_df = (_spread(df.select(F.col(id_col).alias("id"), text_col))
             .select("id", tokens(F.lower(F.col(text_col))).alias("__toks__"))
             .select("id", digests.alias("hs")))

    def sig_i(i: int):
        off = i * 8 + 1
        return F.array_min(F.transform(F.col("hs"),
                                       lambda h: F.substring(h, off, 8)))

    keys = [F.concat(F.lit(f"b{b}:"),
                     F.md5(F.concat_ws("|", *[sig_i(b * rows + r)
                                              for r in range(rows)])))
            for b in range(bands)]
    # each key becomes a PHYSICAL column first, and the generator explodes
    # a CONSTANT-size array of (bi, band, ek) structs over those
    # attributes. Two traps this shape avoids (measured, 70x): a
    # posexplode over a computed array ATTRIBUTE makes
    # InferFiltersFromGenerate add ``size(arr) > 0``, which filter
    # pushdown inlines through every projection down to the scan —
    # re-evaluating the whole md5 pipeline per input row (a literal-size
    # array folds the inferred filter away instead); and referencing the
    # key array after the Generate would duplicate its expression. The
    # key columns stay a separate Project (CollapseProject never inlines
    # non-cheap multiply-referenced exprs), so every md5 runs once.
    kd = hs_df.select("id", *[k.alias(f"__k{b}__")
                              for b, k in enumerate(keys)])
    items = F.array(*[
        F.struct(F.lit(b).alias("bi"),
                 F.col(f"__k{b}__").alias("band"),
                 F.array(*[F.col(f"__k{j}__") for j in range(b)])
                  .alias("ek"))
        for b in range(bands)])
    return (kd.select("id", F.explode(items).alias("x"))
            .select("id", "x.bi", "x.band", "x.ek"))


def minhash_candidate_recall(s: float, bands: int, rows_per_band: int
                             ) -> float:
    """P(a pair with true Jaccard ``s`` shares >= 1 band) =
    1 - (1 - s^r)^b — the banded-minhash S-curve (MMDS ch.3)."""
    return 1.0 - (1.0 - s ** rows_per_band) ** bands


def minhash_near_dup_pairs(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", num_hashes: int = 16,
                           bands: int = 4, k: int = 3) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) sharing >= 1 LSH band.

    Plan shape at scale: one narrow map computes signatures; explode to
    (band_key, id); ONE shuffle groups each band's members; ordered pairs
    are generated in-band from the sorted member array, each pair emitted
    exactly once from the first band it shares (canonical-band emission —
    no pair-stream ``distinct()``). No cartesian anywhere. (r14, guide
    §2.4: the former band self-equi-join shuffled the keyed table twice
    and needed an eager materialize so the signature expression would not
    compute once per join side — grouping lands a band's members on one
    reducer exactly like the join's hash partitioning did, so hot-band
    concentration is unchanged while one exchange and the materialize job
    disappear.)

    Candidate recall is a function of the TRUE Jaccard similarity s:
    P(candidate) = 1 - (1 - s^r)^b with r = num_hashes/bands rows per band
    (defaults 16/4: ~0.23 at s=0.5, ~0.87 at s=0.8, ~0.99 at s=0.95) —
    the S-curve every banded-minhash system rides. Each call logs
    ``minhash_candidates`` with the curve at s = 0.5/0.8/0.95 so a
    low-similarity request is visibly recall-bounded (the same discipline
    the embedding LSH gate got after the sf1 oracle found its low-threshold
    recall hole).
    """
    r = max(num_hashes // bands, 1)
    _gate("minhash_candidates", "banded_lsh", num_hashes=num_hashes,
          bands=bands, rows_per_band=r,
          recall_at_s={s: round(minhash_candidate_recall(s, bands, r), 4)
                       for s in (0.5, 0.8, 0.95)})
    keyed = _minhash_band_table_canonical(df, text_col, id_col,
                                          num_hashes, bands, k)
    grouped = (keyed.groupBy("bi", "band")
               .agg(F.array_sort(F.collect_list(F.struct("id", "ek")))
                     .alias("ms"))
               .where(F.size("ms") >= 2))
    arr = F.col("ms")
    # ordered pairs from the sorted member array: element i pairs with
    # every later element, so id_a < id_b by construction (identical to
    # the old a.id < b.id join predicate); each member carries its
    # earlier band keys for the canonical-band filter below
    pair_structs = F.flatten(F.transform(
        arr,
        lambda x, i: F.transform(
            F.slice(arr, i + F.lit(2), F.size(arr)),
            lambda y: F.struct(x["id"].alias("id_a"), y["id"].alias("id_b"),
                               x["ek"].alias("ea"), y["ek"].alias("eb")))))
    # canonical-band emission (r14, guide §2.4): emit a pair only from the
    # FIRST band both members share — an agreeing earlier key means the
    # pair already surfaced in that band's group. Replaces the
    # ``distinct()`` exchange over the pair stream (the stream that goes
    # quadratic on hot bands) with an in-group elementwise key compare.
    dup_earlier = F.exists(
        F.zip_with(F.col("p.ea"), F.col("p.eb"), lambda a, b: a == b),
        lambda v: v)
    return (grouped.select(F.explode(pair_structs).alias("p"))
            .filter(~dup_earlier)
            .select("p.id_a", "p.id_b"))


# driver/executor broadcast budget for the collected-lookup rescore paths
# (shingle sets / vector matrices). Above this estimated size the rescore
# re-attaches state by equi-join instead — a row-count gate alone undercounts
# long documents (2M ids x a few hundred shingles each is multiple GB).
_BCAST_BYTES_MAX = 512 << 20

# every physical-strategy gate decision is appended here (gate name,
# measured size, budget, chosen path) — tools/scale_probe.py dumps it per
# scale factor so SCALING.md records which side of each gate actually
# fires as data grows; also the first thing to read when a dedup job's
# plan surprises you in production
GATE_LOG: list[dict] = []


def _gate(gate: str, path: str, **kw) -> None:
    GATE_LOG.append({"gate": gate, "path": path, **kw})


def clear_gate_log() -> None:
    GATE_LOG.clear()


def _shingle_hash_sets(df, cand_ids, text_col, id_col, k,
                       broadcast_ids: bool = False):
    """(id, sorted distinct xxhash64-per-shingle LONG array) for candidate
    ids only. Hashing runs JVM-side inside codegen; downstream rescoring
    moves/holds 8 B per shingle instead of its string (~10x smaller
    broadcast/shuffle) and compares longs instead of strings. Jaccard on
    the hash sets equals string-set jaccard up to 64-bit collisions inside
    one candidate pair's union (~hundreds of shingles: P < 1e-14)."""
    ids = F.broadcast(cand_ids) if broadcast_ids else cand_ids
    hashes = F.array_sort(F.array_distinct(
        F.transform(shingles_from_tokens(F.col("__toks__"), k),
                    lambda s: F.xxhash64(s)))).alias("sh")
    return (_spread(df.select(F.col(id_col).alias("id"), text_col))
            .join(ids, "id", "left_semi")
            .select("id", tokens(F.lower(F.col(text_col))).alias("__toks__"))
            .select("id", hashes))


def _jaccard_rescore_broadcast(sets_df, cand):
    """Rescore candidate id pairs against a driver-collected shingle-hash
    lookup shipped to tasks as one broadcast — Arrow moves 2 longs per
    pair, never the sets. Per-pair work is np.intersect1d over sorted
    int64 arrays (C merge), not Python set ops (measured ~10x on the
    near-dup-heavy sf1 probe)."""
    # Arrow transfer into flat buffers (same fix as _collect_matrix,
    # ADVICE r12): a Row-object collect of {id: list} pays several GB of
    # Python-object overhead at the 512 MB budget ceiling. The per-id
    # arrays are zero-copy views over the Arrow values buffer.
    tbl = sets_df.select("id", "sh").toArrow()
    ids = tbl.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
    sh = tbl.column("sh").combine_chunks()
    offs = np.asarray(sh.offsets, dtype=np.int64)
    vals = np.asarray(sh.values, dtype=np.int64)
    lookup = {int(ids[i]): vals[offs[i]:offs[i + 1]]
              for i in range(len(ids))}
    bc = cand.sparkSession.sparkContext.broadcast(lookup)

    @F.pandas_udf("double")
    def jac(ia: pd.Series, ib: pd.Series) -> pd.Series:
        lk = bc.value
        out = np.zeros(len(ia), dtype="float64")
        for i, (x, y) in enumerate(zip(ia.to_numpy(), ib.to_numpy())):
            sa, sb = lk[int(x)], lk[int(y)]
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            out[i] = inter / union if union else 0.0
        return pd.Series(out)

    return cand.select(
        "id_a", "id_b",
        F.round(jac(F.col("id_a"), F.col("id_b")), 6).alias("jaccard"))


def _jaccard_rescore_join(sets_df, cand):
    """Rescore by re-attaching the (candidate-only) shingle-hash sets with
    two equi-joins — the scale path when the lookup exceeds the broadcast
    budget; the joined arrays are 8 B/shingle longs, and the intersect/
    union stay JVM-side."""
    j = (cand.join(sets_df.withColumnRenamed("id", "id_a")
                          .withColumnRenamed("sh", "sh_a"), "id_a")
             .join(sets_df.withColumnRenamed("id", "id_b")
                          .withColumnRenamed("sh", "sh_b"), "id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac_col = F.when(union > 0,
                     inter.cast("double") / union.cast("double")).otherwise(F.lit(0.0))
    return j.select("id_a", "id_b", F.round(jac_col, 6).alias("jaccard"))


def jaccard_near_dup_pairs(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", threshold: float = 0.5,
                           num_hashes: int = 16, bands: int = 8,
                           k: int = 2,
                           broadcast_bytes_max: int | None = None) -> DataFrame:
    """LSH candidates verified with exact token-k-gram Jaccard >= threshold.

    Verify plan (the id-pairs + broadcast-set pattern proven by
    ``embedding_near_dup_pairs``): candidate pairs carry IDS ONLY through
    the shuffle; shingle sets are computed ONCE, for candidate ids only
    (left-semi on the id set), materialized, and fed to whichever rescore
    path the gate picks — the naive form drags two wide array columns
    through the candidate-pair shuffle. The gate is byte-EXACT: the
    materialized table's count/size agg (cache-local, no rescan) gives the
    true int64-hash payload; above ``broadcast_bytes_max`` the rescore
    re-attaches the sets by equi-join instead of a driver broadcast.
    """
    if broadcast_bytes_max is None:   # resolve at CALL time
        broadcast_bytes_max = _BCAST_BYTES_MAX
    # lazy persists: neither frame feeds a self-join, so the stats agg
    # below is the single materializing action for BOTH caches (an eager
    # materialize here was two extra count jobs)
    cand = _persist(
        minhash_near_dup_pairs(df, text_col, id_col, num_hashes, bands, k))
    cand_ids = (cand.select(F.col("id_a").alias("id"))
                .unionByName(cand.select(F.col("id_b").alias("id")))
                .distinct())
    sets_df = _persist(
        _shingle_hash_sets(df, cand_ids, text_col, id_col, k))
    # exact broadcast footprint from the persisted sets: 8 B per hash plus
    # the measured per-entry overhead of the {id: int64 ndarray} lookup
    # (ndarray header + dict slot ~ 224 B)
    stats = sets_df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.size("sh")), F.lit(0)).alias("hashes")).first()
    est_bytes = int(stats["hashes"]) * 8 + int(stats["n"]) * 224
    _gate("jaccard_rescore", "broadcast" if est_bytes <= broadcast_bytes_max
          else "join", est_bytes=est_bytes, budget=broadcast_bytes_max,
          cand_docs=int(stats["n"]))
    if est_bytes <= broadcast_bytes_max:
        scored = _jaccard_rescore_broadcast(sets_df, cand)
    else:
        scored = _jaccard_rescore_join(sets_df, cand)
    return scored.filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

# legacy row-count alias kept for callers that sized against it; the actual
# gate in embedding_near_dup_pairs is byte-based (_BCAST_BYTES_MAX)
_BCAST_VECS_MAX = 2_000_000


def _collect_matrix(base: DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """(ids_sorted, row-normalized matrix sorted by id) via ``toArrow()``
    — one Arrow batch transfer into flat buffers instead of a Row-object
    collect (several GB of Python-object overhead at the 1M-row budget
    ceiling; ADVICE r12)."""
    tbl = base.select("id", "vec").toArrow()
    ids = tbl.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
    vec = tbl.column("vec").combine_chunks()
    flat = np.asarray(vec.flatten(), dtype=np.float64)
    n = len(ids)
    if n == 0:
        return ids, flat.reshape(0, 0)
    d = len(flat) // n
    if n * d != len(flat):
        raise ValueError("ragged embedding column: all vectors must share "
                         f"one dimension (n={n}, total={len(flat)})")
    M = flat.reshape(n, d)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    order = np.argsort(ids)
    return ids[order], M[order]


def _score_pairs_broadcast(base: DataFrame, pairs: DataFrame) -> DataFrame:
    """cos(id_a, id_b) via a normalized vector matrix shipped to tasks —
    the same physical pattern as broadcasting a dimension table."""
    ids_sorted, M_sorted = _collect_matrix(base)

    @F.pandas_udf("double")
    def cos_lookup(ia: pd.Series, ib: pd.Series) -> pd.Series:
        A = M_sorted[np.searchsorted(ids_sorted, ia.to_numpy())]
        B = M_sorted[np.searchsorted(ids_sorted, ib.to_numpy())]
        return pd.Series(np.round((A * B).sum(axis=1), 6))

    return pairs.select("id_a", "id_b",
                        cos_lookup(F.col("id_a"), F.col("id_b")).alias("cos"))


def _score_pairs_join(base: DataFrame, pairs: DataFrame) -> DataFrame:
    """Re-attach vectors by equi-join, then batch-vectorized cosine."""
    @F.pandas_udf("double")
    def cos_np(va: pd.Series, vb: pd.Series) -> pd.Series:
        A = np.stack([np.asarray(v, dtype="float64") for v in va])
        B = np.stack([np.asarray(v, dtype="float64") for v in vb])
        num = (A * B).sum(axis=1)
        den = np.sqrt((A * A).sum(axis=1)) * np.sqrt((B * B).sum(axis=1))
        return pd.Series(np.round(num / den, 6))

    j = (pairs.join(base.select(F.col("id").alias("id_a"),
                                F.col("vec").alias("va")), "id_a")
              .join(base.select(F.col("id").alias("id_b"),
                                F.col("vec").alias("vb")), "id_b"))
    return j.select("id_a", "id_b", cos_np(F.col("va"), F.col("vb")).alias("cos"))

def _exact_pairs_blocked(base: DataFrame, threshold: float) -> DataFrame:
    """EXACT all-pairs cosine >= threshold without materializing the O(n²)
    id-pair relation: the normalized matrix ships to every task (the
    dimension-table broadcast the byte gate already approved) and each
    Arrow batch of ids computes its block-row of the similarity matrix
    with BLAS (blocked GEMM), emitting only the surviving upper-triangle
    pairs. n=1M x d=64 is a 512 MB broadcast and ~3e13 FLOPs — seconds
    per executor on a 1000-executor cluster — where an id-pair BNLJ would
    shuffle 5e11 rows. Values match the DuckDB all-pairs oracle exactly
    (round 6), at ANY threshold — unlike LSH candidates, whose recall
    collapses for low thresholds (measured 0.49 at threshold 0.45 on
    isotropic sf1 vectors; see embedding_near_dup_pairs)."""
    ids_sorted, M_sorted = _collect_matrix(base)
    spark = base.sparkSession

    def gen(batches):
        for pdf in batches:
            bid = pdf["id"].to_numpy()
            bidx = np.searchsorted(ids_sorted, bid)
            # block the GEMM so temp memory stays ~rows_blk x cols_blk
            # (1024 x 8192 float64 = 64 MB per temp, rounded IN PLACE —
            # ADVICE r12: 1024 x 65536 was 512 MB, doubled by np.round's
            # copy, on top of the broadcast matrix itself)
            for i in range(0, len(bidx), 1024):
                ridx = bidx[i:i + 1024]
                A = M_sorted[ridx]
                out_a, out_b, out_c = [], [], []
                for j in range(0, len(ids_sorted), 8192):
                    S = A @ M_sorted[j:j + 8192].T
                    np.round(S, 6, out=S)
                    hit_r, hit_c = np.nonzero(S >= threshold)
                    ia = ids_sorted[ridx[hit_r]]
                    ib = ids_sorted[j + hit_c]
                    keep = ia < ib   # upper triangle only, no self-pairs
                    out_a.append(ia[keep])
                    out_b.append(ib[keep])
                    out_c.append(S[hit_r, hit_c][keep])
                yield pd.DataFrame({
                    "id_a": np.concatenate(out_a) if out_a else
                            np.array([], dtype=np.int64),
                    "id_b": np.concatenate(out_b) if out_b else
                            np.array([], dtype=np.int64),
                    "cos": np.concatenate(out_c) if out_c else
                           np.array([], dtype=np.float64)})

    n_parts = max(spark.sparkContext.defaultParallelism, 1)
    return (base.select("id").repartition(n_parts)
            .mapInPandas(gen, "id_a long, id_b long, cos double"))


# per-task block budget for the grid path: each task holds TWO blocks of
# the normalized matrix (plus the GEMM temp), so 128 MB keeps task memory
# ~comfortably under 1 GB with pandas overhead. Replication factor of the
# groupBy shuffle is k = ceil(matrix_bytes / block_bytes) — grow the block
# with executor memory to shrink the shuffle.
_GRID_BLOCK_BYTES_MAX = 128 << 20


def _exact_pairs_grid(base: DataFrame, threshold: float, n_rows: int,
                      dim: int,
                      block_bytes_max: int = _GRID_BLOCK_BYTES_MAX
                      ) -> DataFrame:
    """EXACT all-pairs cosine >= threshold ABOVE the single-matrix
    broadcast budget: 2-D blocked GEMM over the upper triangle of a
    k x k block grid (the SUMMA-style decomposition used by distributed
    matrix multiply, e.g. Spark MLlib's BlockMatrix).

    Rows hash into k row-blocks (k = ceil(matrix_bytes / block budget));
    one task per block pair (i, j), i <= j, receives exactly blocks i and
    j via a grouped shuffle and BLAS-multiplies them, emitting only the
    surviving pairs. No task ever holds more than two blocks; nothing
    O(n²) is shuffled (the k(k+1)/2 grid replicates each input row k
    times — matrix_bytes x k total shuffle, the standard 2-D-grid matmul
    communication bound). Exact at ANY n and ANY threshold — this is the
    above-budget default; LSH (recall collapses at low thresholds) is
    opt-in via strategy='lsh'. Values are bit-identical to
    _exact_pairs_blocked (same normalize + round(6))."""
    spark = base.sparkSession
    k = max(2, int(-(-(n_rows * dim * 8) // block_bytes_max)))
    blocked = base.withColumn(
        "blk", F.pmod(F.xxhash64(F.col("id")), F.lit(k)).cast("int"))
    grid = spark.createDataFrame(
        [(i, j) for i in range(k) for j in range(i, k)], "bi int, bj int")
    # broadcast the k(k+1)/2-row grid against the data: a row in block b
    # feeds every grid task whose bi or bj is b (k tasks)
    left = (blocked.join(F.broadcast(grid), F.col("blk") == F.col("bi"))
            .select("bi", "bj", F.lit(0).alias("side"), "id", "vec"))
    right = (blocked.join(F.broadcast(grid.filter("bi <> bj")),
                          F.col("blk") == F.col("bj"))
             .select("bi", "bj", F.lit(1).alias("side"), "id", "vec"))
    both = left.unionByName(right)

    def compute(key, pdf):
        bi, bj = int(key[0]), int(key[1])
        a = pdf[pdf["side"] == 0]
        ida = a["id"].to_numpy().astype(np.int64)
        A = np.array(a["vec"].tolist(), dtype=np.float64)
        A /= np.linalg.norm(A, axis=1, keepdims=True)
        if bi == bj:
            idb, B = ida, A
        else:
            b = pdf[pdf["side"] == 1]
            idb = b["id"].to_numpy().astype(np.int64)
            B = np.array(b["vec"].tolist(), dtype=np.float64)
            B /= np.linalg.norm(B, axis=1, keepdims=True)
        out_a, out_b, out_c = [], [], []
        # sub-block the GEMM: 1024 x 8192 float64 temps, rounded in place
        for i in range(0, len(ida), 1024):
            Ai, ia_blk = A[i:i + 1024], ida[i:i + 1024]
            for j in range(0, len(idb), 8192):
                S = Ai @ B[j:j + 8192].T
                np.round(S, 6, out=S)
                hit_r, hit_c = np.nonzero(S >= threshold)
                ia = ia_blk[hit_r]
                ib = idb[j + hit_c]
                keep = ia != ib   # blocks are disjoint unless bi == bj
                ia, ib, cs = ia[keep], ib[keep], S[hit_r, hit_c][keep]
                if bi == bj:
                    # symmetric block: each unordered pair appears twice
                    m = ia < ib
                    ia, ib, cs = ia[m], ib[m], cs[m]
                else:
                    lo = np.minimum(ia, ib)
                    ib = np.maximum(ia, ib)
                    ia = lo
                out_a.append(ia)
                out_b.append(ib)
                out_c.append(cs)
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64"),
                                 "cos": pd.Series(dtype="float64")})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "cos": np.concatenate(out_c)})

    return both.groupBy("bi", "bj").applyInPandas(
        compute, "id_a long, id_b long, cos double")


def lsh_candidate_recall(threshold: float, n_planes: int,
                         n_tables: int) -> float:
    """Expected probability that a TRUE pair at exactly ``threshold``
    cosine collides in at least one hyperplane table:
    p_plane = 1 - acos(threshold)/pi; 1 - (1 - p_plane^planes)^tables.
    Pairs above the threshold collide with higher probability, so this
    lower-bounds candidate recall at the decision boundary."""
    import math
    p_plane = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    per_table = p_plane ** n_planes
    return 1.0 - (1.0 - per_table) ** n_tables


def lsh_plan(threshold: float, target_recall: float = 0.9,
             fp_budget: float = 0.02, max_planes: int = 24,
             max_tables: int = 64) -> tuple[int, int]:
    """Size (n_planes, n_tables) FROM the quality contract instead of a
    fixed 6x8 (which collapses to ~0.49 candidate recall at threshold
    0.45 — found by the r12 sf1 sweep). Inverts the S-curve:

    * recall: 1-(1-p^r)^b >= target_recall at the decision boundary,
      where p = 1 - acos(threshold)/pi, so b = ceil(ln(1-target) /
      ln(1-p^r));
    * precision: an orthogonal pair (cos ~ 0, p = 1/2) must collide with
      probability <= fp_budget, i.e. b * 0.5^r <= fp_budget — without
      this constraint the recall target alone is met by r=1, b=2, whose
      buckets are HALF-SPACES (candidate set ~ n²/4, quadratic again);
    * cost: among feasible (r, b) pick minimal hashing work r*b.

    Raises if no (r <= max_planes, b <= max_tables) satisfies both —
    caller should use the exact grid path instead of silently degraded
    LSH."""
    import math
    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    best = None
    for r in range(1, max_planes + 1):
        per = p ** r
        if per >= 1.0:
            b = 1
        elif per <= 0.0:
            continue
        else:
            b = math.ceil(math.log(1.0 - target_recall)
                          / math.log(1.0 - per))
        if b > max_tables or b * 0.5 ** r > fp_budget:
            continue
        if best is None or r * b < best[0] * best[1]:
            best = (r, b)
    if best is None:
        raise ValueError(
            f"no LSH plan meets recall>={target_recall} at threshold "
            f"{threshold} with fp<={fp_budget} within {max_planes} planes "
            f"x {max_tables} tables — use the exact grid strategy")
    return best


def embedding_near_dup_pairs(df: DataFrame, threshold: float = 0.95,
                             id_col: str = "vec_id", vec_col: str = "embedding",
                             exact_below: int = 2000, dim: int = 64,
                             n_planes: int | None = None,
                             n_tables: int | None = None,
                             n_rows: int | None = None,
                             broadcast_bytes_max: int | None = None,
                             strategy: str | None = None,
                             grid_block_bytes: int | None = None,
                             lsh_target_recall: float = 0.9
                             ) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= threshold.

    Physical strategies (``strategy=None`` picks by byte gate — EXACT at
    every scale; both exact paths are value-identical):
    * **'exact'** — single-matrix blocked GEMM while the normalized matrix
      fits the broadcast byte budget (n*dim*8 <= broadcast_bytes_max —
      1M rows at d=64 under the default 512 MB): every task scores its
      Arrow batch's block-row against the broadcast matrix with BLAS; no
      O(n²) shuffle, matches the all-pairs oracle.
    * **'grid'** — ABOVE the budget (the default there since r13): 2-D
      blocked GEMM over the upper triangle of a k x k block grid, one
      task per block pair, each holding two <=``grid_block_bytes``
      blocks. Exact at any n; shuffle = matrix_bytes x k (the standard
      distributed-matmul communication bound), never O(n²) rows.
    * **'lsh'** — OPT-IN ONLY (demoted from the above-budget default in
      r13): hyperplane-LSH candidates + exact verify. Sub-quadratic, but
      candidate recall depends on the threshold: p_plane =
      1 - acos(threshold)/pi per plane, so LOW thresholds collapse recall
      (measured 0.49 at threshold 0.45 with 6x8 on isotropic sf1
      vectors). When ``n_planes``/``n_tables`` are not given they are
      sized by ``lsh_plan(threshold, lsh_target_recall)`` instead of a
      fixed 6x8; the gate log records the estimated boundary recall.

    Pass ``n_rows`` (manifest total_rows / parquet footer count) to pick the
    strategy without a driver-side scan; ``exact_below=0`` forces the LSH
    path unconditionally (legacy probe knob, same as strategy='lsh'). The
    ``df.count()`` fallback only runs when the caller provides neither.
    """
    from arcticdb_spark.extensions.similarity import _bucket_udf, _planes
    if broadcast_bytes_max is None:   # resolve at CALL time (tests/probes
        broadcast_bytes_max = _BCAST_BYTES_MAX   # monkeypatch the global)
    if strategy is None and exact_below <= 0:
        strategy = "lsh"
    n = n_rows if n_rows is not None else (0 if strategy == "lsh" else df.count())
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    if strategy is None:
        # broadcast_bytes_max is a memory BUDGET: it dominates exact_below
        # (which only keeps its legacy <=0 -> lsh meaning above).
        strategy = ("exact" if n * dim * 8 <= broadcast_bytes_max
                    else "grid")
    if strategy == "exact":
        _gate("embedding_strategy", "exact", n_rows=n,
              est_bytes=n * dim * 8, budget=broadcast_bytes_max)
        return _exact_pairs_blocked(base, threshold)
    if strategy == "grid":
        blk = grid_block_bytes if grid_block_bytes else _GRID_BLOCK_BYTES_MAX
        k = max(2, int(-(-(n * dim * 8) // blk)))
        _gate("embedding_strategy", "exact_grid", n_rows=n,
              est_bytes=n * dim * 8, budget=broadcast_bytes_max,
              grid_k=k, block_bytes=blk)
        return _exact_pairs_grid(base, threshold, n, dim,
                                 block_bytes_max=blk)
    if strategy != "lsh":
        raise ValueError(f"unknown strategy {strategy!r}: "
                         "None | 'exact' | 'grid' | 'lsh'")
    if n_planes is None or n_tables is None:
        n_planes, n_tables = lsh_plan(threshold, lsh_target_recall)
    est_recall = lsh_candidate_recall(threshold, n_planes, n_tables)
    _gate("embedding_strategy", "lsh", n_rows=n,
          est_bytes=n * dim * 8, budget=broadcast_bytes_max,
          est_boundary_recall=round(est_recall, 4))
    buckets = _bucket_udf([_planes(dim, n_planes, seed=7000 + t)
                           for t in range(n_tables)])
    # candidate generation shuffles IDS ONLY: the (id, bucket) table is
    # two scalars per row, so the bucket grouping never carries the
    # 64-float vectors (the naive form moves dim*8 bytes per candidate).
    # r14 (guide §2.4): group per bucket and emit ordered pairs from the
    # sorted member array — the former self-equi-join shuffled the keyed
    # table twice and needed an eager materialize so the bucket UDF would
    # not run once per join side; grouping keeps the same per-bucket
    # reducer concentration with one exchange and no materialize job.
    keyed = base.select("id", F.explode(buckets(F.col("vec"))).alias("bk"))
    grouped = (keyed.groupBy("bk")
               .agg(F.array_sort(F.collect_list("id")).alias("ids"))
               .where(F.size("ids") >= 2))
    arr = F.col("ids")
    pair_structs = F.flatten(F.transform(
        arr,
        lambda x, i: F.transform(
            F.slice(arr, i + F.lit(2), F.size(arr)),
            lambda y: F.struct(x.alias("id_a"), y.alias("id_b")))))
    pairs = (grouped.select(F.explode(pair_structs).alias("p"))
             .select("p.id_a", "p.id_b")
             .dropDuplicates(["id_a", "id_b"]))
    _gate("embedding_rescore",
          "broadcast" if (n_rows is not None
                          and n_rows * dim * 8 <= broadcast_bytes_max)
          else "join",
          est_bytes=(n_rows or 0) * dim * 8, budget=broadcast_bytes_max)
    if n_rows is not None and n_rows * dim * 8 <= broadcast_bytes_max:
        # vectors fit an executor-side broadcast (the dimension-table
        # pattern; byte gate: n_rows x dim x 8B float64 matrix):
        # rescore candidate id pairs against a normalized numpy
        # matrix — Arrow moves 2 longs per pair, not 2 vectors
        scored = _score_pairs_broadcast(base, pairs)
    else:
        # at larger scale re-attach vectors by joining the (small
        # relative to pairs) vector table back, then rescore per batch
        scored = _score_pairs_join(base, pairs)
    return scored.filter(F.col("cos") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 60
_EMPTY_U64 = np.empty(0, dtype=np.uint64)


def simhash(text: Column, bits: int = _SIMHASH_BITS) -> Column:
    """Per-token md5 -> first 15 hex chars -> 60-bit int; bit-majority vote
    over tokens. 60 bits (not 64) keeps the value inside signed-long range;
    wide hashes matter — a 32-bit simhash over a small vocabulary collides
    catastrophically (observed: 4.5M candidate pairs on 5k docs).

    Split execution: token hashing stays JVM-side (codegen'd md5 + conv in
    one array transform — one op per token); the 60-way bit-majority vote —
    which as a SQL fold is 60 interpreted lambda passes per token — runs as
    one vectorized numpy pass per Arrow batch. Exact integer math
    throughout, so the value is bit-identical to the pure-SQL formulation
    the DuckDB oracle uses (hex-cast + ``>>`` votes)."""
    assert bits == _SIMHASH_BITS, "bit layout is fixed at 60 (15 hex chars)"
    toks = F.array_distinct(tokens(F.lower(text)))
    tok_hash = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"))

    return _simhash_vote_udf()(tok_hash)


def _simhash_vote_batch(hashes, bits: int = _SIMHASH_BITS) -> np.ndarray:
    """Vectorized bit-majority vote over a batch of token-hash arrays
    (guide §4.2): the former per-row loop paid ~6 small numpy calls per
    DOCUMENT; this shape pays ``bits`` reduceat calls per BATCH, one
    bit-column at a time into a reused uint64 buffer so the transient
    stays O(total_tokens) with zero per-bit allocations — never the
    tokens x bits matrix (which at 10k rows/batch would be ~1 GB).
    Measured 5x on the testdata token shape (~23 distinct tokens/doc)
    and 1.6x on 20-200-token docs. Same exact integer math per row:
    sum of bit b over the row's token hashes, vote = 2*sum - n_tokens,
    bit set iff vote > 0 — bit-identical to the per-row form and to the
    DuckDB oracle's hex-cast + ``>>`` votes (pinned by
    tests/test_simhash_vote_vectorized.py)."""
    n = len(hashes)
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return out
    arrs = [np.asarray(hs, dtype=np.uint64)
            if hs is not None else _EMPTY_U64 for hs in hashes]
    lens = np.fromiter((a.size for a in arrs), np.int64, n)
    nz = np.flatnonzero(lens)
    if nz.size == 0:
        return out
    flat = np.concatenate([arrs[i] for i in nz])
    starts = np.zeros(nz.size, dtype=np.int64)
    np.cumsum(lens[nz][:-1], out=starts[1:])
    ones = np.empty((nz.size, bits), dtype=np.int64)
    one = np.uint64(1)
    tmp = np.empty_like(flat)
    for b in range(bits):
        np.right_shift(flat, np.uint64(b), out=tmp)
        np.bitwise_and(tmp, one, out=tmp)
        # uint64 partial sums assign exactly into the int64 column:
        # each is <= the row's token count, far below 2**63
        ones[:, b] = np.add.reduceat(tmp, starts)
    votes = ones * 2 - lens[nz][:, None]
    shifts = np.arange(bits, dtype=np.uint64)
    vals = ((votes > 0).astype(np.uint64) << shifts).sum(axis=1)
    out[nz] = vals.astype(np.int64)   # bits < 63, so in signed range
    return out


def _simhash_vote_udf():
    @F.pandas_udf("long")
    def vote(hashes: pd.Series) -> pd.Series:
        return pd.Series(_simhash_vote_batch(hashes))
    return vote


def _simhash_hash_pairs(groups: DataFrame, bands: int,
                        max_hamming: int) -> DataFrame:
    """Verified near-dup pairs over DISTINCT SimHash values (``sh_a < sh_b``
    + ``hamming``): band each hash into ``bands`` chunks, group per chunk
    key, emit ordered pairs from the sorted member array, verify with
    popcount (r14, guide §2.4 — one exchange where the former chunk
    self-join shuffled the chunk table twice; per-chunk reducer
    concentration is identical). Shared by the pair and cluster APIs so
    the banding math cannot diverge between them.

    Canonical-band emission (r14, guide §2.4): a pair whose hashes agree
    in several chunks used to be emitted once per shared chunk and
    deduplicated with a ``distinct()`` — a full extra exchange over the
    PAIR stream, which is exactly the stream that goes quadratic on hot
    chunks. Both full hashes are present inside the group, so each pair
    is now emitted only from its FIRST shared chunk (no earlier chunk
    j < bi agrees — pure integer shift/mask math, zero extra shuffle
    bytes), which yields each qualifying pair exactly once with no
    dedup exchange."""
    width = _SIMHASH_BITS // bands
    mask = (1 << width) - 1

    def chunk(col: Column, i) -> Column:
        return F.shiftright(col, i * width).bitwiseAND(F.lit(mask))

    hc = groups.select(
        "sh",
        F.posexplode(F.array(*[chunk(F.col("sh"), i)
                               for i in range(bands)])).alias("bi", "cv"))
    grouped = (hc.groupBy("bi", "cv")
               .agg(F.array_sort(F.collect_list("sh")).alias("shs"))
               .where(F.size("shs") >= 2))
    arr = F.col("shs")
    pair_structs = F.flatten(F.transform(
        arr,
        lambda x, i: F.transform(
            F.slice(arr, i + F.lit(2), F.size(arr)),
            lambda y: F.struct(x.alias("sh_a"), y.alias("sh_b")))))
    sha, shb = F.col("p.sh_a"), F.col("p.sh_b")
    # first-shared-chunk filter: band 0 always emits; band b emits only
    # when no chunk j < b agrees (an agreeing earlier chunk means the
    # same pair already surfaced in that chunk's group)
    keep = F.when(F.col("bi") == 0, F.lit(True))
    earlier = None
    for b in range(1, bands):
        m = chunk(sha, b - 1) == chunk(shb, b - 1)
        earlier = m if earlier is None else (earlier | m)
        keep = keep.when(F.col("bi") == b, ~earlier)
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (grouped.select("bi", F.explode(pair_structs).alias("p"))
            .filter(keep)
            .select("p.sh_a", "p.sh_b")
            .withColumn("hamming", ham)
            .filter(F.col("hamming") <= max_hamming))


def simhash_near_dup_pairs(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", max_hamming: int = 3,
                           bands: int = 4) -> DataFrame:
    """Near-dups by SimHash: band the hash into ``bands`` chunks — any pair
    within ``bands-1`` differing bits shares >= 1 exact chunk (pigeonhole),
    so candidates come from equi-joins, verified by popcount.

    The join runs at the DISTINCT-HASH level: documents with identical
    hashes collapse to one node first (template-heavy corpora have far
    fewer hashes than docs — 3812 vs 5000 in the test corpus), the banded
    self-join + hamming verify touches hash pairs only, and surviving hash
    pairs expand back to id pairs via the per-hash id lists. This removes
    the two scale hazards of the per-doc join: skewed chunk buckets go
    quadratic in DOCS (one 1582-doc bucket = 1.25M pairs in one task) when
    they should be quadratic in distinct hashes, and the final
    ``distinct()`` over the (huge) id-pair stream disappears because the
    hash-level expansion emits each pair exactly once."""
    h = simhash(F.col(text_col))
    base = _spread(df.select(F.col(id_col).alias("id"), text_col)) \
        .select("id", h.alias("sh"))
    # eager materialize stays here (measured r14): this pair query has four
    # consumers in one action, and the lazy TableCacheQueryStage form costs
    # MORE jobs (10 -> 11) than the count it saves — unlike simhash_dedup,
    # whose first consumer is a single driver collect (lazy there: 13 -> 11)
    groups = _materialize(base.groupBy("sh").agg(F.collect_list("id").alias("ids")))
    hpairs = _simhash_hash_pairs(groups, bands, max_hamming)
    # cross-hash expansion: each (sh_a < sh_b) pair appears once, and a doc
    # belongs to exactly one hash group, so no id-level dedup is needed
    cross = (hpairs
             .join(groups.select(F.col("sh").alias("sh_a"),
                                 F.col("ids").alias("ids_a")), "sh_a")
             .join(groups.select(F.col("sh").alias("sh_b"),
                                 F.col("ids").alias("ids_b")), "sh_b")
             .select(F.explode("ids_a").alias("ia"), F.col("ids_b"), "hamming")
             .select("ia", F.explode("ids_b").alias("ib"), "hamming")
             .select(F.least("ia", "ib").alias("id_a"),
                     F.greatest("ia", "ib").alias("id_b"), "hamming"))
    # same-hash pairs (hamming 0): ordered combinations within each group,
    # generated JVM-side with array HOFs — no join, no shuffle
    same = (groups.filter(F.size("ids") > 1)
            .select(F.explode(F.expr(
                "flatten(transform(ids, x -> "
                "transform(filter(ids, y -> y > x), "
                "y -> struct(x AS id_a, y AS id_b))))")).alias("p"))
            .select(F.col("p.id_a"), F.col("p.id_b"),
                    F.lit(0).cast("int").alias("hamming")))
    return cross.unionByName(same)


# ---------------------------------------------------------------------------
# cluster representatives — dedup as "keep one per near-dup cluster"
# ---------------------------------------------------------------------------
# Pair listing is quadratic in duplicate multiplicity (a doc with k copies
# contributes C(k,2) pairs — measured 113M pairs on a 50k-doc corpus with
# 10x duplication). The pipeline-scale API is the cluster view: connected
# components over the candidate-pair graph, keep the min id per component.

# edges collected for the driver union-find fast path: 2 longs/row ≈ 16 B,
# so 5M edges ≈ 80 MB driver-side — far under the broadcast budget. The
# candidate-pair graphs this runs on are distinct-hash- or near-dup-sized
# (tiny fractions of the corpus), so the gate almost always takes this path.
_UF_EDGES_MAX = 5_000_000


def _clusters_union_find(spark, rows) -> DataFrame:
    """Min-root union-find over collected (a, b) edge rows — identical
    components and labels (cluster = min member) to the propagation loop,
    zero shuffle rounds."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:        # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    ids = list(parent)
    labels = pd.DataFrame({"id": np.asarray(ids, dtype=np.int64),
                           "cluster": np.asarray([find(i) for i in ids],
                                                 dtype=np.int64)})
    # pandas input rides the Arrow createDataFrame fast path; a list of
    # tuples would be pickled row by row
    return spark.createDataFrame(labels, "id long, cluster long")


def near_dup_clusters(pairs: DataFrame, id_a: str = "id_a",
                      id_b: str = "id_b", max_iter: int = 50,
                      driver_edges_max: int = _UF_EDGES_MAX) -> DataFrame:
    """(id, cluster) rows: connected components of the pair graph; cluster
    is the min id in the component. Only ids appearing in ``pairs`` are
    returned.

    Physical strategy: up to ``driver_edges_max`` edges the graph is
    collected and solved with union-find on the driver (near-constant time;
    candidate graphs are small by construction — distinct hashes or LSH
    survivors, not the corpus). Above the gate it falls back to iterative
    min-label propagation (one groupBy per round, bounded by component
    diameter) — a hamming-chained hash graph can have diameter in the tens,
    and each propagation round is a full shuffle, so the driver path is
    also the fast path whenever it fits.

    Raises ``RuntimeError`` if labels still change after ``max_iter``
    propagation rounds (a component with diameter > max_iter) rather than
    silently returning split clusters."""
    p2 = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    if driver_edges_max > 0:
        # ONE Arrow-batched job decides the gate AND delivers the edges:
        # <= max rows means the limit+1 transfer already holds the whole
        # graph (the former materialize + count + Row-object collect was
        # three jobs and several GB of Python Row overhead at the cap)
        tbl = p2.limit(driver_edges_max + 1).toArrow()
        if tbl.num_rows <= driver_edges_max:
            _gate("cluster_solver", "driver_union_find",
                  edges=tbl.num_rows, budget=driver_edges_max)
            return _clusters_union_find(
                pairs.sparkSession,
                zip(tbl.column("a").to_pylist(),
                    tbl.column("b").to_pylist()))
    p2 = _materialize(p2)
    n_edges = p2.count()
    _gate("cluster_solver", "distributed_propagation",
          edges=n_edges, budget=driver_edges_max)
    edges = p2.unionByName(p2.select(F.col("b").alias("a"),
                                     F.col("a").alias("b")))
    labels = (edges.groupBy("a").agg(F.min("b").alias("nbr"))
              .select(F.col("a").alias("id"),
                      F.least("a", "nbr").alias("cluster"))).persist()
    changed = 1
    for _ in range(max_iter):
        # propagate: my label = min(my label, labels of my neighbors)
        prop = (edges.join(labels.withColumnRenamed("id", "b")
                                 .withColumnRenamed("cluster", "nbr_cluster"), "b")
                .groupBy("a").agg(F.min("nbr_cluster").alias("nbr_min")))
        nxt = (labels.join(prop.withColumnRenamed("a", "id"), "id", "left")
               .select("id", F.least("cluster", F.coalesce("nbr_min", "cluster"))
                             .alias("cluster"))).persist()
        # full (un-limited) count: decides convergence AND fully populates
        # nxt's cache before the previous round's labels are released
        changed = (labels.withColumnRenamed("cluster", "old")
                   .join(nxt, "id")
                   .filter(F.col("old") != F.col("cluster")).count())
        labels.unpersist()          # superseded — only two label tables
        labels = nxt                # (current + next) are ever cached
        if changed == 0:
            break
    _PERSISTED.append(labels)       # released by the caller's unpersist_all()
    if changed != 0:
        raise RuntimeError(
            f"near_dup_clusters did not converge in {max_iter} rounds "
            f"(a component has diameter > {max_iter}); raise max_iter")
    return labels


def dedup_by_pairs(df: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id", id_a: str = "id_a",
                   id_b: str = "id_b") -> DataFrame:
    """Drop every row that belongs to a near-dup cluster but is not its
    min-id representative. Rows never seen in ``pairs`` pass through —
    the anti-join touches only clustered ids, so the big side streams.
    ``id_a``/``id_b`` name the pair columns in ``pairs``."""
    clusters = near_dup_clusters(pairs, id_a=id_a, id_b=id_b)
    losers = clusters.filter(F.col("id") != F.col("cluster")) \
        .select(F.col("id").alias(id_col))
    return df.join(losers, id_col, "left_anti")


def simhash_dedup(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 3,
                  bands: int = 4) -> DataFrame:
    """Deduplicated corpus by SimHash clusters WITHOUT materializing id
    pairs: clustering runs on the distinct-hash graph (thousands of nodes
    for a template corpus, regardless of document count), then each hash
    group keeps ids only if its hash is the cluster representative's hash
    group — inside a group only the min id survives."""
    h = simhash(F.col(text_col))
    base = _spread(df.select(F.col(id_col).alias("id"), text_col)) \
        .select("id", h.alias("sh"))
    # lazy persist (r14): the first consumer is the cluster gate's single
    # Arrow collect (near_dup_clusters), which fills the cache; the member/
    # rep joins in the returned plan then read it — the eager count here
    # was a whole extra pass over the signature computation
    groups = _persist(base.groupBy("sh").agg(F.min("id").alias("min_id"),
                                             F.collect_list("id").alias("ids")))
    hpairs = _simhash_hash_pairs(groups, bands, max_hamming)
    # hash -> cluster-root hash
    hclusters = near_dup_clusters(hpairs, id_a="sh_a", id_b="sh_b")
    # representative id per cluster = min over member hashes' min ids
    member = (groups.join(hclusters.withColumnRenamed("id", "sh"), "sh", "left")
              .withColumn("cluster", F.coalesce("cluster", "sh")))
    rep = (member.groupBy("cluster").agg(F.min("min_id").alias("rep_id")))
    keep = (member.join(rep, "cluster")
            .select(F.explode("ids").alias("id"), "rep_id")
            .filter(F.col("id") == F.col("rep_id"))
            .select(F.col("id").alias(id_col)))
    return df.join(keep, id_col, "left_semi")


def ngrams_from_tokens(toks: Column, n: int) -> Column:
    """Word n-grams from an ALREADY-MATERIALIZED token-array column.
    Feed this a projected column, not the tokenize expression itself:
    Catalyst inlines a raw expression into every per-position lambda call,
    re-running the regex split O(tokens) times per document (measured 2x
    wall on the gram explode). array_join over the slice beats concat_ws's
    varargs/null handling (measured -15% on the 8-gram explode at sf0.1)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                    lambda i: F.array_join(F.slice(toks, i, n), " "))
    ).otherwise(F.array().cast("array<string>"))


def word_ngrams(text: Column, n: int) -> Column:
    """Lower-cased word n-grams as space-joined strings; documents shorter
    than n tokens yield an empty array (no short-doc fallback — matches the
    Gopher/decontamination recipes, which ignore sub-n docs).

    Prefer projecting ``tokens(F.lower(c))`` to a column and calling
    :func:`ngrams_from_tokens` in hot paths (see its docstring). Lowering
    the whole string once beats a per-token transform."""
    return ngrams_from_tokens(tokens(F.lower(text)), n)


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 8,
                  text_col: str = "text", id_col: str = "doc_id",
                  carry_cols: tuple = ()) -> DataFrame:
    """Benchmark decontamination (the GPT-3/Llama training-data recipe):
    flag training documents sharing any word ``n``-gram with a held-out
    benchmark/eval set, so they can be dropped before training.

    Distributed shape: the benchmark's distinct n-grams are a SMALL table
    (eval sets are tiny next to a 100 TB corpus) -> broadcast; training
    docs explode their n-grams once and probe the broadcast set — one
    narrow pass over the corpus, one map-side join, no shuffle keyed on
    corpus size (only the per-doc re-aggregation, keyed on doc id).

    Returns one row per training doc: ``n_grams``, ``n_contaminated``
    (grams hitting the benchmark), ``contaminated`` flag.
    """
    lower_toks = tokens(F.lower(F.col(text_col)))
    bg = (_spread(benchmark.select(text_col))
          .select(lower_toks.alias("__toks__"))
          .select(F.explode(ngrams_from_tokens(F.col("__toks__"), n))
                   .alias("gram"))
          .distinct())
    keep = [id_col, *carry_cols]
    dg = (_spread(docs.select(*keep, text_col))
          .select(*keep, lower_toks.alias("__toks__"))
          .select(*keep,
                  F.explode_outer(ngrams_from_tokens(F.col("__toks__"), n))
                   .alias("gram")))
    j = dg.join(F.broadcast(bg.withColumn("__hit__", F.lit(1))),
                "gram", "left")
    return (j.groupBy(*keep)
             .agg(F.count(F.col("gram")).alias("n_grams"),
                  F.count(F.col("__hit__")).alias("n_contaminated"))
             .withColumn("contaminated", F.col("n_contaminated") > 0))


def duplicate_ngram_fraction(df: DataFrame, n: int = 8,
                             text_col: str = "text", id_col: str = "doc_id",
                             carry_cols: tuple = ()) -> DataFrame:
    """Per-document duplicate n-gram fraction (Gopher / RefinedWeb-style
    corpus quality signal): the share of a doc's token n-grams that also
    appear in at least one OTHER document. High values flag boilerplate and
    template spam that survives whole-doc dedup.

    Distributed shape (the CCNet recipe): explode n-grams -> corpus-wide
    count of distinct source docs per n-gram (map-side combinable groupBy
    on the gram) -> join back on the gram -> per-doc fraction. Both
    shuffles key on the n-gram / doc id; no driver-side state, no
    all-pairs anything — linear in total tokens at any corpus size.
    """
    keep = [id_col, *carry_cols]
    # pre-combine per (doc, gram): downstream sees one row per distinct
    # gram per doc (carrying its in-doc multiplicity) instead of every
    # gram instance — the per-gram doc count is then a plain count(*)
    # rather than an expensive exact countDistinct expansion
    g2 = (_spread(df.select(*keep, text_col))
            .select(*keep, tokens(F.lower(F.col(text_col)))
                            .alias("__toks__"))
            .select(*keep, F.explode(ngrams_from_tokens(F.col("__toks__"), n))
                            .alias("gram"))
            .groupBy(*keep, "gram").agg(F.count(F.lit(1)).alias("c")))
    # per-gram doc count as ONE window over the gram partition (r14,
    # guide §2.4): the former groupBy("gram") + left-join-back consumed g2
    # twice — persist + two shuffles + a join; count().over(gram) computes
    # the same n_docs_with (g2 is unique per (doc, gram), so rows per
    # gram = docs per gram) in the single gram shuffle, and g2 goes back
    # to one consumer with no persist
    from pyspark.sql import Window
    w = Window.partitionBy("gram")
    per = (g2.withColumn("__nd__", F.count(F.lit(1)).over(w))
             .groupBy(*keep)
             .agg(F.sum("c").alias("n_grams"),
                  F.coalesce(F.sum(F.when(F.col("__nd__") > 1, F.col("c"))),
                             F.lit(0)).alias("n_dup_grams")))
    return per.withColumn(
        "dup_ngram_frac",
        F.round(F.col("n_dup_grams") / F.col("n_grams").cast("double"), 6))
