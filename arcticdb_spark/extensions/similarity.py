"""Similarity search over an embedding column (``array<float>``).

* **brute_force_topk** — exact cosine top-k: broadcast the (small) query set,
  one narrow map computes scores (``F.zip_with`` + ``F.aggregate`` — JVM-side
  fold, no Python), then a per-query top-k window. At 100 TB the scan
  dominates; scoring is embarrassingly parallel and shuffle-free until the
  final tiny top-k aggregation.
* **lsh_topk** — the scale path: random-hyperplane LSH. Planes are a
  deterministic broadcast literal; bucket = sign-bit string; candidates =
  equi-join on bucket (with multi-probe via several tables), exact-rescored.
  Recall < 1.0 by construction; the bench compares it against brute force.
* **ivf_assign / ivf_topk** — IVF-style coarse quantization: k centroid
  vectors (sampled deterministically), assign by best dot product, search
  only the nprobe closest lists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# DataFrames persisted across an operator call (the kmeans base scan); call
# unpersist_all() after consuming results (bench.py does, like dedup's).
_PERSISTED: list = []


def unpersist_all() -> None:
    while _PERSISTED:
        try:
            _PERSISTED.pop().unpersist()
        except Exception:
            pass


def _seed_rows(corpus: DataFrame, k: int, id_col: str, vec_col: str) -> list:
    """Deterministic CONTENT-SPREAD seed set: the k corpus vectors with the
    smallest ``md5(cast(id as string))``, ties by id. Engine-replayable
    (DuckDB md5 of the same string matches bit-for-bit), and — unlike
    first-k-by-id — decorrelated from id assignment order: on a corpus
    where ids track content (appended source by source) first-k seeds
    collapse into one region, giving unbalanced IVF lists and slow Lloyd
    convergence. A TakeOrdered over the hash: no full sort, no shuffle."""
    return sorted(
        corpus.select(F.col(id_col).alias("cid"),
                      F.col(vec_col).alias("cv"),
                      F.md5(F.col(id_col).cast("string")).alias("__h__"))
              .orderBy("__h__", "cid").limit(k).drop("__h__").collect(),
        key=lambda r: r["cid"])


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x.cast("double") * x.cast("double")),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     metric: str = "cosine") -> DataFrame:
    """Exact top-k: one (query_id, vec_id, score) row per query-neighbor.

    ``queries`` must be small (it is broadcast); self-matches are excluded.
    Output: query_id, vec_id, score (rounded 6dp), rank 1..k.
    """
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qvec"))
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec"))
    joined = c.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
    score = (cosine(F.col("qvec"), F.col("cvec")) if metric == "cosine"
             else _dot(F.col("qvec"), F.col("cvec")))
    scored = joined.select("query_id", "vec_id", F.round(score, 6).alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))


# ---------------------------------------------------------------------------
# LSH (random hyperplanes)
# ---------------------------------------------------------------------------

def _planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    import numpy as np
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id as a string of 0/1 (pure-SQL variant)."""
    bits = []
    for p in planes:
        lit = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(_dot(vec, lit) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _bucket_udf(planes_list: list[list[list[float]]], probe: int = 0):
    """All tables' bucket ids in one vectorized numpy matmul per Arrow batch.

    The SQL fold (`F.aggregate`) runs interpreted per element — for
    n_tables*n_planes dot products per vector a Pandas UDF is the documented
    fast path (~10-100x). Bucketing is self-consistent (corpus and queries
    hash identically), so float summation order here cannot break results.

    ``probe=1`` adds multi-probe buckets (each single-bit flip of the sign
    pattern) — used on the QUERY side only: queries are few, so probing
    1+n_planes buckets per table costs nothing but recovers the neighbors
    that fell one hyperplane away (the dominant LSH miss mode).
    """
    mats = [np.asarray(p, dtype="float64").T for p in planes_list]  # dim x planes

    @F.pandas_udf("array<string>")
    def buckets(vecs: pd.Series) -> pd.Series:
        V = np.stack([np.asarray(v, dtype="float64") for v in vecs])
        per_table = []
        for t, M in enumerate(mats):
            S = (V @ M) >= 0.0
            names = []
            for row in S:
                base = "".join("1" if b else "0" for b in row)
                ids = [f"t{t}:{base}"]
                if probe >= 1:
                    for i in range(len(base)):
                        flipped = base[:i] + ("0" if base[i] == "1" else "1") + base[i + 1:]
                        ids.append(f"t{t}:{flipped}")
                names.append(ids)
            per_table.append(names)
        return pd.Series([sum(x, []) for x in zip(*per_table)])

    return buckets


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_planes: int = 6, n_tables: int = 8, dim: int = 64,
             probe: int = 1) -> DataFrame:
    """Approximate top-k: ``n_tables`` independent hyperplane bucketings
    computed in ONE pass over the corpus (bucket array + explode with the
    table index), candidates from a single equi-join on (table, bucket),
    exact cosine rescoring. One scan + one shuffle regardless of n_tables.
    Multi-probe (``probe=1``) expands QUERY buckets only — the corpus side
    stays one row per (vector, table), so the big-side explode factor is
    exactly n_tables regardless of probing."""
    planes = [_planes(dim, n_planes, seed=1000 + t) for t in range(n_tables)]
    cb = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec"),
                       F.explode(_bucket_udf(planes)(F.col(vec_col))).alias("bucket"))
    qb = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
                        F.explode(_bucket_udf(planes, probe=probe)(F.col(vec_col)))
                         .alias("bucket"))
    # score BEFORE deduplicating: a (query, vector) pair colliding in
    # several tables scores identically each time, and the dedup shuffle
    # then moves (query_id, vec_id, score) triples instead of two
    # dim-float vectors per row (~30x fewer shuffle bytes at d=64).
    # ONE exchange serves both the dedup and the top-k window (r14, guide
    # §2.4): hash-partitioning on query_id alone satisfies the dedup's
    # (query_id, vec_id) clustering requirement AND the window's, so the
    # scored stream crosses the network once instead of twice
    scored = (cb.join(F.broadcast(qb), "bucket")
                .filter(F.col("query_id") != F.col("vec_id"))
                .select("query_id", "vec_id",
                        F.round(cosine(F.col("qvec"), F.col("cvec")), 6)
                         .alias("score"))
                .repartition("query_id")
                .dropDuplicates(["query_id", "vec_id"]))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# IVF (coarse quantization)
# ---------------------------------------------------------------------------

def _ivf_refine_centroids(corpus: DataFrame, seed_rows: list,
                          vec_col: str, iters: int = 2,
                          id_col: str = "vec_id",
                          train_cap: int = 4096) -> np.ndarray:
    """Spherical-Lloyd refinement of the md5-seeded IVF list centroids,
    trained DRIVER-SIDE on a capped deterministic sample — the standard
    IVF quantizer-training shape (faiss trains coarse quantizers on a
    sample, never the full corpus). One Spark job collects at most
    ``train_cap`` vectors (hash-selected by ``xxhash64(id) % m == 0``, so
    the sample is stable across runs and engines); the Lloyd rounds are
    then numpy on a <=cap x d matrix — microseconds, no per-round Spark
    jobs, no persist. At 100 TB the collect is still <=cap x d floats
    (cap 4096 x dim 64 = 2 MB), while the previous distributed form paid
    2 full corpus passes + a k x d groupBy per round.

    Semantics match the prior distributed version: max-cosine assignment
    with cosines rounded 6dp before the argmax (ties -> lowest list id),
    member means rounded 9dp, a list that loses all members keeps its
    previous centroid. Cosine is scale invariant, so means need no
    re-normalization. Returns the k x d centroid matrix.

    Why refine at all: the raw seed set is content-spread but still k
    corpus POINTS; on a near-unclustered corpus its Voronoi cells are
    lopsided and recall@nprobe suffers (round-6 honest measurement:
    0.70@nprobe=6). Two Lloyd rounds hold measured recall@5 at 0.925 on
    the driver embeddings across sf0.001-0.1."""
    M = np.stack([np.asarray(r["cv"], dtype="float64") for r in seed_rows])
    if iters <= 0:
        return M
    n = corpus.count()
    tr = corpus
    if n > train_cap:
        m = int(n // train_cap) + 1
        tr = corpus.filter(
            F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(m)) == 0)
    V = np.stack([np.asarray(r["v"], dtype="float64") for r in
                  tr.select(F.transform(F.col(vec_col),
                                        lambda x: x.cast("double"))
                            .alias("v")).collect()])
    Vn = np.sqrt((V * V).sum(axis=1))
    for _ in range(iters):
        Mn = np.sqrt((M * M).sum(axis=1))
        sims = (V @ M.T) / (Vn[:, None] * Mn[None, :])
        best = np.argmin(-np.round(sims, 6), axis=1)
        M = M.copy()
        for l in range(M.shape[0]):
            members = V[best == l]
            if len(members):
                M[l] = np.round(members.mean(axis=0), 9)
    return M


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_lists: int = 16, nprobe: int = 4,
             refine_iters: int = 2, n_assign: int = 2) -> DataFrame:
    """IVF: list centroids = deterministic content-spread sample of corpus
    vectors (min-k by md5(id) — `_seed_rows`) refined with
    ``refine_iters`` spherical-Lloyd rounds (`_ivf_refine_centroids`);
    every vector assigned to its best centroid; queries search only nprobe
    lists."""
    cent_rows = _seed_rows(corpus, n_lists, id_col, vec_col)
    cids = np.arange(len(cent_rows), dtype="int64")
    M = _ivf_refine_centroids(corpus, cent_rows, vec_col,
                              iters=refine_iters, id_col=id_col).T

    @F.pandas_udf("array<bigint>")
    def centroid_order(vecs: pd.Series) -> pd.Series:
        # vectorized matmul: centroid ids sorted by descending dot product
        V = np.stack([np.asarray(v, dtype="float64") for v in vecs])
        order = np.argsort(-(V @ M), axis=1, kind="stable")
        return pd.Series([cids[o].tolist() for o in order])

    # multi-assignment: each vector is indexed into its top-``n_assign``
    # lists — the standard IVF recall lever for weakly-clustered data
    # (boundary vectors are reachable from adjacent cells). Index size and
    # query-side candidates scale by n_assign within the same nprobe; at
    # scale this is a storage/recall tradeoff, not a shuffle change.
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec"),
                      F.explode(F.slice(centroid_order(F.col(vec_col)),
                                        1, n_assign)).alias("list_id"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
                       F.explode(F.slice(centroid_order(F.col(vec_col)), 1, nprobe))
                        .alias("list_id"))
    j = c.join(F.broadcast(q), "list_id").filter(F.col("query_id") != F.col("vec_id"))
    # a (query, vector) pair can meet in up to n_assign probed lists:
    # score first (identical in every list), THEN dedup — the shuffle
    # moves score triples instead of two dim-float vectors per row.
    # ONE exchange serves both the dedup and the top-k window (r14, guide
    # §2.4): hash-partitioning on query_id alone satisfies the dedup's
    # (query_id, vec_id) clustering requirement AND the window's
    scored = (j.select("query_id", "vec_id",
                       F.round(cosine(F.col("qvec"), F.col("cvec")), 6)
                        .alias("score"))
               .repartition("query_id")
               .dropDuplicates(["query_id", "vec_id"]))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def centroid_assign(corpus: DataFrame, k: int = 8,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Nearest-centroid assignment (the k-means E-step / IVF coarse
    quantizer): centroids are the ``k`` corpus vectors with the smallest
    md5(id) (deterministic content-spread seed set — `_seed_rows`), each
    vector is assigned to the centroid with the highest cosine (ties ->
    lowest centroid id).

    The k x d centroid matrix is driver-collected (k rows, independent of
    corpus size) and inlined as literal arrays, so assignment is one narrow
    JVM-side projection — no shuffle, no Python, scan-bound at 100 TB.
    Cosines are rounded to 6dp before the argmax so the decision is
    reproducible across engines (same contract as brute_force_topk).
    """
    cent = _seed_rows(corpus, k, id_col, vec_col)
    cids = np.array([int(r["cid"]) for r in cent])
    M = np.stack([np.asarray(r["cv"], dtype="float64") for r in cent])
    Mn = np.sqrt((M * M).sum(axis=1))

    # vectorized Arrow-batched assignment: one matmul per batch. A literal
    # per-centroid fold expression is semantically identical but Catalyst
    # codegen over k*d literals dominates wall time even at tiny k
    @F.pandas_udf("struct<centroid_id:bigint, cos:double>")
    def assign(vecs: pd.Series) -> pd.DataFrame:
        V = np.stack([np.asarray(x, dtype="float64") for x in vecs])
        sims = (V @ M.T) / (np.sqrt((V * V).sum(axis=1))[:, None] * Mn[None, :])
        sims = np.round(sims, 6)
        best = np.argmin(-sims, axis=1)  # first max -> lowest cid on ties
        rows = np.arange(len(best))
        return pd.DataFrame({"centroid_id": cids[best],
                             "cos": sims[rows, best]})

    out = corpus.select(F.col(id_col).alias("vec_id"),
                        assign(F.col(vec_col)).alias("a"))
    return out.select("vec_id", F.col("a.centroid_id").alias("centroid_id"),
                      F.col("a.cos").alias("cos"))


def _sq_dist(v: Column, lit_vec: list[float]) -> Column:
    arr = F.array(*[F.lit(float(x)) for x in lit_vec])
    return F.aggregate(F.zip_with(v, arr, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, d: acc + d)


def _kmeans_estep(base: DataFrame, cents: dict) -> DataFrame:
    """Assign each vector to the nearest centroid by euclidean distance
    (rounded 6dp; ties -> lowest cluster id). ``cents`` is {cid: [float]},
    broadcast as a numpy matrix into a vectorized Arrow-batched UDF — a
    narrow shuffle-free map (the literal-fold equivalent spends seconds in
    Catalyst codegen at k*d expression nodes)."""
    items = sorted(cents.items())
    cids = np.array([cid for cid, _ in items])
    M = np.stack([np.asarray(cv, dtype="float64") for _, cv in items])

    @F.pandas_udf("struct<cluster:bigint, dist:double>")
    def assign(vecs: pd.Series) -> pd.DataFrame:
        V = np.stack([np.asarray(x, dtype="float64") for x in vecs])
        d = np.sqrt(((V[:, None, :] - M[None, :, :]) ** 2).sum(axis=2))
        d = np.round(d, 6)
        best = np.argmin(d, axis=1)  # first min -> lowest cid on ties
        rows = np.arange(len(best))
        return pd.DataFrame({"cluster": cids[best], "dist": d[rows, best]})

    return base.select("vec_id", "v", assign(F.col("v")).alias("a")) \
               .select("vec_id", "v", F.col("a.cluster").alias("cluster"),
                       F.col("a.dist").alias("dist"))


def kmeans(corpus: DataFrame, k: int = 8, iters: int = 2,
           id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Lloyd's k-means, Spark-native and deterministic: init = the ``k``
    corpus vectors with the smallest md5(id) (content-spread seed —
    `_seed_rows`); each iteration is one narrow E-step
    (broadcast literal centroids, no Python) plus one M-step groupBy whose
    per-dimension ``avg`` aggregates are map-side combinable — per
    iteration the driver holds only the k x d centroid matrix and the
    cluster never shuffles the raw vectors more than once.

    Centroid coordinates are rounded to 9dp and distances to 6dp each
    round, so the full trajectory is bit-reproducible across engines (the
    ``embedding_kmeans`` DuckDB oracle replays it exactly). A cluster that
    loses all members keeps its previous centroid.

    Returns the final assignment: (vec_id, cluster, dist).
    """
    rows = _seed_rows(corpus, k, id_col, vec_col)
    cents = {int(r["cid"]): [float(x) for x in r["cv"]] for r in rows}
    dim = len(next(iter(cents.values())))
    base = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"))
    # One input scan total: every E-step re-reads (vec_id, v), so cache it
    # once before the loop — without this each Lloyd iteration re-scans the
    # full table, a 100 TB scan per iteration. The first M-step's collect
    # populates the cache; the cache is released by unpersist_all() (a
    # post-release recompute of the returned frame replays the SAME final
    # centroids, so results stay deterministic either way).
    if iters > 1:
        base = base.persist()
        _PERSISTED.append(base)
    assigned = _kmeans_estep(base, cents)
    for _ in range(iters - 1):
        # M-step as posexplode -> avg per (cluster, dim): still map-side
        # combinable (k x dim partial rows per partition), ~2x cheaper than
        # a dim-wide column-per-dimension aggregate (64 element_at + avg
        # expression updates per input row), and the same shape the DuckDB
        # oracle replays (generate_subscripts + unnest + AVG)
        new_rows = (assigned.select("cluster",
                                    F.posexplode("v").alias("__p__", "__x__"))
                    .groupBy("cluster", "__p__")
                    .agg(F.round(F.avg("__x__"), 9).alias("c"))
                    .collect())
        upd: dict[int, list] = {}
        for r in new_rows:
            upd.setdefault(int(r["cluster"]), [0.0] * dim)[r["__p__"]] = r["c"]
        cents = {**cents, **upd}
        assigned = _kmeans_estep(base, cents)
    return assigned.select("vec_id", "cluster", "dist")
