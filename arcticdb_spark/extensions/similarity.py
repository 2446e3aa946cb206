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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


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
    """Sign-bit bucket id as a string of 0/1."""
    bits = []
    for p in planes:
        lit = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(_dot(vec, lit) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_planes: int = 8, n_tables: int = 4, dim: int = 64) -> DataFrame:
    """Approximate top-k: union of ``n_tables`` independent hyperplane
    bucketings; candidates = bucket equi-join; exact cosine rescoring."""
    cands = None
    for t in range(n_tables):
        planes = _planes(dim, n_planes, seed=1000 + t)
        cb = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec"),
                           hyperplane_bucket(F.col(vec_col), planes).alias("bucket"))
        qb = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
                            hyperplane_bucket(F.col(vec_col), planes).alias("bucket"))
        j = cb.join(F.broadcast(qb), "bucket").filter(F.col("query_id") != F.col("vec_id")) \
              .select("query_id", "vec_id", "qvec", "cvec")
        cands = j if cands is None else cands.unionByName(j)
    cands = cands.dropDuplicates(["query_id", "vec_id"])
    scored = cands.select("query_id", "vec_id",
                          F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# IVF (coarse quantization)
# ---------------------------------------------------------------------------

def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_lists: int = 16, nprobe: int = 4) -> DataFrame:
    """IVF: centroids = deterministic sample of corpus vectors; every vector
    assigned to its best centroid; queries search only nprobe lists."""
    cent_rows = (corpus.orderBy(id_col).limit(n_lists)
                 .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
                 .collect())
    cents = [(int(r["cid"]), [float(x) for x in r["cv"]]) for r in cent_rows]

    def best_lists(vec: Column, n: int) -> Column:
        scored = F.array(*[
            F.struct(F.round(_dot(vec, F.array(*[F.lit(x) for x in cv])), 6).alias("s"),
                     F.lit(cid).alias("cid"))
            for cid, cv in cents])
        top = F.slice(F.reverse(F.array_sort(scored)), 1, n)
        return F.transform(top, lambda s: s.getField("cid"))

    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec"),
                      best_lists(F.col(vec_col), 1)[0].alias("list_id"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
                       F.explode(best_lists(F.col(vec_col), nprobe)).alias("list_id"))
    j = c.join(F.broadcast(q), "list_id").filter(F.col("query_id") != F.col("vec_id"))
    scored = j.select("query_id", "vec_id",
                      F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
