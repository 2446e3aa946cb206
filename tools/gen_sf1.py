"""Generate a deterministic sf1 dataset (10x sf0.1) into .scale/sf1/.

The driver ships sf{0.001,0.01,0.1} only; the 100 TB scale claims need at
least one decade beyond the 600k-row ceiling (r11 verdict item 1). sf1 is
synthesized from the driver's sf0.1 tables by a 10-way copy with
structure-preserving, similarity-destroying per-copy transforms — chosen so
per-row character (text length, duplicate fraction, neighbor structure,
value distributions) matches sf0.1 while global size grows exactly 10x:

* **keys** — every fact/dim key becomes ``key*10 + copy``; foreign keys get
  the same map, so referential integrity and join fan-out per key are
  preserved (nation/region stay fixed like TPC-H).
* **documents.text** — for copy c>0, every token that is not a language
  marker/stopword gets suffix ``str(c)``. A per-copy token BIJECTION
  preserves within-copy shingle-set Jaccard EXACTLY (dup structure scales
  linearly) while cross-copy k=3 shingle overlap needs 3 consecutive
  stopwords (rare in this vocabulary) — so the near-dup graph is 10
  disjoint isomorphic copies, not a 100x pair blow-up. Language markers
  are preserved so lang-id / quality-score selectivity carries over.
* **embeddings** — copy c multiplies elementwise by a deterministic ±1 mask
  m(c): (m⊙x)·(m⊙y) = x·y, so within-copy cosines/norms are EXACT while
  cross-copy dot products decorrelate (random sign agreement) — ANN
  recall@k is measurable at sf1 against brute force, and k-means sees 10
  sign-isomorphic copies of the sf0.1 geometry.
* **events.ts** — unchanged: the driver keeps a fixed 30-day window at
  every sf (720 hourly buckets at all three), so density scales, matching
  its convention.

Run: ``python tools/gen_sf1.py`` (~1 min). Output: ``.scale/sf1/<t>.parquet``
directories readable by ``sources.tables.load_table`` (gitignored).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from arcticdb_spark import get_spark
from arcticdb_spark.sources.tables import load_table

SRC = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".scale", "sf1")
COPIES = 10

# union of every stopword/marker inventory the text operators score on
# (extensions/text.py _LANG_MARKERS + _EN_STOPWORDS extras)
_PRESERVE = sorted({
    "the", "and", "of", "to", "in", "is", "that", "for", "with",
    "der", "die", "und", "das", "ist", "nicht", "ein", "mit",
    "le", "la", "les", "des", "est", "une", "dans", "pour",
    "el", "los", "las", "una", "por", "para", "con", "del",
    "a", "an", "it", "on", "as", "at", "by",
})


def _copies(df: DataFrame) -> DataFrame:
    spark = df.sparkSession
    return df.crossJoin(spark.range(COPIES).select(
        F.col("id").cast("long").alias("__copy__")))


def _rekey(df: DataFrame, keys: list[str]) -> DataFrame:
    out = _copies(df)
    for k in keys:
        out = out.withColumn(k, F.col(k) * COPIES + F.col("__copy__"))
    return out.drop("__copy__")


def _sign_mask(copy: int, dim: int) -> list[float]:
    # deterministic, copy-0 = identity so the original vectors survive.
    # md5-derived bits: pairwise-independent across copies — a correlated
    # mask (an earlier affine one agreed on ~75% of dims between some copy
    # pairs) leaks cross-copy cosine ~0.5x the original and inflates the
    # near-dup pair count 267x instead of 10x
    if copy == 0:
        return [1.0] * dim
    import hashlib
    return [1.0 if int(hashlib.md5(f"{copy}:{i}".encode()).hexdigest(), 16)
            & 1 == 0 else -1.0 for i in range(dim)]


def gen(spark, out_dir: str = OUT) -> None:
    os.makedirs(out_dir, exist_ok=True)

    def write(df: DataFrame, name: str, n_files: int, sort: list[str]) -> None:
        path = os.path.join(out_dir, f"{name}.parquet")
        (df.repartition(n_files).sortWithinPartitions(*sort)
           .write.mode("overwrite").parquet(path))
        print(f"  {name}: {spark.read.parquet(path).count()} rows -> {path}")

    # dims fixed like TPC-H nation/region
    for t in ("region", "nation"):
        write(load_table(spark, SRC, t), t, 1,
              [load_table(spark, SRC, t).columns[0]])

    write(_rekey(load_table(spark, SRC, "customer"), ["c_custkey"]),
          "customer", 4, ["c_custkey"])
    write(_rekey(load_table(spark, SRC, "supplier"), ["s_suppkey"]),
          "supplier", 1, ["s_suppkey"])
    write(_rekey(load_table(spark, SRC, "part"), ["p_partkey"]),
          "part", 4, ["p_partkey"])
    write(_rekey(load_table(spark, SRC, "orders"), ["o_orderkey", "o_custkey"]),
          "orders", 8, ["o_orderkey"])
    write(_rekey(load_table(spark, SRC, "lineitem"),
                 ["l_orderkey", "l_partkey", "l_suppkey"]),
          "lineitem", 32, ["l_orderkey", "l_linenumber"])
    write(_rekey(load_table(spark, SRC, "events"), ["event_id", "user_id"]),
          "events", 8, ["ts"])

    # documents: per-copy token bijection, stopwords/markers preserved
    stop = F.array(*[F.lit(w) for w in _PRESERVE])
    docs = _copies(load_table(spark, SRC, "documents"))
    suffixed = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda t: F.when((t == "") | F.array_contains(stop, t), t)
                       .otherwise(F.concat(t, F.col("__copy__").cast("string")))),
        " ")
    docs = (docs
            .withColumn("text", F.when(F.col("__copy__") == 0, F.col("text"))
                                 .otherwise(suffixed))
            .withColumn("doc_id", F.col("doc_id") * COPIES + F.col("__copy__"))
            .withColumn("n_chars", F.length("text").cast("int"))
            .drop("__copy__"))
    write(docs, "documents", 4, ["doc_id"])

    # embeddings: per-copy elementwise ±1 mask (exact within-copy geometry)
    emb = load_table(spark, SRC, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    parts = []
    for c in range(COPIES):
        mask = F.array(*[F.lit(v) for v in _sign_mask(c, dim)])
        parts.append(emb.select(
            (F.col("vec_id") * COPIES + F.lit(c)).alias("vec_id"),
            F.zip_with("embedding", mask,
                       lambda x, m: (x * m).cast("float")).alias("embedding"),
            "label"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    write(out, "embeddings", 2, ["vec_id"])


if __name__ == "__main__":
    spark = get_spark()
    gen(spark)
    print("sf1 generated")
