"""Round-13 pipeline operators: dup-group retention policy, incremental
(new-vs-seen) dedup with a Bloom prefilter, corpus-unigram LM scoring.

Each operator's physical strategies are forced across their gates on the
same inputs and must be value-identical — the same discipline the sf1
ladder applies to the older dedup family."""

import math

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from arcticdb_spark.extensions import dedup as xd
from arcticdb_spark.extensions import text as xt


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # group A: three copies of the same normalized text, different
        # quality (row 3 has no stopwords/short -> lower quality)
        (1, "The cat sat on the mat, and it was very happy there."),
        (2, "the   cat sat on the mat, and it was very    happy there."),
        (7, "THE CAT SAT ON THE MAT, AND IT WAS VERY HAPPY THERE."),
        # group B: two copies, tie on quality and length -> min id wins
        (4, "a quick brown fox jumps over the lazy dog by the river"),
        (5, "A Quick Brown Fox Jumps Over The Lazy Dog By The River"),
        # singletons
        (6, "!!!???;;;:::"),
        (8, "short one"),
        (9, ""),
        (10, "   "),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_keep_best_winners(corpus):
    out = {r.fingerprint: r for r in
           xd.keep_best_per_dup_group(corpus).collect()}
    by_id = {r.doc_id: r for r in out.values()}
    # group A: all three normalize identically; quality ties (same text
    # modulo case/whitespace -> same tokens), n_chars differs: doc 2 has
    # the extra spaces -> longest wins
    assert 2 in by_id and by_id[2].dup_count == 3
    # group B: identical normalized text and identical length -> lowest id
    assert 4 in by_id and by_id[4].dup_count == 2
    # empty and whitespace-only normalize to the same "" fingerprint
    empties = [r for r in out.values() if r.n_chars <= 3]
    assert any(r.dup_count == 2 for r in empties)
    # every surviving doc_id is a member of its group
    total_docs = sum(r.dup_count for r in out.values())
    assert total_docs == corpus.count()


def test_keep_best_matches_window_reference(documents):
    """max_by struct ordering == the obvious row_number window plan."""
    fast = xd.keep_best_per_dup_group(documents)
    q = xt.quality_score(F.col("text"))
    ref = (documents
           .select(xt.fingerprint(F.col("text")).alias("fingerprint"),
                   F.col("doc_id"), q.alias("quality"),
                   F.length("text").cast("long").alias("n_chars"))
           .withColumn("dup_count",
                       F.count(F.lit(1)).over(
                           Window.partitionBy("fingerprint")))
           .withColumn("rn", F.row_number().over(
               Window.partitionBy("fingerprint")
               .orderBy(F.col("quality").desc(), F.col("n_chars").desc(),
                        F.col("doc_id").asc())))
           .filter("rn = 1").drop("rn"))
    a = sorted(map(tuple, fast.collect()))
    b = sorted(map(tuple, ref.select(*fast.columns).collect()))
    assert a == b


def test_bloom_params_math():
    m, k = xd._bloom_params(1_000_000, 0.01)
    # textbook optimum: ~9.585 bits/item, ~7 hashes at 1% fpp
    assert 9_400_000 < m < 9_800_000
    assert k == 7
    m2, _ = xd._bloom_params(1_000_000, 0.001)
    assert m2 > m


def test_bloom_indices_deterministic_and_in_range():
    fps = pd.Series(["d41d8cd98f00b204e9800998ecf8427e",
                     "900150983cd24fb0d6963f7d28e17f72"])
    idx = xd._bloom_indices(fps, 1 << 20, 7)
    assert idx.shape == (2, 7)
    assert (idx < (1 << 20)).all()
    idx2 = xd._bloom_indices(fps, 1 << 20, 7)
    assert (idx == idx2).all()
    # different fingerprints -> different index rows
    assert (idx[0] != idx[1]).any()


def test_incremental_dedup_both_paths(documents):
    seen = documents.filter(F.col("doc_id") % 2 == 0)
    new = documents.filter(F.col("doc_id") % 2 == 1)
    xd.clear_gate_log()
    broad = xd.incremental_dedup(new, seen,
                                 broadcast_bytes_max=1 << 30)
    rows_broad = sorted((r.doc_id, r.fingerprint) for r in broad.collect())
    assert xd.GATE_LOG[-1]["path"] == "broadcast_set"

    xd.clear_gate_log()
    bloom = xd.incremental_dedup(new, seen, broadcast_bytes_max=0,
                                 bloom_fpp=0.05)
    rows_bloom = sorted((r.doc_id, r.fingerprint) for r in bloom.collect())
    assert xd.GATE_LOG[0]["path"] == "bloom_prefilter"
    assert rows_broad == rows_bloom

    # exactness oracle: plain anti-join on the fingerprint
    fp = xt.fingerprint(F.col("text"))
    truth = sorted((r.doc_id, r.fingerprint) for r in
                   new.select("doc_id", fp.alias("fingerprint"))
                      .join(seen.select(fp.alias("fingerprint")).distinct(),
                            "fingerprint", "left_anti")
                      .collect())
    assert rows_broad == truth
    xd.unpersist_all()


def test_incremental_dedup_planted_dup(spark):
    seen = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(10, "ALPHA   beta gamma"),      # dup of 1 modulo normalize
         (11, "zeta eta theta"),          # genuinely new
         (12, "delta epsilon")],          # exact dup of 2
        "doc_id long, text string")
    for budget in (1 << 30, 0):
        got = sorted(r.doc_id for r in
                     xd.incremental_dedup(new, seen,
                                          broadcast_bytes_max=budget)
                     .collect())
        assert got == [11], (budget, got)
    xd.unpersist_all()


def test_unigram_logprob_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, ""), (4, "   ")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in xt.unigram_logprob(df).collect()}
    # corpus: a:2 b:2 c:1, total 5; empty docs excluded
    assert set(out) == {1, 2}
    lp = lambda n: math.log(n / 5)
    assert out[1].n_tokens == 3
    assert out[1].logprob == pytest.approx(
        round((2 * lp(2) + lp(2)) / 3, 6), abs=1e-9)
    assert out[2].n_tokens == 2
    assert out[2].logprob == pytest.approx(
        round((lp(2) + lp(1)) / 2, 6), abs=1e-9)
    xd.unpersist_all()


def test_unigram_logprob_casefold_and_paths(documents):
    """Broadcast-vocab and shuffle-join paths agree; scores are ordered
    sensibly (a doc of corpus-frequent tokens beats hapax gibberish)."""
    a = xt.unigram_logprob(documents)
    rows_a = sorted(map(tuple, a.collect()))
    b = xt.unigram_logprob(documents, vocab_broadcast_rows_max=0)
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b
    assert len(rows_a) > 0
    xd.unpersist_all()
