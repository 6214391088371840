package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Correctness of the near-dup detectors on a synthetic fixture with KNOWN
  * duplicates — the invariant the rows-only driver check can't verify. */
class NearDupSpec extends SparkTestBase {
  import spark.implicits._

  // 40 base docs of 30 tokens; docs 100x are exact copies of doc x,
  // docs 200x are near-copies (2 tokens changed), docs 300x unrelated.
  private lazy val fixture = {
    val vocab = (0 until 50).map(i => s"w$i")
    def text(seed: Int): String =
      (0 until 30).map(j => vocab((seed * 31 + j * 7) % vocab.size)).mkString(" ")
    val base = (0 until 40).map(i => (i.toLong, text(i)))
    val exact = (0 until 40).map(i => (100L + i, text(i)))
    // one token changed -> true 3-gram jaccard ≈ 25/31 ≈ 0.81; at K=16,B=4
    // the any-band hit probability is ~1-(1-0.81^4)^4 ≈ 0.9
    val near = (0 until 40).map { i =>
      val t = text(i).split(" "); t(17) = "qqq"
      (200L + i, t.mkString(" "))
    }
    // unrelated docs use a disjoint vocabulary (no token overlap at all)
    val far = (0 until 40).map(i =>
      (300L + i, (0 until 30).map(j => s"u${i}x$j").mkString(" ")))
    (base ++ exact ++ near ++ far).toDF("doc_id", "text")
  }

  private def minhashPairs = {
    // re-run the production pipeline on the fixture via a temp parquet dir
    val dir = tmpDir("neardup")
    fixture
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    DedupOps.queries("doc_minhash_lsh")(spark, dir)
  }

  test("minhash+LSH finds exact and near duplicates, not unrelated docs") {
    val pairs = minhashPairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    // every exact copy must be found with est_jaccard 1.0
    val exactFound = (0 until 40).count(i => pairSet.contains((i.toLong, 100L + i)))
    assert(exactFound == 40, s"exact dups found: $exactFound/40")
    pairs.filter(p => p._1 < 40 && p._2 == p._1 + 100).foreach(p => assert(p._3 == 1.0))
    // most near-copies must be found (expected recall ~0.9, see fixture)
    val nearFound = (0 until 40).count(i => pairSet.contains((i.toLong, 200L + i)))
    assert(nearFound >= 28, s"near dups found: $nearFound/40")
    // unrelated docs must not pair with their base
    val falsePos = (0 until 40).count(i => pairSet.contains((i.toLong, 300L + i)))
    assert(falsePos == 0, s"false positives vs unrelated: $falsePos")
  }

  test("emb_near_dup candidate volume is cap-bounded (the 100 TB guarantee)") {
    // the r2 scale defect: unbounded band buckets degrade the "bucketed"
    // join to ~N^2/buckets pairs. The fix bounds every bucket at ECAP, so
    // candidate pairs <= sum over buckets of |b|^2/2 <= ECAP/2 * banded rows.
    val dir = "/root/testdata/sf0.01"
    val banded = DedupOps.embNearDupBanded(spark, dir)
    val buckets = DedupOps.embNearDupBuckets(banded)
    val sizes = buckets.select(size(col("members")).as("n"))
      .agg(max(col("n")), sum((col("n").cast("long") * (col("n") - 1)))).head()
    assert(sizes.getInt(0) <= DedupOps.ECAP,
      s"bucket over cap: ${sizes.getInt(0)} > ${DedupOps.ECAP}")
    val twicePairs = sizes.getLong(1)
    val rows = banded.count()
    assert(twicePairs <= DedupOps.ECAP.toLong * rows,
      s"candidate pairs ${twicePairs / 2} exceed cap bound ${DedupOps.ECAP.toLong * rows / 2}")
  }

  test("connected components: path graph needs multi-round propagation") {
    import spark.implicits._
    // path 1-2-3-4-5 (diameter 4 — min label must propagate over several
    // rounds), a 2-cycle {10,11}, and a triangle {20,21,22}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("doc_a", "doc_b")
    val got = DedupOps.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(got(_) == 1L), s"path cluster wrong: $got")
    assert(got(10L) == 10L && got(11L) == 10L)
    assert(Seq(20L, 21L, 22L).forall(got(_) == 20L))
    // non-convergence is loud, not silent: one round cannot settle the path
    intercept[IllegalStateException](
      DedupOps.connectedComponents(edges, maxIter = 1).collect())
  }

  test("connected components: reliable checkpoint path (cluster fault tolerance)") {
    import spark.implicits._
    // with a checkpoint dir configured, the per-round lineage cut goes
    // through reliable checkpoint() (survives executor loss) instead of
    // executor-pinned localCheckpoint — same labeling either way
    val ckpt = tmpDir("cc-ckpt")
    spark.sparkContext.setCheckpointDir(ckpt)
    try {
      val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
        (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L))
        .toDF("doc_a", "doc_b")
      val got = DedupOps.connectedComponents(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert((1L to 5L).forall(got(_) == 1L), s"path cluster wrong: $got")
      assert(got(10L) == 10L && got(11L) == 10L)
      assert(Seq(20L, 21L, 22L).forall(got(_) == 20L))
      // the reliable path actually wrote round state to the checkpoint dir
      val wrote = new java.io.File(ckpt).listFiles()
      assert(wrote != null && wrote.nonEmpty, "no reliable checkpoint written")
    } finally spark.sparkContext.setCheckpointDir(null)
  }

  test("simhash: exact copies collide, near copies are close in hamming") {
    val dir = tmpDir("neardup2")
    fixture
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val sims = DedupOps.queries("doc_simhash")(spark, dir).collect()
      .map(r => r.getLong(0) -> java.lang.Long.parseUnsignedLong(r.getString(1), 16)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    (0 until 40).foreach { i =>
      assert(sims(i.toLong) == sims(100L + i), s"exact copy $i simhash differs")
      assert(hamming(sims(i.toLong), sims(200L + i)) <= 16,
        s"near copy $i too far: ${hamming(sims(i.toLong), sims(200L + i))}")
    }
    // unrelated docs: average distance should be much larger
    val farDist = (0 until 40).map(i => hamming(sims(i.toLong), sims(300L + i))).sum / 40.0
    assert(farDist > 16.0, s"unrelated docs too close on average: $farDist")
  }
}
