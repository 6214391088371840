package graft.operators

import graft.SparkTestBase
import graft.SparkEntry
import org.apache.spark.sql.functions._

/** Smoke + semantics checks for every SparkEntry query at sf0.001 (full
  * cross-engine value equality is covered by the driver's DuckDB gate and
  * tools/selfcheck.py; this suite guards invariants the oracle can't see). */
class OperatorSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("every registered query runs and is VALUE-deterministic across two runs") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val a = fn(spark, dir)
      val b = fn(spark, dir)
      assert(a.schema == b.schema, s"$name schema unstable")
      // value-level determinism, both directions (count+schema alone would
      // miss a nondeterministic value that keeps the cardinality)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$name values unstable across two runs")
    }
  }

  test("every oracle key corresponds to a registered query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracles without queries: $unknown")
  }

  test("every query has an oracle (no rows-only gates)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracles: $missing")
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("lsh ann returns ranked neighbors consistent with brute force") {
    val brute = SparkEntry.queries("emb_knn_brute")(spark, dir)
      .select("query_id", "neighbor_id", "rank").collect()
      .groupBy(_.getLong(0))
    val lsh = SparkEntry.queries("emb_lsh_ann")(spark, dir)
      .select("query_id", "neighbor_id", "rank").collect()
      .groupBy(_.getLong(0))
    assert(lsh.nonEmpty, "lsh must return candidates")
    // ranks are 1..k and unique per query
    lsh.foreach { case (q, rows) =>
      val ranks = rows.map(_.getInt(2)).sorted
      assert(ranks.head == 1 && ranks.distinct.length == ranks.length, s"bad ranks for $q")
    }
    // LSH's best hit for a query must appear in brute-force's candidate
    // universe (sanity: same scoring function)
    val bq = brute.keySet
    assert(lsh.keySet.subsetOf(bq))
    // recall@5 floor (r2 verdict: the signature-space growth must not cost
    // recall). Measured on this fixture: 0.48 with the sized signature
    // space + multi-probe vs 0.46 with the old constant 16-bucket config.
    val brutePairs = brute.values.flatten.map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshPairs = lsh.values.flatten.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brutePairs & lshPairs).size.toDouble / brutePairs.size
    assert(recall >= 0.4, f"ANN recall@5 vs brute dropped to $recall%.3f (floor 0.4)")
  }

  test("minhash est_jaccard is a valid probability and pairs are canonical") {
    val r = SparkEntry.queries("doc_minhash_lsh")(spark, dir).collect()
    r.foreach { row =>
      val (a, b, j) = (row.getLong(0), row.getLong(1), row.getDouble(2))
      assert(a < b && j >= 0.0 && j <= 1.0)
    }
  }

  test("simhash is stable and 64-bit") {
    val r1 = SparkEntry.queries("doc_simhash")(spark, dir).collect().map(r => (r.getLong(0), r.getString(1)))
    val r2 = SparkEntry.queries("doc_simhash")(spark, dir).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(r1.sameElements(r2))
    assert(r1.forall(_._2.matches("[0-9a-f]{16}")), "simhash must be 16 hex chars (64 bits)")
    assert(r1.map(_._2).distinct.length > 400, "simhashes should mostly differ across docs")
  }

  test("multimodal feature extraction: fixed dim, one vector per doc") {
    val f = Multimodal.extractFeatures(Multimodal.mediaTable(spark, dir))
    val n = Tables.documents(spark, dir).count()
    assert(f.count() == n)
    assert(f.filter(size(col("features")) =!= Multimodal.FEATURE_DIM).count() == 0)
    // deterministic stub: same payload -> same features
    val twice = Multimodal.extractFeatures(Multimodal.mediaTable(spark, dir))
    assert(f.select("doc_id", "features").exceptAll(twice.select("doc_id", "features")).isEmpty)
  }
}
