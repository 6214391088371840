package graft

import org.apache.spark.sql.SparkSession
import graft.cdc.{EventGen, GenConfig}

/**
 * Fixture oracles for the two queries whose results cannot be recomputed in
 * SQL (engine-side generator / stubbed media kernel). `graft.Verify` writes
 * each fixture from an INDEPENDENT implementation (a sequential driver-side
 * fold, not the distributed Dataset pipeline under test), and the DuckDB
 * oracle SELECTs the fixture parquet — so the gate still cross-checks the
 * distributed plan against a second implementation.
 */
object Fixtures {

  val dir = "/root/repo/target/fixtures"

  /** cdc_replay_final: the TRUE reference semantics, computed sequentially —
    * fold every event in LSN order into a driver-side map, deletes remove.
    * (The query under test uses the distributed max_by dedup; this is the
    * one-record-at-a-time consumer the reference actually is.) */
  private def replayFinalFixture(spark: SparkSession): Unit = {
    val gen = GenConfig(numKeys = 20000, hotKeys = 32)
    val rows = EventGen.events(spark, 0, 100000, gen)
      .select("lsn", "op", "repo", "path", "commit", "lang", "content")
      .collect()
      .sortBy(_.getLong(0))
    val state = scala.collection.mutable.LinkedHashMap.empty[(String, String), (String, String, String)]
    rows.foreach { r =>
      val key = (r.getString(2), r.getString(3))
      if (r.getString(1) == "d") state.remove(key)
      else state(key) = (r.getString(4), r.getString(5), r.getString(6))
    }
    import spark.implicits._
    state.toSeq.map { case ((repo, path), (commit, lang, content)) =>
      (repo, path, commit, lang, content)
    }.toDF("repo", "path", "commit", "lang", "content")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/cdc_replay_final")
  }

  /** mm_features: per-doc expected (dim, f0) recomputed by a plain local
    * fold over the document bytes — no Spark pipeline, no batching. */
  private def mmFeaturesFixture(spark: SparkSession, sfDir: String): Unit = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
    val out = docs.map { r =>
      val payload = r.getString(1).getBytes("UTF-8")
      var h = 1125899906842597L
      payload.foreach(b => h = h * 31 + b)
      val f0 = ((h ^ 0L) % 2000003L).toFloat / 1000.0f
      (r.getLong(0), graft.operators.Multimodal.FEATURE_DIM, f0)
    }.toSeq
    out.toDF("doc_id", "dim", "f0")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/mm_features")
  }

  def writeAll(spark: SparkSession, sfDir: String): Unit = {
    replayFinalFixture(spark)
    mmFeaturesFixture(spark, sfDir)
  }

  val oracles: Map[String, String] = Map(
    "cdc_replay_final" ->
      s"""SELECT repo, path, commit, lang, content
         |FROM read_parquet('$dir/cdc_replay_final/*.parquet')
         |ORDER BY repo, path""".stripMargin,
    "mm_features" ->
      s"""SELECT doc_id, dim, f0
         |FROM read_parquet('$dir/mm_features/*.parquet')
         |ORDER BY doc_id""".stripMargin
  )
}
