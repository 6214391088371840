package graft.cdc

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Golden-output harness (reference ConnectorOutputTest.java:76-120): the
  * per-event DELIVERED sequence of a replay — recorded as serialized wire
  * epochs — must be reproduced exactly by a later run, including across a
  * scripted restart; tampering with a single record must be detected. */
class GoldenOutputSpec extends SparkTestBase {

  private val gen = GenConfig(numKeys = 500, hotKeys = 8)
  private val payloadCols = Seq("op", "repo", "path", "commit", "lang", "content", "ts_ms")

  /** one run: apply `epochs` LSN chunks through a fresh engine, recording
    * each epoch's delivered (deduped) delta to a wire sink; `restartAfter`
    * swaps in a brand-new engine + table handle mid-run (the scripted
    * restart — committed epochs fence, delivery stays deterministic). */
  private def run(tableRoot: String, sinkRoot: String, epochs: Int,
                  restartAfter: Int = Int.MaxValue): Unit = {
    def mkEngine() = new CdcEngine(spark,
      new SnapshotTable(spark, tableRoot, 4), EngineConfig(numBuckets = 4))
    var engine = mkEngine()
    val sink = engine.wireSink(sinkRoot)
    (0 until epochs).foreach { i =>
      if (i == restartAfter) engine = mkEngine() // crash + restart
      val events = EventGen.events(spark, i * 4000L, (i + 1) * 4000L, gen)
      // the delivered sequence = the per-key max-LSN delta the engine emits
      val delivered = Dedup.lastPerKey(events, Model.keyCols, "lsn")
      sink.writeEpoch(delivered, i.toLong, payloadCols)
      engine.applyEpoch(events, i.toLong)
    }
  }

  test("a replay with a scripted restart reproduces the recorded sequence") {
    val golden = tmpDir("golden")
    run(tmpDir("gt"), golden, epochs = 4)
    val candidate = tmpDir("cand")
    run(tmpDir("ct"), candidate, epochs = 4, restartAfter = 2)
    assert(GoldenOutput.matches(spark, golden, candidate),
      s"diffs: ${GoldenOutput.diffAll(spark, golden, candidate)}")
  }

  test("gzip-compressed recordings compare transparently (codec from extension)") {
    // reference parity: the S3 sink records gzipped jsonl objects — the
    // harness must read .txt.gz parts as records, not bytes, and a gzip
    // recording must compare equal against an uncompressed one of the
    // SAME delivered sequence (codec is storage, not content)
    def runZip(sinkRoot: String, compression: String): Unit = {
      val sink = new graft.formats.WireSink(spark, sinkRoot,
        graft.formats.WireFormat.Json, compression = compression)
      (0 until 2).foreach { i =>
        val delivered = Dedup.lastPerKey(
          EventGen.events(spark, i * 4000L, (i + 1) * 4000L, gen),
          Model.keyCols, "lsn")
        sink.writeEpoch(delivered, i.toLong, payloadCols)
      }
    }
    val gz = tmpDir("golden-gz"); runZip(gz, "gzip")
    val gz2 = tmpDir("cand-gz"); runZip(gz2, "gzip")
    val plain = tmpDir("cand-plain"); runZip(plain, "none")
    // the recording really is gzipped on disk
    val fs = new org.apache.hadoop.fs.Path(gz)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(s"$gz/epoch=0"))
      .map(_.getPath.getName).exists(_.endsWith(".txt.gz")))
    assert(GoldenOutput.matches(spark, gz, gz2))
    assert(GoldenOutput.matches(spark, gz, plain) &&
      GoldenOutput.matches(spark, plain, gz))
  }

  test("a single tampered record, a missing epoch, and an extra epoch are detected") {
    val golden = tmpDir("golden2")
    run(tmpDir("gt2"), golden, epochs = 3)
    val candidate = tmpDir("cand2")
    run(tmpDir("ct2"), candidate, epochs = 3)
    // tamper: rewrite epoch 1 with one record's content flipped (materialize
    // before the overwrite — lazy read + overwrite of the same dir races)
    val rows = spark.read.text(s"$candidate/epoch=1").collect().map(_.getString(0))
    val tampered = rows.head.replace("\"op\":", "\"oops\":") +: rows.tail
    import spark.implicits._
    tampered.toSeq.toDF("value").write.mode("overwrite").text(s"$candidate/epoch=1")
    val d = GoldenOutput.diffAll(spark, golden, candidate)
    assert(d.keySet == Set(1L) && d(1L) == 2L, s"got $d") // 1 golden + 1 candidate orphan
    // missing epoch
    val fs = new org.apache.hadoop.fs.Path(candidate)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$candidate/epoch=2"), true)
    assert(GoldenOutput.diffAll(spark, golden, candidate).get(2L).contains(-1L))
    // extra epoch the recording never saw
    spark.range(1).select(lit("{}").as("value")).write.text(s"$candidate/epoch=9")
    assert(GoldenOutput.diffAll(spark, golden, candidate).get(9L).contains(-2L))
  }
}
