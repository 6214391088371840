package graft.cdc

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Structured Streaming front-end: file-tail source -> foreachBatch ->
  * exactly-once MERGE, resumable from the Spark checkpoint. */
class StreamingCdcSpec extends SparkTestBase {

  private val gen = GenConfig(numKeys = 1000, hotKeys = 8)

  private def writeChunk(dir: String, lo: Long, hi: Long): Unit =
    EventGen.events(spark, lo, hi, gen)
      .coalesce(2).write.mode("append").parquet(dir)

  private def digests(df: org.apache.spark.sql.DataFrame) =
    df.select(col("repo"), col("path"),
      sha2(coalesce(col("content"), lit("")), 256).as("sha"))

  test("stream drains chunks into the table; final state == oracle") {
    val eventsDir = tmpDir("ev")
    val ckpt = tmpDir("ckpt")
    val table = new SnapshotTable(spark, tmpDir("snap"), numBuckets = 4)
    val engine = new CdcEngine(spark, table)

    writeChunk(eventsDir, 0, 8000)
    writeChunk(eventsDir, 8000, 16000)
    val q = StreamingCdc.start(spark, engine, eventsDir, ckpt, maxFilesPerTrigger = 2)
    try q.processAllAvailable() finally q.stop()

    val want = digests(EventGen.finalState(spark, 0, 16000, gen))
    val got = digests(table.read())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)

    // restart with the SAME checkpoint after new data arrives: only the new
    // chunk is processed, nothing is double-applied
    writeChunk(eventsDir, 16000, 24000)
    val epochsBefore = table.loadManifest().get.epochs.size
    val q2 = StreamingCdc.start(spark, engine, eventsDir, ckpt, maxFilesPerTrigger = 2)
    try q2.processAllAvailable() finally q2.stop()
    val want2 = digests(EventGen.finalState(spark, 0, 24000, gen))
    val got2 = digests(table.read())
    assert(got2.exceptAll(want2).isEmpty && want2.exceptAll(got2).isEmpty)
    assert(table.loadManifest().get.epochs.size > epochsBefore)
  }

  test("checkpoint wipe (re-delivery of all batches) is fenced to a no-op") {
    val eventsDir = tmpDir("ev")
    val table = new SnapshotTable(spark, tmpDir("snap"), numBuckets = 4)
    val engine = new CdcEngine(spark, table)
    writeChunk(eventsDir, 0, 10000)
    val q = StreamingCdc.start(spark, engine, eventsDir, tmpDir("ckpt1"), 2)
    try q.processAllAvailable() finally q.stop()
    val v1 = table.loadManifest().get.version

    // new checkpoint => Spark re-delivers every file with the same epoch ids
    val q2 = StreamingCdc.start(spark, engine, eventsDir, tmpDir("ckpt2"), 2)
    try q2.processAllAvailable() finally q2.stop()
    assert(table.loadManifest().get.version == v1, "re-delivered epochs must fence")
    val want = digests(EventGen.finalState(spark, 0, 10000, gen))
    val got = digests(table.read())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
