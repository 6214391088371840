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
    val epochsBefore = table.loadManifest().get.epochWatermark
    val q2 = StreamingCdc.start(spark, engine, eventsDir, ckpt, maxFilesPerTrigger = 2)
    try q2.processAllAvailable() finally q2.stop()
    val want2 = digests(EventGen.finalState(spark, 0, 24000, gen))
    val got2 = digests(table.read())
    assert(got2.exceptAll(want2).isEmpty && want2.exceptAll(got2).isEmpty)
    assert(table.loadManifest().get.epochWatermark > epochsBefore)
  }

  test("crash between micro-batches under a deferred commit policy loses nothing") {
    // Spark's checkpoint marks a batch committed once foreachBatch returns
    // and never re-delivers it; if the manifest flush were deferred by the
    // policy, a crash would lose the staged epoch FOREVER (zero-once). The
    // streaming front-end therefore flushes before returning — this test
    // kills the pipeline between micro-batches and proves convergence.
    val eventsDir = tmpDir("ev")
    val ckpt = tmpDir("ckpt")
    val root = tmpDir("snap")
    val deferred = EngineConfig(numBuckets = 4,
      commitPolicy = CommitPolicy.periodic(3600 * 1000L)) // would never fire
    val t1 = new SnapshotTable(spark, root, 4)
    val e1 = new CdcEngine(spark, t1, deferred)
    writeChunk(eventsDir, 0, 8000)
    val q1 = StreamingCdc.start(spark, e1, eventsDir, ckpt, maxFilesPerTrigger = 2)
    try q1.processAllAvailable() finally q1.stop()
    // "crash": discard engine + table instances (staged state would die here)
    val t2 = new SnapshotTable(spark, root, 4)
    assert(t2.loadManifest().nonEmpty,
      "epoch applied before the crash must already be durable")
    writeChunk(eventsDir, 8000, 16000)
    val e2 = new CdcEngine(spark, t2, deferred)
    val q2 = StreamingCdc.start(spark, e2, eventsDir, ckpt, maxFilesPerTrigger = 2)
    try q2.processAllAvailable() finally q2.stop()
    val want = digests(EventGen.finalState(spark, 0, 16000, gen))
    val got = digests(new SnapshotTable(spark, root, 4).read())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("health listener tracks lifecycle + liveness (reference ConnectorLifecycle)") {
    val eventsDir = tmpDir("ev")
    val table = new SnapshotTable(spark, tmpDir("snap"), numBuckets = 4)
    val engine = new CdcEngine(spark, table)
    val health = HealthListener.attach(spark, expected = 1)
    try {
      writeChunk(eventsDir, 0, 4000)
      val q = StreamingCdc.start(spark, engine, eventsDir, tmpDir("ckpt"), 2)
      try {
        q.processAllAvailable()
        assert(health.healthy, "all expected engines live => UP")
      } finally q.stop()
      // listener events are delivered async; poll for the termination event
      val deadline = System.currentTimeMillis() + 10000
      while (health.healthy && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(!health.healthy, "engine stopped => DOWN")
      assert(health.lifecycleCounts == ((1L, 1L)))
      assert(health.totalRowsProcessed >= 4000L)
      assert(health.completionFailure.isEmpty)
    } finally spark.streams.removeListener(health)
  }

  test("wire-encoded envelope stream: tail -> decode -> exactly-once MERGE") {
    val wireDir = tmpDir("wire")
    val table = new SnapshotTable(spark, tmpDir("snap"), numBuckets = 4)
    val engine = new CdcEngine(spark, table)
    def writeWire(lo: Long, hi: Long): Unit =
      Envelope.wrapJson(EventGen.events(spark, lo, hi, gen))
        .coalesce(2).write.mode("append").parquet(wireDir)
    writeWire(0, 8000)
    writeWire(8000, 16000)
    val q = StreamingCdc.startDecoded(spark, engine, wireDir, tmpDir("ckpt"),
      maxFilesPerTrigger = 2)
    try q.processAllAvailable() finally q.stop()
    val want = digests(EventGen.finalState(spark, 0, 16000, gen))
    val got = digests(table.read())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("corrupt wire records go to the dead-letter dir; the stream survives") {
    import spark.implicits._
    val wireDir = tmpDir("wirebad")
    val root = tmpDir("snap")
    val table = new SnapshotTable(spark, root, numBuckets = 4)
    val engine = new CdcEngine(spark, table)
    // good records + three corrupt ones: truncated JSON, missing source.lsn,
    // missing op
    Envelope.wrapJson(EventGen.events(spark, 0, 4000, gen))
      .union(Seq(
        ("""{"repo":"rX","path":"pX"}""", """{"after":{"commit":{"valu"""),
        ("""{"repo":"rY","path":"pY"}""", """{"after":null,"source":{"txId":1},"op":"u","ts_ms":1}"""),
        ("""{"repo":"rZ","path":"pZ"}""", """{"after":null,"source":{"lsn":9,"txId":1},"ts_ms":1}"""))
        .toDF("key", "value"))
      .coalesce(2).write.mode("append").parquet(wireDir)
    val q = StreamingCdc.startDecoded(spark, engine, wireDir, tmpDir("ckpt"), maxFilesPerTrigger = 4)
    try q.processAllAvailable() finally q.stop()
    // good records applied to oracle equality, corrupt ones quarantined
    val want = digests(EventGen.finalState(spark, 0, 4000, gen))
    val got = digests(table.read())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    val dead = spark.read.parquet(s"$root/deadletter")
    assert(dead.count() == 3, s"expected 3 dead letters, got ${dead.count()}")
    assert(dead.columns.toSet == Set("key", "value", "epoch"), "dead letters keep the original wire record + epoch")
  }

  test("checkpoint wipe does not duplicate dead letters (DLQ fencing)") {
    import spark.implicits._
    val wireDir = tmpDir("wiredlq")
    val root = tmpDir("snap")
    val table = new SnapshotTable(spark, root, numBuckets = 4)
    val engine = new CdcEngine(spark, table)
    Envelope.wrapJson(EventGen.events(spark, 0, 2000, gen))
      .union(Seq(
        ("""{"repo":"rX","path":"pX"}""", """{"after":{"commit":{"valu"""),
        ("""{"repo":"rY","path":"pY"}""", """{"after":null,"source":{"txId":1},"op":"u","ts_ms":1}"""))
        .toDF("key", "value"))
      .coalesce(2).write.mode("append").parquet(wireDir)
    val q = StreamingCdc.startDecoded(spark, engine, wireDir, tmpDir("ckpt1"), maxFilesPerTrigger = 4)
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(s"$root/deadletter").count() == 2)

    // checkpoint wipe: every batch re-delivers with the same epoch ids; the
    // DLQ write runs BEFORE the table's epoch fencing, so it must overwrite
    // its epoch dir, not append — or the same corrupt records pile up
    val q2 = StreamingCdc.startDecoded(spark, engine, wireDir, tmpDir("ckpt2"), maxFilesPerTrigger = 4)
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(s"$root/deadletter").count() == 2,
      "re-delivered batches must not duplicate dead letters")
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
