package graft.formats

import graft.SparkTestBase
import graft.cdc.{EventGen, GenConfig}
import org.apache.spark.sql.functions._

object AckSinkSpec {
  // flaky downstream: records with lsn % 7 == 3 fail on their FIRST attempt
  // (local mode: executors share the JVM, so the set is visible)
  val failedOnce = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
  val attempts = new java.util.concurrent.atomic.AtomicLong(0L)
  def flakySend(id: Long, body: String): Boolean = {
    attempts.incrementAndGet()
    require(body.nonEmpty)
    if (id % 7 == 3 && failedOnce.add(id)) false else true
  }
}

/** K3 HTTP-sink semantics: per-record ack, failures leave holes that only a
  * re-delivery fills; acked records are never re-sent. */
class AckSinkSpec extends SparkTestBase {

  test("failed records stay as holes; retry delivers only the holes") {
    AckSinkSpec.failedOnce.clear(); AckSinkSpec.attempts.set(0L)
    val sink = new AckSink(spark, tmpDir("acksink"))(AckSinkSpec.flakySend)
    val wire = WireFormat.encode(
        EventGen.events(spark, 0, 2000, GenConfig(numKeys = 100)),
        WireFormat.Json, Seq("op", "repo", "path", "content"), 0, keep = Seq("lsn"))
      .withColumnRenamed("lsn", "recordId")

    val (d1, h1) = sink.deliverEpoch(wire, 0L)
    val expectedHoles = (0L until 2000L).count(_ % 7 == 3)
    assert(h1 == expectedHoles && d1 == 2000 - expectedHoles, s"got $d1/$h1")
    assert(AckSinkSpec.attempts.get == 2000)

    // retry: ONLY the holes are attempted (acked records never re-sent)
    val (d2, h2) = sink.deliverEpoch(wire, 0L)
    assert(d2 == expectedHoles && h2 == 0, s"got $d2/$h2")
    assert(AckSinkSpec.attempts.get == 2000 + expectedHoles,
      s"retry must not re-send acked records (attempts=${AckSinkSpec.attempts.get})")

    // fully acked epoch: a further re-delivery attempts nothing
    val (d3, h3) = sink.deliverEpoch(wire, 0L)
    assert(d3 == 0 && h3 == 0 && AckSinkSpec.attempts.get == 2000 + expectedHoles)
  }
}
