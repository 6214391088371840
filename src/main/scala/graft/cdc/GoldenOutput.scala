package graft.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Golden-output record/compare harness — the reference's
 * `ConnectorOutputTest` (cdcsdk-engine/src/test/java/io/debezium/embedded/
 * ConnectorOutputTest.java:76-120): record a run's DELIVERED change events
 * as JSON and replay later runs (including scripted restarts) against the
 * recording, comparing the per-event delivered sequence epoch by epoch —
 * a strictly stronger check than final-table-state equality, because it
 * catches dedup/ordering/serialization drift that cancels out in the
 * final MERGE.
 *
 * Spark shape: a "recording" is a WireSink root (one serialized epoch dir
 * per micro-batch); the comparison is a multiset diff of wire records per
 * epoch, so file count/order (task parallelism) never matters.
 */
object GoldenOutput {

  /** epoch ids present under a recording root (epoch=N dirs). */
  def epochs(spark: SparkSession, root: String): Seq[Long] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith("epoch=") => s.stripPrefix("epoch=").toLong }
      .sorted
  }

  /** Detect the epoch's on-disk layout: text parts (json/cloudevents
    * WireSink epochs, possibly gzipped) vs parquet parts (avro/proto binary
    * wire and KV epochs) — reading a parquet recording as raw text would
    * produce meaningless byte diffs instead of a comparison. */
  private def readEpoch(spark: SparkSession, root: String, epochId: Long): DataFrame = {
    val dir = new Path(f"$root/epoch=$epochId")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(dir).map(_.getPath.getName).filter(_.startsWith("part-"))
    if (parts.exists(_.contains(".parquet"))) spark.read.parquet(dir.toString)
    else spark.read.text(dir.toString).select(col("value").as("wire"))
  }

  /** multiset difference (both directions) of one epoch's delivered records. */
  def diffEpoch(spark: SparkSession, goldenRoot: String, candidateRoot: String,
                epochId: Long): Long = {
    val g = readEpoch(spark, goldenRoot, epochId)
    val c = readEpoch(spark, candidateRoot, epochId)
    if (g.schema != c.schema)
      throw new IllegalStateException(
        s"epoch $epochId: recording layouts differ (golden ${g.schema.simpleString} " +
          s"vs candidate ${c.schema.simpleString}) — runs used different wire formats")
    g.exceptAll(c).count() + c.exceptAll(g).count()
  }

  /** Compare a full run against the recording: every golden epoch must be
    * present and record-identical; extra candidate epochs are also a
    * mismatch (events delivered that the recording never saw). Returns the
    * per-epoch diff counts for every epoch with a discrepancy. */
  def diffAll(spark: SparkSession, goldenRoot: String, candidateRoot: String): Map[Long, Long] = {
    val ge = epochs(spark, goldenRoot)
    val ce = epochs(spark, candidateRoot)
    val missing = (ge.toSet -- ce.toSet).map(_ -> -1L) // -1 = epoch absent
    val extra = (ce.toSet -- ge.toSet).map(_ -> -2L)   // -2 = unexpected epoch
    val diffs = ge.filter(ce.contains).map(e => e -> diffEpoch(spark, goldenRoot, candidateRoot, e))
      .filter(_._2 != 0L)
    (missing ++ extra ++ diffs).toMap
  }

  /** True iff the candidate run delivered exactly the recorded sequence. */
  def matches(spark: SparkSession, goldenRoot: String, candidateRoot: String): Boolean =
    diffAll(spark, goldenRoot, candidateRoot).isEmpty
}
