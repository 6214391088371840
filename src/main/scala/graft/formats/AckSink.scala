package graft.formats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Per-record ack-with-holes delivery — the reference's HTTP webhook sink
 * semantics (cdcsdk-server-http/.../HttpChangeConsumer.java:95-124: POST each
 * record, only a 2xx acks it via markProcessed, a failed record is NOT acked
 * but the loop continues — at-least-once with holes until a retry
 * re-delivers them).
 *
 * Spark shape: the per-epoch ack ledger is a parquet append of acked record
 * ids; a (re-)delivery anti-joins the epoch's records against its ledger so
 * only the holes are attempted again. Sends run on the executors
 * (mapPartitions over the wire records); acked ids flow back as a DataFrame
 * and append to the ledger, so the ledger write is the batch's single
 * durable decision. Records are identified by the caller-supplied id column
 * (the LSN, in the engine's case).
 */
class AckSink(spark: SparkSession, root: String)(send: (Long, String) => Boolean)
  extends Serializable {

  private def ackDir(epochId: Long) = s"$root/acks/epoch=$epochId"

  /** Acked record ids for an epoch (empty frame if none yet). Explicit
    * schema: a crash mid-append can leave the dir with only _temporary —
    * schema inference would throw forever and brick the retry path; an
    * explicit schema reads it as empty and the retry proceeds. */
  def acked(epochId: Long): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(ackDir(epochId))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema("recordId LONG").parquet(p.toString)
    else spark.range(0).select(col("id").as("recordId"))
  }

  private def attemptDir(epochId: Long) = s"$root/attempts/epoch=$epochId"

  /**
   * Deliver one epoch of wire records `(recordId: long, wire: string)`:
   * attempts every not-yet-acked record once, appends the new acks, returns
   * (deliveredThisCall, holesRemaining). Call again to retry the holes;
   * acked records are never re-sent (the reference's restart semantics).
   *
   * The side-effecting send() runs under exactly ONE Spark action — the
   * attempt-outcome parquet write. Counts and the ack ledger both derive
   * from that durable output, so they can never disagree with each other or
   * with what was actually sent (persist+multiple-actions could recompute
   * the partition on cache eviction, re-sending records and counting
   * different ok bits than the ledger recorded).
   */
  def deliverEpoch(wire: DataFrame, epochId: Long): (Long, Long) = {
    val f = send // avoid closing over the sink (hadoop conf isn't serializable)
    val pending = wire.select(col("recordId").cast("long").as("recordId"), col("wire"))
      .join(acked(epochId), Seq("recordId"), "left_anti")
    import spark.implicits._
    // single action with side effects; overwrite = a stale prior attempt's
    // outcomes are garbage (its acks are already in the ledger)
    pending.as[(Long, String)]
      .mapPartitions(_.map { case (id, body) => (id, f(id, body)) })
      .toDF("recordId", "ok")
      .write.mode("overwrite").parquet(attemptDir(epochId))
    val outcome = spark.read.schema("recordId LONG, ok BOOLEAN")
      .parquet(attemptDir(epochId))
    val delivered = outcome.filter(col("ok")).count()
    val holes = outcome.filter(!col("ok")).count()
    if (delivered > 0)
      outcome.filter(col("ok")).select("recordId")
        .write.mode("append").parquet(ackDir(epochId))
    (delivered, holes)
  }
}
