package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multi-destination routing: every change event carries a destination
 * (reference: `record.destination()` mapped by StreamNameMapper,
 * io/debezium/server/StreamNameMapper.java:14-16, rewritten per record by
 * RegexRouter, EmbeddedEngineTest.java:437-441), and the engine fans records
 * out to one keyed snapshot table PER destination — each with its own
 * manifest, so fencing/resume/schema evolution are per-table, exactly like
 * the reference's per-topic consumers.
 *
 * Scale shape: the routed batch is cached once; each destination applies a
 * `filter(destination = d)` over the cached batch (destinations are few —
 * tables/topics — while rows are billions), then the usual dedup + MERGE.
 * No per-destination re-read of the source, no extra shuffle beyond each
 * table's own merge.
 */
class RoutingEngine(spark: SparkSession, root: String, destinations: Seq[String],
                    conf: EngineConfig = EngineConfig(), mode: String = "cow") {
  require(destinations.nonEmpty)

  /** One engine (and table) per destination: <root>/<destination>. */
  val engines: Map[String, CdcEngine] = destinations.map { d =>
    d -> new CdcEngine(spark,
      new SnapshotTable(spark, s"$root/$d", conf.numBuckets, mode = mode), conf)
  }.toMap

  def table(destination: String): SnapshotTable = engines(destination).table

  /**
   * Apply one epoch of raw events, routed by the `route` expression (e.g. a
   * RegexRouter `regexp_replace`). Rows routing to an unlisted destination
   * are dropped (reference filter-SMT semantics: null destination = drop).
   * Returns rows applied per destination (-1 = fenced).
   */
  def applyEpoch(events: DataFrame, epochId: Long, route: Column): Map[String, Long] = {
    val routed = events.withColumn("_destination", route)
    routed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      destinations.map { d =>
        val slice = routed.filter(col("_destination") === d).drop("_destination")
        d -> engines(d).applyEpoch(slice, epochId)
      }.toMap
    } finally routed.unpersist()
  }

  /** Graceful-stop flush across all destinations. */
  def flush(): Unit = engines.values.foreach(_.flush())
}
