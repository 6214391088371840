package graft.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/**
 * Lifecycle events + liveness gauge for streaming pipelines — the Spark
 * equivalent of the reference's ConnectorLifecycle/health surface
 * (cdcsdk-server-core/.../ConnectorLifecycle.java:66-117: connector/task
 * start/stop CDI events; liveness UP iff all engines live) and its
 * completion capture (MTEngine CompletionResult).
 *
 * `expected` plays the role of `cdcsdk.server.threads`: health is UP iff
 * every expected query is live (started and not terminated). Terminations
 * with an exception are captured as the completion result.
 */
class HealthListener(expected: Int = 1) extends StreamingQueryListener {
  import StreamingQueryListener._

  private val live = ConcurrentHashMap.newKeySet[java.util.UUID]()
  private val rowsProcessed = new AtomicLong(0L)
  @volatile private var failure: Option[String] = None
  @volatile private var starts = 0L
  @volatile private var stops = 0L

  override def onQueryStarted(e: QueryStartedEvent): Unit = {
    live.add(e.id); starts += 1
  }

  override def onQueryProgress(e: QueryProgressEvent): Unit =
    rowsProcessed.addAndGet(e.progress.numInputRows)

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = {
    live.remove(e.id); stops += 1
    e.exception.foreach(msg => failure = Some(msg))
  }

  /** Liveness gauge: UP(0) iff all expected engines live — the reference's
    * `cdcsdk_server_health` 0/1 semantics. */
  def healthy: Boolean = failure.isEmpty && live.size() >= expected

  def liveQueries: Int = live.size()
  def totalRowsProcessed: Long = rowsProcessed.get()
  def completionFailure: Option[String] = failure
  def lifecycleCounts: (Long, Long) = (starts, stops)
}

object HealthListener {
  /** Attach a listener to the session; caller keeps the handle for gauges. */
  def attach(spark: SparkSession, expected: Int = 1): HealthListener = {
    val l = new HealthListener(expected)
    spark.streams.addListener(l)
    l
  }
}
