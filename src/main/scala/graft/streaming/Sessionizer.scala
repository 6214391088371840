package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Stateful gap-based sessionizer over the change stream — the
 * `flatMapGroupsWithState` custom-state pattern (per-key state that lives
 * across micro-batches). A session closes when a later event for the same
 * key arrives more than `gapSec` after the previous one; the closed session
 * is emitted and the new one becomes the state.
 *
 * The batch formulation of the same semantics is the `cdc_sessionize` query
 * (lag/sum window); SessionizerSpec asserts the two agree on closed
 * sessions. The core CDC engine deliberately does NOT use stream state
 * (SURVEY.md §7.3 — per-epoch dedup + the keyed table IS the state); this
 * operator exists for pipelines that need in-flight session aggregates.
 */
object Sessionizer {

  case class Event(key: String, tsSec: Long, lsn: Long)
  case class SessionState(start: Long, last: Long, n: Long, firstLsn: Long, lastLsn: Long)
  case class ClosedSession(key: String, startSec: Long, endSec: Long, n: Long,
                           firstLsn: Long, lastLsn: Long)

  def sessionize(events: Dataset[Event], gapSec: Long)
                (implicit spark: SparkSession): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[Event], state: GroupState[SessionState]) =>
          // order within the batch: event time then LSN (total order).
          // NOTE this buffers ONE KEY's events for ONE micro-batch — bounded
          // by batch sizing (maxFilesPerTrigger), not by total key volume;
          // for hot keys beyond that bound use sessionizeSorted, which
          // spills through Spark's external sort instead of buffering.
          val evs = it.toSeq.sortBy(e => (e.tsSec, e.lsn))
          val closed = Seq.newBuilder[ClosedSession]
          var cur = state.getOption
          evs.foreach { e =>
            cur match {
              case Some(s) if e.tsSec - s.last > gapSec =>
                closed += ClosedSession(key, s.start, s.last, s.n, s.firstLsn, s.lastLsn)
                cur = Some(SessionState(e.tsSec, e.tsSec, 1, e.lsn, e.lsn))
              case Some(s) =>
                cur = Some(s.copy(last = e.tsSec, n = s.n + 1, lastLsn = e.lsn))
              case None =>
                cur = Some(SessionState(e.tsSec, e.tsSec, 1, e.lsn, e.lsn))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }

  /**
   * Sort-based batch formulation (secondary-sort pattern): repartition by
   * key, sort within partitions by (key, ts, lsn) — Spark's EXTERNAL sort,
   * so a hot key spills to disk instead of buffering on one executor — then
   * a single lazy pass holding exactly ONE open session at a time.
   * Emits only closed sessions (the trailing open session per key is state,
   * matching [[sessionize]]'s append-mode output).
   */
  def sessionizeSorted(events: Dataset[Event], gapSec: Long)
                      (implicit spark: SparkSession): Dataset[ClosedSession] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    events
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("tsSec"), col("lsn"))
      .mapPartitions { it =>
        var cur: Option[(String, SessionState)] = None
        it.flatMap { e =>
          cur match {
            case Some((k, s)) if k == e.key && e.tsSec - s.last <= gapSec =>
              cur = Some(k -> s.copy(last = e.tsSec, n = s.n + 1, lastLsn = e.lsn))
              Iterator.empty
            case Some((k, s)) =>
              val out =
                if (k == e.key) // same key, gap exceeded => close
                  Iterator.single(ClosedSession(k, s.start, s.last, s.n, s.firstLsn, s.lastLsn))
                else Iterator.empty // key change: previous key's last session stays open
              cur = Some(e.key -> SessionState(e.tsSec, e.tsSec, 1, e.lsn, e.lsn))
              out
            case None =>
              cur = Some(e.key -> SessionState(e.tsSec, e.tsSec, 1, e.lsn, e.lsn))
              Iterator.empty
          }
        }
      }
  }
}
