package graft.cdc

/**
 * Offset-flush cadence policies, mirroring the reference's
 * `OffsetCommitPolicy` combinator family (cdcsdk-engine/src/main/java/com/
 * yugabyte/cdcsdk/engine/spi/OffsetCommitPolicy.java:30-93): ALWAYS commits
 * after every batch, PERIODIC after `intervalMs` elapsed, and policies
 * compose with `or` / `and`.
 *
 * In the Spark engine a "commit" is the manifest rename (the offset flush);
 * epochs applied between commits are still written as data but only become
 * visible/fenced at the next commit. A crash before the commit replays those
 * epochs deterministically (same contract as the reference's at-least-once
 * offset window, upgraded to exactly-once by the deterministic re-run
 * overwriting the same snapshot dirs).
 */
trait CommitPolicy {
  /** @param epochsSinceCommit epochs applied since the last manifest commit
    * @param msSinceCommit     wall millis since the last manifest commit */
  def performCommit(epochsSinceCommit: Long, msSinceCommit: Long): Boolean

  def or(other: CommitPolicy): CommitPolicy =
    (e, t) => this.performCommit(e, t) || other.performCommit(e, t)

  def and(other: CommitPolicy): CommitPolicy =
    (e, t) => this.performCommit(e, t) && other.performCommit(e, t)
}

object CommitPolicy {
  /** commit after every epoch (reference default in perf runs:
    * OFFSET_FLUSH_INTERVAL_MS=0). */
  val Always: CommitPolicy = (_, _) => true

  /** commit once `intervalMs` has elapsed since the last commit
    * (reference default: 60 s). */
  def periodic(intervalMs: Long): CommitPolicy = (_, t) => t >= intervalMs

  /** commit once at least `n` epochs have been applied. */
  def everyNEpochs(n: Long): CommitPolicy = (e, _) => e >= n
}
