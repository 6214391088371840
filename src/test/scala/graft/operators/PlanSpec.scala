package graft.operators

import graft.SparkTestBase
import graft.SparkEntry

/** Physical-plan shape guards: these are the properties that decide whether
  * a query survives a 100x scale-up — filter pushdown into the parquet scan,
  * column pruning, broadcast for small dims, map-side partial aggregation.
  * A regression here can stay invisible at sf0.01 and melt a cluster. */
class PlanSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("route filter is pushed down to the parquet scan") {
    val p = plan("cdc_route_filter")
    assert(p.contains("PushedFilters") &&
      (p.contains("Not(EqualTo(event_type,error))") || p.contains("event_type")),
      s"filter not pushed:\n$p")
  }

  test("q3 join broadcasts the filtered customer dim") {
    val p = plan("q3_topk_revenue")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("region rollup broadcasts both dims, no shuffle of fact side") {
    val p = plan("q_region_rollup")
    assert(p.split("BroadcastHashJoin").length >= 3, s"expected 2 broadcast joins:\n$p")
  }

  test("max_by dedup runs as partial + final aggregation (map-side combine)") {
    val p = plan("cdc_dedup_last_maxby")
    assert(p.split("HashAggregate").length >= 3 || p.split("SortAggregate").length >= 3
      || p.split("ObjectHashAggregate").length >= 3,
      s"expected two-phase aggregation:\n$p")
    assert(p.contains("partial_max"), s"expected partial aggregate functions:\n$p")
  }

  test("scan reads only needed columns (column pruning)") {
    val p = plan("cdc_offset_max")
    // lineitem of the events table: only event_type + event_id needed
    assert(p.contains("ReadSchema"), s"no ReadSchema in:\n$p")
    assert(!p.contains("props"), s"props should be pruned from scan:\n$p")
    assert(!p.contains("user_id"), s"user_id should be pruned from scan:\n$p")
  }

  test("knn brute force broadcasts the probe set") {
    val p = plan("emb_knn_brute")
    assert(p.contains("Broadcast"), s"expected broadcast of probes:\n$p")
  }
}
