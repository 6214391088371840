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

  test("envelope decode is pure expressions, no UDFs, no shuffle before the sort") {
    val p = plan("cdc_envelope_decode")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), s"UDF in plan:\n$p")
    assert(p.split("Exchange").length <= 2, // only the final orderBy's range exchange
      s"envelope decode must not shuffle:\n$p")
  }

  test("before-image envelope round trip is expression-only with bounded shuffles") {
    val p = plan("cdc_envelope_before")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), s"UDF in plan:\n$p")
    // one hash exchange for the per-key lag window + the final sort's range
    // exchange — wrap/decode themselves must not shuffle
    assert(p.split("Exchange").length <= 3, s"unexpected extra shuffle:\n$p")
  }

  test("nested-envelope avro/proto round trips shuffle only for lag window + sort") {
    // serialization is per-partition mapPartitions work; the only exchanges
    // allowed are the per-key lag window's hash exchange and the final
    // orderBy's range exchange — an extra shuffle here would dominate the
    // wire path at 10^10 events
    Seq("cdc_envelope_avro", "cdc_envelope_proto").foreach { q =>
      val p = plan(q)
      assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), s"UDF in $q:\n$p")
      assert(p.split("Exchange").length <= 3, s"$q has an unexpected extra shuffle:\n$p")
    }
  }

  test("LSH projections are codegen'd dot_q, not interpreted aggregate(zip_with) pairs") {
    val p = plan("emb_lsh_ann")
    assert(p.contains("dot_q"), s"expected dot_q projections:\n$p")
    assert(!p.contains("zip_with"), s"interpreted HOF pair in hot path:\n$p")
    val pn = plan("emb_near_dup")
    assert(pn.contains("dot_q") && !pn.contains("zip_with"), s"emb_near_dup hot path:\n$pn")
  }

  test("minhash pipeline shuffles at most 3 times (doc agg, buckets, pair distinct)") {
    val p = plan("doc_minhash_lsh")
    // window(by doc) + groupBy(doc) share one exchange; +1 bucket groupBy,
    // +1 pair distinct, +1 final sort
    val exchanges = p.split("Exchange hashpartitioning").length - 1
    assert(exchanges <= 3, s"expected <=3 hash exchanges, got $exchanges:\n$p")
  }
}
