package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DotQSpec extends SparkTestBase {
  import spark.implicits._

  test("dot_q equals the higher-order-function formulation") {
    DotQ.register(spark)
    val df = spark.range(0, 2000).toDF("id")
      .withColumn("a", transform(sequence(lit(0), lit(63)),
        i => pmod(xxhash64(col("id") * 64 + i), lit(2001)) - 1000))
      .withColumn("b", transform(sequence(lit(0), lit(63)),
        i => pmod(xxhash64(col("id") * 64 + i, lit(7)), lit(2001)) - 1000))
    val cmp = df
      .withColumn("native", call_function("dot_q", col("a"), col("b")))
      .withColumn("hof", aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x))
    assert(cmp.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("dot_q null semantics and SQL registration") {
    DotQ.register(spark)
    val r = spark.sql(
      "SELECT dot_q(array(1L,2L,3L), array(4L,5L,6L)) AS d, " +
      "dot_q(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS n").head()
    assert(r.getLong(0) == 32L && r.isNullAt(1))
  }

  test("dot_q participates in whole-stage codegen and folds constants") {
    DotQ.register(spark)
    // literal input must constant-fold away entirely
    val folded = spark.range(0, 10).toDF("id")
      .withColumn("d", call_function("dot_q", array(lit(1L), lit(2L)), array(lit(1L), lit(2L))))
    assert(folded.queryExecution.optimizedPlan.toString.contains("5 AS d"),
      "literal dot_q should constant-fold")
    // data-dependent input must run inside a WholeStageCodegen stage
    val df = spark.range(0, 10).toDF("id")
      .withColumn("a", array(col("id"), col("id") + 1))
      .withColumn("d", call_function("dot_q", col("a"), col("a")))
    val hasWsc = df.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(hasWsc, s"expected WholeStageCodegenExec in:\n${df.queryExecution.executedPlan}")
    // sum of id^2 + (id+1)^2 for id in 0..9 = 285 + 385 = 670
    assert(df.agg(sum("d")).head.getLong(0) == 670L)
  }
}
