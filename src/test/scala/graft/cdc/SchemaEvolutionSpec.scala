package graft.cdc

import graft.SparkTestBase
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

class SchemaEvolutionSpec extends SparkTestBase {
  import spark.implicits._

  test("widen lattice") {
    assert(SchemaEvolution.widen(IntegerType, LongType) == LongType)
    assert(SchemaEvolution.widen(LongType, IntegerType) == LongType)
    assert(SchemaEvolution.widen(IntegerType, DoubleType) == DoubleType)
    assert(SchemaEvolution.widen(StringType, StringType) == StringType)
    assert(SchemaEvolution.widen(LongType, StringType) == StringType)
    assert(SchemaEvolution.widen(BooleanType, IntegerType) == StringType)
    assert(SchemaEvolution.widen(DecimalType(10, 2), DecimalType(12, 1)) == DecimalType(12, 2))
  }

  test("merge adds columns nullable and widens shared ones") {
    val a = StructType(Seq(
      StructField("k", StringType, false), StructField("n", IntegerType, false)))
    val b = StructType(Seq(
      StructField("k", StringType, false), StructField("n", LongType, false),
      StructField("extra", StringType, true)))
    val m = SchemaEvolution.merge(a, b)
    assert(m.fieldNames.toSeq == Seq("k", "n", "extra"))
    assert(m("n").dataType == LongType)
    assert(m("extra").nullable)
  }

  test("alignTo casts and null-fills") {
    val df = Seq((1, "x")).toDF("n", "k")
    val target = StructType(Seq(
      StructField("k", StringType, false), StructField("n", LongType, true),
      StructField("extra", StringType, true)))
    val out = SchemaEvolution.alignTo(df, target)
    assert(out.schema.fieldNames.toSeq == Seq("k", "n", "extra"))
    assert(out.schema("n").dataType == LongType)
    val r = out.head()
    assert(r.getString(0) == "x" && r.getLong(1) == 1L && r.isNullAt(2))
  }

  test("merge is idempotent and commutative on the lattice") {
    val a = StructType(Seq(StructField("x", IntegerType, false)))
    val b = StructType(Seq(StructField("x", DoubleType, false)))
    assert(SchemaEvolution.merge(a, a) == StructType(Seq(StructField("x", IntegerType, false))))
    assert(SchemaEvolution.merge(a, b)("x").dataType == DoubleType)
    assert(SchemaEvolution.merge(b, a)("x").dataType == DoubleType)
  }
}
