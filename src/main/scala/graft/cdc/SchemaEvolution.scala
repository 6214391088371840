package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Catalyst-level schema evolution (north rule N4): column add + type widen.
 *
 * The reference carries a schema with every record and the sink must accept
 * whatever arrives (schemas ride in keySchema/valueSchema, `schemas.enable`
 * at reference cdcsdk-engine/.../MTEngine.java:654-660) — its implicit
 * evolution contract. Here it is explicit: before each micro-batch write the
 * incoming batch schema is merged with the table schema (add missing columns
 * as nullable, widen numerics along a fixed lattice, fall back to string),
 * and both sides are cast to the merged schema.
 */
object SchemaEvolution {

  /** Widening lattice: Byte < Short < Int < Long < Float < Double; anything
    * irreconcilable widens to String. */
  private val numericRank: Map[DataType, Int] = Map(
    ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3,
    FloatType -> 4, DoubleType -> 5)

  def widen(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (x: DecimalType, y: DecimalType) =>
      DecimalType(math.max(x.precision, y.precision), math.max(x.scale, y.scale))
    case (x, y) if numericRank.contains(x) && numericRank.contains(y) =>
      if (numericRank(x) >= numericRank(y)) x else y
    case (x: StructType, y: StructType) => merge(x, y)
    case (ArrayType(x, n1), ArrayType(y, n2)) => ArrayType(widen(x, y), n1 || n2)
    case (MapType(k1, v1, n1), MapType(k2, v2, n2)) if k1 == k2 =>
      MapType(k1, widen(v1, v2), n1 || n2)
    case _ => StringType
  }

  /** Merge two schemas: union of fields by name; shared fields widen; all
    * result fields nullable (an added column is absent from old rows). */
  def merge(current: StructType, incoming: StructType): StructType = {
    val byName = incoming.fields.map(f => f.name -> f).toMap
    val merged = current.fields.map { f =>
      byName.get(f.name) match {
        case Some(g) => StructField(f.name, widen(f.dataType, g.dataType), f.nullable || g.nullable)
        case None    => f.copy(nullable = true)
      }
    }
    val added = incoming.fields.filterNot(f => current.fieldNames.contains(f.name))
      .map(_.copy(nullable = true))
    StructType(merged ++ added)
  }

  /** Project `df` onto `target`: existing columns cast to the target type,
    * missing columns filled with typed nulls. Column order = target order. */
  def alignTo(df: DataFrame, target: StructType): DataFrame = {
    val present = df.columns.toSet
    val cols = target.fields.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
