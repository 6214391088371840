package graft.formats

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/**
 * Protobuf wire format for the flattened payload — the reference's third
 * converter family (ServerApp.java:152-161 / ConvertingEngineBuilder.java:198-234
 * select a protobuf converter class). No protobuf runtime jar exists in this
 * environment, so the (public, documented) proto3 wire encoding is
 * implemented directly: `tag = (fieldNumber << 3) | wireType`, varints,
 * zigzag sint64/sint32 for integers, fixed64 for doubles, length-delimited
 * UTF-8 for strings/bytes; null/default fields are omitted (proto3
 * presence semantics). Field numbers are StructType positions + 1; the
 * registry header matches the Avro framing (magic 0x01 + 4-byte schema id).
 */
object ProtoWire {

  val MAGIC: Byte = 0x01

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def zigzag(n: Long): Long = (n << 1) ^ (n >> 63)
  private def unzigzag(n: Long): Long = (n >>> 1) ^ -(n & 1)

  private def wireType(dt: DataType): Int = dt match {
    case LongType | IntegerType | BooleanType => 0 // varint (zigzag ints)
    case DoubleType                           => 1 // fixed64
    case StringType | BinaryType              => 2 // length-delimited
    case other => throw new IllegalArgumentException(s"unsupported proto field type $other")
  }

  private def header(schemaId: Int): Array[Byte] =
    Array(MAGIC, (schemaId >> 24).toByte, (schemaId >> 16).toByte,
      (schemaId >> 8).toByte, schemaId.toByte)

  def headerSchemaId(wire: Array[Byte]): Int = {
    require(wire.length >= 5 && wire(0) == MAGIC, "bad proto wire header")
    ((wire(1) & 0xff) << 24) | ((wire(2) & 0xff) << 16) | ((wire(3) & 0xff) << 8) | (wire(4) & 0xff)
  }

  /** Serialize `payloadCols` into a proto3-wire `wire` binary column. */
  def encode(df: DataFrame, payloadCols: Seq[String], schemaId: Int,
             keep: Seq[String] = Seq.empty): DataFrame = {
    val payloadType = StructType(payloadCols.map(c => df.schema(c)).toArray)
    val outSchema = StructType(keep.map(c => df.schema(c)) :+
      StructField("wire", BinaryType, nullable = false))
    val hdr = header(schemaId)
    df.select(keep.map(col) :+ struct(payloadCols.map(col): _*).as("_payload"): _*)
      .mapPartitions { rows =>
        val out = new ByteArrayOutputStream(256)
        rows.map { row =>
          val p = row.getStruct(row.length - 1)
          out.reset()
          out.write(hdr, 0, hdr.length)
          payloadType.fields.zipWithIndex.foreach { case (f, i) =>
            if (!p.isNullAt(i)) {
              val fieldNum = i + 1
              val wt = wireType(f.dataType)
              writeVarint(out, (fieldNum.toLong << 3) | wt)
              f.dataType match {
                case LongType    => writeVarint(out, zigzag(p.getLong(i)))
                case IntegerType => writeVarint(out, zigzag(p.getInt(i).toLong))
                case BooleanType => writeVarint(out, if (p.getBoolean(i)) 1L else 0L)
                case DoubleType =>
                  var bits = java.lang.Double.doubleToLongBits(p.getDouble(i))
                  (0 until 8).foreach { _ => out.write((bits & 0xff).toInt); bits >>>= 8 }
                case StringType =>
                  val b = p.getString(i).getBytes(StandardCharsets.UTF_8)
                  writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
                case BinaryType =>
                  val b = p.getAs[Array[Byte]](i)
                  writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
                case _ => ()
              }
            }
          }
          Row.fromSeq(row.toSeq.dropRight(1) :+ out.toByteArray)
        }
      }(Encoders.row(outSchema))
      .toDF(outSchema.fieldNames.toIndexedSeq: _*)
      .asInstanceOf[DataFrame]
  }

  /** Decode a proto3-wire `wire` column; absent fields read as NULL. */
  def decode(df: DataFrame, registry: Map[Int, StructType], targetSchemaId: Int,
             keep: Seq[String] = Seq.empty): DataFrame = {
    val target = registry(targetSchemaId)
    val outSchema = StructType(keep.map(c => df.schema(c)).toArray ++ target.fields)
    df.select((keep.map(col) :+ col("wire")): _*)
      .mapPartitions { rows =>
        rows.map { row =>
          val wire = row.getAs[Array[Byte]](row.length - 1)
          val written = registry(headerSchemaId(wire))
          var pos = 5
          def readVarint(): Long = {
            var shift = 0; var acc = 0L; var b = 0
            do {
              b = wire(pos) & 0xff; pos += 1
              acc |= (b & 0x7fL) << shift; shift += 7
            } while ((b & 0x80) != 0)
            acc
          }
          val byName = scala.collection.mutable.Map.empty[String, Any]
          while (pos < wire.length) {
            val tag = readVarint()
            val fieldIdx = (tag >>> 3).toInt - 1
            val wt = (tag & 7).toInt
            val f = if (fieldIdx < written.fields.length) Some(written.fields(fieldIdx)) else None
            wt match {
              case 0 =>
                val v = readVarint()
                f.foreach(fd => byName(fd.name) = fd.dataType match {
                  case LongType    => unzigzag(v)
                  case IntegerType => unzigzag(v).toInt
                  case BooleanType => v != 0L
                  case _           => unzigzag(v)
                })
              case 1 =>
                var bits = 0L
                (0 until 8).foreach(i => { bits |= (wire(pos + i) & 0xffL) << (8 * i) })
                pos += 8
                f.foreach(fd => byName(fd.name) = java.lang.Double.longBitsToDouble(bits))
              case 2 =>
                val len = readVarint().toInt
                val b = java.util.Arrays.copyOfRange(wire, pos, pos + len)
                pos += len
                f.foreach(fd => byName(fd.name) = fd.dataType match {
                  case StringType => new String(b, StandardCharsets.UTF_8)
                  case _          => b
                })
              case other => throw new IllegalStateException(s"unsupported wire type $other")
            }
          }
          val vals = target.fields.map(f => byName.getOrElse(f.name, null))
          new GenericRowWithSchema((row.toSeq.dropRight(1) ++ vals).toArray, outSchema): Row
        }
      }(Encoders.row(outSchema))
      .toDF(outSchema.fieldNames.toIndexedSeq: _*)
      .asInstanceOf[DataFrame]
  }
}
