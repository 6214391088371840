package graft.formats

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/**
 * Protobuf wire format for the payload — the reference's third converter
 * family (ServerApp.java:152-161 / ConvertingEngineBuilder.java:198-234
 * select a protobuf converter class). No protobuf runtime jar exists in this
 * environment, so the (public, documented) proto3 wire encoding is
 * implemented directly: `tag = (fieldNumber << 3) | wireType`, varints,
 * zigzag sint64/sint32 for integers, fixed64 for doubles, length-delimited
 * UTF-8 for strings/bytes, length-delimited embedded messages for nested
 * structs, unpacked repeated fields for arrays; null fields are omitted
 * (proto3 presence semantics — an empty/all-null array is therefore
 * indistinguishable from an absent one and normalizes to NULL on decode).
 * Field numbers are StructType positions + 1; the registry header matches
 * the Avro framing (magic 0x01, then the id per the selected
 * [[RegistryFraming]] — Confluent 4-byte or Apicurio 8-byte).
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
    // temporal types ride as zigzag varints of their canonical integer form:
    // micros-since-epoch for timestamps, days-since-epoch for dates (the
    // reference's Connect converters carry Timestamp/Date logical schemas as
    // int64/int32 the same way — ConvertingEngineBuilder.java:198-234)
    case TimestampType | TimestampNTZType | DateType => 0
    case DoubleType                           => 1 // fixed64
    case StringType | BinaryType              => 2 // length-delimited
    case _: DecimalType                       => 2 // unscaled big-endian bytes
    case _: StructType                        => 2 // embedded message
    case MapType(StringType, _, _)            => 2 // repeated map-entry message
    case ArrayType(et, _)                     => wireType(et) // unpacked repeated
    case other => throw new IllegalArgumentException(s"unsupported proto field type $other")
  }

  private def timestampMicros(v: Any): Long = v match {
    case t: java.sql.Timestamp =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t)
    case i: java.time.Instant =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(i)
    case l: java.time.LocalDateTime =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.localDateTimeToMicros(l)
  }

  private def dateDays(v: Any): Int = v match {
    case d: java.sql.Date =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d)
    case d: java.time.LocalDate => d.toEpochDay.toInt
  }

  /** Recursive field writer. Nested structs are length-delimited embedded
    * messages; arrays are unpacked repeated fields (one tagged occurrence
    * per element — wire-compatible with any proto3 parser). Null fields and
    * null array ELEMENTS are omitted, so proto3 presence semantics apply at
    * every level: an empty or all-null array is indistinguishable from an
    * absent one and reads back as NULL (documented normalization, same as
    * the flat codec's null handling). */
  private def writeField(out: ByteArrayOutputStream, fieldNum: Int,
                         dt: DataType, v: Any): Unit = dt match {
    case ArrayType(et, _) =>
      v.asInstanceOf[scala.collection.Seq[Any]]
        .foreach(e => if (e != null) writeField(out, fieldNum, et, e))
    case MapType(StringType, vt, _) =>
      // standard proto3 map encoding: repeated embedded entry message with
      // field 1 = key, field 2 = value; proto3 map values cannot be null,
      // so null-valued entries are omitted (presence semantics, same
      // normalization as absent scalar fields)
      v.asInstanceOf[scala.collection.Map[String, Any]].foreach { case (k, mv) =>
        if (mv != null) {
          val entry = new ByteArrayOutputStream(64)
          writeField(entry, 1, StringType, k)
          writeField(entry, 2, vt, mv)
          writeVarint(out, (fieldNum.toLong << 3) | 2L)
          writeVarint(out, entry.size.toLong); entry.writeTo(out)
        }
      }
    case _ =>
      writeVarint(out, (fieldNum.toLong << 3) | wireType(dt))
      dt match {
        case LongType    => writeVarint(out, zigzag(v.asInstanceOf[Long]))
        case IntegerType => writeVarint(out, zigzag(v.asInstanceOf[Int].toLong))
        case BooleanType => writeVarint(out, if (v.asInstanceOf[Boolean]) 1L else 0L)
        case TimestampType | TimestampNTZType =>
          writeVarint(out, zigzag(timestampMicros(v)))
        case DateType => writeVarint(out, zigzag(dateDays(v).toLong))
        case d: DecimalType =>
          val b = v.asInstanceOf[java.math.BigDecimal]
            .setScale(d.scale).unscaledValue().toByteArray
          writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
        case DoubleType =>
          var bits = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
          (0 until 8).foreach { _ => out.write((bits & 0xff).toInt); bits >>>= 8 }
        case StringType =>
          val b = v.asInstanceOf[String].getBytes(StandardCharsets.UTF_8)
          writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
        case BinaryType =>
          val b = v.asInstanceOf[Array[Byte]]
          writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
        case st: StructType =>
          val nested = new ByteArrayOutputStream(64)
          writeMessage(nested, v.asInstanceOf[Row], st)
          writeVarint(out, nested.size.toLong); nested.writeTo(out)
        case other => throw new IllegalArgumentException(s"unsupported proto field type $other")
      }
  }

  private def writeMessage(out: ByteArrayOutputStream, row: Row, st: StructType): Unit = {
    var i = 0
    while (i < st.fields.length) {
      if (!row.isNullAt(i)) writeField(out, i + 1, st.fields(i).dataType, row.get(i))
      i += 1
    }
  }

  /** Recursive message parser over wire[from, to); field values follow the
    * written schema `st`. Unknown field numbers are skipped by wire type
    * (forward compatibility). */
  private def parseMessage(wire: Array[Byte], from: Int, to: Int, st: StructType): Row = {
    var pos = from
    def readVarint(): Long = {
      var shift = 0; var acc = 0L; var b = 0
      do {
        b = wire(pos) & 0xff; pos += 1
        acc |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      acc
    }
    val acc = new Array[Any](st.fields.length)
    def put(idx: Int, v: Any): Unit = st.fields(idx).dataType match {
      case _: ArrayType =>
        val buf = acc(idx) match {
          case null => val b = new scala.collection.mutable.ArrayBuffer[Any]; acc(idx) = b; b
          case b: scala.collection.mutable.ArrayBuffer[Any @unchecked] => b
        }
        buf += v
      case _ => acc(idx) = v
    }
    def putMapEntry(idx: Int, k: String, v: Any): Unit = {
      val buf = acc(idx) match {
        case null =>
          val b = new scala.collection.mutable.LinkedHashMap[String, Any]; acc(idx) = b; b
        case b: scala.collection.mutable.LinkedHashMap[String @unchecked, Any @unchecked] => b
      }
      buf += k -> v
    }
    def elemType(idx: Int): DataType = st.fields(idx).dataType match {
      case ArrayType(et, _) => et
      case t => t
    }
    // one varint-family scalar per declared type (shared by the tagged and
    // the packed paths so sint zigzag conventions agree between them)
    def varintValue(dt: DataType, v: Long): Any = dt match {
      case LongType    => unzigzag(v)
      case IntegerType => unzigzag(v).toInt
      case BooleanType => v != 0L
      case TimestampType =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaTimestamp(unzigzag(v))
      case TimestampNTZType =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils.microsToLocalDateTime(unzigzag(v))
      case DateType =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaDate(unzigzag(v).toInt)
      case _ => unzigzag(v)
    }
    def readFixed64(): Double = {
      var bits = 0L
      (0 until 8).foreach(i => { bits |= (wire(pos + i) & 0xffL) << (8 * i) })
      pos += 8
      java.lang.Double.longBitsToDouble(bits)
    }
    while (pos < to) {
      val tag = readVarint()
      val idx = (tag >>> 3).toInt - 1
      val wt = (tag & 7).toInt
      val known = idx >= 0 && idx < st.fields.length
      wt match {
        case 0 =>
          val v = readVarint()
          if (known) put(idx, varintValue(elemType(idx), v))
        case 1 =>
          val d = readFixed64()
          if (known) put(idx, d)
        case 2 =>
          val len = readVarint().toInt
          val start = pos
          val end = start + len
          pos = end
          if (known) st.fields(idx).dataType match {
            case MapType(StringType, vt, _) =>
              val entry = parseMessage(wire, start, end, StructType(Seq(
                StructField("key", StringType), StructField("value", vt))))
              putMapEntry(idx,
                Option(entry.get(0)).map(_.toString).getOrElse(""), entry.get(1))
            case ArrayType(et, _) if wireType(et) != 2 =>
              // PACKED repeated scalars — the default encoding standard
              // proto3 serializers emit for numeric repeated fields (wire
              // type 2 wrapping a block of varints/fixed64); our writer
              // emits unpacked (also valid), so this path is pure read-side
              // interop with foreign records
              pos = start
              while (pos < end) {
                if (wireType(et) == 0) put(idx, varintValue(et, readVarint()))
                else put(idx, readFixed64())
              }
              pos = end
            case _ => elemType(idx) match {
              case StringType =>
                put(idx, new String(wire, start, len, StandardCharsets.UTF_8))
              case d: DecimalType =>
                put(idx, new java.math.BigDecimal(new java.math.BigInteger(
                  java.util.Arrays.copyOfRange(wire, start, end)), d.scale))
              case nested: StructType =>
                put(idx, parseMessage(wire, start, end, nested))
              case _ =>
                put(idx, java.util.Arrays.copyOfRange(wire, start, end))
            }
          }
        case other => throw new IllegalStateException(s"unsupported wire type $other")
      }
    }
    var i = 0
    while (i < acc.length) {
      acc(i) = acc(i) match {
        case b: scala.collection.mutable.ArrayBuffer[Any @unchecked] => b.toSeq
        case b: scala.collection.mutable.LinkedHashMap[String @unchecked, Any @unchecked] =>
          b.toMap
        case v => v
      }
      i += 1
    }
    Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(acc))
  }

  def headerSchemaId(wire: Array[Byte],
                     framing: String = RegistryFraming.Confluent): Int =
    RegistryFraming.schemaId(framing, MAGIC, wire)

  /** Serialize `payloadCols` into a proto3-wire `wire` binary column. */
  def encode(df: DataFrame, payloadCols: Seq[String], schemaId: Int,
             keep: Seq[String] = Seq.empty,
             framing: String = RegistryFraming.Confluent): DataFrame = {
    val payloadType = StructType(payloadCols.map(c => df.schema(c)).toArray)
    val outSchema = StructType(keep.map(c => df.schema(c)) :+
      StructField("wire", BinaryType, nullable = false))
    val hdr = RegistryFraming.header(framing, MAGIC, schemaId)
    df.select(keep.map(col) :+ struct(payloadCols.map(col): _*).as("_payload"): _*)
      .mapPartitions { rows =>
        val out = new ByteArrayOutputStream(256)
        rows.map { row =>
          val p = row.getStruct(row.length - 1)
          out.reset()
          out.write(hdr, 0, hdr.length)
          writeMessage(out, p, payloadType)
          Row.fromSeq(row.toSeq.dropRight(1) :+ out.toByteArray)
        }
      }(Encoders.row(outSchema))
      .toDF(outSchema.fieldNames.toIndexedSeq: _*)
      .asInstanceOf[DataFrame]
  }

  /** Decode a proto3-wire `wire` column; absent fields read as NULL. */
  def decode(df: DataFrame, registry: Map[Int, StructType], targetSchemaId: Int,
             keep: Seq[String] = Seq.empty,
             framing: String = RegistryFraming.Confluent): DataFrame = {
    val hlen = RegistryFraming.headerLen(framing)
    val target = registry(targetSchemaId)
    val outSchema = StructType(keep.map(c => df.schema(c)).toArray ++ target.fields)
    df.select((keep.map(col) :+ col("wire")): _*)
      .mapPartitions { rows =>
        rows.map { row =>
          val wire = row.getAs[Array[Byte]](row.length - 1)
          val written = registry(headerSchemaId(wire, framing))
          val parsed = parseMessage(wire, hlen, wire.length, written)
          // top-level schema routing by FIELD NAME onto the target version
          // (nested shapes follow the written schema — proto has no
          // Avro-style nested resolution)
          val byName = written.fieldNames.zipWithIndex.toMap
          val vals = target.fields.map(f =>
            byName.get(f.name).map(parsed.get).orNull)
          new GenericRowWithSchema((row.toSeq.dropRight(1) ++ vals).toArray, outSchema): Row
        }
      }(Encoders.row(outSchema))
      .toDF(outSchema.fieldNames.toIndexedSeq: _*)
      .asInstanceOf[DataFrame]
  }
}
