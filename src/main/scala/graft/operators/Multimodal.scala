package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: media ride as opaque `binary` columns with a
 * typed metadata struct; decode / feature-extract run per-partition in
 * fixed-size batches (the shape a real codec/model inference step needs).
 *
 * The actual image/audio codecs are NOT in this container, so the decode
 * kernel is a clearly-marked deterministic STUB — everything around it
 * (schema, batching, partition mapping, output shape) is real and tested.
 * Swap [[decodeStub]] for the real codec at deploy time.
 */
object Multimodal {

  val FEATURE_DIM = 32
  val BATCH_SIZE = 64

  /** STUB for the real media decoder: deterministic bytes -> feature vector.
    * Real implementation would decode the image/audio payload and run a
    * feature extractor; this produces a stable hash-derived vector so the
    * pipeline (schema, batching, joins downstream) is fully exercisable. */
  private def decodeStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FEATURE_DIM)
    var h = 1125899906842597L // deterministic FNV-ish fold of the payload
    var i = 0
    while (i < payload.length) { h = h * 31 + payload(i); i += 1 }
    var j = 0
    while (j < FEATURE_DIM) {
      val v = h ^ (j * 0x9E3779B97F4A7C15L)
      out(j) = ((v % 2000003L).toFloat) / 1000.0f
      j += 1
    }
    out
  }

  /** documents -> media table: payload as binary + typed metadata struct.
    * (In production the binary column comes from the lake; here the doc text
    * bytes stand in for the media payload.) */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        octet_length(encode(col("text"), "UTF-8")).as("n_bytes"),
        col("source").as("origin")).as("meta"))

  /** Batched per-partition feature extraction over the binary column —
    * executors each process their partition in BATCH_SIZE groups, never
    * materializing more than one batch of decoded media at a time. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false),
      StructField("batch_ordinal", IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("doc_id", "payload").mapPartitions { it =>
      it.grouped(BATCH_SIZE).zipWithIndex.flatMap { case (batch, bIdx) =>
        // batch boundary == model-inference boundary in the real pipeline
        batch.map { r =>
          val feats = decodeStub(r.getAs[Array[Byte]]("payload"))
          Row(r.getLong(0), feats.toSeq, bIdx)
        }
      }
    }(enc)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // binary column + metadata + content digest (oracle-checkable: byte
    // length and sha256 agree across engines)
    "mm_binary_meta" -> ((s, d) =>
      mediaTable(s, d).select(
          col("doc_id"),
          col("meta.n_bytes").cast("long").as("n_bytes"),
          sha2(col("payload"), 256).as("payload_sha"))
        .orderBy("doc_id")),

    // frame sampling: fixed-stride byte windows as "frames" (the video-frame
    // pattern), each with offset + digest
    "mm_frame_sample" -> ((s, d) => {
      val m = mediaTable(s, d)
      m.select(col("doc_id"), col("meta.n_bytes").as("n_bytes"),
          posexplode(transform(
            sequence(lit(0), greatest(floor((col("meta.n_bytes") - 1) / 100).cast("int"), lit(0))),
            i => col("payload").substr(i * 100 + 1, lit(100)))))
        .select(col("doc_id"), col("pos").cast("long").as("frame_no"),
          octet_length(col("col")).cast("long").as("frame_bytes"),
          sha2(col("col"), 256).as("frame_sha"))
        .orderBy("doc_id", "frame_no")
    }),

    // stubbed decode -> feature vectors, batched per partition (rows-only
    // check: the stub is engine-side by construction)
    "mm_features" -> ((s, d) =>
      extractFeatures(mediaTable(s, d))
        .select(col("doc_id"), size(col("features")).as("dim"),
          element_at(col("features"), 1).as("f0"))
        .orderBy("doc_id"))
  )

  // DuckDB 1.0 sha256/substring only accept VARCHAR; the doc text is pure
  // ASCII (verified: length == octet_length for every row), so byte-wise and
  // char-wise slicing/hashing coincide and the oracle can stay on VARCHAR.
  val oracles: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |       sha256(text) AS payload_sha
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      """WITH m AS (SELECT doc_id, text, octet_length(encode(text)) AS n_bytes FROM documents),
        |frames AS (
        |  SELECT doc_id, r.range AS frame_no,
        |         substring(text, CAST(r.range * 100 + 1 AS INTEGER), 100) AS frame
        |  FROM m CROSS JOIN range(0, 1000000) r
        |  WHERE r.range <= greatest(CAST(floor((n_bytes - 1) / 100) AS INTEGER), 0))
        |SELECT doc_id, frame_no, length(frame) AS frame_bytes, sha256(frame) AS frame_sha
        |FROM frames ORDER BY doc_id, frame_no""".stripMargin
  )
}
