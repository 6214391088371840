package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.DotQ

/**
 * Near-duplicate detection at training-data scale over `documents` /
 * `embeddings`. These use engine-side hashing (xxhash64) so they have no
 * cross-engine SQL oracle (driver records rows-only checks); correctness is
 * covered by ScalaTest oracles on synthetic near-dup fixtures.
 *
 * Scale shapes (the whole point of each variant):
 *  - MinHash+LSH: shingle -> K minhashes -> B bands -> bucket join. All-pairs
 *    O(N^2) becomes sum over buckets of |bucket|^2, with band buckets capped.
 *  - SimHash: one 64-bit signature per doc, near-dups share a band prefix;
 *    hamming distance check only within band buckets.
 *  - Embedding cosine near-dup: sign-LSH buckets then exact cosine inside.
 */
object DedupOps {

  private val K = 16  // minhash permutations
  private val B = 4   // LSH bands (rows per band = K/B = 4)

  /** word 3-gram shingles as one column of arrays */
  private def shingles(text: Column): Column = {
    val toks = split(text, " ")
    when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3), i =>
        concat_ws(" ", get(toks, i), get(toks, i + 1), get(toks, i + 2))))
      .otherwise(array().cast("array<string>"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // MinHash signatures + banded LSH candidate pairs + exact-overlap confirm
    "doc_minhash_lsh" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), shingles(col("text")).as("sh"))
        .filter(size(col("sh")) > 0)
      val exploded = docs.select(col("doc_id"), explode(col("sh")).as("shingle")).distinct()
      // K minhashes via per-permutation seeded xxhash64, computed in ONE
      // aggregation pass (partial agg => no skew on common shingles)
      val minhashes = exploded.groupBy("doc_id").agg(
        array((0 until K).map(i =>
          min(xxhash64(col("shingle"), lit(i))).as(s"h$i")): _*).as("sig"),
        count(lit(1)).as("n_shingles"))
      // band key = hash of the band's slice of the signature
      val banded = minhashes.select(col("doc_id"), col("n_shingles"), col("sig"),
        explode(array((0 until B).map(b =>
          struct(lit(b).as("band"),
            xxhash64(slice(col("sig"), b * (K / B) + 1, K / B).cast("string")).as("bkey")))
          : _*)).as("bb"))
        .select(col("doc_id"), col("n_shingles"), col("sig"), col("bb.band"), col("bb.bkey"))
      // mega-bucket cap: a band bucket with > CAP members contributes
      // O(CAP^2) candidate pairs; such buckets are near-universal shingle
      // patterns, not near-duplicates. Standard LSH practice at scale —
      // bounds the candidate join at sum(|bucket|^2) <= CAP * |docs|.
      val CAP = 64
      val bucketW = org.apache.spark.sql.expressions.Window.partitionBy("band", "bkey")
      val bandedCapped = banded
        .withColumn("bsize", count(lit(1)).over(bucketW))
        .filter(col("bsize") <= CAP)
        .drop("bsize")
      val a = bandedCapped.as("a"); val bb = bandedCapped.as("b")
      val cand = a.join(bb,
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
        .distinct()
      // estimated jaccard = fraction of agreeing minhashes
      cand.withColumn("est_jaccard",
          aggregate(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), (acc, x) => acc + x).cast("double") / K)
        .filter(col("est_jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
        .orderBy("doc_a", "doc_b")
    }),

    // 64-bit SimHash per document from token-frequency bit votes
    "doc_simhash" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy("doc_id", "token").agg(count(lit(1)).as("w"))
        .withColumn("h", xxhash64(col("token")))
      // per-bit weighted vote: sum(+w if bit set else -w); sign -> bit
      val voteCols = (0 until 64).map { i =>
        sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, col("w"))
          .otherwise(-col("w"))).as(s"v$i")
      }
      val votes = toks.groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
      val sim = votes.select(col("doc_id"),
        (0 until 64).map(i =>
          when(col(s"v$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
      sim.orderBy("doc_id")
    }),

    // embedding cosine near-dup pairs above threshold, banded sign-LSH
    // (4 bands x 3 planes: high recall at the dataset's cosine range; the
    // threshold is calibrated to the synthetic embeddings, which are near-
    // orthogonal — real near-dup corpora would use ~0.95)
    "emb_near_dup" -> ((s, d) => {
      DotQ.register(s)
      val e = Tables.embeddings(s, d).select(col("vec_id"),
        transform(col("embedding"), x => round(x.cast("double") * 1000).cast("long")).as("q"))
      val bandCols = (0 until 4).map { band =>
        (0 until 3).map { r =>
          val p = band * 3 + r
          val proj = aggregate(
            zip_with(col("q"), sequence(lit(0), lit(63)),
              (x, i) => x * when(pmod(xxhash64(lit(p.toLong) * 131071L + i), lit(2)) === 0, 1L)
                .otherwise(-1L)),
            lit(0L), (acc, x) => acc + x)
          when(proj >= 0, lit(1L << r)).otherwise(lit(0L))
        }.reduce(_ + _).as(s"band$band")
      }
      val withSig = e.select((col("vec_id") +: col("q") +: bandCols): _*)
      val banded = withSig.select(col("vec_id"), col("q"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"), col(s"band$b").as("bsig"))): _*)).as("bb"))
        .select(col("vec_id"), col("q"), col("bb.band"), col("bb.bsig"))
      val a = banded.as("a"); val b = banded.as("b")
      a.join(b, col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          col("a.q").as("qa"), col("b.q").as("qb"))
        .distinct()
        .withColumn("dot", call_function("dot_q", col("qa"), col("qb")))
        .withColumn("na", call_function("dot_q", col("qa"), col("qa")))
        .withColumn("nb", call_function("dot_q", col("qb"), col("qb")))
        .withColumn("cos", col("dot").cast("double") / sqrt((col("na") * col("nb")).cast("double")))
        .filter(col("cos") >= 0.3)
        .select(col("vec_a"), col("vec_b"), col("dot"))
        .orderBy("vec_a", "vec_b")
    })
  )

  /** no cross-engine oracles: xxhash64 is Spark-specific (rows-only check) */
  val oracles: Map[String, String] = Map.empty
}
