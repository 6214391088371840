package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for a training-data pipeline over the `documents`
 * table: exact dedup, token counting, quality scoring, language-ID
 * (n-gram/marker heuristic), document fingerprinting, unigram Jaccard
 * near-dup pairs.
 *
 * Determinism rules for the DuckDB oracle: md5 digests (identical across
 * engines), integer counts via the replace-trick, and divisions only of
 * exact integer operands (single IEEE op => bit-identical).
 */
object TextOps {

  /** occurrences of `pat` in `c` = (len(c) - len(replace(c, pat, ''))) / len(pat) */
  private def occPlain(c: Column, pat: String): Column =
    ((length(c) - length(replaceExpr(c, pat))) / pat.length).cast("long")

  // literal removal via StringReplace (plain substring search, codegen'd) —
  // r6: this was regexp_replace(Pattern.quote(pat)), which drags the whole
  // java.util.regex engine through every occurrence count; doc_quality and
  // doc_langid scan the text up to 16x per row through this helper
  private def replaceExpr(c: Column, pat: String): Column =
    call_function("replace", c, lit(pat), lit(""))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup: hash-groupBy on content digest (the 100 TB-safe baseline:
    // one shuffle on a 16-byte key, no content comparison)
    "doc_dedup_exact" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("digest"))
        .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper_doc"))
        .orderBy("digest")),

    // token counting: whitespace tokens + a BPE-ish alnum-run count
    "doc_token_stats" -> ((s, d) =>
      Tables.documents(s, d).select(
          col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_ws_tokens"),
          size(split(col("text"), "[^a-z0-9]+")).cast("long").as("n_alnum_runs"),
          length(col("text")).cast("long").as("n_chars_measured"))
        .orderBy("doc_id")),

    // quality scoring: length / punctuation / stopword signals.
    // Sort BEFORE the scoring projection (r6, here and in the other per-doc
    // scans below): the final orderBy's range partitioner samples its child,
    // so a sort placed after the expensive expressions executes them twice —
    // sorted(doc_id) -> project computes each score once and the sampling
    // pass reads only the scan. Same rows, same total order (doc_id is the
    // unique sort key either way).
    "doc_quality" -> ((s, d) => {
      val t = col("text")
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .orderBy("doc_id")
        .select(
          col("doc_id"),
          length(t).cast("long").as("n_chars"),
          occPlain(t, ".").as("n_periods"),
          occPlain(t, " the ").as("n_the"),
          (occPlain(t, " ") + 1).as("n_tokens"),
          // mean token length: exact ints -> one division, bit-identical
          ((length(t) - occPlain(t, " ")) * lit(1.0) / (occPlain(t, " ") + 1))
            .as("mean_tok_len"))
    }),

    // language-ID: marker-word heuristic with a fixed priority tie-break
    "doc_langid" -> ((s, d) => {
      val t = concat(lit(" "), col("text"), lit(" "))
      val en = occPlain(t, " the ") + occPlain(t, " and ")
      val es = occPlain(t, " el ") + occPlain(t, " la ")
      val de = occPlain(t, " der ") + occPlain(t, " und ")
      val fr = occPlain(t, " le ") + occPlain(t, " et ")
      Tables.documents(s, d).select(col("doc_id"), col("text"), col("lang"))
        .orderBy("doc_id") // before the marker counts — see doc_quality note
        .select(
          col("doc_id"),
          when(en >= es && en >= de && en >= fr, "en")
            .when(es >= de && es >= fr, "es")
            .when(de >= fr, "de")
            .otherwise("fr").as("pred_lang"),
          col("lang").as("labeled_lang"))
    }),

    // fingerprint: md5 of the normalized text (lowercase, alnum+space only)
    "doc_fingerprint" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .orderBy("doc_id") // before the regex+md5 — see doc_quality note
        .select(
          col("doc_id"),
          md5(regexp_replace(lower(col("text")), "[^a-z0-9 ]", "")).as("fp"))),

    // PII/URL scrubbing — the standard pre-training sanitization pass:
    // emails and URLs replaced by typed placeholder tokens, runs of digits
    // masked, filler stopwords tokenized (the rule that actually fires on
    // this corpus), whitespace normalized. Pure codegen'd regexp_replace
    // chain, semantics identical under Java regex and DuckDB's RE2.
    "doc_scrub" -> ((s, d) => {
      val scrubbed =
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(col("text"),
                  "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
                "https?://[^ ]+", "<URL>"),
              "[0-9]{6,}", "<NUM>"),
            "\\b(a|the)\\b", "<STOP>"),
          "  +", " ")
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .orderBy("doc_id") // before the regex chain — see doc_quality note
        .select(
          col("doc_id"),
          scrubbed.as("clean"),
          (length(col("text")) - length(scrubbed)).as("removed_chars"))
    }),

    // unigram-Jaccard near-dup pairs over a bounded candidate window (full
    // n-gram/MinHash variants in DedupOps; this one is oracle-checkable)
    "doc_jaccard_pairs" -> ((s, d) => {
      val docs = Tables.documents(s, d).filter(col("doc_id") < 200)
      val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "").distinct()
      val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val a = toks.as("a"); val b = toks.as("b")
      val shared = a.join(b, col("a.token") === col("b.token") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("shared"))
      shared
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn("jaccard",
          col("shared") * lit(1.0) / (col("sz_a") + col("sz_b") - col("shared")))
        .filter(col("jaccard") >= 0.8)
        .select(col("doc_a"), col("doc_b"), col("shared"), col("sz_a"), col("sz_b"))
        .orderBy("doc_a", "doc_b")
    })
  )

  val oracles: Map[String, String] = Map(
    "doc_dedup_exact" ->
      """SELECT md5(text) AS digest, count(*) AS n_copies, min(doc_id) AS keeper_doc
        |FROM documents GROUP BY 1 ORDER BY digest""".stripMargin,
    "doc_token_stats" ->
      """SELECT doc_id,
        |       len(string_split(text, ' ')) AS n_ws_tokens,
        |       len(string_split_regex(text, '[^a-z0-9]+')) AS n_alnum_runs,
        |       length(text) AS n_chars_measured
        |FROM documents ORDER BY doc_id""".stripMargin,
    "doc_quality" ->
      """SELECT doc_id, length(text) AS n_chars,
        |       (length(text) - length(replace(text, '.', ''))) AS n_periods,
        |       CAST((length(text) - length(replace(text, ' the ', ''))) / 5 AS BIGINT) AS n_the,
        |       (length(text) - length(replace(text, ' ', '')) + 1) AS n_tokens,
        |       (length(text) - (length(text) - length(replace(text, ' ', '')))) * 1.0
        |         / (length(text) - length(replace(text, ' ', '')) + 1) AS mean_tok_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "doc_langid" ->
      """WITH m AS (
        |  SELECT doc_id, lang, ' ' || text || ' ' AS t FROM documents),
        |c AS (
        |  SELECT doc_id, lang,
        |    (length(t) - length(replace(t, ' the ', ''))) / 5
        |      + (length(t) - length(replace(t, ' and ', ''))) / 5 AS en,
        |    (length(t) - length(replace(t, ' el ', ''))) / 4
        |      + (length(t) - length(replace(t, ' la ', ''))) / 4 AS es,
        |    (length(t) - length(replace(t, ' der ', ''))) / 5
        |      + (length(t) - length(replace(t, ' und ', ''))) / 5 AS de,
        |    (length(t) - length(replace(t, ' le ', ''))) / 4
        |      + (length(t) - length(replace(t, ' et ', ''))) / 4 AS fr
        |  FROM m)
        |SELECT doc_id,
        |       CASE WHEN en >= es AND en >= de AND en >= fr THEN 'en'
        |            WHEN es >= de AND es >= fr THEN 'es'
        |            WHEN de >= fr THEN 'de'
        |            ELSE 'fr' END AS pred_lang,
        |       lang AS labeled_lang
        |FROM c ORDER BY doc_id""".stripMargin,
    "doc_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "doc_scrub" ->
      """WITH s AS (
        |  SELECT doc_id, text,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(text,
        |              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |            'https?://[^ ]+', '<URL>', 'g'),
        |          '[0-9]{6,}', '<NUM>', 'g'),
        |        '\b(a|the)\b', '<STOP>', 'g'),
        |      '  +', ' ', 'g') AS clean
        |  FROM documents)
        |SELECT doc_id, clean, length(text) - length(clean) AS removed_chars
        |FROM s ORDER BY doc_id""".stripMargin,
    "doc_jaccard_pairs" ->
      """WITH docs AS (SELECT * FROM documents WHERE doc_id < 200),
        |toks AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token FROM docs),
        |toks2 AS (SELECT * FROM toks WHERE token <> ''),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM toks2 GROUP BY doc_id),
        |shared AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
        |  FROM toks2 a JOIN toks2 b ON a.token = b.token AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, shared, sa.sz AS sz_a, sb.sz AS sz_b
        |FROM shared
        |JOIN sizes sa ON sa.doc_id = doc_a
        |JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE shared * 1.0 / (sa.sz + sb.sz - shared) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin
  )
}
