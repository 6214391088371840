package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.cdc.{Dedup, EventGen, GenConfig, Model}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Operator coverage: SURVEY.md §2 (CDC dataflow ops) + training-data
  * pipeline ops (dedup / similarity / text / multimodal). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The CDC keyed-MERGE final state over the events stream. */
  def entry(spark: SparkSession): DataFrame =
    CdcQueries.queries("cdc_merge_upsert")(spark, "/root/testdata/sf0.001")

  /** The CDC engine's logical core as a pure query: generated change stream
    * -> per-key max-LSN dedup -> delete filter == final table state.
    * (Engine-side generator, no SQL oracle -> rows-only check; full
    * correctness is sha256-verified in the test suite / ReplayJob.) */
  private val cdcReplayFinal: (SparkSession, String) => DataFrame = (s, _) => {
    val gen = GenConfig(numKeys = 20000, hotKeys = 32)
    Dedup.lastPerKey(EventGen.events(s, 0, 100000, gen), Model.keyCols, "lsn")
      .filter(col("op") =!= "d")
      .select("repo", "path", "commit", "lang", "content")
      .orderBy("repo", "path")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CdcQueries.queries ++
      RelationalQueries.queries ++
      TextOps.queries ++
      VectorOps.queries ++
      DedupOps.queries ++
      Multimodal.queries +
      ("cdc_replay_final" -> cdcReplayFinal)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CdcQueries.oracles ++
      RelationalQueries.oracles ++
      TextOps.oracles ++
      VectorOps.oracles ++
      DedupOps.oracles ++
      Multimodal.oracles ++
      Fixtures.oracles // fixture-parquet oracles written by graft.Verify
}
