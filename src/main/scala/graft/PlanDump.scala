package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Optimization-round support tool: dump `.explain("formatted")` for every
  * declared query (or the comma-separated subset in args(2)) to one file per
  * query under the given directory. Not part of the bench or verify surface.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> [q1,q2,...] [suffix]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val only = if (args.length > 2 && args(2).nonEmpty) Some(args(2).split(",").toSet) else None
    val suffix = if (args.length > 3) args(3) else ""
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val mode = ExplainMode.fromString("formatted")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(mode) +
            "\n-- final schema --\n" + df.schema.treeString
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/$name$suffix.txt"), txt)
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: $e")
        }
      }
    spark.stop()
  }
}
