package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dumps `explain("formatted")` for each registered query to
  * `<outDir>/<query>_<suffix>.txt` — the per-round optimization evidence
  * (plans/r07/NAME_before.txt and NAME_after.txt). Complements [[PlanAudit]]
  * (which writes the single BENCH/PLANS.md review artifact).
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> [query ...]
  * (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS). With no query names, dumps
  * every registered query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [query ...]")
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val names = if (args.length > 2) args.drop(2).toSeq else Queries.all.keys.toSeq.sorted
    names.foreach { name =>
      try {
        val df = Queries.all(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
        println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
      } catch {
        case e: Exception =>
          Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"),
            s"EXPLAIN FAILED: $e\n")
          println(s"[plandump] $name failed: $e")
      }
    }
    Queries.releaseCaches(spark)
    spark.stop()
  }
}
