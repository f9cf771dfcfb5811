package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: time individual registered queries by name, repeated, in one
  * session — for isolating a regression without running the whole bench.
  * Usage: runMain graft.BenchOne <query> [query ...] (env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_REPS). Repetitions expose cache/persist
  * effects: rep 1 includes shared-artifact build, later reps are steady-state.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Queries.all.keys.toSeq.sorted
    names.foreach { name =>
      val fn = Queries.all(name)
      (1 to reps).foreach { rep =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[benchone] $name rep=$rep rows=$n wall=$dt%.3f s")
      }
    }
    Queries.releaseCaches(spark)
    spark.stop()
  }
}
