package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Diagnostic: attribute x3_extract_resume's wall time to its stages
  * (corpus generation, resume InSet filter, extraction, output sort) —
  * each timed separately in steady state (rep 2+) so a regression can be
  * pinned to a stage instead of guessed at. Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 runMain graft.BenchAttrib
  */
object BenchAttrib {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    implicit val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val enc = org.apache.spark.sql.Encoders.product[graft.spark.Doc]
    val n = if (sfDir.contains("0.001")) 100L else if (sfDir.contains("0.01")) 400L else 2000L
    val nParts = 32
    def time(label: String)(f: => Long): Unit =
      (1 to reps).foreach { rep =>
        val t0 = System.nanoTime()
        val r = f
        println(f"[attrib] $label%-16s rep=$rep rows=$r wall=${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    val doneLineage = spark.range(nParts / 2).select(col("id").as("part_key"))
    time("gen_only") { graft.spark.Corpus.generate(spark, n).count() }
    time("gen_filter") {
      graft.spark.Lineage.resumeFilter(
        graft.spark.Corpus.generate(spark, n).toDF(), doneLineage, nParts).count()
    }
    time("gen_filter_x") {
      graft.spark.Pipeline.extract(
        graft.spark.Lineage.resumeFilter(
          graft.spark.Corpus.generate(spark, n).toDF(), doneLineage, nParts).as[graft.spark.Doc](enc))
        .count()
    }
    time("full_x3") { Queries.all("x3_extract_resume")(spark, sfDir).count() }
    time("full_x1_uncached") {
      graft.spark.Pipeline.extract(graft.spark.Corpus.generate(spark, n)).count()
    }
    spark.stop()
  }
}
