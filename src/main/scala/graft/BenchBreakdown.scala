package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: separate scan+assembly cost from extraction cost per
  * parallelism level, several repetitions to expose host variance.
  */
object BenchBreakdown {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"bench-breakdown-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val corpusPath = "target/bench_corpus"
    for (cores <- Seq(8, 32, 8, 32)) {
      implicit val spark: SparkSession = session(cores)
      import spark.implicits._
      val docs = spark.read.parquet(corpusPath).as[graft.spark.Doc]
      val n = docs.count()
      def time(label: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val r = f
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[breakdown] cores=$cores $label%-18s rows=$r wall=${dt}%.2f s thr=${n / dt}%.0f docs/s")
      }
      time("scan_only")(docs.count())
      time("scan_assemble") {
        docs.toDF().select(col("doc_id"),
          length(concat_ws("", transform(col("spans"), s => coalesce(s.getField("text"), lit(""))))).as("l"))
          .agg(sum("l")).collect()
        n
      }
      time("extract")(graft.spark.Pipeline.extract(docs).count())
      time("extract2")(graft.spark.Pipeline.extract(docs).count())
      spark.stop()
    }
  }
}
