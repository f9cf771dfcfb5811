package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Scaling-efficiency harness (BASELINE.md): run the identical extraction
  * job at two parallelism levels — local[8] (N) and local[32] (4N) — over
  * the same on-disk corpus and report throughput at both plus
  * efficiency = throughput_4N / (4 × throughput_N). Sandbox proxy for the
  * north rule's two-cluster-size criterion.
  *
  * Env knobs: SPARK_GRAFT_BENCH_DOCS (default 4000),
  * SPARK_GRAFT_BENCH_LOW / HIGH (default 8 / 32).
  */
object BenchScaling {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"bench-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "60000").toLong
    val low = sys.env.getOrElse("SPARK_GRAFT_BENCH_LOW", "8").toInt
    val high = sys.env.getOrElse("SPARK_GRAFT_BENCH_HIGH", "32").toInt
    val corpusPath = "target/bench_corpus"

    // Materialize the corpus once (identical input for both runs).
    {
      implicit val spark: SparkSession = session(high)
      import spark.implicits._
      if (!Files.exists(Paths.get(corpusPath, "_SUCCESS")) ||
          spark.read.parquet(corpusPath).count() != nDocs) {
        graft.spark.Corpus.generate(spark, nDocs, seed = 42L,
            oversizeFraction = 0.001, nPartitions = high * 4)
          .write.mode("overwrite").parquet(corpusPath)
      }
      // JIT warmup on a slice
      val warm = spark.read.parquet(corpusPath).limit(200)
        .as[graft.spark.Doc]
      graft.spark.Pipeline.extract(warm, graft.spark.Pipeline.Config(nSalts = high * 4)).count()
      spark.stop()
    }

    def run(cores: Int): Double = {
      implicit val spark: SparkSession = session(cores)
      import spark.implicits._
      val docs = spark.read.parquet(corpusPath).as[graft.spark.Doc]
      val t0 = System.nanoTime()
      val n = graft.spark.Pipeline.extract(docs,
        graft.spark.Pipeline.Config(nSalts = cores * 4)).filter(_.status != "__never__").count()
      val dt = (System.nanoTime() - t0) / 1e9
      require(n == nDocs, s"expected $nDocs rows, got $n")
      spark.stop()
      nDocs / dt
    }

    val thrLow = run(low)
    val thrHigh = run(high)
    val efficiency = thrHigh / ((high.toDouble / low) * thrLow)
    val json =
      s"""{"metric":"scaling_efficiency","value":${f"$efficiency%.4f"},"unit":"ratio",""" +
      s""""docs":$nDocs,"parallelism_low":$low,"parallelism_high":$high,""" +
      s""""docs_per_sec_low":${f"$thrLow%.2f"},"docs_per_sec_high":${f"$thrHigh%.2f"}}"""
    println(json)
    Files.createDirectories(Paths.get("BENCH"))
    Files.writeString(Paths.get("BENCH/scaling_latest.json"), json + "\n")
  }
}
