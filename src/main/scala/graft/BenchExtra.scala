package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimization-round diagnostic (guide §1.4): times individual STAGES of
  * the expensive queries behind a noop sink (every column of every row
  * computed, nothing written), in a WARMED session, with repetitions —
  * so numbers isolate the stage, not session init or the real sink.
  * Separate from the frozen [[Bench]] harness; cite these numbers in
  * OPTIMIZATION_r07.md, never in BENCH_SELF.json.
  *
  * Usage: runMain graft.BenchExtra [stage ...]
  * (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_REPS)
  */
object BenchExtra {
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
    import spark.implicits._

    // warm up scheduler, parquet footers, codegen of scan shapes
    Seq("documents", "embeddings", "orders", "lineitem").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case scala.util.control.NonFatal(e) => System.err.println(s"warmup $t: $e") }
    }

    def docs = Tables.load(spark, sfDir, "documents")
    def emb = Tables.load(spark, sfDir, "embeddings")

    // shared artifacts, built once (mirrors the session caches)
    lazy val sigs = graft.spark.Dedup.simhashPortableDf(docs).persist()
    lazy val embSigs = {
      val t = graft.spark.Ann.signatureTable(emb, nTables = 16, nBits = 8).persist()
      t.count()
      t
    }

    val stages: Seq[(String, () => DataFrame)] = Seq(
      "simhash_sigs_build" -> (() => graft.spark.Dedup.simhashPortableDf(docs)),
      "simhash_pairs_from_sigs" -> (() => { sigs.count(); graft.spark.Dedup.simhashPairsFromSigs(sigs) }),
      "dupclusters_fixpoint" -> (() => {
        val pairs = graft.spark.Dedup.simhashPairsFromSigs(sigs).persist()
        pairs.count()
        val out = graft.spark.Dedup.dupClusters(pairs)
        pairs.unpersist()
        out
      }),
      "emb_signature_build" -> (() => graft.spark.Ann.signatureTable(emb, nTables = 16, nBits = 8)),
      "d10_join_path" -> (() => graft.spark.Ann.cosineDupPairsFromSignatures(
        embSigs, threshold = 0.4, bucketBits = 4, maxBucketSize = 4096,
        broadcastVectors = false)),
      "d10_broadcast_path" -> (() => graft.spark.Ann.cosineDupPairsFromSignatures(
        embSigs, threshold = 0.4, bucketBits = 4, maxBucketSize = 4096,
        broadcastVectors = true)),
      // (an AQE-coalescing probe ran here during r7 — disabling partition
      // coalescing for the pair-loop shuffle measured neutral, median 1.29
      // vs 1.12 s, so the group-pass cost is pipeline overhead, not a
      // single-coalesced-task bottleneck)
      "lsh_candidates_build" -> (() => graft.spark.Dedup.minhashLshPairs(docs)),
      // the pre-r7 window-based degenerate-bucket cap, reconstructed for
      // A/B evidence against the agg + broadcast anti-join cap above
      "lsh_candidates_window_cap" -> (() => {
        import org.apache.spark.sql.expressions.Window
        val prepared = docs.select(col("doc_id").cast("string").as("id"), col("text"))
          .repartition(64)
        val sig = prepared.as[(String, String)]
          .mapPartitions { it =>
            it.flatMap { case (id, text) =>
              graft.spark.Dedup.bucketHashesJvm(Option(text).getOrElse(""), 5, 16, 4)
                .iterator.zipWithIndex.map { case (bucket, band) => (id, band, bucket) }
            }
          }.toDF("id", "band", "bucket")
        val w = Window.partitionBy(col("band"), col("bucket"))
        val capped = sig.withColumn("bucket_n", count(lit(1)).over(w))
          .filter(col("bucket_n") <= 256).drop("bucket_n")
        val a = capped.select(col("id").as("doc_a"), col("band"), col("bucket"))
        val b = capped.select(col("id").as("doc_b"), col("band"), col("bucket"))
        a.join(b, Seq("band", "bucket"))
          .filter(col("doc_a") < col("doc_b"))
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).as("n_shared_bands"))
      }),
      "d13_query" -> (() => Queries.all("d13_decontaminate")(spark, sfDir)),
      "d12_query" -> (() => Queries.all("d12_repetition")(spark, sfDir)),
      "e1_query" -> (() => Queries.all("e1_cosine_topk")(spark, sfDir)),
      "e3_query" -> (() => Queries.all("e3_cosine_ivf")(spark, sfDir)),
      "x3_query" -> (() => Queries.all("x3_extract_resume")(spark, sfDir)),
      "m1_query" -> (() => Queries.all("m1_media_features")(spark, sfDir)),
    )
    val wanted = if (args.nonEmpty) args.toSet else stages.map(_._1).toSet
    stages.filter(s => wanted(s._1)).foreach { case (name, fn) =>
      val times = (1 to reps).map { rep =>
        spark.sparkContext.setJobDescription(s"extra:$name rep$rep")
        val t0 = System.nanoTime()
        fn().write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[benchextra] $name rep=$rep wall=$dt%.3f s")
        dt
      }
      val sorted = times.sorted
      println(f"[benchextra] $name MEDIAN=${sorted(sorted.length / 2)}%.3f s MIN=${sorted.head}%.3f s")
    }
    Queries.releaseCaches(spark)
    spark.stop()
  }
}
