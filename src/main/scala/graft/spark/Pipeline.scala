package graft.spark

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed extraction skeleton (SURVEY.md §2.0):
  *
  * {{{
  * scan → salted repartition (skew-aware) → mapPartitions(extract) → sink
  *                                        ↘ per-partition lineage/metrics
  * }}}
  *
  * Everything is Dataset/DataFrame API; the per-doc pipeline is a typed
  * mapPartitions (SURVEY.md §7.3: no UDF — one object pipeline per task,
  * no Row↔case-class churn, metrics for free). Catalyst prunes the scan to
  * (doc_id, spans); the only shuffle is the explicit salt.
  *
  * Scale design notes (100 TB / 10^12 docs):
  *   - salt = pmod(xxhash64(doc_id), S) with S ≈ 2–4× total cores spreads
  *     hash-skew; doc cost is ~linear in span bytes, so additionally the
  *     oversize tail (> oversizeBytes of span payload) is routed to
  *     dedicated salts so one 8 MB page never serializes behind thousands
  *     of small ones (north-rule skew requirement).
  *   - map-side work dominates; AQE coalescing applies to the metrics aggs.
  *   - per-partition lineage rows make restarts resumable via anti-join
  *     (see [[Lineage.resumeFilter]]).
  */
object Pipeline {

  final case class Config(
      baseUrl: String = "https://corpus.example/doc.html",
      charThreshold: Int = 500,
      nSalts: Int = 128,
      /** span-byte threshold above which a doc gets an oversize salt */
      oversizeBytes: Int = 1 << 20,
      /** hard cap: skip docs above this many HTML chars (0 = off) */
      maxHtmlChars: Int = 32 << 20)

  /** Salted, skew-aware repartition + typed extraction. */
  def extract(docs: Dataset[Doc], cfg: Config = Config())(implicit spark: SparkSession): Dataset[ExtractedDoc] = {
    import spark.implicits._
    val opts = graft.algo.Options(charThreshold = cfg.charThreshold)
    val oversizeSalts = math.max(cfg.nSalts / 8, 4)

    val salted = docs.toDF()
      .withColumn("span_bytes",
        aggregate(col("spans"), lit(0L), (acc, s) =>
          acc + coalesce(length(s.getField("text")).cast("long"), lit(0L))
              + coalesce(length(s.getField("media_ref")).cast("long"), lit(0L))))
      .withColumn("salt",
        when(col("span_bytes") > cfg.oversizeBytes,
          // oversize docs spread over their own salt range
          lit(cfg.nSalts) + pmod(xxhash64(col("doc_id")), lit(oversizeSalts)))
          .otherwise(pmod(xxhash64(col("doc_id")), lit(cfg.nSalts))))
      .repartition(col("salt"))
      .drop("span_bytes", "salt")
      .as[Doc]

    salted.mapPartitions { it =>
      it.map(doc => Spans.extractOne(doc, cfg.baseUrl, opts, cfg.maxHtmlChars))
    }
  }

  /** Extraction with per-partition lineage emission: wraps the iterator so
    * a lineage row is produced when the partition completes (S3/S4).
    */
  def extractWithLineage(docs: Dataset[Doc], runId: String, cfg: Config = Config())(
      implicit spark: SparkSession): (Dataset[ExtractedDoc], Dataset[LineageRow]) = {
    import spark.implicits._
    val extracted = extract(docs, cfg).cache()
    val lineage = extracted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var nDocs = 0L
      var nErrors = 0L
      var sumLen = 0L
      var maxDocId = ""
      while (it.hasNext) {
        val d = it.next()
        nDocs += 1
        if (d.status != "ok") nErrors += 1
        sumLen += d.text_length
        if (d.doc_id > maxDocId) maxDocId = d.doc_id
      }
      Iterator.single(LineageRow(runId, pid, nDocs, nErrors, sumLen, maxDocId))
    }
    (extracted, lineage)
  }

  /** Extraction quality metrics: one row per status with counts and text
    * volume — plain groupBy/agg, AQE-coalesced.
    */
  def metrics(extracted: Dataset[ExtractedDoc]): DataFrame =
    extracted.groupBy(col("status"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("text_length")).as("sum_text_length"),
        avg(size(col("spans"))).as("avg_spans"))
      .orderBy(col("status"))
}

final case class LineageRow(
    run_id: String,
    partition_id: Int,
    n_docs: Long,
    n_errors: Long,
    sum_text_length: Long,
    max_doc_id: String)

object Lineage {
  /** Resume: drop docs whose partition already completed in a previous
    * run — left_anti join against the lineage table (broadcast: lineage is
    * tiny relative to docs).
    */
  def resumeFilter(docs: DataFrame, doneDocIds: DataFrame): DataFrame =
    docs.join(broadcast(doneDocIds), Seq("doc_id"), "left_anti")
}
