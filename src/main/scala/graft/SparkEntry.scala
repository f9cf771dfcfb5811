package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is a Spark DataFrame computation over the
  * driver-provided parquet tables at `sfDir`; the matching entry in
  * [[oracleSql]] is the equivalent ANSI/DuckDB SQL the driver replays for
  * the correctness gate. Column names and types are aligned on both sides
  * (computed ints cast to BIGINT, doubles rounded) because the comparison
  * hashes values under sorted column names.
  *
  * Queries without an oracle entry (extraction itself, hash-seeded ops)
  * get the weaker rows-only check, and are instead validated by the golden
  * fixture suite in src/test (span-sequence equality vs the reference's
  * Mozilla test-pages corpus).
  */
object SparkEntry {

  /** Flagship: Readability span extraction over a deterministic corpus
    * synthesized from the sf0.001 documents table. Driver smoke-checks
    * rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.extractDocuments(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  def oracleSql: Map[String, String] = Queries.oracles
}
