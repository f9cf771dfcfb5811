package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Format-agnostic table I/O (SURVEY.md §7.1): every scan and sink in the
  * engine goes through this seam so the storage layer is a deployment
  * choice, not a code change.
  *
  * In this sandbox the only available format is parquet-on-path. In
  * production the same calls target Iceberg DSv2 catalogs
  * (`spark.read.table(name)` / `writeTo(name).append()`), which adds:
  *   - atomic commits → the lineage/resume contract in [[Lineage]] reads
  *     only COMMITTED snapshots for free,
  *   - hidden partitioning + partition evolution for the doc corpus,
  *   - snapshot time-travel for replaying an extraction over the exact
  *     input of a previous run.
  * Nothing downstream depends on the format: plans are built from the
  * returned DataFrame, so pushdown/pruning work identically.
  */
trait TableIO {
  def read(spark: SparkSession, table: String): DataFrame
  /** Replace the table's contents (fresh-run sink). */
  def write(df: DataFrame, table: String): Unit
  /** Append to the table (resumed-run sink: the committed output of the
    * prior run must survive — see [[Pipeline.extractToSink]]).
    */
  def append(df: DataFrame, table: String): Unit
}

/** Parquet-backed implementation: table name = directory path. */
final class ParquetTableIO(root: String = "") extends TableIO {
  private def path(table: String): String =
    if (root.isEmpty) table else s"$root/$table"

  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(path(table))

  override def write(df: DataFrame, table: String): Unit =
    df.write.mode("overwrite").parquet(path(table))

  override def append(df: DataFrame, table: String): Unit =
    df.write.mode("append").parquet(path(table))
}

/** Catalog-backed implementation for production (Iceberg/Hive): table
  * name = catalog identifier. Compiles against the stock Spark API only —
  * the Iceberg runtime is a cluster-side jar, not a code dependency.
  */
final class CatalogTableIO extends TableIO {
  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.table(table)

  override def write(df: DataFrame, table: String): Unit =
    df.writeTo(table).createOrReplace()

  override def append(df: DataFrame, table: String): Unit =
    df.writeTo(table).append()
}

object TableIO {
  /** Sandbox default. */
  val parquet: TableIO = new ParquetTableIO()
}
