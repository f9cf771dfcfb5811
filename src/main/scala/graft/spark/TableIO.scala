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
  /** Name of a small sidecar table stored logically beside `table` (the
    * persisted lineage, [[Pipeline.extractToSink]]). Catalog identifiers
    * get a `_suffix` sibling table; the parquet implementation nests an
    * underscore-prefixed subdirectory, which Spark's file listing skips
    * when scanning the parent, so the sidecar travels with the sink.
    */
  def sidecar(table: String, suffix: String): String = table + "_" + suffix
  /** Row count WITHOUT a data scan — the consistency probe for
    * sidecar-vs-sink validation ([[Lineage.doneSet]]). On parquet a
    * count(*) is answered from row-group footers (no column data read);
    * on Iceberg it is O(1) from the snapshot summary's total-records.
    */
  def countRows(spark: SparkSession, table: String): Long =
    read(spark, table).count()

  /** Commit `main` plus its derived sidecar as ONE LOGICAL COMMIT from
    * the resume contract's point of view. `sidecarOf` receives the
    * COMMITTED table (sidecar content derives from committed state only —
    * the exactly-once-under-retry property). Returns the committed table.
    *
    * Default implementation: sink first, then sidecar overwrite. A crash
    * between the two leaves a STALE sidecar — that window is part of the
    * contract, defended downstream: [[Lineage.doneSet]] validates the
    * sidecar against the sink's metadata row count and falls back to the
    * committed-output scan on any mismatch (crash-window contract-tested
    * for both the parquet and catalog implementations in PipelineSpec).
    * The sink-THEN-sidecar order is load-bearing: the reverse order could
    * leave a sidecar claiming buckets the sink never committed, which the
    * count probe would also catch — but only by discarding resume
    * savings on every crash instead of only sidecar-window crashes.
    * A catalog backend with real multi-table transactions (e.g. an
    * Iceberg REST catalog) overrides this to commit both tables in one
    * transaction; the stock Spark API exposes no such commit, so the
    * default encodes ordering + validation rather than pretending
    * atomicity it cannot have.
    */
  def commitWithSidecar(main: DataFrame, table: String,
      sidecarOf: DataFrame => DataFrame, suffix: String, resume: Boolean): DataFrame = {
    if (resume) append(main, table) else write(main, table)
    val written = read(main.sparkSession, table)
    write(sidecarOf(written), sidecar(table, suffix))
    written
  }

  /** Drop a table (compaction staging cleanup). */
  def drop(spark: SparkSession, table: String): Unit

  /** Compact `table` into `targetPartitions` output partitions — the
    * small-files maintenance a long-lived appended sink needs: every
    * resumed run appends its own file set, and at 10^12-doc scale an
    * uncompacted sink's file count (and with it scan planning time and
    * per-file open cost) grows without bound. Content is preserved
    * EXACTLY, so content-derived sidecars (the `_lineage` resume
    * contract) remain valid — [[Lineage.doneSet]]'s count probe passes
    * before and after.
    *
    * Default implementation (catalog backends): stage the coalesced scan
    * as a sibling staging table, validate its row count against the
    * source's metadata count, then atomically replace `table` from
    * staging (RTAS — atomic on Iceberg, the production path) and drop
    * staging. A crash before the replace leaves `table` untouched; after
    * it, staging is garbage a later compact run overwrites.
    * The parquet implementation overrides with a rename swap (no second
    * data write, dir-nested sidecars preserved — see [[ParquetTableIO]]).
    *
    * Returns (rows, partitions-or-files after) for the caller's
    * observability surface ([[graft.spark.Coverage]]).
    */
  def compact(spark: SparkSession, table: String, targetPartitions: Int): (Long, Long) = {
    require(targetPartitions > 0, s"targetPartitions=$targetPartitions")
    val staging = table + "__compacting"
    val before = countRows(spark, table)
    write(read(spark, table).coalesce(targetPartitions), staging)
    require(countRows(spark, staging) == before,
      s"compact: staging row count != $before for $table — aborting before replace")
    write(read(spark, staging), table)
    drop(spark, staging)
    val after = countRows(spark, table)
    require(after == before, s"compact: $table has $after rows after replace, expected $before")
    (before, targetPartitions.toLong)
  }
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

  override def sidecar(table: String, suffix: String): String =
    table + "/_" + suffix

  override def drop(spark: SparkSession, table: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path(table))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** Parquet compaction: ONE data write + a rename swap.
    *
    *   1. write the coalesced scan to a sibling staging dir,
    *   2. validate staging's footer count against the source's,
    *   3. swap: `table` → `table__pre_compact`, staging → `table`, move
    *      the old dir's `_*` sidecar subdirs (lineage etc.) into the new
    *      one (renames, not copies), drop `__pre_compact`.
    *
    * Crash recovery is by directory presence, every window re-runnable:
    * before step 3 the source is untouched (staging is garbage); a crash
    * inside step 3 leaves `__pre_compact` holding the original — restore
    * is a rename back. Sidecars survive by rename, and stay VALID because
    * compaction preserves content exactly (the `_lineage` count probe
    * passes unchanged). Returns (rows, data files after).
    */
  override def compact(spark: SparkSession, table: String,
      targetPartitions: Int): (Long, Long) = {
    require(targetPartitions > 0, s"targetPartitions=$targetPartitions")
    import org.apache.hadoop.fs.Path
    val main = new Path(path(table))
    val staging = new Path(path(table + "__compacting"))
    val pre = new Path(path(table + "__pre_compact"))
    val fs = main.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(pre),
      s"compact: $pre exists — a previous compaction crashed mid-swap; " +
        "restore it (rename back over the target) before compacting again")
    val before = countRows(spark, table)
    write(read(spark, table).coalesce(targetPartitions), table + "__compacting")
    require(countRows(spark, table + "__compacting") == before,
      s"compact: staging row count != $before for $table — aborting before swap")
    val sidecars = fs.listStatus(main)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("_"))
      .map(_.getPath.getName)
    require(fs.rename(main, pre), s"compact: rename $main -> $pre failed")
    require(fs.rename(staging, main), s"compact: rename $staging -> $main failed")
    sidecars.foreach { name =>
      require(fs.rename(new Path(pre, name), new Path(main, name)),
        s"compact: sidecar $name move failed — sink is compacted and valid, " +
          "sidecar recoverable under " + pre)
    }
    val after = countRows(spark, table)
    require(after == before, s"compact: $table has $after rows after swap, expected $before")
    fs.delete(pre, true)
    val nFiles = fs.listStatus(main)
      .count(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
    (before, nFiles.toLong)
  }
}

/** Catalog-backed implementation for production (Iceberg/Hive): table
  * name = catalog identifier. Compiles against the stock Spark API only —
  * the Iceberg runtime is a cluster-side jar, not a code dependency.
  */
final class CatalogTableIO extends TableIO {
  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.table(table)

  override def write(df: DataFrame, table: String): Unit =
    try df.writeTo(table).createOrReplace()
    catch {
      // atomic REPLACE TABLE AS SELECT needs a catalog that supports it
      // (Iceberg does — that's the production path); the stock session
      // catalog does not, so fall back to non-atomic drop + create there
      case e: org.apache.spark.sql.AnalysisException
          if String.valueOf(e.getCondition).startsWith("UNSUPPORTED_FEATURE") =>
        df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
        df.writeTo(table).create()
    }

  override def append(df: DataFrame, table: String): Unit =
    try df.writeTo(table).append()
    catch {
      // V2 AppendData requires a V2 table; the stock session catalog hands
      // back v1 parquet tables (_LEGACY_ERROR_TEMP_1012 "Cannot write into
      // v1 table"), where the V1 writer's append is the supported path.
      // Iceberg tables are V2, so production appends stay on writeTo.
      case e: org.apache.spark.sql.AnalysisException
          if String.valueOf(e.getCondition).startsWith("UNSUPPORTED_FEATURE") ||
            e.getCondition == "_LEGACY_ERROR_TEMP_1012" =>
        df.write.mode("append").saveAsTable(table)
    }

  override def drop(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")
}

object TableIO {
  /** Sandbox default. */
  val parquet: TableIO = new ParquetTableIO()
}
