package graft.substrate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-pinned snapshot reads over an immutable-file store — the
  * data-level mechanism behind Factor 4's version coverage (reference
  * `factors/requirements.yaml:136-138`, immutable version ids; cf.
  * `4-correlated.md`'s reproducibility framing): a TABLE here is a set of
  * immutable data files plus a MANIFEST of (version, file) rows naming
  * which files each version comprises. A commit appends manifest rows and
  * never mutates data files: an append commit pins the previous version's
  * files PLUS the new ones; a compaction commit pins ONLY the rewritten
  * files, leaving every earlier version reading its original files — so a
  * training run pinned to version N reproduces its exact input while
  * ingest and maintenance move the table forward. Time travel is a
  * manifest filter, never a data copy.
  *
  * Scale shape: the manifest is metadata — O(#files) rows per version,
  * the same bookkeeping an Iceberg/Hive-style table format keeps.
  * [[readAt]] resolves one version's file list driver-side (a
  * metadata-scale collect, like [[Layout]]'s plan listings) and hands
  * Spark the explicit paths, so the scan touches exactly that version's
  * files with no directory listing or partition discovery at read time.
  * [[vacuum]] is pure manifest algebra: the files NO retained version
  * references — the only files a cleaner may delete; a file shared by a
  * retained and a dropped version survives (the anti-join guarantees it).
  */
object SnapshotStore {

  /** Manifest rows pinning `version` to the *.parquet files currently
    * under `paths` (full path per row — the manifest must stay valid if
    * read from elsewhere). List-once discipline: the caller commits the
    * returned rows immediately; files added to a directory later belong
    * to LATER versions (the Layout.compact plan/member-list contract).
    */
  def manifestFor(spark: SparkSession, version: Long,
      paths: Seq[String]): DataFrame =
    paths.map(p => Layout.listFiles(spark, p)).reduce(_ unionByName _)
      .select(lit(version).as("version"),
        concat_ws("/", col("part"), col("file")).as("file"))

  /** The table as of `version`: resolve its file list (metadata-scale
    * collect) and scan exactly those files. Fails loudly on an unknown
    * or empty version — an empty scan would silently read as an empty
    * table.
    */
  def readAt(spark: SparkSession, manifest: DataFrame,
      version: Long): DataFrame = {
    val files = manifest.filter(col("version") === version)
      .select("file").distinct().collect().map(_.getString(0))
    require(files.nonEmpty, s"snapshot version $version unknown or empty")
    spark.read.parquet(files.toIndexedSeq: _*)
  }

  /** Files referenced by NO version in `keep` — the deletable set after
    * dropping every other version. Anti-join semantics make shared files
    * safe by construction: one retained reference keeps a file alive.
    */
  def vacuum(manifest: DataFrame, keep: Seq[Long]): DataFrame =
    manifest.select("file").distinct()
      .join(manifest.filter(col("version").isin(keep: _*)).select("file"),
        Seq("file"), "left_anti")

  /** Files in `toV` that `fromV` does not reference — the file-level
    * incremental-consumption set: after an APPEND commit this is exactly
    * the delta's files, so a downstream consumer reads O(|delta|) bytes
    * instead of re-scanning the table (the manifest diff costs O(#files)
    * metadata rows, never data). After a COMPACTION commit it is the
    * whole rewritten set — file-level diff is only as incremental as the
    * commits are append-only, which is why maintenance rewrites should
    * pair with row-level diffing (TableDiff/Cdc) for consumers that
    * cannot re-read.
    */
  def changedFiles(manifest: DataFrame, fromV: Long, toV: Long): DataFrame =
    manifest.filter(col("version") === toV).select("file")
      .join(manifest.filter(col("version") === fromV).select("file"),
        Seq("file"), "left_anti")

  /** Scan of exactly [[changedFiles]]' paths. Fails loudly when nothing
    * changed — an empty path list cannot produce a schema'd scan; a
    * no-change window is for the caller to short-circuit on
    * changedFiles' count.
    */
  def readChanged(spark: SparkSession, manifest: DataFrame,
      fromV: Long, toV: Long): DataFrame = {
    val files = changedFiles(manifest, fromV, toV)
      .collect().map(_.getString(0))
    require(files.nonEmpty,
      s"no files changed between versions $fromV and $toV")
    spark.read.parquet(files.toIndexedSeq: _*)
  }
}
