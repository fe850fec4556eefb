package graft.substrate

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The vector serving index as a PERSISTED, version-stamped set of
  * lakehouse tables — the durable form of what the in-JVM entries memoize
  * (DerivationCache) and the serve-swap stream holds in an
  * AtomicReference. Reference anchor: "consumable" serving artifacts that
  * outlive the job that built them (`factors/2-consumable.md:9`) and
  * version-pinned data (`factors/4-correlated.md`'s version coverage)
  * applied to the INDEX itself.
  *
  * Layout under `<base>/v=<version>/`:
  *   - `centroids/` (cell BIGINT, cv ARRAY<DOUBLE>) — the coarse
  *     quantizer [[IvfPq.servingCentroids]] hands to probeCellsFrom.
  *   - `codebook/`  (sub, cid, cv) — the PQ codebooks, m·k skinny rows.
  *   - `codes/`     (vec_id, codes[, cell]) — the code FILES this
  *     version newly wrote: the whole corpus for [[save]]/
  *     [[saveClustered]], only the changed cells' rows for
  *     [[publishIncremental]], only the appended batch for
  *     [[appendPublish]]. [[saveClustered]] and the incremental forms
  *     hive-partition by a `pcell` copy of `cell` so a cell's rows are
  *     addressable FILES (`cell` stays a data column — explicit-path
  *     manifest reads don't see hive dirs).
  *   - `manifest/`  (file, cell) rows pinning this version's COMPLETE
  *     code-file set — rows may point into EARLIER versions' `codes/`
  *     dirs (file sharing: the Iceberg/Delta manifest discipline,
  *     `SnapshotStore.manifestFor`'s geometry applied to the index
  *     artifact). [[load]] resolves codes from the manifest when
  *     present, the bare `codes/` dir otherwise (legacy).
  *   - `meta/`      one row (version, dim, m, k, source_version) —
  *     source_version is the publish's PROVENANCE: the version whose
  *     files an incremental/append publish shares, or the version
  *     whose corpus snapshot trained a from-scratch publish (Factor
  *     4's source→decision traceability applied to the engine's own
  *     derived artifacts, `factors/requirements.yaml:128-130`).
  *
  * Why tables and not a binary blob: every piece is already relational,
  * so the artifact inherits the lakehouse's machinery for free —
  * snapshot/manifest pinning (substrate.Snapshot), compaction
  * (substrate.Layout), schema evolution, and predicate pushdown into the
  * code table. Parquet round-trips IEEE-754 doubles bit-exactly, so a
  * reloaded index serves IDENTICAL rankings to the one just built — the
  * `ann_stored_index` registry entry hashes that claim cross-engine, and
  * VectorArtifactSpec pins save→load equality piecewise.
  *
  * 100 TB shape: `codes` is the only corpus-sized table — [[saveClustered]]
  * writes it hive-partitioned by cell so a probe's candidate scan prunes
  * to the probed cells' files; centroids/codebook/meta/manifest are
  * metadata-scale and coalesce to one file each. Publishing version N+1
  * is a directory write + repointing readers ([[loadLatest]]) — the
  * durable twin of `retrieval_serve_swap_stream`'s in-memory hot swap;
  * old versions stay readable for pinned consumers (time travel at the
  * index level). Crucially, a publish after `index_refresh_selective`
  * (19.9% of rows re-encoded at the r11 fixture) writes ONLY the flagged
  * cells' files and manifest-shares the rest from v=N
  * ([[publishIncremental]]) — without that, the selective refresh's
  * compute saving was followed by a 100% durable rewrite, and at 100 TB
  * with a drift-cadence refresh loop the publish I/O dominates
  * (VERDICT r11 what's-missing #1).
  */
object VectorArtifact {

  /** A reloaded serving index: the codebook re-hydrated to the driver
    * array [[PqIndex.encode]]/topK expect (bounded: m·k centroid rows —
    * the same collect discipline as PqIndex.codebookArrays), the
    * centroid/code tables as lazy parquet scans.
    */
  final case class Loaded(version: Long, dim: Int,
      centroids: DataFrame, cb: Array[Array[Array[Double]]],
      codes: DataFrame, sourceVersion: Option[Long] = None)

  def save(spark: SparkSession, base: String, version: Long, dim: Int,
      centroids: DataFrame, cb: Array[Array[Array[Double]]],
      codes: DataFrame, sourceVersion: Option[Long] = None): Unit = {
    val dir = s"$base/v=$version"
    requireUnreferenced(spark, base, version)
    decommit(spark, dir)
    writeSkinny(spark, dir, centroids, cb)
    codes.write.mode(SaveMode.Overwrite).parquet(s"$dir/codes")
    // unclustered layout: the manifest pins this version's own files,
    // cell unknown (null) — load round-trips through it all the same
    writeManifest(spark, dir,
      listParquetFiles(spark, s"$dir/codes").map(f => (f, None)))
    writeMeta(spark, dir, version, dim, cb, sourceVersion)
  }

  /** [[save]] with the 100 TB codes layout: `codes` must carry a `cell`
    * column; rows are repartitioned BY cell and hive-partitioned on a
    * `pcell` copy, so each cell's rows are addressable files that a
    * probe prunes to and — the point — that a later
    * [[publishIncremental]] can SHARE untouched. `cell` stays a data
    * column (manifest reads are explicit-path and would lose a hive-only
    * column).
    */
  def saveClustered(spark: SparkSession, base: String, version: Long,
      dim: Int, centroids: DataFrame, cb: Array[Array[Array[Double]]],
      codes: DataFrame, sourceVersion: Option[Long] = None): Unit = {
    val dir = s"$base/v=$version"
    requireUnreferenced(spark, base, version)
    decommit(spark, dir)
    writeSkinny(spark, dir, centroids, cb)
    writeCellFiles(spark, dir, codes)
    writeManifest(spark, dir, listCellFiles(spark, s"$dir/codes"))
    writeMeta(spark, dir, version, dim, cb, sourceVersion)
  }

  /** The INCREMENTAL durable publish (VERDICT r11 what's-missing #1 /
    * next #1): after a selective refresh re-encoded only the flagged
    * cells, version N+1 writes ONLY those cells' files and
    * manifest-shares every other cell's files from version
    * `fromVersion` — bytes written ∝ drifted fraction, not corpus size.
    * Data files stay immutable (`factors/requirements.yaml:136-138`);
    * the new manifest is the only record that "moves", and the meta-last
    * commit keeps the publish reader-atomic.
    *
    * Correctness contract (the `ann_stored_index_incremental` oracle
    * hashes it): the loaded v=N+1 code set equals a from-scratch full
    * encode iff `changedCells` covers every cell whose MEMBERSHIP or
    * member vectors changed — for an update batch that is the union of
    * the updated rows' old and new cells (rows in untouched cells are
    * bit-identical to v=N's files). `changedCodes` must hold exactly the
    * changed cells' CURRENT rows (all members, re-encoded), with a
    * `cell` column.
    *
    * @param changedCells bounded (a governance/refresh batch of cell
    *        ids — driver-side, like the compaction plan's bin list).
    */
  def publishIncremental(spark: SparkSession, base: String, version: Long,
      fromVersion: Long, dim: Int, centroids: DataFrame,
      cb: Array[Array[Array[Double]]], changedCodes: DataFrame,
      changedCells: Seq[Long]): Unit = {
    require(changedCells.nonEmpty,
      "publishIncremental with no changed cells — re-point readers at " +
        s"v=$fromVersion instead of publishing an identical version")
    val prev = readManifest(spark, base, fromVersion)
    require(prev.forall(_._2.isDefined),
      s"v=$fromVersion is not cell-clustered (manifest has cell-less " +
        "files) — incremental publish needs saveClustered ancestry")
    val dir = s"$base/v=$version"
    requireUnreferenced(spark, base, version)
    decommit(spark, dir)
    writeSkinny(spark, dir, centroids, cb)
    writeCellFiles(spark, dir, changedCodes)
    val fresh = listCellFiles(spark, s"$dir/codes")
    val freshCells = fresh.flatMap(_._2).toSet
    require(freshCells.subsetOf(changedCells.toSet),
      s"changedCodes wrote cells ${freshCells -- changedCells.toSet} " +
        "outside changedCells — the shared files would double-count them")
    val shared = prev.filter(_._2.exists(c => !changedCells.contains(c)))
    writeManifest(spark, dir, shared ++ fresh)
    writeMeta(spark, dir, version, dim, cb, Some(fromVersion))
  }

  /** APPEND publish — the durable write-side of streaming ingest
    * (`vector_ingest_stream`'s frozen-codebook per-batch codes folded
    * into the artifact store): version N+1 = version N's entire file set
    * (manifest-shared, zero data I/O) PLUS the new batch's files. The
    * centroids/codebook are re-written from the passed (frozen) values —
    * metadata-scale; the corpus-sized table is never touched.
    * `newCodes` must carry `cell` (assigned against the frozen
    * centroids) and only NEW vec_ids — an append cannot supersede a row
    * (that is [[publishIncremental]]'s update contract).
    */
  def appendPublish(spark: SparkSession, base: String, version: Long,
      fromVersion: Long, dim: Int, centroids: DataFrame,
      cb: Array[Array[Array[Double]]], newCodes: DataFrame): Unit = {
    val prev = readManifest(spark, base, fromVersion)
    require(prev.forall(_._2.isDefined),
      s"v=$fromVersion is not cell-clustered — append needs " +
        "saveClustered ancestry")
    val dir = s"$base/v=$version"
    requireUnreferenced(spark, base, version)
    decommit(spark, dir)
    writeSkinny(spark, dir, centroids, cb)
    writeCellFiles(spark, dir, newCodes)
    writeManifest(spark, dir,
      prev ++ listCellFiles(spark, s"$dir/codes"))
    writeMeta(spark, dir, version, dim, cb, Some(fromVersion))
  }

  private def writeSkinny(spark: SparkSession, dir: String,
      centroids: DataFrame, cb: Array[Array[Array[Double]]]): Unit = {
    PqIndex.codebookDf(spark, cb)
      .select(col("sub"), col("cid_code").as("cid"), col("cv"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/codebook")
    centroids.coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")
  }

  /** Write `codes` (vec_id, codes, cell, ...) repartitioned by cell and
    * hive-partitioned on a `pcell` copy — one file per cell, each cell's
    * rows colocated (the clustered layout every probe and every
    * incremental publish depends on).
    */
  private def writeCellFiles(spark: SparkSession, dir: String,
      codes: DataFrame): Unit = {
    require(codes.columns.contains("cell"),
      "clustered publish needs a `cell` column on codes")
    codes.withColumn("pcell", col("cell"))
      .repartition(col("cell"))
      .write.partitionBy("pcell")
      .mode(SaveMode.Overwrite).parquet(s"$dir/codes")
  }

  private def writeMeta(spark: SparkSession, dir: String, version: Long,
      dim: Int, cb: Array[Array[Array[Double]]],
      sourceVersion: Option[Long]): Unit = {
    // meta is written LAST and its _SUCCESS marker is the COMMIT RECORD:
    // versions() ignores v= directories without it, so a concurrent
    // reader can never dereference a half-written publish, and a save()
    // that crashes mid-write leaves an INVISIBLE orphan (re-publish the
    // same version to repair) instead of wedging loadLatest.
    spark.range(1)
      .select(lit(version).as("version"), lit(dim).as("dim"),
        lit(cb.length).as("m"), lit(cb.head.length).as("k"),
        lit(sourceVersion.map(Long.box).orNull).cast("long")
          .as("source_version"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/meta")
  }

  private def writeManifest(spark: SparkSession, dir: String,
      rows: Seq[(String, Option[Long])]): Unit = {
    import spark.implicits._
    rows.map { case (f, c) => (f, c.map(Long.box).orNull: java.lang.Long) }
      .toDF("file", "cell")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/manifest")
  }

  /** A committed version's manifest rows, driver-side (metadata-scale:
    * O(#files)). Empty Seq when the version predates manifests (legacy
    * layout — its codes are its own directory).
    */
  def readManifest(spark: SparkSession, base: String,
      version: Long): Seq[(String, Option[Long])] = {
    val p = new org.apache.hadoop.fs.Path(s"$base/v=$version/manifest")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else spark.read.parquet(p.toString).collect().toSeq
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1))))
  }

  /** Recursive *.parquet listing under `path` (absolute paths) — the
    * same driver-side metadata walk as Layout.listFiles, descending into
    * hive `pcell=` dirs.
    */
  private def listParquetFiles(spark: SparkSession,
      path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else {
      def walk(d: org.apache.hadoop.fs.Path): Seq[String] =
        fs.listStatus(d).toSeq.flatMap { s =>
          if (s.isDirectory) walk(s.getPath)
          else if (s.getPath.getName.endsWith(".parquet"))
            Seq(s.getPath.toUri.getPath)
          else Seq.empty
        }
      walk(p)
    }
  }

  /** (file, cell) rows for a hive-partitioned codes dir: the cell comes
    * from the `pcell=` path segment each file sits under.
    */
  private def listCellFiles(spark: SparkSession,
      path: String): Seq[(String, Option[Long])] =
    listParquetFiles(spark, path).map { f =>
      val cell = f.split('/').reverse.collectFirst {
        case seg if seg.startsWith("pcell=") =>
          seg.stripPrefix("pcell=").toLong
      }
      (f, cell)
    }

  /** DECOMMIT a version before (re)writing its data tables: delete the
    * meta directory (the commit record) FIRST, so the version is
    * invisible to [[versions]]/[[loadLatest]] for the whole rewrite and
    * the reader-atomic publish contract holds for RE-publishes too, not
    * just first-time publishes and crashed orphans (ADVICE r11 medium —
    * previously the stale `meta/_SUCCESS` stayed visible while the data
    * tables were overwritten underneath a concurrent load).
    */
  private def decommit(spark: SparkSession, dir: String): Unit = {
    val meta = new org.apache.hadoop.fs.Path(s"$dir/meta")
    val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(meta)) fs.delete(meta, true)
  }

  /** Guard every (re)publish of `version`: a LATER committed version's
    * manifest may pin files under `v=<version>/codes` (the sharing
    * contract), and a rewrite would silently destroy them —
    * loadLatest's scans would then throw FileNotFoundException
    * mid-query with the child still listed as committed (code-review
    * r12). The SnapshotStore.commit immutability discipline applied to
    * the artifact store: repairing an orphan or rewriting a LEAF
    * version is fine; rewriting a shared ancestor fails loudly
    * (vacuum/retire the descendants first, or publish a NEW version).
    */
  private def requireUnreferenced(spark: SparkSession, base: String,
      version: Long): Unit = {
    val needle = s"/v=$version/"
    val pinnedBy = versions(spark, base).filter(_ != version).filter(v =>
      readManifest(spark, base, v).exists(_._1.contains(needle)))
    require(pinnedBy.isEmpty,
      s"cannot rewrite v=$version: committed version(s) " +
        s"${pinnedBy.mkString(",")} manifest-share its files — " +
        "vacuum them first or publish a new version")
  }

  /** Published (= COMMITTED) versions under `base`, ascending — a
    * metadata-scale directory listing, never a data read. Only v=N
    * directories whose `meta/_SUCCESS` commit marker exists count
    * (save() writes meta last); half-written publishes and stray
    * non-numeric `v=` names are invisible rather than a crash.
    */
  def versions(spark: SparkSession, base: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("v=\\d+") &&
        fs.exists(
          new org.apache.hadoop.fs.Path(s.getPath, "meta/_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("v=").toLong).sorted
  }

  def load(spark: SparkSession, base: String, version: Long): Loaded = {
    val dir = s"$base/v=$version"
    val meta = spark.read.parquet(s"$dir/meta").collect().head
    val m = meta.getAs[Int]("m")
    val k = meta.getAs[Int]("k")
    val cb = PqIndex.codebookArrays(
      spark.read.parquet(s"$dir/codebook"), m = m, k = k)
    // codes resolve through the version's MANIFEST when present (files
    // may live under earlier versions' dirs — the sharing contract);
    // a manifest-less version is legacy layout: its own codes dir
    val mf = readManifest(spark, base, version)
    val codes =
      if (mf.nonEmpty) spark.read.parquet(mf.map(_._1): _*)
      else spark.read.parquet(s"$dir/codes")
    val src =
      if (meta.schema.fieldNames.contains("source_version") &&
        !meta.isNullAt(meta.fieldIndex("source_version")))
        Some(meta.getAs[Long]("source_version"))
      else None
    Loaded(meta.getAs[Long]("version"), meta.getAs[Int]("dim"),
      spark.read.parquet(s"$dir/centroids"), cb, codes, src)
  }

  /** Manifest-level FILE PRUNING for the probed path — the Iceberg
    * scan-planning shape: a manifest-resolved codes read is an
    * explicit-path scan, so Spark's hive partition discovery cannot
    * prune `pcell=` directories for it; pruning belongs where a table
    * format does it — in the MANIFEST. Resolve only the probed cells'
    * files (driver-side metadata filter over O(#files) rows) and scan
    * exactly those: at 100 TB an nProbe-cell query touches nProbe
    * files' worth of bytes regardless of corpus size. Fails loudly when
    * no probed cell has a file — an empty scan cannot carry a schema;
    * the caller short-circuits on empty probe sets.
    */
  def codesForCells(spark: SparkSession, base: String, version: Long,
      cells: Seq[Long]): DataFrame = {
    val mf = readManifest(spark, base, version)
    require(mf.nonEmpty, s"v=$version has no manifest — cell pruning " +
      "needs saveClustered/publishIncremental ancestry")
    require(mf.forall(_._2.isDefined),
      s"v=$version manifest carries cell-less files — not cell-clustered")
    val cellSet = cells.toSet
    val files = mf.collect { case (f, Some(c)) if cellSet(c) => f }
    require(files.nonEmpty,
      s"none of cells $cells have files in v=$version")
    spark.read.parquet(files: _*)
  }

  /** The serving tier's default dereference: the highest published
    * version — writing v=N+1 then serving loadLatest IS the durable hot
    * swap (in-flight readers keep the version they loaded).
    */
  def loadLatest(spark: SparkSession, base: String): Loaded = {
    val vs = versions(spark, base)
    require(vs.nonEmpty, s"no index versions published under $base")
    load(spark, base, vs.last)
  }

  /** Retention on the index artifact itself (the SnapshotStore.vacuum
    * discipline applied to versions): drop every published version
    * except the newest `keepLatest`, returning what was removed.
    * Refuses to remove everything — a serving tier must always have a
    * version to dereference. Driver-side metadata deletes; a dropped
    * version's code files SURVIVE while any retained version's manifest
    * pins them (the anti-join guarantee file sharing demands — an
    * incremental v=N+1 keeps reading the v=N files it shares after v=N
    * itself is vacuumed). Pinned consumers of a dropped version fail
    * loudly at load (missing meta), the same contract as a vacuumed
    * snapshot. Anchor: "defined and ENFORCED data retention and
    * deletion schedules" (`factors/requirements.yaml:197-199`) applied
    * to the artifact store.
    */
  /** Phase 1 of the TWO-PHASE drop (VERDICT r11 next #8 — the grace
    * contract real table formats give pinned readers): RETIRE every
    * version except the newest `keepLatest` by deleting only its meta
    * commit record. The version disappears from [[versions]]/
    * [[loadLatest]] immediately — no NEW reader can dereference it —
    * but its data files and manifest stay on disk, so an IN-FLIGHT
    * reader holding a [[Loaded]] keeps serving to completion instead of
    * failing mid-query. Phase 2 ([[purgeRetired]]) reclaims the bytes
    * after the deployment's grace window. A one-shot [[vacuum]] remains
    * the no-grace form.
    */
  def retire(spark: SparkSession, base: String,
      keepLatest: Int): Seq[Long] = {
    require(keepLatest >= 1, "retire must keep at least one version")
    val vs = versions(spark, base)
    val drop = vs.dropRight(keepLatest)
    drop.foreach(v => decommit(spark, s"$base/v=$v"))
    drop
  }

  /** Phase 2: reclaim every RETIRED (or crash-orphaned) version's
    * storage — v= directories without a meta commit record — keeping
    * any code file a still-committed version's manifest pins (the
    * [[vacuum]] anti-join). Call after the grace window; in-flight
    * readers of a purged version fail loudly from here on, the
    * documented end of the contract.
    */
  def purgeRetired(spark: SparkSession, base: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    val committed = versions(spark, base).toSet
    val retired = fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("v=\\d+"))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .filterNot(committed).sorted
    val pinned: Set[String] = committed.toSeq
      .flatMap(v => readManifest(spark, base, v).map(_._1)).toSet
    retired.foreach { v =>
      val dir = s"$base/v=$v"
      Seq("manifest", "codebook", "centroids").foreach { d =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$d"), true)
      }
      val (keep, del) = listParquetFiles(spark, s"$dir/codes")
        .partition(pinned.contains)
      del.foreach(f => fs.delete(new org.apache.hadoop.fs.Path(f), false))
      if (keep.isEmpty) fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    }
    retired
  }

  def vacuum(spark: SparkSession, base: String,
      keepLatest: Int): Seq[Long] = {
    // the no-grace form IS the two-phase drop run back to back
    // (code-review r12: one retention body, not two copies to keep in
    // sync) — retire decommits atomically, purgeRetired reclaims every
    // decommitted/orphaned version's unshared files behind the
    // retained-manifest anti-join
    val drop = retire(spark, base, keepLatest)
    purgeRetired(spark, base)
    drop
  }
}
