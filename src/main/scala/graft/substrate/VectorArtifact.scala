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
  *   - `codes/`     (vec_id, codes[, cell]) — the encoded corpus, written
  *     exactly as given (callers include `cell` for the pruned path).
  *   - `meta/`      one row (version, dim, m, k).
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
  * 100 TB shape: `codes` is the only corpus-sized table — write it
  * clustered by `cell` (Layout.writeClustered keyed on cell, or hive
  * partitioning at high cell counts) so a probe's candidate scan prunes
  * to the probed cells' files; centroids/codebook/meta are metadata-scale
  * and coalesce to one file each. Publishing version N+1 is a directory
  * write + repointing readers ([[loadLatest]]) — the durable twin of
  * `retrieval_serve_swap_stream`'s in-memory hot swap; old versions stay
  * readable for pinned consumers (time travel at the index level).
  */
object VectorArtifact {

  /** A reloaded serving index: the codebook re-hydrated to the driver
    * array [[PqIndex.encode]]/topK expect (bounded: m·k centroid rows —
    * the same collect discipline as PqIndex.codebookArrays), the
    * centroid/code tables as lazy parquet scans.
    */
  final case class Loaded(version: Long, dim: Int,
      centroids: DataFrame, cb: Array[Array[Array[Double]]],
      codes: DataFrame)

  def save(spark: SparkSession, base: String, version: Long, dim: Int,
      centroids: DataFrame, cb: Array[Array[Array[Double]]],
      codes: DataFrame): Unit = {
    val dir = s"$base/v=$version"
    decommit(spark, dir)
    PqIndex.codebookDf(spark, cb)
      .select(col("sub"), col("cid_code").as("cid"), col("cv"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/codebook")
    centroids.coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")
    codes.write.mode(SaveMode.Overwrite).parquet(s"$dir/codes")
    // meta is written LAST and its _SUCCESS marker is the COMMIT RECORD:
    // versions() ignores v= directories without it, so a concurrent
    // reader can never dereference a half-written publish, and a save()
    // that crashes mid-write leaves an INVISIBLE orphan (re-publish the
    // same version to repair) instead of wedging loadLatest.
    spark.range(1)
      .select(lit(version).as("version"), lit(dim).as("dim"),
        lit(cb.length).as("m"), lit(cb.head.length).as("k"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/meta")
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
    Loaded(meta.getAs[Long]("version"), meta.getAs[Int]("dim"),
      spark.read.parquet(s"$dir/centroids"), cb,
      spark.read.parquet(s"$dir/codes"))
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
    * version to dereference. Driver-side directory deletes,
    * metadata-scale; pinned consumers of a dropped version fail loudly
    * at load (missing directory), the same contract as a vacuumed
    * snapshot. Anchor: "defined and ENFORCED data retention and
    * deletion schedules" (`factors/requirements.yaml:197-199`) applied
    * to the artifact store.
    */
  def vacuum(spark: SparkSession, base: String,
      keepLatest: Int): Seq[Long] = {
    require(keepLatest >= 1, "vacuum must keep at least one version")
    val vs = versions(spark, base)
    val drop = vs.dropRight(keepLatest)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    drop.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$base/v=$v"), true)
    }
    drop
  }
}
