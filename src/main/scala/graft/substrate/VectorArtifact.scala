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
  *   - `meta/`      one row (version, dim, m, k, source_version,
  *     corpus_base, corpus_version) — source_version is the publish's
  *     OWN-ANCESTRY provenance (the version whose files a derived
  *     publish shares); corpus_base/corpus_version pin the CORPUS
  *     snapshot (a SnapshotStore base + version) whose data trained
  *     the codebook — the cross-store edge SnapshotStore's guarded
  *     vacuum walks (Factor 4's source→decision traceability,
  *     `factors/requirements.yaml:128-130`).
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
    * centroid/code tables as lazy parquet scans. `corpusBase`/
    * `corpusVersion` name the CORPUS snapshot (a [[SnapshotStore]]
    * base + version) whose data trained this index's codebook — the
    * cross-store provenance link Factor 4's source→decision
    * traceability asks for (`factors/requirements.yaml:128-130`,
    * VERDICT r12 next #6).
    */
  final case class Loaded(version: Long, dim: Int,
      centroids: DataFrame, cb: Array[Array[Array[Double]]],
      codes: DataFrame, sourceVersion: Option[Long] = None,
      corpusBase: Option[String] = None,
      corpusVersion: Option[Long] = None)

  /** In-JVM claim serialization for [[stagedPublish]] — see
    * SnapshotStore.commitLocks for the contract. STRIPED (code-review
    * r13): a per-(base, version) map grows a monitor per publish for
    * the JVM lifetime; 64 hash stripes bound the memory. [[purgeRetired]]
    * takes the same stripe before destroying a version's remains.
    */
  private val claimLocks = Array.fill(64)(new Object)
  private def lockFor(base: String, version: Long): Object =
    claimLocks(math.floorMod(s"$base#v=$version".hashCode, 64))

  /** The stage-then-claim publish protocol every publish form commits
    * through (VERDICT r12 next #1 — optimistic concurrency): `write`
    * lays the COMPLETE version (skinny tables, codes, manifest, meta)
    * under an invisible `.stage-v=N-<uuid>` directory, then one rename
    * claims `v=N`. Two racing publishers of the same version stage
    * independently and exactly one rename wins; the loser gets a
    * [[CommitConflictException]] and its stage is cleaned up — writes
    * can never interleave under one version directory. A publish that
    * crashes mid-stage leaves the PREVIOUS commit serving untouched
    * (strictly stronger than the r12 decommit-first rewrite, which left
    * the version invisible until repair).
    *
    * Re-publish vs race is the CALLER's intent, never arrival timing
    * (`allowRepublish`): only [[save]]/[[saveClustered]] may
    * deliberately swap a committed version (leaf rewrite / orphan
    * repair), and only one that was ALREADY committed when this publish
    * began. A DERIVED publish (append/incremental/delete/compact)
    * derives from a `fromVersion` and claims a NEW version — finding its
    * target committed, whenever that happens, means a racer won and the
    * intent is STALE; it must fail with the named conflict and be
    * re-derived at N+1 ([[retryPublish]]). The r13 first cut measured
    * `committedAtStart` at stage entry for every form, which conflated
    * the two: a racer that arrived AFTER the winner's claim (the
    * compactor doing more pre-stage work than the appender — found by
    * `ann_stored_index_concurrent`'s requires on first run) classified
    * itself as a deliberate re-publish and silently clobbered the
    * winner's commit — a lost update under a green commit. `finalize`
    * rewrites a staged file's qualified URI to the path it will hold
    * after the claim — manifest rows must carry FINAL paths.
    */
  private def stagedPublish(spark: SparkSession, base: String,
      version: Long, allowRepublish: Boolean = false)(
      write: (String, String => String) => Unit): Unit = {
    val finalDir = s"$base/v=$version"
    val fp = new org.apache.hadoop.fs.Path(finalDir)
    val fs = fp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committedAtEntry = versions(spark, base).contains(version)
    val committedAtStart = allowRepublish && committedAtEntry
    if (!allowRepublish && committedAtEntry)
      throw new CommitConflictException(
        s"v=$version under $base is already committed — a derived " +
          "publish claims a NEW version; this intent is stale (a " +
          "concurrent publisher won) — re-derive it at the next version")
    val stage = new org.apache.hadoop.fs.Path(
      s"$base/.stage-v=$version-${java.util.UUID.randomUUID()}")
    val qStage = fs.makeQualified(stage).toString
    val qFinal = fs.makeQualified(fp).toString
    val finalize = (f: String) =>
      if (f.startsWith(qStage)) qFinal + f.stripPrefix(qStage) else f
    val lock = lockFor(base, version)
    try {
      write(stage.toString, finalize)
      lock.synchronized {
        if (!committedAtStart && versions(spark, base).contains(version))
          throw new CommitConflictException(
            s"v=$version under $base was committed by a concurrent " +
              "publisher while this publish was staging — exactly one " +
              "committer claims a version; retry at the next version")
        requireUnreferenced(spark, base, version)
        if (fs.exists(fp)) { decommit(spark, finalDir); fs.delete(fp, true) }
        if (!fs.rename(stage, fp))
          throw new CommitConflictException(
            s"claiming v=$version under $base failed: a concurrent " +
              "committer won the rename race")
      }
    } finally {
      if (fs.exists(stage)) fs.delete(stage, true)
    }
  }

  /** @param corpus the SnapshotStore (base, version) whose corpus
    *        snapshot trained this publish's codebook — stamped into meta
    *        as `corpus_base`/`corpus_version` (cross-store provenance;
    *        None = untracked corpus). Derived publishes
    *        ([[publishIncremental]]/[[appendPublish]]/[[deletePublish]]/
    *        [[compactPublish]]) INHERIT it from their ancestor — their
    *        codebook is frozen, so the training corpus is unchanged.
    */
  def save(spark: SparkSession, base: String, version: Long, dim: Int,
      centroids: DataFrame, cb: Array[Array[Array[Double]]],
      codes: DataFrame, sourceVersion: Option[Long] = None,
      corpus: Option[(String, Long)] = None): Unit = {
    requireUnreferenced(spark, base, version) // fail fast, pre-stage
    stagedPublish(spark, base, version,
        allowRepublish = true) { (stage, finalize) =>
      writeSkinny(spark, stage, centroids, cb)
      codes.write.mode(SaveMode.Overwrite).parquet(s"$stage/codes")
      // unclustered layout: the manifest pins this version's own files,
      // cell unknown (null) — load round-trips through it all the same
      writeManifest(spark, stage,
        listParquetFiles(spark, s"$stage/codes")
          .map(f => (finalize(f), None)))
      writeMeta(spark, stage, version, dim, cb, sourceVersion, corpus)
    }
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
      codes: DataFrame, sourceVersion: Option[Long] = None,
      corpus: Option[(String, Long)] = None): Unit = {
    requireUnreferenced(spark, base, version) // fail fast, pre-stage
    stagedPublish(spark, base, version,
        allowRepublish = true) { (stage, finalize) =>
      writeSkinny(spark, stage, centroids, cb)
      writeCellFiles(spark, stage, codes)
      writeManifest(spark, stage,
        listCellFiles(spark, s"$stage/codes")
          .map { case (f, c) => (finalize(f), c) })
      writeMeta(spark, stage, version, dim, cb, sourceVersion, corpus)
    }
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
      changedCells: Seq[Long]): Unit =
    publishIncrementalCore(spark, base, version, fromVersion, dim,
      centroids, cb, changedCodes, changedCells,
      dropPendingSidecars = false)

  /** The Seq-form incremental publish body, with the sidecar decision
    * explicit (r15): a plain incremental/append-derived publish CARRIES
    * pending MoR sidecars verbatim (dropping one resurrects forgotten
    * rows); only [[compactPublish]] may drop them, and only after
    * proving its rewrite covered every affected cell.
    */
  private def publishIncrementalCore(spark: SparkSession, base: String,
      version: Long, fromVersion: Long, dim: Int, centroids: DataFrame,
      cb: Array[Array[Array[Double]]], changedCodes: DataFrame,
      changedCells: Seq[Long], dropPendingSidecars: Boolean): Unit = {
    require(changedCells.nonEmpty,
      "publishIncremental with no changed cells — re-point readers at " +
        s"v=$fromVersion instead of publishing an identical version")
    val prev = requireClusteredAncestor(spark, base, version, fromVersion)
    val corpus = corpusOf(spark, base, fromVersion) // frozen cb → inherit
    requireUnreferenced(spark, base, version) // fail fast, pre-stage
    stagedPublish(spark, base, version) { (stage, finalize) =>
      writeSkinny(spark, stage, centroids, cb)
      writeCellFiles(spark, stage, changedCodes)
      val fresh = listCellFiles(spark, s"$stage/codes")
        .map { case (f, c) => (finalize(f), c) }
      val freshCells = fresh.flatMap(_._2).toSet
      val changedSet = changedCells.toSet
      require(freshCells.subsetOf(changedSet),
        s"changedCodes wrote cells ${freshCells -- changedSet} " +
          "outside changedCells — the shared files would double-count them")
      // Set membership, not Seq.contains — the split is O(F) not O(F·C)
      // (VERDICT r12 what's-wrong #2)
      val shared = prev.filter(_._2.exists(c => !changedSet.contains(c)))
      val sidecars =
        if (dropPendingSidecars) Nil
        else carriedSidecarRows(spark, base, fromVersion)
      writeManifestFull(spark, stage,
        (shared ++ fresh).map { case (f, c) => (f, c, None) } ++ sidecars)
      writeMeta(spark, stage, version, dim, cb, Some(fromVersion), corpus)
    }
  }

  /** [[publishIncremental]] with the changed-cell set as a DATAFRAME
    * (VERDICT r12 next #4 / what's-missing #4): the Seq form is right
    * for bounded governance/refresh batches, but a drift loop's flagged
    * set is (drifted fraction × #cells) and #cells ∝ corpus at constant
    * cell size — at 100 TB that is millions of ids, which must not
    * become `isin` literal trees in the caller or O(F·C) driver scans
    * here. This overload keeps the whole split relational: the share
    * split is an anti-join of the ancestor's manifest TABLE against
    * `changedCells` (broadcast — the changed set is the small side by
    * the drifted-fraction premise), the double-count guard a semi-join
    * count over the fresh listing, and the new manifest is written
    * straight from the joined plan. Same contract, same commit
    * protocol; `changedCells` needs one `cell` column.
    */
  def publishIncremental(spark: SparkSession, base: String, version: Long,
      fromVersion: Long, dim: Int, centroids: DataFrame,
      cb: Array[Array[Array[Double]]], changedCodes: DataFrame,
      changedCells: DataFrame): Unit = {
    import org.apache.spark.sql.functions.broadcast
    val cellsDf = changedCells.select(col("cell").cast("long")).distinct()
    require(!cellsDf.isEmpty,
      "publishIncremental with no changed cells — re-point readers at " +
        s"v=$fromVersion instead of publishing an identical version")
    // the ancestry gate stays RELATIONAL here (the Seq form's
    // requireClusteredAncestor collects the manifest to the driver —
    // exactly what this overload exists to avoid): committed ancestor,
    // manifest present, zero cell-less rows, strictly-forward version
    require(version > fromVersion,
      s"derived publish must move the version FORWARD: v=$version from " +
        s"v=$fromVersion — file sharing points strictly backward")
    require(versions(spark, base).contains(fromVersion),
      s"v=$fromVersion is not a committed version under $base")
    requireHeadAncestor(spark, base, fromVersion, "a derived publish")
    val prevManifest = new org.apache.hadoop.fs.Path(
      s"$base/v=$fromVersion/manifest")
    require(prevManifest
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(prevManifest),
      s"v=$fromVersion has no manifest under $base (legacy layout) — " +
        "a derived publish needs saveClustered ancestry")
    // manifest = O(#files) commit metadata: read driver-side (r17,
    // MetaIo) and serve as a LocalRelation — the broadcast joins below
    // stay relational, but no scan job is scheduled for metadata
    val prevAll = {
      val (s, r) = MetaIo.readRows(
        spark.sparkContext.hadoopConfiguration, prevManifest.toString)
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(r.asJava, s)
    }
    val hasKind = prevAll.columns.contains("kind")
    // the cluster gate checks DATA rows only — sidecar rows are
    // cell-less by design (r15)
    val prevData =
      if (hasKind) prevAll.filter(col("kind").isNull ||
        col("kind") =!= "delete")
      else prevAll
    require(prevData.filter(col("cell").isNull).isEmpty,
      s"v=$fromVersion is not cell-clustered (manifest has cell-less " +
        "files) — a derived publish needs saveClustered ancestry")
    val corpus = corpusOf(spark, base, fromVersion)
    requireUnreferenced(spark, base, version)
    stagedPublish(spark, base, version) { (stage, finalize) =>
      writeSkinny(spark, stage, centroids, cb)
      writeCellFiles(spark, stage, changedCodes)
      import spark.implicits._
      val freshDf = listCellFiles(spark, s"$stage/codes")
        .map { case (f, c) => (finalize(f), c.map(Long.box).orNull:
          java.lang.Long) }
        .toDF("file", "cell")
      val stray = freshDf.join(broadcast(cellsDf), Seq("cell"),
        "left_anti").count()
      require(stray == 0,
        s"changedCodes wrote $stray file(s) for cells outside " +
          "changedCells — the shared files would double-count them")
      // pending sidecars carry VERBATIM (r15), like the Seq form
      val carried =
        if (!hasKind) freshDf.limit(0)
          .select(col("file"), col("cell"))
          .withColumn("kind", lit(null).cast("string"))
        else prevAll.filter(col("kind") === "delete")
          .select("file", "cell", "kind")
      prevData.join(broadcast(cellsDf), Seq("cell"), "left_anti")
        .select("file", "cell")
        .unionByName(freshDf.select("file", "cell"))
        .withColumn("kind", lit(null).cast("string"))
        .unionByName(carried)
        .coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$stage/manifest")
      writeMeta(spark, stage, version, dim, cb, Some(fromVersion), corpus)
    }
  }

  /** The optimistic-concurrency RETRY LOOP around a derived publish —
    * the client half of the stage-then-claim protocol (VERDICT r12 next
    * #1's second clause: the loser "retries at N+1", not just aborts).
    * [[stagedPublish]] fails a losing racer loudly with
    * [[CommitConflictException]]; a deployed writer — the streaming
    * ingester racing the maintenance compactor, the exact two-writer
    * shape a real deployment runs — then RE-DERIVES its intent against
    * the winner's commit and claims the next version (the Iceberg/Delta
    * commit-retry discipline). `attempt` receives the CURRENT latest
    * committed version and the version to claim (latest+1) and must
    * recompute everything it publishes from that ancestor: an append
    * re-shares the new latest's manifest, a compact re-plans its
    * multi-file cells — so a retried intent COMPOSES with the winner's
    * instead of clobbering it (appendPublish/compactPublish/
    * deletePublish already take (version, fromVersion), which is why
    * the callback is shaped that way). Returns the version claimed;
    * rethrows the last conflict when contention outlasts `maxAttempts`.
    * Any non-conflict failure propagates immediately — a broken intent
    * must not be retried into a different version.
    */
  def retryPublish(spark: SparkSession, base: String,
      maxAttempts: Int = 5)(attempt: (Long, Long) => Unit): Long = {
    require(maxAttempts >= 1, "retryPublish needs at least one attempt")
    var last: CommitConflictException = null
    var i = 0
    while (i < maxAttempts) {
      val vs = versions(spark, base)
      require(vs.nonEmpty,
        s"no committed version under $base to derive a publish from")
      val from = vs.last
      try { attempt(from, from + 1); return from + 1 }
      catch { case e: CommitConflictException => last = e; i += 1 }
    }
    throw last
  }

  /** The maintenance POLICY behind [[compactPublish]] — which cells a
    * maintenance window should rewrite: every cell whose committed file
    * count exceeds `maxFilesPerCell` (after K streaming appends a hot
    * cell holds up to K files and every probed serve opens all of them —
    * the small-file proliferation OPTIMIZE exists to undo). Pure
    * manifest algebra, metadata-scale (O(#files) driver rows — the same
    * listing every publish already does); the decide→act pairing
    * mirrors `index_refresh_decision`/`_execute` and Factor 5's
    * retention: policy produces the bounded batch, [[compactPublish]]'s
    * `onlyCells` acts on it. Anchor: `factors/2-consumable.md:9`
    * (serving latency is a file-count property at scale).
    */
  def maintenanceDecision(spark: SparkSession, base: String,
      version: Long, maxFilesPerCell: Int = 1): Seq[Long] = {
    require(maxFilesPerCell >= 1,
      "a cell cannot hold fewer than one file")
    readManifest(spark, base, version).flatMap(_._2)
      .groupBy(identity).view.mapValues(_.size)
      .filter(_._2 > maxFilesPerCell).keys.toSeq.sorted
  }

  /** The shared ancestry gate of every derived publish: `fromVersion`
    * must hold a non-empty, cell-clustered manifest (an EMPTY manifest
    * would pass a bare forall vacuously and a typo'd / legacy /
    * never-committed ancestor would silently publish a version holding
    * ONLY the changed cells — ADVICE r12 medium), and `version >
    * fromVersion`: manifests may only pin files of EARLIER versions, the
    * ordering [[requireUnreferenced]]'s descendants-only sweep relies on.
    */
  /** Every derived publish must derive from the CURRENT HEAD (r14 —
    * the SnapshotStore.requireFromHead twin): a rewrite derived from an
    * older committed version carries that ancestor's manifest and
    * silently DROPS every delta published since — a lost update under a
    * green commit. A committed-but-overtaken ancestor throws the TYPED
    * conflict so [[retryPublish]] re-derives from the new head.
    */
  private def requireHeadAncestor(spark: SparkSession, base: String,
      fromVersion: Long, what: String): Unit = {
    val vs = versions(spark, base)
    if (vs.contains(fromVersion) && vs.last != fromVersion)
      throw new CommitConflictException(
        s"$what derives from v=$fromVersion but the committed head " +
          s"under $base is v=${vs.last} — the intent is stale (a " +
          "concurrent publisher advanced the store); re-derive from " +
          "the current head")
  }

  private def requireClusteredAncestor(spark: SparkSession, base: String,
      version: Long, fromVersion: Long): Seq[(String, Option[Long])] = {
    require(version > fromVersion,
      s"derived publish must move the version FORWARD: v=$version from " +
        s"v=$fromVersion — file sharing points strictly backward")
    requireHeadAncestor(spark, base, fromVersion, "a derived publish")
    val prev = readManifest(spark, base, fromVersion)
    require(prev.nonEmpty,
      s"v=$fromVersion has no manifest under $base (not committed, or " +
        "legacy manifest-less layout) — a derived publish needs " +
        "saveClustered ancestry")
    require(prev.forall(_._2.isDefined),
      s"v=$fromVersion is not cell-clustered (manifest has cell-less " +
        "files) — a derived publish needs saveClustered ancestry")
    prev
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
    val prev = requireClusteredAncestor(spark, base, version, fromVersion)
    val corpus = corpusOf(spark, base, fromVersion) // frozen cb → inherit
    requireUnreferenced(spark, base, version) // fail fast, pre-stage
    stagedPublish(spark, base, version) { (stage, finalize) =>
      writeSkinny(spark, stage, centroids, cb)
      writeCellFiles(spark, stage, newCodes)
      // pending sidecars carry VERBATIM (r15): dropping one would
      // silently resurrect forgotten rows. Same governance contract as
      // the table store: the sidecar hides its keys across the whole
      // logical index, appended rows included, until a materializing
      // compact re-admits the namespace.
      writeManifestFull(spark, stage,
        (prev ++ listCellFiles(spark, s"$stage/codes")
          .map { case (f, c) => (finalize(f), c) })
          .map { case (f, c) => (f, c, None) } ++
          carriedSidecarRows(spark, base, fromVersion))
      writeMeta(spark, stage, version, dim, cb, Some(fromVersion), corpus)
    }
  }

  /** MERGE-ON-READ right-to-be-forgotten on the vector artifact (r15 —
    * VERDICT r14 what's-missing #1 / next #3, the `snapshot_delete_dv`
    * geometry on the index store): [[deletePublish]] stays the
    * CELL-LOCAL form (rewrite the affected cells), but a governance
    * batch SCATTERED across most cells makes it rewrite nearly the
    * whole code table — this form commits an O(batch) KEY SIDECAR
    * instead: one parquet of the batch's distinct vec_ids under
    * `<stage>/deletes`, pinned by a `kind='delete'` manifest row, with
    * every ancestor file manifest-shared VERBATIM — zero code files
    * rewritten, publish I/O ∝ the batch. Every read path ([[load]],
    * [[codesForCells]] — the full-ADC and probed serves) applies the
    * sidecar as a broadcast anti-join; derived publishes carry pending
    * sidecars forward; [[compactPublish]] MATERIALIZES them (rewriting
    * the affected cells minus the forgotten ids) at the maintenance
    * window that compacts anyway, and retire/purge then make the forget
    * physical. The codebook/centroids stay FROZEN (the FAISS remove_ids
    * discipline). Honest contract, as everywhere: earlier versions
    * still serve the rows until retention drops them, and a pending
    * sidecar hides its keys across the WHOLE logical index — re-adding
    * a forgotten id needs a materializing compact first. Returns the
    * batch's distinct key count. Anchor: `factors/5-compliant.md:9`,
    * `factors/requirements.yaml:197-199`.
    */
  def deletePublishMor(spark: SparkSession, base: String, version: Long,
      fromVersion: Long, deleteIds: DataFrame): Long = {
    require(deleteIds.columns.contains("vec_id"),
      "deletePublishMor needs a `vec_id` column on deleteIds")
    val prev = requireClusteredAncestor(spark, base, version, fromVersion)
    val corpus = corpusOf(spark, base, fromVersion)
    val loaded = load(spark, base, fromVersion) // frozen skinny tables
    val del = deleteIds.select("vec_id").filter(col("vec_id").isNotNull)
      .distinct()
    val n = del.count()
    require(n > 0, "deletePublishMor with no keys — nothing to forget; " +
      "re-point readers instead of publishing an identical version")
    requireUnreferenced(spark, base, version) // fail fast, pre-stage
    stagedPublish(spark, base, version) { (stage, finalize) =>
      writeSkinny(spark, stage, loaded.centroids, loaded.cb)
      // numFiles ∝ the batch (VERDICT r15 what's-wrong #2): one file
      // for a forget batch, fan-out for a changelog-scale sidecar —
      // every reader already lists the dir plural
      del.repartition(SnapshotStore.sidecarFileCount(n))
        .write.parquet(s"$stage/deletes")
      val sidecar = listParquetFiles(spark, s"$stage/deletes")
        .map(f => (finalize(f), None, Some("delete")))
      require(sidecar.nonEmpty,
        "the delete sidecar write produced no files")
      // ancestor data rows verbatim + its pending sidecars (chained
      // MoR deletes compose) + this batch's sidecar
      writeManifestFull(spark, stage,
        prev.map { case (f, c) => (f, c, None) } ++
          carriedSidecarRows(spark, base, fromVersion) ++ sidecar)
      writeMeta(spark, stage, version, loaded.dim, loaded.cb,
        Some(fromVersion), corpus)
    }
    n
  }

  /** DURABLE right-to-be-forgotten on the vector artifact (VERDICT r12
    * next #3 — the dedup store's forget-vs-time-travel contract applied
    * to the vector family): publish v=N+1 where `changedCells` = the
    * deleted rows' OWN cells, each rewritten minus the forgotten
    * vec_ids; every untouched cell's files are manifest-shared verbatim.
    * The act is bounded by the batch: one broadcast semi-join finds the
    * affected cells (O(deleted) driver rows — a governance batch, like
    * the compaction plan's bin list), the rewrite reads ONLY those
    * cells' files through the manifest ([[codesForCells]] — at 100 TB a
    * clustered delete batch touches O(affected cells) files, never the
    * corpus), and one broadcast anti-join drops the forgotten rows. The
    * codebook/centroids stay FROZEN — a trained quantizer is not
    * per-row state (the FAISS remove_ids discipline; retraining is
    * `index_refresh_decision`'s drift call). Honest contract, same as
    * the dedup store: earlier versions' manifests still pin files
    * CONTAINING the forgotten rows — history serves until retention
    * drops it, and [[retire]]/[[purgeRetired]]/[[vacuum]] make the
    * forget PHYSICAL (spec-pinned). Anchor: `factors/5-compliant.md:9`,
    * `factors/requirements.yaml:197-199`.
    */
  def deletePublish(spark: SparkSession, base: String, version: Long,
      fromVersion: Long, deleteIds: DataFrame): Unit = {
    import org.apache.spark.sql.functions.broadcast
    require(deleteIds.columns.contains("vec_id"),
      "deletePublish needs a `vec_id` column on deleteIds")
    requireHeadAncestor(spark, base, fromVersion, "a durable delete")
    val del = deleteIds.select("vec_id").distinct()
    val prev = load(spark, base, fromVersion)
    require(prev.codes.columns.contains("cell"),
      s"v=$fromVersion codes carry no cell column — durable delete " +
        "needs saveClustered ancestry")
    // the affected cells — bounded by the governance batch
    val affected = prev.codes.join(broadcast(del), Seq("vec_id"))
      .select("cell").distinct().collect().map(_.getLong(0)).toSeq
    require(affected.nonEmpty,
      s"no rows of v=$fromVersion match the delete batch — nothing to " +
        "forget; re-point readers instead of publishing an identical " +
        "version")
    val survivors = codesForCells(spark, base, fromVersion, affected)
      .join(broadcast(del), Seq("vec_id"), "left_anti")
    publishIncremental(spark, base, version, fromVersion, prev.dim,
      prev.centroids, prev.cb, survivors, affected)
  }

  /** The OPTIMIZE commit on the artifact store (VERDICT r12 next #2 —
    * the maintenance pass streaming ingest makes necessary): after K
    * [[appendPublish]] batches a hot cell's rows sit in up to K files
    * and every probed serve opens all of them — the classic
    * streaming-lakehouse small-file proliferation. This rewrites each
    * multi-file cell's accumulated files into ONE file (the
    * [[writeCellFiles]] clustered layout guarantees one file per cell
    * per publish) and publishes v=N+1 manifest-sharing every other
    * cell's files verbatim — Layout.compact's bin geometry expressed
    * through [[publishIncremental]]'s manifest algebra. Row content is
    * untouched: loadLatest serves hash-identically while
    * [[codesForCells]] opens fewer files (the oracled entry pins both).
    * `onlyCells` scopes the pass (the WHERE-predicate form a real
    * OPTIMIZE run takes — compact the hot range now, the rest next
    * maintenance window); None compacts every multi-file cell. Anchor:
    * `factors/2-consumable.md:9` (serving latency is a file-count
    * property at scale).
    */
  def compactPublish(spark: SparkSession, base: String, version: Long,
      fromVersion: Long, onlyCells: Option[Seq[Long]] = None): Unit = {
    val prev = requireClusteredAncestor(spark, base, version, fromVersion)
    val filesPerCell = prev.flatMap(_._2)
      .groupBy(identity).view.mapValues(_.size)
    val multi = filesPerCell.filter(_._2 > 1).keys.toSeq.sorted
    // pending MoR sidecars MATERIALIZE here (r15 — the maintenance
    // window that compacts anyway, the snapshot_delete_dv discipline):
    // the cells holding any deleted id join the rewrite set, located by
    // a RAW read of the data files (the logical read hides exactly the
    // rows that locate the cells); the rewrite itself reads through
    // codesForCells, whose sidecar anti-join makes the fresh files
    // survivors-only. Sidecar rows are DROPPED from the new manifest
    // only when the rewrite covered every affected cell — a scoped
    // OPTIMIZE (onlyCells excluding an affected cell) carries them
    // forward, correct and idempotent.
    val pending = pendingSidecarFiles(spark, base, fromVersion)
    val affected: Seq[Long] =
      if (pending.isEmpty) Nil
      else {
        val keys = spark.read.parquet(pending: _*)
          .select("vec_id").distinct()
        spark.read.parquet(prev.map(_._1): _*)
          .join(broadcast(keys), Seq("vec_id"))
          .select("cell").distinct().collect().map(_.getLong(0)).toSeq
      }
    val candidates = (multi ++ affected).distinct.sorted
    val targets = onlyCells.fold(candidates) { sel =>
      val s = sel.toSet; candidates.filter(s)
    }
    require(targets.nonEmpty,
      s"nothing to compact under v=$fromVersion: every " +
        s"${onlyCells.fold("")(_ => "selected ")}cell already holds one " +
        "file and no sidecar is pending — skip the maintenance commit")
    val drop = affected.toSet.subsetOf(targets.toSet)
    val loaded = load(spark, base, fromVersion)
    publishIncrementalCore(spark, base, version, fromVersion, loaded.dim,
      loaded.centroids, loaded.cb,
      codesForCells(spark, base, fromVersion, targets), targets,
      dropPendingSidecars = drop)
  }

  private def writeSkinny(spark: SparkSession, dir: String,
      centroids: DataFrame, cb: Array[Array[Array[Double]]]): Unit = {
    // driver-side parquet I/O (r17, the MetaIo write discipline): both
    // tables are metadata-scale — the codebook IS a driver array (m·k
    // skinny rows) and centroids are O(#cells) — yet every publish paid
    // two Spark write jobs (planning + task + committer) for them. The
    // centroids collect executes the same plan the write job executed;
    // column names/types (incl. array-element nullability) match the
    // old writer's, so loadLatest's spark.read sees the identical table.
    import org.apache.spark.sql.types._
    val conf = spark.sparkContext.hadoopConfiguration
    MetaIo.writeRows(conf, s"$dir/codebook",
      StructType(Seq(StructField("sub", LongType),
        StructField("cid", IntegerType),
        StructField("cv", ArrayType(DoubleType, containsNull = false)))),
      for { s <- cb.indices; c <- cb(s).indices }
        yield org.apache.spark.sql.Row(s.toLong, c, cb(s)(c).toSeq))
    MetaIo.writeRows(conf, s"$dir/centroids", centroids.schema,
      centroids.collect().toIndexedSeq)
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
      sourceVersion: Option[Long],
      corpus: Option[(String, Long)]): Unit = {
    // meta/_SUCCESS stays the commit RECORD versions() checks, but since
    // r13 the whole version directory arrives by one stagedPublish
    // rename — a reader can never see a version whose meta exists while
    // its data tables are still being written, because both land in the
    // same atomic claim. Written driver-side (r17, the MetaIo write
    // discipline — one scalar row needs no Spark job); MetaIo.writeRows
    // creates the _SUCCESS marker itself.
    import org.apache.spark.sql.types._
    MetaIo.writeRows(spark.sparkContext.hadoopConfiguration,
      s"$dir/meta",
      StructType(Seq(StructField("version", LongType),
        StructField("dim", IntegerType), StructField("m", IntegerType),
        StructField("k", IntegerType),
        StructField("source_version", LongType),
        StructField("corpus_base", StringType),
        StructField("corpus_version", LongType))),
      Seq(org.apache.spark.sql.Row(version, dim, cb.length,
        cb.head.length, sourceVersion.map(Long.box).orNull,
        corpus.map(_._1).orNull,
        corpus.map(c => Long.box(c._2)).orNull)))
  }

  /** The corpus-provenance stamp of a committed version (None when the
    * version predates r13 metas or was published with an untracked
    * corpus) — what derived publishes inherit and what
    * [[citedCorpora]]/SnapshotStore's guarded vacuum consume.
    */
  private[substrate] def corpusOf(spark: SparkSession, base: String,
      version: Long): Option[(String, Long)] = {
    val g = metaRow(spark, base, version)
    for (cb <- MetaIo.optString(g, "corpus_base");
         cv <- MetaIo.optLong(g, "corpus_version")) yield (cb, cv)
  }

  /** The committed meta row, read DRIVER-SIDE without a Spark job
    * (MetaIo) — every derived publish consults it (provenance
    * inheritance) and every load dereferences it; as cluster jobs these
    * metadata lookups dominated the publish wall (r13 bench forensics)
    * and at scale they would queue commit planning behind running
    * queries.
    */
  private def metaRow(spark: SparkSession, base: String,
      version: Long): org.apache.parquet.example.data.Group = {
    val gs = MetaIo.groups(spark.sparkContext.hadoopConfiguration,
      s"$base/v=$version/meta")
    require(gs.nonEmpty, s"v=$version under $base has no meta row")
    gs.head
  }

  /** Every (corpus_base, corpus_version) a COMMITTED version of the
    * index under `base` cites as its training corpus — the reverse edge
    * SnapshotStore's guarded vacuumExecute walks before dropping a
    * corpus version a committed index still depends on (Factor 4's
    * source→decision traceability ACROSS the two stores, VERDICT r12
    * next #6). Metadata-scale: one meta row per committed version.
    */
  def citedCorpora(spark: SparkSession,
      base: String): Seq[(String, Long)] =
    versions(spark, base).flatMap(v => corpusOf(spark, base, v)).distinct

  private def writeManifest(spark: SparkSession, dir: String,
      rows: Seq[(String, Option[Long])]): Unit =
    writeManifestFull(spark, dir, rows.map { case (f, c) => (f, c, None) })

  /** [[writeManifest]] with the row KIND (r15): None = a data (codes)
    * file; Some("delete") = a MoR delete sidecar ([[deletePublishMor]])
    * whose vec_id keys hide rows at read time. Stores that never commit
    * a sidecar keep an all-null kind column — readers that predate it
    * ignore the column entirely.
    */
  private val ManifestSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("file",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("cell",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("kind",
      org.apache.spark.sql.types.StringType)))

  private def writeManifestFull(spark: SparkSession, dir: String,
      rows: Seq[(String, Option[Long], Option[String])]): Unit =
    // driver-side parquet I/O, no Spark job (r17 — the MetaIo write
    // discipline): the rows are already local O(#files) metadata; the
    // old local-relation write paid a full Spark write job per publish.
    // Same column names/types as the old writer, so Spark reads of the
    // manifest (the relational publishIncremental overload) and
    // MetaIo.groups reads both see the identical table.
    MetaIo.writeRows(spark.sparkContext.hadoopConfiguration,
      s"$dir/manifest", ManifestSchema,
      rows.map { case (f, c, k) => org.apache.spark.sql.Row(
        f, c.map(Long.box).orNull, k.orNull) })

  /** A committed version's DATA manifest rows, driver-side
    * (metadata-scale: O(#files)). Empty Seq when the version predates
    * manifests (legacy layout — its codes are its own directory).
    * Delete sidecar rows are excluded — use [[readManifestFull]] where
    * sidecars matter (pins, carries, the read paths).
    */
  def readManifest(spark: SparkSession, base: String,
      version: Long): Seq[(String, Option[Long])] =
    readManifestFull(spark, base, version)
      .collect { case (f, c, k) if !k.contains("delete") => (f, c) }

  /** Every manifest row incl. its kind: (file, cell, kind). */
  def readManifestFull(spark: SparkSession, base: String,
      version: Long): Seq[(String, Option[Long], Option[String])] = {
    // driver-side, no Spark job (MetaIo): the manifest is O(#files)
    // commit metadata — a table format reads it with plain file I/O
    MetaIo.groups(spark.sparkContext.hadoopConfiguration,
        s"$base/v=$version/manifest")
      .map(g => (MetaIo.optString(g, "file").getOrElse(
        throw new IllegalStateException("manifest row without a file")),
        MetaIo.optLong(g, "cell"), MetaIo.optString(g, "kind")))
  }

  /** The pending MoR delete sidecar FILES of a committed version —
    * empty for a store that never took a [[deletePublishMor]], or one
    * whose sidecars a [[compactPublish]] has materialized.
    */
  private def pendingSidecarFiles(spark: SparkSession, base: String,
      version: Long): Seq[String] =
    readManifestFull(spark, base, version)
      .collect { case (f, _, k) if k.contains("delete") => f }

  /** Carried sidecar rows for a derived publish's manifest — every
    * derived publish pins its ancestor's pending sidecars VERBATIM
    * (dropping one would silently resurrect forgotten rows), except the
    * materializing compact ([[compactPublish]] with full coverage).
    */
  private def carriedSidecarRows(spark: SparkSession, base: String,
      fromVersion: Long): Seq[(String, Option[Long], Option[String])] =
    pendingSidecarFiles(spark, base, fromVersion)
      .map(f => (f, None, Some("delete")))

  /** Apply a version's pending MoR sidecars to a codes scan: ONE
    * broadcast anti-join on vec_id — the sidecars are O(batch) by
    * construction, so the join never shuffles the corpus-sized scan. A
    * store without sidecars pays nothing.
    */
  private def applySidecars(spark: SparkSession, delFiles: Seq[String],
      codes: DataFrame): DataFrame =
    if (delFiles.isEmpty) codes
    else codes.join(
      broadcast(spark.read.parquet(delFiles: _*)
        .select("vec_id").distinct()),
      Seq("vec_id"), "left_anti")

  /** Recursive *.parquet listing under `path` — the same driver-side
    * metadata walk as Layout.listFiles, descending into hive `pcell=`
    * dirs. Paths are FULLY QUALIFIED URIs (scheme + authority — what
    * fs.listStatus already returns): a persisted manifest row must
    * resolve against the filesystem it was written on, not whatever the
    * reading session's default FS happens to be — on an object store
    * (`s3a://bucket/...`) a scheme-stripped row loses the bucket
    * (ADVICE r12 / VERDICT r12 what's-wrong #1). Comparisons against
    * `input_file_name()`-derived sets normalize BOTH sides through
    * `URI.getPath` at the comparison site, never in the stored row.
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
            Seq(fs.makeQualified(s.getPath).toString)
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
    // only DESCENDANTS can pin this version's files: every derived
    // publish enforces version > fromVersion (requireClusteredAncestor)
    // and a manifest can only name files that exist at publish time, so
    // sharing points strictly backward — the sweep is O(descendants·F),
    // not O(V·F) over the whole store (VERDICT r12 next #8)
    val pinnedBy = versions(spark, base).filter(_ > version).filter(v =>
      readManifestFull(spark, base, v).exists(_._1.contains(needle)))
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
    val meta = metaRow(spark, base, version) // driver-side, no Spark job
    def num(name: String): Long = MetaIo.optLong(meta, name).getOrElse(
      throw new IllegalStateException(s"meta row missing $name"))
    val m = num("m").toInt
    val k = num("k").toInt
    // codebook + centroids are metadata-scale skinny tables written by
    // writeSkinny — read them driver-side (r17, MetaIo): the codebook
    // collect was a scan job per load, and the centroid scan+broadcast
    // another per serve; as a LocalRelation the broadcast builds from
    // driver rows without a file-scan job
    val conf = spark.sparkContext.hadoopConfiguration
    val cb = {
      val (s, rows) = MetaIo.readRows(conf, s"$dir/codebook")
      val (si, ci, vi) =
        (s.fieldIndex("sub"), s.fieldIndex("cid"), s.fieldIndex("cv"))
      val out = Array.ofDim[Array[Double]](m, k)
      rows.foreach { r =>
        out(r.getLong(si).toInt)(r.getInt(ci)) =
          r.getSeq[Double](vi).toArray
      }
      out
    }
    val centroids = {
      val (s, rows) = MetaIo.readRows(conf, s"$dir/centroids")
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(rows.asJava, s)
    }
    // codes resolve through the version's MANIFEST when present (files
    // may live under earlier versions' dirs — the sharing contract);
    // a manifest-less version is legacy layout: its own codes dir.
    // Pending MoR sidecars apply as a broadcast anti-join (r15) —
    // every load serves the LOGICAL index, never the raw files
    val mfFull = readManifestFull(spark, base, version)
    val dataFiles = mfFull
      .collect { case (f, _, k) if !k.contains("delete") => f }
    val delFiles = mfFull
      .collect { case (f, _, k) if k.contains("delete") => f }
    val codes = applySidecars(spark, delFiles,
      if (mfFull.nonEmpty) spark.read.parquet(dataFiles: _*)
      else spark.read.parquet(s"$dir/codes"))
    Loaded(num("version"), num("dim").toInt,
      centroids, cb, codes,
      MetaIo.optLong(meta, "source_version"),
      MetaIo.optString(meta, "corpus_base"),
      MetaIo.optLong(meta, "corpus_version"))
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
    // the pruned serve applies pending MoR sidecars too (r15): a probed
    // ADC read must never rank a forgotten vector
    applySidecars(spark, pendingSidecarFiles(spark, base, version),
      spark.read.parquet(files: _*))
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
  def purgeRetired(spark: SparkSession, base: String,
      stageGraceMs: Long = 3600000L): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    // sweep crashed publishers' stage garbage (.stage-v=N-<uuid> dirs are
    // uncommitted by construction), but only past a grace window — an
    // IN-FLIGHT publish's stage must survive a concurrent maintenance
    // pass (the same mtime discipline table formats use for orphan-file
    // cleanup)
    val now = System.currentTimeMillis()
    fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(".stage-")
        && now - s.getModificationTime > stageGraceMs)
      .foreach(s => fs.delete(s.getPath, true))
    // retired = meta-less v= dirs, the commit marker checked PER
    // VERSION under the committer's stripe (code-review r13 round 2: a
    // stale committed-set snapshot would classify a version whose
    // publish rename landed between the snapshot and the listing as
    // retired and destroy it). The claim deletes the skinny tables and
    // records the codes files as they stood at claim time; a later
    // re-publish of the id writes fresh uuid-named part files the
    // recorded list cannot touch.
    val candidates = fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("v=\\d+"))
      .map(_.getPath.getName.stripPrefix("v=").toLong).sorted
    val claimed: Seq[(Long, Seq[String])] = candidates.flatMap { v =>
      lockFor(base, v).synchronized {
        val dir = s"$base/v=$v"
        if (fs.exists(
            new org.apache.hadoop.fs.Path(s"$dir/meta/_SUCCESS"))) None
        else {
          // shareable remains: code files AND delete sidecars (r15) —
          // a descendant's manifest may pin either
          val codes = listParquetFiles(spark, s"$dir/codes") ++
            listParquetFiles(spark, s"$dir/deletes")
          Seq("manifest", "codebook", "centroids").foreach { d =>
            fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$d"), true)
          }
          Some(v -> codes)
        }
      }
    }
    if (claimed.isEmpty) return Seq.empty
    // pins recomputed AFTER the claims — any concurrently committed
    // version is visible here, so its manifest-shared files survive no
    // matter which side of the listing its rename landed on. Pin
    // detection normalizes both sides through PathNorm (code-review
    // r13; VERDICT r13 what's-wrong #1 moved it off java.net.URI, which
    // throws on a legal space-bearing filename mid-sweep): legacy
    // raw-path manifest rows and qualified listings must compare equal
    // — a missed match DELETES a pinned file.
    val pinned: Set[String] = versions(spark, base)
      .flatMap(v => readManifestFull(spark, base, v).map(_._1))
      .map(PathNorm(_)).toSet
    claimed.foreach { case (v, codes) =>
      val dir = s"$base/v=$v"
      val (keep, del) = codes.partition(f => pinned(PathNorm(f)))
      del.foreach(f => fs.delete(new org.apache.hadoop.fs.Path(f), false))
      if (keep.isEmpty) lockFor(base, v).synchronized {
        // the dir may have been re-claimed by a committer since —
        // re-check before removing it wholesale
        if (!fs.exists(
            new org.apache.hadoop.fs.Path(s"$dir/meta/_SUCCESS")))
          fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      }
    }
    claimed.map(_._1)
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
