package graft

import org.apache.spark.sql.functions._

import graft.substrate.{IvfIndex, VectorOps}

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private def embeddings = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), VectorOps.toDoubleArr(col("embedding")).as("v"))
  }

  test("every vector lands in exactly one cell; cells are centroid ids") {
    val e = embeddings
    val assigned = IvfIndex.assign(e, centroidMod = 23).cache()
    assert(assigned.count() == e.count())
    assert(assigned.select("vec_id").distinct().count() == e.count())
    val cells = assigned.select("cell").distinct().as[Long].collect().toSet
    assert(cells.forall(_ % 23 == 0))
  }

  test("autoCoarseFactor: √|C| budget, floored at 2, round-half-up") {
    assert(IvfIndex.autoCoarseFactor(0) == 2)
    assert(IvfIndex.autoCoarseFactor(1) == 2)
    assert(IvfIndex.autoCoarseFactor(4) == 2)
    assert(IvfIndex.autoCoarseFactor(6) == 2)   // sqrt 2.449 rounds to 2
    assert(IvfIndex.autoCoarseFactor(7) == 3)   // sqrt 2.645 rounds to 3
    assert(IvfIndex.autoCoarseFactor(100) == 10)
    assert(IvfIndex.autoCoarseFactor(110) == 10) // sqrt 10.488
    assert(IvfIndex.autoCoarseFactor(111) == 11) // sqrt 10.535
    assert(IvfIndex.autoCoarseFactor(1L << 20) == 1024)
  }

  test("assignAuto ≡ assignHier at the derived coarse budget") {
    val e = embeddings.cache()
    val nCents = e.filter(col("vec_id") % 23 === 0).count()
    val f = IvfIndex.autoCoarseFactor(nCents)
    val auto = IvfIndex.assignAuto(e, centroidMod = 23)
      .select(col("vec_id"), col("cell").as("a_cell"))
    val hier = IvfIndex.assignHier(e, centroidMod = 23, coarseFactor = f,
      nProbeCoarse = 4)
      .select(col("vec_id"), col("cell").as("h_cell"))
    val joined = auto.join(hier, Seq("vec_id"), "full")
    assert(joined.filter(col("a_cell").isNull || col("h_cell").isNull ||
      col("a_cell") =!= col("h_cell")).count() == 0,
      "assignAuto must be exactly assignHier at autoCoarseFactor(|C|)")
    e.unpersist()
  }

  test("assignRouted: total assignment, one cell per vector, cells are centroids") {
    val e = embeddings.cache()
    val assigned = IvfIndex.assignRouted(e, centroidMod = 23).cache()
    assert(assigned.count() == e.count(), "routed assignment must be total")
    assert(assigned.select("vec_id").distinct().count() == e.count(),
      "exactly one cell per vector (miss-set fallback must not duplicate)")
    val cells = assigned.select("cell").distinct().as[Long].collect().toSet
    assert(cells.forall(_ % 23 == 0), "cells must be centroid ids")
    assigned.unpersist(); e.unpersist()
  }

  test("assignRouted: planted near-identical copies co-route to one cell") {
    val e = embeddings.cache()
    // the VectorTier planting: every vec_id % 50 == 0 gains a +0.01-shifted
    // copy at vec_id + 1,000,000 (cosine ≈ 0.997 to its original)
    val aug = e.unionAll(e.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("v"), x => x + lit(0.01)).as("v"))).cache()
    val cells = IvfIndex.assignRouted(aug, centroidMod = 23)
      .select(col("vec_id"), col("cell")).cache()
    val nPlanted = e.filter(col("vec_id") % 50 === 0).count()
    val coRouted = cells.filter(col("vec_id") >= 1000000L).as("c")
      .join(cells.as("o"),
        col("c.vec_id") - 1000000L === col("o.vec_id") &&
          col("c.cell") === col("o.cell")).count()
    info(s"routed co-routing: $coRouted of $nPlanted planted pairs share a cell")
    assert(coRouted.toDouble / nPlanted >= 0.7,
      s"copies stopped co-routing under LSH routing ($coRouted/$nPlanted)")
    cells.unpersist(); aug.unpersist(); e.unpersist()
  }

  test("assignRouted miss-set fallback agrees with flat argmin") {
    // Vectors whose buckets caught no centroid fall back to the flat
    // argmin; for THOSE vectors routed and flat assignment must be
    // identical (the routed approximation applies only to bucket-caught
    // vectors). Verified by recomputing the candidate-caught set the same
    // way the operator builds it.
    val e = embeddings.cache()
    val flat = IvfIndex.assign(e, centroidMod = 23)
      .select(col("vec_id"), col("cell").as("flat_cell"))
    val routed = IvfIndex.assignRouted(e, centroidMod = 23)
      .select(col("vec_id"), col("cell").as("r_cell"))
    val cents = e.filter(col("vec_id") % 23 === 0)
      .select(col("vec_id").as("cent_id"))
    val dots = graft.substrate.BrpLsh.projections(e, "vec_id", "v", 64,
      IvfIndex.RoutedTables)
    val lengths = graft.substrate.BrpLsh.autoBucketLengths(dots,
      IvfIndex.RoutedTables, IvfIndex.RoutedOccupancy)
    val vb = graft.substrate.BrpLsh.bucketKeysFromDots(dots, "vec_id", lengths)
    val cb = vb.join(cents, vb("vec_id") === col("cent_id"))
      .select(col("cent_id"), col("tbl"),
        explode(sequence(col("bucket") - IvfIndex.RoutedProbe,
          col("bucket") + IvfIndex.RoutedProbe)).as("bucket"))
    val caught = vb.join(cb, Seq("tbl", "bucket"))
      .select("vec_id").distinct()
    val missed = e.join(caught, Seq("vec_id"), "left_anti").select("vec_id")
    val nMissed = missed.count()
    info(s"miss-set size = $nMissed of ${e.count()}")
    val disagree = missed.join(flat, Seq("vec_id")).join(routed, Seq("vec_id"))
      .filter(col("flat_cell") =!= col("r_cell")).count()
    assert(disagree == 0,
      s"$disagree missed vectors did not fall back to the flat argmin")
    e.unpersist()
  }

  test("IVF top-k recall against exact search is meaningfully above chance") {
    val e = embeddings.cache()
    val q = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val approx = IvfIndex.topK(e, q, centroidMod = 23, k = 10, nProbe = 4)
      .select("qid", "cid")
    // exact euclidean ground truth
    val exact = {
      import org.apache.spark.sql.expressions.Window
      val d = q.crossJoin(e).filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("cid"),
          VectorOps.sqDist(col("qv"), col("v")).as("d2"))
      val w = Window.partitionBy("qid").orderBy(col("d2").asc, col("cid"))
      d.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
        .select("qid", "cid")
    }
    val nQ = q.count()
    val overlap = exact.join(approx, Seq("qid", "cid"), "left_semi").count()
    val recall = overlap.toDouble / (nQ * 10)
    // 4 of ~22 cells probed: random-data recall well above the ~18% cell
    // coverage because near neighbours concentrate in the query's cells
    assert(recall > 0.25, s"recall@10 = $recall")
  }
  test("topKFiltered: predicate restriction commutes with the probe scan") {
    val e = embeddings.cache()
    val q = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val allowed = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("lang") === "en").select(col("doc_id").as("vec_id"))
    val allowedSet = allowed.as[Long].collect().toSet
    val filtered = IvfIndex
      .topKFiltered(e, q, allowed, centroidMod = 23, k = 10, nProbe = 4)
      .collect()
    // every hit satisfies the predicate
    assert(filtered.nonEmpty)
    filtered.foreach(r => assert(allowedSet.contains(r.getAs[Long]("cid"))))
    // restriction property: filtered top-k == (unfiltered probed
    // candidates, exhaustively ranked) restricted to allowed, renumbered
    val exhaustive = IvfIndex
      .topK(e, q, centroidMod = 23, k = Int.MaxValue, nProbe = 4)
      .collect().filter(r => allowedSet.contains(r.getAs[Long]("cid")))
      .groupBy(_.getAs[Long]("qid")).toSeq
      .flatMap { case (qid, rows) =>
        rows.sortBy(_.getAs[Long]("rank")).take(10).zipWithIndex
          .map { case (r, i) => (qid, (i + 1).toLong, r.getAs[Long]("cid")) }
      }.toSet
    val got = filtered
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"),
        r.getAs[Long]("cid"))).toSet
    assert(got == exhaustive)
  }
  test("assignDeltaAuto: frozen-codebook ingest routes to base cells; twins co-route") {
    val e = embeddings.cache()
    val base = e.filter(col("vec_id") % 10 < 8).cache()
    val delta = e.filter(col("vec_id") % 10 >= 8)
    // refactor guard: self-ingest is exactly assignAuto
    val viaDelta = IvfIndex.assignDeltaAuto(base, base, 23)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    val viaAuto = IvfIndex.assignAuto(base, 23)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    assert(viaDelta == viaAuto)
    // every ingested vector lands in a BASE centroid's cell
    val baseCents = base.filter(col("vec_id") % 23 === 0)
      .select("vec_id").as[Long].collect().toSet
    val ingested = IvfIndex.assignDeltaAuto(delta, base, 23)
      .select("vec_id", "cell").as[(Long, Long)].collect()
    assert(ingested.nonEmpty)
    ingested.foreach { case (_, cell) => assert(baseCents.contains(cell)) }
    // an ingest batch of EXACT copies of base vectors co-routes: each
    // copy lands in its original's cell (the property incremental
    // semantic dedup needs from ingest)
    val copies = base.limit(40)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("v"))
    val copyCells = IvfIndex.assignDeltaAuto(copies, base, 23)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    copyCells.foreach { case (vid, cell) =>
      assert(cell == viaAuto(vid - 1000000L),
        s"copy of ${vid - 1000000L} routed to $cell, original in ${viaAuto(vid - 1000000L)}")
    }
  }

  test("probe-budget sweep: recall is monotone in nProbe (the knob curve is real)") {
    // widening the probe set only ADDS candidates, so recall@k cannot
    // fall — the property that makes nProbe a safe latency/recall dial
    val rows = graft.checks.Checks.byName("retrieval_recall_ivf_probes")
      .run(spark, sf).collect()
      .map(r => r.getAs[Long]("n_probe") -> r.getAs[Double]("avg_recall"))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(2L, 4L, 8L, 16L))
    rows.sliding(2).foreach {
      case Array((_, r1), (np, r2)) =>
        assert(r2 >= r1, s"recall fell at nProbe=$np: $r1 -> $r2")
      case _ => ()
    }
  }
}
