package graft.checks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.checks.CheckDsl._
import graft.substrate.{Cdc, TableDiff}

/** Change-management operators: CDC merge and version diff — the data-side
  * machinery behind the reference's incremental-processing and versioning
  * requirements (`factors/requirements.yaml:91-93,123-125,136-138`).
  *
  * Both checks derive a deterministic change set from `orders` itself with
  * pure integer arithmetic (key modulus selects rows; prices go through
  * `floor()` — exact in IEEE — never float rounding), so both engines
  * construct bit-identical inputs and the merge/diff logic is what's
  * actually under test.
  *
  * Mutation rules shared by both checks:
  *   - keys ≡ 3 (mod 10): updated (status 'X', price +500), seq 1
  *   - keys ≡ 7 (mod 10): deleted, seq 1
  *   - keys ≡ 3 (mod 100): updated AGAIN (status 'Y', price +900), seq 2 —
  *     exercises latest-wins over the seq-1 update of the same keys
  */
object ChangeTier {

  private def base(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders").select(
      col("o_orderkey").as("k"),
      col("o_orderstatus").as("status"),
      floor(col("o_totalprice")).cast("long").as("price_i"))

  private val BaseSql =
    """base AS (SELECT o_orderkey AS k, o_orderstatus AS status,
      |CAST(floor(o_totalprice) AS BIGINT) AS price_i FROM orders)"""
      .stripMargin.replace("\n", " ")

  /** CDC merge (substrate.Cdc): fold a change log (updates, deletes, a
    * second update wave that must supersede the first) into the snapshot;
    * output = per-status counts and integer price totals of the merged
    * state. One shuffle at any scale (see CdcSpec's plan assertion).
    */
  val cdcUpsert = Check("cdc_upsert",
    (spark, dir) => {
      val b = base(spark, dir)
      val upd1 = b.filter(col("k") % 10 === 3).select(col("k"),
        lit("X").as("status"), (col("price_i") + 500).as("price_i"),
        lit("U").as("op"), lit(1L).as("seq"))
      val del1 = b.filter(col("k") % 10 === 7).select(col("k"),
        col("status"), col("price_i"), lit("D").as("op"), lit(1L).as("seq"))
      val upd2 = b.filter(col("k") % 100 === 3).select(col("k"),
        lit("Y").as("status"), (col("price_i") + 900).as("price_i"),
        lit("U").as("op"), lit(2L).as("seq"))
      Cdc.applyChangeLog(b, upd1.unionByName(del1).unionByName(upd2), Seq("k"))
        .groupBy("status")
        .agg(count(lit(1)).cast("long").as("n"),
          sum("price_i").cast("long").as("total_price_i"))
        .orderBy("status")
    },
    Some(
      s"""WITH $BaseSql,
         |chg AS (
         |SELECT k, 'X' AS status, price_i + 500 AS price_i, 'U' AS op, 1 AS seq
         |FROM base WHERE k % 10 = 3
         |UNION ALL SELECT k, status, price_i, 'D', 1 FROM base WHERE k % 10 = 7
         |UNION ALL SELECT k, 'Y', price_i + 900, 'U', 2 FROM base WHERE k % 100 = 3),
         |unioned AS (SELECT k, status, price_i, 'I' AS op, -1 AS seq FROM base
         |UNION ALL SELECT * FROM chg),
         |latest AS (SELECT k, status, price_i, op FROM (
         |SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
         |FROM unioned) WHERE rn = 1)
         |SELECT status, CAST(COUNT(*) AS BIGINT) AS n,
         |CAST(SUM(price_i) AS BIGINT) AS total_price_i
         |FROM latest WHERE op <> 'D' GROUP BY 1 ORDER BY status"""
        .stripMargin.replace("\n", " ")),
    isScore = false)

  /** Version diff (substrate.TableDiff): v2 = v1 with the mutation rules
    * applied plus a small synthetic-key insert set; output = row counts
    * per diff class. One full-outer shuffle join at any scale.
    */
  val tableDiff = Check("table_diff",
    (spark, dir) => {
      val b = base(spark, dir)
      val mutated = b.filter(col("k") % 10 =!= 7).select(col("k"),
        when(col("k") % 100 === 3, "Y")
          .when(col("k") % 10 === 3, "X")
          .otherwise(col("status")).as("status"),
        when(col("k") % 100 === 3, col("price_i") + 900)
          .when(col("k") % 10 === 3, col("price_i") + 500)
          .otherwise(col("price_i")).as("price_i"))
      val added = b.filter(col("k") % 1000 === 1).select(
        (col("k") + 100000000L).as("k"), lit("N").as("status"), col("price_i"))
      TableDiff.byKey(b, mutated.unionByName(added), Seq("k"))
        .groupBy("diff_status").agg(count(lit(1)).cast("long").as("n"))
        .orderBy("diff_status")
    },
    Some(
      s"""WITH $BaseSql,
         |mutated AS (SELECT k,
         |CASE WHEN k % 100 = 3 THEN 'Y' WHEN k % 10 = 3 THEN 'X'
         |ELSE status END AS status,
         |CASE WHEN k % 100 = 3 THEN price_i + 900 WHEN k % 10 = 3 THEN price_i + 500
         |ELSE price_i END AS price_i
         |FROM base WHERE k % 10 <> 7),
         |v2 AS (SELECT * FROM mutated UNION ALL
         |SELECT k + 100000000 AS k, 'N' AS status, price_i FROM base WHERE k % 1000 = 1),
         |d AS (SELECT CASE WHEN o.k IS NULL THEN 'added'
         |WHEN n.k IS NULL THEN 'removed'
         |WHEN o.status IS NOT DISTINCT FROM n.status
         |AND o.price_i IS NOT DISTINCT FROM n.price_i THEN 'unchanged'
         |ELSE 'changed' END AS diff_status
         |FROM base o FULL JOIN v2 n ON o.k = n.k)
         |SELECT diff_status, CAST(COUNT(*) AS BIGINT) AS n
         |FROM d GROUP BY 1 ORDER BY diff_status"""
        .stripMargin.replace("\n", " ")),
    isScore = false)

  /** MV incremental maintenance (VERDICT r7 #6; reference
    * `factors/3-current.md:14` names materialized views as a core
    * freshness mechanism — checks #21/#29 assess the flags, this is the
    * refresh primitive that makes them true): maintain the per-status
    * COUNT/SUM aggregate of `orders` under the shared mutation rules PLUS
    * an insert wave (k % 1000 == 1 re-keyed to +1e8, status 'N' —
    * table_diff's added set), via
    * substrate.MaterializedView.refreshSumCount — the before/after-image
    * delta path whose work is O(|changes|), never re-reading the base.
    * The ORACLE is the FULL recompute (apply the changelog latest-wins,
    * re-aggregate), so a hash match IS the incremental ≡ full-refresh
    * equivalence, cross-engine; MvSpec pins it in-engine on randomized
    * changelogs.
    */
  /** Shared MV fixture: the per-status COUNT/SUM aggregate of `orders`
    * plus the full before/after-image changelog (the shared mutation
    * rules + table_diff's insert wave) — the inputs of the batch MV
    * entries and the AVG face.
    */
  private def mvAndChanges(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val b = base(spark, dir)
    val mv = b.groupBy("status")
      .agg(count(lit(1)).cast("long").as("n"),
        sum("price_i").cast("long").as("s"))
      .select(col("status").as("g"), col("n"), col("s"))
    val nullS = lit(null).cast("string")
    val nullL = lit(null).cast("long")
    val upd1 = b.filter(col("k") % 10 === 3).select(col("k"),
      col("status").as("b_g"), col("price_i").as("b_v"),
      lit("X").as("a_g"), (col("price_i") + 500).cast("long").as("a_v"),
      lit(1L).as("seq"))
    val del1 = b.filter(col("k") % 10 === 7).select(col("k"),
      col("status").as("b_g"), col("price_i").as("b_v"),
      nullS.as("a_g"), nullL.as("a_v"), lit(1L).as("seq"))
    val upd2 = b.filter(col("k") % 100 === 3).select(col("k"),
      lit("X").as("b_g"), (col("price_i") + 500).cast("long").as("b_v"),
      lit("Y").as("a_g"), (col("price_i") + 900).cast("long").as("a_v"),
      lit(2L).as("seq"))
    val ins = b.filter(col("k") % 1000 === 1).select(
      (col("k") + 100000000L).as("k"),
      nullS.as("b_g"), nullL.as("b_v"),
      lit("N").as("a_g"), col("price_i").as("a_v"), lit(1L).as("seq"))
    (mv, upd1.unionByName(del1).unionByName(upd2).unionByName(ins))
  }

  val mvIncrementalRefresh = Check("mv_incremental_refresh",
    (spark, dir) => {
      val (mv, changes) = mvAndChanges(spark, dir)
      graft.substrate.MaterializedView.refreshSumCount(mv, changes, Seq("k"))
        .select(col("g").as("status"), col("n"),
          col("s").as("total_price_i"))
        .orderBy("status")
    },
    Some(
      s"""WITH $BaseSql,
         |chg AS (
         |SELECT k, 'X' AS status, price_i + 500 AS price_i, 'U' AS op, 1 AS seq
         |FROM base WHERE k % 10 = 3
         |UNION ALL SELECT k, status, price_i, 'D', 1 FROM base WHERE k % 10 = 7
         |UNION ALL SELECT k, 'Y', price_i + 900, 'U', 2 FROM base WHERE k % 100 = 3
         |UNION ALL SELECT k + 100000000, 'N', price_i, 'U', 1 FROM base WHERE k % 1000 = 1),
         |unioned AS (SELECT k, status, price_i, 'I' AS op, -1 AS seq FROM base
         |UNION ALL SELECT * FROM chg),
         |latest AS (SELECT k, status, price_i, op FROM (
         |SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
         |FROM unioned) WHERE rn = 1)
         |SELECT status, CAST(COUNT(*) AS BIGINT) AS n,
         |CAST(SUM(price_i) AS BIGINT) AS total_price_i
         |FROM latest WHERE op <> 'D' GROUP BY 1 ORDER BY status"""
        .stripMargin.replace("\n", " ")),
    isScore = false)

  /** AVG face of [[mvIncrementalRefresh]] (VERDICT r8 #4, reference
    * `factors/3-current.md:14`): avg = s / n derived from the refreshed
    * SUM/COUNT state (MaterializedView.refreshSumCountAvg) — zero extra
    * maintained state, the same O(|changes|) fold. Both engines compute
    * ONE double division over exactly-maintained longs, so the floats
    * agree bit-for-bit (no accumulation-order dependence). The MIN/MAX
    * boundary — NOT derivable from (s, n) under deletes — is documented
    * on the substrate object.
    */
  val mvIncrementalRefreshAvg = Check("mv_incremental_refresh_avg",
    (spark, dir) => {
      val (mv, changes) = mvAndChanges(spark, dir)
      graft.substrate.MaterializedView
        .refreshSumCountAvg(mv, changes, Seq("k"))
        .select(col("g").as("status"), col("n"),
          col("avg").as("avg_price_i"))
        .orderBy("status")
    },
    Some(
      s"""WITH $BaseSql,
         |chg AS (
         |SELECT k, 'X' AS status, price_i + 500 AS price_i, 'U' AS op, 1 AS seq
         |FROM base WHERE k % 10 = 3
         |UNION ALL SELECT k, status, price_i, 'D', 1 FROM base WHERE k % 10 = 7
         |UNION ALL SELECT k, 'Y', price_i + 900, 'U', 2 FROM base WHERE k % 100 = 3
         |UNION ALL SELECT k + 100000000, 'N', price_i, 'U', 1 FROM base WHERE k % 1000 = 1),
         |unioned AS (SELECT k, status, price_i, 'I' AS op, -1 AS seq FROM base
         |UNION ALL SELECT * FROM chg),
         |latest AS (SELECT k, status, price_i, op FROM (
         |SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
         |FROM unioned) WHERE rn = 1)
         |SELECT status, CAST(COUNT(*) AS BIGINT) AS n,
         |CAST(SUM(price_i) AS DOUBLE) / COUNT(*) AS avg_price_i
         |FROM latest WHERE op <> 'D' GROUP BY 1 ORDER BY status"""
        .stripMargin.replace("\n", " ")),
    isScore = false)

  /** MIN/MAX face of the MV family — the NON-invertible aggregates the
    * delta fold cannot maintain (MaterializedView's object scaladoc):
    * refreshed by `refreshMinMax`'s touched-group re-aggregation against
    * the POST-change snapshot (here the same latest-wins state
    * table_diff's v2 constructs), untouched groups passing through from
    * the stored view by anti-join. The oracle is the full MIN/MAX
    * recompute over the applied changelog, so the hash match pins
    * touched-group re-aggregation ≡ full refresh cross-engine; MvSpec
    * covers the untouched-pass-through and group-vanish paths the
    * fixture's all-groups-touched changelog cannot reach.
    */
  val mvIncrementalRefreshMinmax = Check("mv_incremental_refresh_minmax",
    (spark, dir) => {
      val b = base(spark, dir)
      val mv0 = b.groupBy("status")
        .agg(min("price_i").cast("long").as("mn"),
          max("price_i").cast("long").as("mx"))
        .select(col("status").as("g"), col("mn"), col("mx"))
      val (_, changes) = mvAndChanges(spark, dir)
      // the POST-change snapshot the changelog was applied to — the
      // mutation rules + insert wave, exactly table_diff's v2
      val mutated = b.filter(col("k") % 10 =!= 7).select(
        when(col("k") % 100 === 3, "Y")
          .when(col("k") % 10 === 3, "X")
          .otherwise(col("status")).as("g"),
        when(col("k") % 100 === 3, col("price_i") + 900)
          .when(col("k") % 10 === 3, col("price_i") + 500)
          .otherwise(col("price_i")).cast("long").as("v"))
      val added = b.filter(col("k") % 1000 === 1)
        .select(lit("N").as("g"), col("price_i").cast("long").as("v"))
      graft.substrate.MaterializedView
        .refreshMinMax(mv0, mutated.unionByName(added), changes)
        .select(col("g").as("status"), col("mn").as("min_price_i"),
          col("mx").as("max_price_i"))
        .orderBy("status")
    },
    Some(
      s"""WITH $BaseSql,
         |chg AS (
         |SELECT k, 'X' AS status, price_i + 500 AS price_i, 'U' AS op, 1 AS seq
         |FROM base WHERE k % 10 = 3
         |UNION ALL SELECT k, status, price_i, 'D', 1 FROM base WHERE k % 10 = 7
         |UNION ALL SELECT k, 'Y', price_i + 900, 'U', 2 FROM base WHERE k % 100 = 3
         |UNION ALL SELECT k + 100000000, 'N', price_i, 'U', 1 FROM base WHERE k % 1000 = 1),
         |unioned AS (SELECT k, status, price_i, 'I' AS op, -1 AS seq FROM base
         |UNION ALL SELECT * FROM chg),
         |latest AS (SELECT k, status, price_i, op FROM (
         |SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
         |FROM unioned) WHERE rn = 1)
         |SELECT status, CAST(MIN(price_i) AS BIGINT) AS min_price_i,
         |CAST(MAX(price_i) AS BIGINT) AS max_price_i
         |FROM latest WHERE op <> 'D' GROUP BY 1 ORDER BY status"""
        .stripMargin.replace("\n", " ")),
    isScore = false)

  /** Fixed key-range cap on the STREAM fixture's mutation waves: bounds
    * the MemoryStream driver-side collect at ~cap/10 × 2 tuples at ANY
    * scale factor (sf-independent by construction; above the sf0.01
    * keyspace, so the smallest verify corpus streams its full waves).
    * Declared BEFORE mvRefreshStream: its oracle SQL interpolates this
    * at object init, and a forward val reference would read 0.
    */
  private val StreamKeyCap = 60000L

  /** STREAMING face of [[mvIncrementalRefresh]]: the same changelog
    * arrives as a real Structured Streaming micro-batch sequence
    * (MemoryStream → foreachBatch), and the MV is maintained BATCH BY
    * BATCH with `MaterializedView.refreshSumCount` — the composition a
    * production freshness pipeline runs (reference `factors/3-current.md:
    * 14-15`: materialized views + streaming as the sub-minute mechanisms).
    * Batch-wise refresh composes because each batch's before-images match
    * the state the previous refresh produced (seq-ordered consistent
    * chains; batch 1 = the seq-1 waves, batch 2 = the seq-2 wave). State
    * is eagerly checkpointed per batch so lineage stays O(1) in the batch
    * count. The oracle is the same FULL recompute as the batch twin:
    * hash match ⇒ stream-incremental ≡ batch-incremental ≡ full.
    * Benched serial-only (Bench.StatefulSet — the blocking micro-batch
    * loop would occupy a FAIR-pool worker for its whole span).
    */
  val mvRefreshStream = Check("mv_refresh_stream",
    (spark, dir) => {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", 2)
      import ss.implicits._
      implicit val sq = ss.sqlContext
      val b = base(ss, dir)
      var mv = b.groupBy("status")
        .agg(count(lit(1)).cast("long").as("n"),
          sum("price_i").cast("long").as("s"))
        .select(col("status").as("g"), col("n"), col("s"))
        .localCheckpoint(true)
      // the same mutation waves as the batch twin, as two micro-batches
      // in seq order (images stay consistent batch-over-batch)
      type Chg =
        (Long, Option[String], Option[Long], Option[String], Option[Long], Long)
      // BOUNDED driver-side collect: the MemoryStream fixture boundary —
      // a test source is necessarily driver-fed (same as
      // freshness_transitions_stream's fixture; a production stream reads
      // Kafka/files and never collects). The waves are capped to the
      // FIXED key range k < StreamKeyCap (VERDICT r8 #7), so the collect
      // is O(cap/10) tuples REGARDLESS of scale factor — at sf0.01 the
      // cap is above the whole keyspace (full waves, like the batch
      // twin); at sf0.1+ it holds the fixture constant while the base
      // snapshot and the refresh itself stay full-corpus distributed.
      def img(df: org.apache.spark.sql.DataFrame): Seq[Chg] =
        df.select(col("k"), col("b_g"), col("b_v"), col("a_g"), col("a_v"),
          col("seq")).as[(Long, Option[String], Option[Long], Option[String], Option[Long], Long)].collect().toSeq
      val capped = b.filter(col("k") < StreamKeyCap)
      val batch1 = img(capped.filter(col("k") % 10 === 3).select(col("k"),
          col("status").as("b_g"), col("price_i").as("b_v"),
          lit("X").as("a_g"), (col("price_i") + 500).cast("long").as("a_v"),
          lit(1L).as("seq"))
        .unionByName(capped.filter(col("k") % 10 === 7).select(col("k"),
          col("status").as("b_g"), col("price_i").as("b_v"),
          lit(null).cast("string").as("a_g"), lit(null).cast("long").as("a_v"),
          lit(1L).as("seq")))
        .unionByName(capped.filter(col("k") % 1000 === 1).select(
          (col("k") + 100000000L).as("k"),
          lit(null).cast("string").as("b_g"), lit(null).cast("long").as("b_v"),
          lit("N").as("a_g"), col("price_i").as("a_v"), lit(1L).as("seq"))))
      val batch2 = img(capped.filter(col("k") % 100 === 3).select(col("k"),
        lit("X").as("b_g"), (col("price_i") + 500).cast("long").as("b_v"),
        lit("Y").as("a_g"), (col("price_i") + 900).cast("long").as("a_v"),
        lit(2L).as("seq")))
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Option[String], Option[Long], Option[String], Option[Long], Long)]
      val q = input.toDF()
        .toDF("k", "b_g", "b_v", "a_g", "a_v", "seq")
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          mv = graft.substrate.MaterializedView
            .refreshSumCount(mv, batch, Seq("k"))
            .localCheckpoint(true)
        }
        .start()
      try {
        Seq(batch1, batch2).foreach { chgs =>
          input.addData(chgs); q.processAllAvailable()
        }
      } finally q.stop()
      mv.select(col("g").as("status"), col("n"),
          col("s").as("total_price_i"))
        .orderBy("status")
    },
    // the batch twin's full-recompute oracle with the SAME k < cap on
    // every mutation wave: hash match ⇒ stream-incremental ≡ full
    Some(
      s"""WITH $BaseSql,
         |chg AS (
         |SELECT k, 'X' AS status, price_i + 500 AS price_i, 'U' AS op, 1 AS seq
         |FROM base WHERE k % 10 = 3 AND k < $StreamKeyCap
         |UNION ALL SELECT k, status, price_i, 'D', 1 FROM base WHERE k % 10 = 7 AND k < $StreamKeyCap
         |UNION ALL SELECT k, 'Y', price_i + 900, 'U', 2 FROM base WHERE k % 100 = 3 AND k < $StreamKeyCap
         |UNION ALL SELECT k + 100000000, 'N', price_i, 'U', 1 FROM base WHERE k % 1000 = 1 AND k < $StreamKeyCap),
         |unioned AS (SELECT k, status, price_i, 'I' AS op, -1 AS seq FROM base
         |UNION ALL SELECT * FROM chg),
         |latest AS (SELECT k, status, price_i, op FROM (
         |SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
         |FROM unioned) WHERE rn = 1)
         |SELECT status, CAST(COUNT(*) AS BIGINT) AS n,
         |CAST(SUM(price_i) AS BIGINT) AS total_price_i
         |FROM latest WHERE op <> 'D' GROUP BY 1 ORDER BY status"""
        .stripMargin.replace("\n", " ")),
    isScore = false)

  val all: Seq[Check] =
    Seq(cdcUpsert, tableDiff, mvIncrementalRefresh, mvIncrementalRefreshAvg,
      mvIncrementalRefreshMinmax, mvRefreshStream)
}
