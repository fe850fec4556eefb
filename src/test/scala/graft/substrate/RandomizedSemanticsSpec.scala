package graft.substrate

import java.sql.Timestamp

import scala.util.Random

import graft.SparkSpec

/** Seeded randomized scenarios for the two operators with the subtlest
  * semantics — CDC merge and the as-of joins — each compared against a
  * direct in-memory reference implementation. Ten corpora per operator,
  * deterministic under fixed seeds.
  */
class RandomizedSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("CDC merge matches a sequential in-memory fold (10 random logs)") {
    for (seed <- 1 to 10) {
      val rng = new Random(seed)
      val keys = (1L to 8L)
      val base = keys.filter(_ => rng.nextBoolean())
        .map(k => (k, s"b$k", rng.nextInt(100).toLong))
      // unique (key, seq): shuffle a seq range per key
      val changes = keys.flatMap { k =>
        val n = rng.nextInt(4)
        rng.shuffle((1 to 6).toList).take(n).map { s =>
          val op = if (rng.nextInt(4) == 0) "D" else "U"
          (k, s"c$k-$s", rng.nextInt(100).toLong, op, s.toLong)
        }
      }
      // reference: highest seq wins per key (base = seq -inf), D drops
      val expected = keys.flatMap { k =>
        val cs = changes.filter(_._1 == k)
        if (cs.isEmpty) base.find(_._1 == k).map(b => (b._1, b._2, b._3))
        else {
          val w = cs.maxBy(_._5)
          if (w._4 == "D") None else Some((w._1, w._2, w._3))
        }
      }.toSet
      val out = Cdc.applyChangeLog(
        base.toDF("k", "s", "v"),
        changes.toDF("k", "s", "v", "op", "seq"), Seq("k"))
        .as[(Long, String, Long)].collect().toSet
      assert(out == expected, s"seed $seed: $out != $expected")
    }
  }

  test("incremental dedup == full dedup restricted to delta×corpus (8 random corpora)") {
    import org.apache.spark.sql.functions.{col, explode}
    // random word-soup corpora with planted cross-set near-dups: the
    // incremental matcher must find EXACTLY the pairs the full self-dedup
    // of (delta ∪ corpus) finds between the two sets — no more (it never
    // compares corpus to itself) and no fewer (same signatures, same bands)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omi", "pi")
    for (seed <- 1 to 8) {
      val rng = new Random(seed)
      def doc(): String =
        Seq.fill(8 + rng.nextInt(8))(vocab(rng.nextInt(vocab.size))).mkString(" ")
      val corpus = (1L to 12L).map(i => (i, doc()))
      // delta: fresh random docs + near-dup re-ingests (drop first token)
      val delta = (101L to 106L).map(i => (i, doc())) ++
        corpus.filter(_._1 % 4 == 0).map { case (i, t) =>
          (i + 1000L, t.split(" ").drop(1).mkString(" "))
        }
      def sh(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
        .select(col("doc_id"),
          explode(TextOps.wordTrigrams(col("text"))).as("shingle"))
      val incremental = MinHashLsh.nearDupPairsAgainst(sh(delta), sh(corpus),
          numPerms = 8, bandRows = 2, threshold = 0.5)
        .select("a", "b").as[(Long, Long)].collect().toSet
      val deltaIds = delta.map(_._1).toSet
      val fullPairs: Set[(Long, Long)] = MinHashLsh
        .nearDupPairs(sh(corpus ++ delta),
          numPerms = 8, bandRows = 2, threshold = 0.5)
        .select("a", "b").as[(Long, Long)].collect().toSet
      // orient cross-set pairs as (delta, corpus); drop within-set pairs
      val full = fullPairs.flatMap { p =>
        val (a, b) = p
        if (deltaIds.contains(a) && !deltaIds.contains(b)) Some((a, b))
        else if (deltaIds.contains(b) && !deltaIds.contains(a)) Some((b, a))
        else None
      }
      assert(incremental == full, s"seed $seed: $incremental != $full")
      // every planted re-ingest must be present
      val planted = corpus.filter(_._1 % 4 == 0).map(c => (c._1 + 1000L, c._1)).toSet
      assert(planted.subsetOf(incremental), s"seed $seed missed planted: $planted")
    }
  }

  test("attribution interval join matches a nested-loop reference (10 corpora)") {
    // random event times incl. exact-boundary collisions (minute
    // granularity forces ties and window-edge hits); reference = the
    // naive all-pairs filter the interval join must equal
    val windowMin = 10
    for (seed <- 1 to 10) {
      val rng = new Random(seed)
      def events(n: Int) = (1 to n).map(_ =>
        (1L + rng.nextInt(4), ts(rng.nextInt(50))))
      val trig = events(15)
      val conv = events(15)
      val expected = (for {
        (tu, tt) <- trig
        (cu, ct) <- conv
        if cu == tu && ct.getTime >= tt.getTime &&
          ct.getTime <= tt.getTime + windowMin * 60000L
      } yield (tu, tt, ct)).toSet
      val out = graft.streaming.FreshnessMonitor.attributionJoin(
          trig.toDF("user_id", "ts"), conv.toDF("user_id", "ts"),
          windowMinutes = windowMin)
        .as[(Long, Timestamp, Timestamp)].collect().toSet
      assert(out == expected, s"seed $seed: ${out.size} vs ${expected.size}")
    }
  }

  test("as-of joins match an in-memory scan, both directions (10 corpora)") {
    for (seed <- 1 to 10) {
      val rng = new Random(seed + 100)
      val keys = (1L to 5L)
      // unique right ts per key so the expected match is unambiguous
      val rights = keys.flatMap { k =>
        rng.shuffle((0 until 50).toList).take(rng.nextInt(6))
          .map(m => (k, ts(m), s"v$k-$m"))
      }
      val lefts = keys.flatMap { k =>
        Seq.fill(rng.nextInt(3) + 1)((k, ts(rng.nextInt(50)), s"l$k"))
      }.distinct
      val l = lefts.toDF("entity_id", "label_ts", "label")
      val r = rights.toDF("entity_id", "feature_ts", "value")

      def expected(forward: Boolean) = lefts.map { case (k, lt, _) =>
        val cands = rights.filter(x => x._1 == k &&
          (if (forward) !x._2.before(lt) else !x._2.after(lt)))
        val pick =
          if (cands.isEmpty) None
          else Some(if (forward) cands.minBy(_._2.getTime) else cands.maxBy(_._2.getTime))
        (k, lt) -> pick.map(p => (p._2, p._3))
      }.toMap

      def run(forward: Boolean) = {
        val df = if (forward)
          AsOfJoin.asofLeftForward(l, r, "entity_id", "label_ts", "feature_ts", Seq("value"))
        else
          AsOfJoin.asofLeft(l, r, "entity_id", "label_ts", "feature_ts", Seq("value"))
        df.collect().map { row =>
          (row.getAs[Long]("entity_id"), row.getAs[Timestamp]("label_ts")) ->
            Option(row.getAs[Timestamp]("asof_feature_ts"))
              .map(t => (t, row.getAs[String]("value")))
        }.toMap
      }

      assert(run(forward = false) == expected(forward = false), s"seed $seed backward")
      assert(run(forward = true) == expected(forward = true), s"seed $seed forward")
    }
  }
}
