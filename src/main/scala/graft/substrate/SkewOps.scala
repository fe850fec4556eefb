package graft.substrate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for 100 TB shapes (SURVEY.md prompt: "salting
  * for skew, AQE for runtime re-plan"). AQE's skew-join handling covers
  * sort-merge joins automatically; these cover the aggregation and
  * broadcast-side cases AQE doesn't.
  */
object SkewOps {

  /** Two-phase salted aggregation: groupBy(key) where a handful of hot keys
    * would overwhelm single reducers. Phase 1 aggregates on (key, salt) —
    * hot keys fan out over `salts` reducers; phase 2 merges the partials.
    * Correct for any commutative+associative partial: the caller supplies
    * the phase-1 partial aggs and the matching phase-2 merge.
    *
    * Example — skew-safe count:
    * {{{
    * saltedAgg(df, Seq("user_id"), 16,
    *   partial = Seq(count(lit(1)).as("c")),
    *   merge   = Seq(sum("c").as("c")))
    * }}}
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val phase1 = salted.groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    phase1.groupBy(keys.map(col): _*).agg(merge.head, merge.tail: _*)
  }

  /** Hot-key split join: broadcast-join the given hot keys, shuffle-join the
    * rest, union. The standard remedy when ONE side's hot keys would skew a
    * shuffle join and the matching right-side rows for those keys fit in a
    * broadcast.
    */
  def hotKeySplitJoin(left: DataFrame, right: DataFrame, key: String,
      hotKeys: Seq[Any]): DataFrame = {
    val hotL = left.filter(col(key).isin(hotKeys: _*))
    val coldL = left.filter(!col(key).isin(hotKeys: _*))
    val hotR = right.filter(col(key).isin(hotKeys: _*))
    hotL.join(broadcast(hotR), Seq(key))
      .unionByName(coldL.join(right, Seq(key)))
  }
}
