package graft.substrate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — the temporal-validity primitive the
  * reference's valid-time declarations imply (`factors/requirements.yaml:
  * 21-23` "effective dates, as-of dates, or valid-time ranges"; SURVEY.md
  * §2.B theta/range join).
  *
  * Scale path: a naive `p BETWEEN s AND e` theta join plans as a
  * nested-loop over |L|·|R| — unusable when both sides are large. Binning
  * makes it an EQUI join: each interval explodes to the fixed-width
  * buckets it covers (bounded fan-out = ceil(len/width)+1, choose width ~
  * typical interval length), each point maps to exactly ONE bucket, the
  * join shuffles on bucket id, and the exact BETWEEN predicate filters
  * residually inside matched buckets. No duplicates by construction (a
  * point joins only its own bucket) — no post-dedup pass needed.
  */
object RangeJoin {

  /** Join left rows (point timestamp `pointCol`) to right rows (interval
    * [`startCol`, `endCol`], inclusive both ends) — returns matched pairs
    * with all columns of both inputs.
    *
    * @param bucketSeconds bin width; size to the TYPICAL interval length
    *        so fan-out stays O(1) per interval.
    */
  def pointInInterval(left: DataFrame, pointCol: String,
      right: DataFrame, startCol: String, endCol: String,
      bucketSeconds: Long = 3600L): DataFrame = {
    def bucketOf(c: Column): Column =
      floor(unix_timestamp(c) / lit(bucketSeconds))
    val l = left.withColumn("__bucket", bucketOf(col(pointCol)))
    val r = right.withColumn("__bucket",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    l.join(r, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Interval-overlap join — the valid-time primitive
    * (`factors/requirements.yaml:21-23` "valid-time ranges"): left rows
    * [lStart, lEnd] × right rows [rStart, rEnd] where the closed
    * intervals intersect. Same binning; each pair could share MANY
    * buckets, so instead of a post-join dedup the pair is emitted only in
    * its canonical bucket — the later of the two start buckets (which
    * both intervals necessarily cover when they overlap): duplicate-free
    * by construction, no distinct shuffle.
    */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      bucketSeconds: Long = 3600L): DataFrame = {
    def bucketOf(c: Column): Column =
      floor(unix_timestamp(c) / lit(bucketSeconds))
    val l = left.withColumn("__bucket",
      explode(sequence(bucketOf(col(lStart)), bucketOf(col(lEnd)))))
    val r = right.withColumn("__bucket",
      explode(sequence(bucketOf(col(rStart)), bucketOf(col(rEnd)))))
    l.join(r, Seq("__bucket"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bucket") ===
        greatest(bucketOf(col(lStart)), bucketOf(col(rStart))))
      .drop("__bucket")
  }
}
