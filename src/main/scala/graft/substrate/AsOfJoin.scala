package graft.substrate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — the hardest join in the engine (SURVEY.md
  * §2.B): for every left row, the latest right row with
  * `right_ts <= left_ts` on the same key, keeping left rows with no match
  * ("features available at inference must match training time", reference
  * `factors/3-current.md:23`; requirement `requirements.yaml:103-105`).
  *
  * Implementation is the UNION + WINDOW formulation, not join-then-rank:
  * tag both sides, union on (key, ts), and carry the last non-null right
  * payload forward with a running window. One shuffle on the key, zero
  * row explosion — a key with R right rows and L left rows costs R+L, not
  * R×L like the naive range-join-then-rank (which at 100 TB explodes on
  * hot keys). Ties (right_ts == left_ts): the right row sorts FIRST
  * (is_left ascending), so an exactly-at-label feature is visible —
  * inclusive as-of.
  */
object AsOfJoin {

  /** @param left      rows to enrich (all preserved)
    * @param right     timestamped payload rows
    * @param key       equi-join key column (both sides)
    * @param leftTs    left event-time column
    * @param rightTs   right event-time column
    * @param rightVals right payload columns to carry
    * @return left columns + matched `rightTs` + payload (nulls if none)
    */
  def asofLeft(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightVals: Seq[String]): DataFrame =
    asofImpl(left, right, key, leftTs, rightTs, rightVals, forward = false)

  /** Forward as-of: for every left row, the EARLIEST right row with
    * `right_ts >= left_ts` (next-observation join — e.g. "first pipeline
    * run after each schema change"). Same union+window shape, window
    * ordered descending; identical one-shuffle/no-explosion cost.
    * Inclusive at equality, like the backward variant.
    */
  def asofLeftForward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightVals: Seq[String]): DataFrame =
    asofImpl(left, right, key, leftTs, rightTs, rightVals, forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightVals: Seq[String],
      forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__isl", lit(1))
      .withColumn("__rts", lit(null).cast("timestamp"))
    val lAligned = rightVals.foldLeft(l)((d, v) =>
      d.withColumn(s"__r_$v", lit(null).cast(right.schema(v).dataType)))

    val rBase = right
      // a NULL right timestamp can never satisfy ts <= left_ts (ASOF
      // semantics) — drop such rows instead of carrying them as matches
      .filter(col(rightTs).isNotNull)
      .withColumn("__ts", col(rightTs))
      .withColumn("__isl", lit(0))
      .withColumn("__rts", col(rightTs))
    val rAligned0 = rightVals.foldLeft(rBase)((d, v) =>
      d.withColumn(s"__r_$v", col(v)))
    // align schemas: right side carries nulls for left payload
    val rAligned = leftCols.filterNot(_ == key).foldLeft(rAligned0)((d, c) =>
      if (d.columns.contains(c)) d else
        d.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val cols = Seq(col(key), col("__ts"), col("__isl"), col("__rts")) ++
      leftCols.filterNot(_ == key).map(col) ++
      rightVals.map(v => col(s"__r_$v"))
    val unioned = lAligned.select(cols: _*)
      .unionByName(rAligned.select(cols: _*))

    // Carry the matched right ROW as one atomic struct (null for left
    // rows, non-null for every right row even when its payload fields are
    // null). Per-column last(ignoreNulls) would mix columns from DIFFERENT
    // right rows and resurrect stale non-null values over a matched row's
    // null payload — diverging from ASOF JOIN row semantics.
    // backward: scan time ascending, carry the last right row seen (the
    // latest <= left_ts). forward: scan time DESCENDING, carry the last
    // right row seen (the earliest >= left_ts). In both, a right row at
    // exactly left_ts sorts before the left row (__isl asc) — inclusive.
    val tsOrder = if (forward) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(key).orderBy(tsOrder, col("__isl").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // payload fields prefixed v_ inside the struct: a right column named
    // "ts" would otherwise collide with the match-timestamp field
    val rowStruct = when(col("__isl") === 0,
      struct((col("__rts").as("ts") +:
        rightVals.map(v => col(s"__r_$v").as(s"v_$v"))): _*))
    val carried = unioned
      .withColumn("__m", last(rowStruct, ignoreNulls = true).over(w))

    carried.filter(col("__isl") === 1)
      .select(leftCols.map(col) ++
        Seq(col("__m.ts").as(s"asof_$rightTs")) ++
        rightVals.map(v => col(s"__m.v_$v").as(v)): _*)
  }
}
