package graft.substrate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-based diff of two dataset versions — the observability primitive
  * behind the reference's version/change requirements: "immutable version
  * identifiers enabling point-in-time reconstruction" (`/root/reference/
  * factors/requirements.yaml:136-138`) and "automated change detection"
  * (`requirements.yaml:91-93`) both presuppose being able to state WHAT
  * changed between two versions.
  *
  * Classification per key: `added` (only in the new version), `removed`
  * (only in the old), `changed` (both, any non-key column differs under
  * null-safe equality), `unchanged` (all non-key columns null-safe equal).
  *
  * Scale shape: one full-outer shuffle join on the key; the comparison is
  * a per-row expression (no second pass). Keys must be unique per side —
  * version snapshots are keyed by definition.
  */
object TableDiff {

  /** @return one row per key present in either version:
    *         key columns + `diff_status` string.
    */
  def byKey(oldV: DataFrame, newV: DataFrame, keys: Seq[String]): DataFrame = {
    require(oldV.columns.sameElements(newV.columns),
      "diff requires identical schemas (align columns first)")
    val nonKey = oldV.columns.toSeq.filterNot(keys.contains)
    val l = oldV.select(oldV.columns.map(c =>
      col(c).as(if (keys.contains(c)) c else s"__l_$c")): _*)
      .withColumn("__in_old", lit(true))
    val r = newV.select(newV.columns.map(c =>
      col(c).as(if (keys.contains(c)) c else s"__r_$c")): _*)
      .withColumn("__in_new", lit(true))
    val same = nonKey
      .map(c => col(s"__l_$c") <=> col(s"__r_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    l.join(r, keys, "full_outer")
      .select(keys.map(col) :+
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(same, "unchanged")
          .otherwise("changed").as("diff_status"): _*)
  }
}
