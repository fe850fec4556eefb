package graft.substrate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture merge: apply a change log to a base snapshot,
  * producing the current state. This is the incremental-processing
  * primitive the reference's Factor 3 presupposes when it scores
  * pipelines on "incremental processing (CDC, streaming, or delta
  * processing) rather than full reloads" (`/root/reference/factors/
  * requirements.yaml:123-125`) — the assessment checks *whether*
  * pipelines are incremental; this operator is *how* an incremental
  * pipeline folds its deltas.
  *
  * Semantics: per key, the change with the highest sequence number wins;
  * base rows carry an implicit sequence of Long.MinValue (any real change
  * outranks them); a winning `op = 'D'` removes the key. (key, seq) must
  * be unique within the union of base and changes — standard CDC-log
  * discipline (a log with two changes at the same LSN is malformed).
  *
  * Scale shape: ONE shuffle on the key, folded by `max_by(struct, seq)`
  * aggregation with map-side partial aggregation (plans as SortAggregate —
  * struct buffers aren't hash-agg eligible — but the partial_max_by still
  * runs BEFORE the exchange), unlike the window-sort formulation which
  * must materialize and sort every version of a hot key in one partition.
  * At 100 TB with daily deltas this is the standard merge-on-read
  * compaction shape: |base| + |changes| rows in, |keys| rows out, no
  * driver-side state.
  */
object Cdc {

  val DeleteOp = "D"

  /** @param base    current snapshot; columns = data columns (no op/seq).
    * @param changes change log; base's columns + `opCol` + `seqCol`.
    * @param keys    key column names (present in both inputs).
    * @return the merged snapshot with base's schema.
    */
  def applyChangeLog(base: DataFrame, changes: DataFrame, keys: Seq[String],
      seqCol: String = "seq", opCol: String = "op"): DataFrame = {
    val dataCols = base.columns.toSeq
    require(!dataCols.contains(seqCol) && !dataCols.contains(opCol),
      s"base must not already have a '$seqCol'/'$opCol' column — pass " +
        "different seqCol/opCol names")
    require(dataCols.forall(changes.columns.contains),
      s"changes must carry all base columns; missing ${
        dataCols.filterNot(changes.columns.contains).mkString(",")}")
    val nonKey = dataCols.filterNot(keys.contains)
    val unioned = base
      .withColumn(opCol, lit("I"))
      .withColumn(seqCol, lit(Long.MinValue))
      .unionByName(changes.select(dataCols.map(col) :+ col(opCol) :+
        col(seqCol).cast("long"): _*))
    val payload = struct((nonKey.map(col) :+ col(opCol)).map(c => c): _*)
    unioned
      .groupBy(keys.map(col): _*)
      .agg(max_by(payload, col(seqCol)).as("__latest"))
      .filter(col(s"__latest.$opCol") =!= DeleteOp)
      .select(keys.map(col) ++ nonKey.map(c => col(s"__latest.$c").as(c)): _*)
  }
}
