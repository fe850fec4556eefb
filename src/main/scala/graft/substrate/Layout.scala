package graft.substrate

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Physical-layout control (reference `factors/requirements.yaml:42-44`
  * clustering keys; SURVEY.md §2.B "bucketing for co-located joins").
  *
  * Bucketed tables pre-shuffle data by the join key at WRITE time: two
  * tables bucketed the same way join with ZERO exchange — at 100 TB this
  * converts every recurring fact-fact join from a full network shuffle
  * into a local zip of bucket files. The layout IS what check #9
  * (access_optimization) scores the presence of.
  */
object Layout {

  /** Write `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Range-CLUSTERED parquet write — the "clustering keys" layout check
    * #9 literally scores (`requirements.yaml:42-44`: "large tables with
    * clustering keys"): range-partition by the key, sort within
    * partitions, so every file (and every row group inside it) covers a
    * narrow key interval and carries tight parquet min/max statistics. A
    * key-range scan then skips whole row groups at read time — LayoutSpec
    * measures the scan's output rows collapsing under a selective filter.
    * At 100 TB this is the difference between reading one file and
    * reading the table; `numFiles` sizes the write parallelism (one range
    * per file).
    */
  def writeClustered(df: DataFrame, path: String, key: String,
      numFiles: Int): Unit =
    df.repartitionByRange(numFiles, org.apache.spark.sql.functions.col(key))
      .sortWithinPartitions(key)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Bit-interleaved Morton (z-order) value of two non-negative ints,
    * `bits` bits each: bit i of `x` lands at position 2i, bit i of `y`
    * at 2i+1, so consecutive z-values trace the space-filling z-curve and
    * any z-RANGE covers a bounded rectangle in (x, y). Pure integer
    * shift/mask arithmetic — codegen'd map-side, and reproduced verbatim
    * by the `zorder_cluster_stats` oracle ([[zValueSql]]).
    *
    * Inputs must already be bounded to `bits` bits (callers map raw keys
    * through % (1 << bits) or a rank/ntile first — the standard z-order
    * dictionary step); values outside would silently collide, so bound
    * the DOMAIN, not the z.
    */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** [[zValue]] as SQL over column expressions `x` and `y` — the same
    * shift/mask terms OR-folded, engine-exact integer arithmetic.
    */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1}))"
    }.mkString("(", " | ", ")")

  /** Z-ORDER clustered parquet write — [[writeClustered]] generalized to
    * TWO predicate dimensions: range-partition and sort by the interleaved
    * z-value, then drop it, so every file/row group covers a small
    * RECTANGLE in (xCol, yCol) and carries tight min/max stats on BOTH
    * columns. A single-key sort gives perfect pruning on the sort key and
    * none on the second dimension; the z-curve trades a constant factor on
    * each for row-group skipping on either (or both) — the standard
    * lakehouse layout for two-dimensional scan predicates (OPTIMIZE
    * ZORDER BY). LayoutSpec measures a two-sided rectangle scan pruning
    * ~the selectivity PRODUCT under z vs one factor under a single-key
    * sort. Both columns must already be bounded to `bits` bits
    * ([[zValue]]'s domain contract — a modulo here would silently break
    * rectangle locality for out-of-range keys instead of failing them).
    */
  def writeZClustered(df: DataFrame, path: String, xCol: String,
      yCol: String, bits: Int, numFiles: Int): Unit =
    df.withColumn("_z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Small-file compaction plan (the lakehouse OPTIMIZE/bin-pack
    * primitive): group each partition's files, in key order, into
    * target-sized compaction bins — `bin = floor(preceding_bytes /
    * target)`, the streaming first-fit that preserves file order (so a
    * clustered layout stays clustered through compaction) and never
    * splits a file. Oversized files occupy bins alone, as they must.
    *
    * Input `files` is a LISTING — (part, file, bytes), metadata scale
    * (O(#files), ~10⁶ rows at 100 TB, not O(rows)) — and the window
    * partitions by `part`, the same scoping real table formats compact
    * under (cross-partition bins would merge partition boundaries away).
    * `target` is a Column so callers can derive it from the listing
    * itself declaratively. The running sums are exact in doubles up to
    * 2^53 bytes (≈ 9 PB) per partition. Output: one row per planned
    * compaction task — (part, bin, n_files, total_bytes, first_file,
    * last_file).
    */
  def compactionPlan(files: DataFrame, target: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("part").orderBy("file")
    files
      .withColumn("_pre", sum(col("bytes")).over(w) - col("bytes"))
      .withColumn("bin",
        floor(col("_pre").cast("double") / target.cast("double")).cast("long"))
      .groupBy("part", "bin")
      .agg(count(lit(1)).as("n_files"), sum("bytes").as("total_bytes"),
        min("file").as("first_file"), max("file").as("last_file"))
  }
}
