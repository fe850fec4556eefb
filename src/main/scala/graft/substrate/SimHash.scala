package graft.substrate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash near-duplicate pair search over 64-bit signatures.
  *
  * Banding argument (pigeonhole): two signatures within Hamming distance d
  * agree exactly on at least one of (d+1) disjoint bands — so candidates
  * come from equality joins on band keys (shuffle on 16-bit band values,
  * never all-pairs), and the exact popcount filter runs on candidates
  * only. With 4 bands this is complete for d ≤ 3; pass more bands via
  * `bands` for larger radii.
  */
object SimHash {

  /** Signature table (doc_id, simhash) → (a, b, hamming) pairs with
    * hamming ≤ maxHamming. Complete when bands > maxHamming.
    */
  def nearPairs(sigs: DataFrame, maxHamming: Int, bands: Int = 4): DataFrame = {
    require(bands > maxHamming,
      s"banding completeness needs bands > maxHamming ($bands <= $maxHamming)")
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    val width = 64 / bands
    val banded = (0 until bands).map { b =>
      sigs.select(col("doc_id"), col("simhash"), lit(b).as("band"),
        expr(s"(simhash >> ${b * width}) & ${(1L << width) - 1}").as("bkey"))
    }.reduce(_ unionAll _)
    val cands = banded
      .select(col("band"), col("bkey"), col("doc_id").as("a"), col("simhash").as("sa"))
      .join(banded.select(col("band"), col("bkey"), col("doc_id").as("b"),
        col("simhash").as("sb")), Seq("band", "bkey"))
      .filter(col("a") < col("b"))
      .select("a", "b", "sa", "sb").distinct()
    cands.select(col("a"), col("b"),
        expr("bit_count(sa ^ sb)").cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
