package graft

import org.apache.spark.sql.functions._

/** ngram_contamination (13-gram benchmark-decontamination diagnostic)
  * against an independent driver-side recomputation: collect the sf0.001
  * corpus (57 test docs) and rebuild splits, 13-gram sets, and the
  * shared-span counts in plain Scala collections.
  */
class NgramContaminationSpec extends SparkSpec {
  import spark.implicits._

  test("matches a driver-side recomputation on sf0.001") {
    val out = graft.checks.PipelineTier.ngramContamination.run(spark, sf)
      .as[(Long, Long)].collect().toMap

    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    def split(id: Long): String = {
      val b = ((id * 2654435761L + 40503L) % 2147483647L) % 100
      if (b < 80) "train" else if (b < 90) "validation" else "test"
    }
    def grams(t: String): Set[String] = {
      val ts = t.trim.split("\\s+")
      if (ts.length < 13) Set.empty
      else ts.sliding(13).map(_.mkString(" ")).toSet
    }
    val trainGrams = texts.filter(d => split(d._1) == "train")
      .flatMap(d => grams(d._2)).toSet
    val expected = texts.filter(d => split(d._1) == "test")
      .map(d => d._1 -> grams(d._2).count(trainGrams.contains).toLong)
      .filter(_._2 > 0).toMap

    assert(out == expected,
      s"mismatch: spark=$out expected=$expected")
    assert(expected.nonEmpty, "fixture must exercise a non-empty overlap")
  }
}
