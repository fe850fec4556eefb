package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Io

/** Source/sink layer: schema-enforced round-trips and failure-on-drift
  * (reference `factors/2-consumable.md:17` native formats;
  * `1-contextual.md:13` typed schemas).
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_io_$name").toString

  test("documents round-trip parquet and json-lines with identical content") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val pq = tmp("pq"); val js = tmp("js")
    Io.writeParquet(docs, pq, partitionBy = Seq("source"))
    Io.writeJsonLines(docs, js)
    val backPq = Io.readParquet(spark, pq)
    val backJs = Io.readJsonLines(spark, js, docs.schema)
    assert(backPq.count() == docs.count())
    assert(backJs.count() == docs.count())
    // content equality via anti-joins on the full row
    val cols = docs.columns.toSeq
    assert(docs.join(backPq.select(cols.map(col): _*), cols, "left_anti").isEmpty)
    assert(docs.join(backJs.select(cols.map(col): _*), cols, "left_anti").isEmpty)
    // partitioned layout actually produced hive-style source= directories
    val dirs = new java.io.File(pq).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("source=")))
  }

  test("readJsonLines FAILFAST aborts on schema drift instead of nulling") {
    val dir = tmp("drift")
    Seq("""{"id": 1, "v": "ok"}""", """{"id": "not-a-number", "v": "bad"}""")
      .toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType)))
    val ex = intercept[Exception] {
      Io.readJsonLines(spark, dir, schema).collect()
    }
    assert(ex.getMessage != null)
  }

  test("parseJsonColumn decodes events.props against a declared schema") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"$sf/events.parquet").limit(50)
    val schema = spark.range(1).sparkSession.read
      .json(events.select("props").as[String]).schema
    val parsed = Io.parseJsonColumn(events, "props", schema)
    assert(parsed.schema("props").dataType.isInstanceOf[StructType])
    assert(parsed.filter(col("props").isNull).count() == 0)
  }
}
