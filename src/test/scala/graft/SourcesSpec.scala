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

  test("documents round-trip csv and orc with identical content") {
    // csv can't carry nested/binary columns — documents is flat, so the
    // full table round-trips; orc is columnar like parquet
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val cs = tmp("csv"); val orc = tmp("orc")
    Io.writeCsv(docs, cs)
    Io.writeOrc(docs, orc, partitionBy = Seq("source"))
    val backCs = Io.readCsv(spark, cs, docs.schema)
    val backOrc = Io.readOrc(spark, orc)
    val cols = docs.columns.toSeq
    assert(backCs.count() == docs.count())
    assert(backOrc.count() == docs.count())
    assert(docs.join(backCs.select(cols.map(col): _*), cols, "left_anti").isEmpty)
    assert(docs.join(backOrc.select(cols.map(col): _*), cols, "left_anti").isEmpty)
    val dirs = new java.io.File(orc).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("source=")))
  }

  test("orc scans push filters down like parquet") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val orc = tmp("orc_push")
    Io.writeOrc(docs, orc)
    val plan = Io.readOrc(spark, orc).filter(col("doc_id") > 100)
      .select("doc_id", "text").queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(doc_id,100)"), s"no pushed filter in:\n$plan")
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
