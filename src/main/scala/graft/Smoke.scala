package graft
import org.apache.spark.sql.SparkSession
/** Local mimic of the driver's t1 smoke gate: `SparkEntry.entry` on sf0.001
  * must return >0 rows — run with a plain session (no special configs) to
  * prove the library works under the driver's own SparkSession too.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(60, truncate = false)
    println(s"SMOKE rows=$n ${if (n > 0) "OK" else "EMPTY"}")
    spark.stop()
  }
}
