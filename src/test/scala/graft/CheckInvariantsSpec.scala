package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.checks.{CheckDsl, Checks}
import graft.model.Registry

/** Spec invariants from the reference contract: every check returns `value`
  * in [0,1] (`factors/requirements.yaml:3`), vacuous population scores 1.0
  * (our documented rule, SURVEY.md §7d), and the registry carries exactly
  * the 48 requirement keys.
  */
class CheckInvariantsSpec extends SparkSpec {
  import spark.implicits._

  test("registry holds 48 reference + 1 engine-defined requirements, workload split grep-verified") {
    assert(Registry.all.size == 49)
    import graft.model.Workload
    // 34 reference ST keys + the engine-defined distribution_currency (ST)
    assert(Registry.all.count(_.workloads == Set(Workload.Serving, Workload.Training)) == 35)
    assert(Registry.all.count(_.workloads == Set(Workload.Serving)) == 9)
    assert(Registry.all.count(_.workloads == Set(Workload.Training)) == 5)
  }

  test("every score check emits one row with value in [0,1] and hits <= population") {
    val bad = Checks.all.filter(_.isScore).flatMap { c =>
      val rows = c.run(spark, sf).collect()
      if (rows.length != 1) Some(s"${c.name}: ${rows.length} rows")
      else {
        val r = rows.head
        val v = r.getAs[Double]("value")
        val h = r.getAs[Long]("hits"); val p = r.getAs[Long]("population")
        if (v < 0 || v > 1 || h > p) Some(s"${c.name}: value=$v hits=$h pop=$p")
        else None
      }
    }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("score-check names are registry keys (plus documented operator extras)") {
    val extras = Set("retrieval_recall_compliance") // in registry too
    val unknown = Checks.all.filter(_.isScore).map(_.name)
      .filterNot(Registry.byKey.contains).filterNot(extras)
    assert(unknown.isEmpty, s"score checks not in registry: $unknown")
  }

  test("COMPLETENESS: every one of the 48 requirements has an implemented check") {
    val implemented = Checks.all.filter(_.isScore).map(_.name).toSet
    val missing = Registry.all.map(_.key).filterNot(implemented)
    assert(missing.isEmpty, s"unimplemented requirements: $missing")
  }

  test("registry counts match the documented Counts constants (VERDICT r7 #7)") {
    import graft.checks.Checks.Counts
    assert(Checks.all.length == Counts.total,
      s"Checks.all.length=${Checks.all.length} != Counts.total=${Counts.total} " +
        "— update Checks.Counts AND the README/SURVEY quotes together")
    val noOracle = Checks.all.filter(_.oracle.isEmpty).map(_.name).toSet
    assert(noOracle == Counts.rowsOnlyNames,
      s"rows-only set drifted: registry=$noOracle documented=${Counts.rowsOnlyNames}")
    assert(Checks.all.count(_.oracle.nonEmpty) == Counts.oracled)
  }

  test("registry hygiene: unique names, well-formed oracles") {
    val names = Checks.all.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate check names: ${names.diff(names.distinct)}")
    // an oracle that is present but blank/unbalanced would silently break
    // the driver's DuckDB compare for that query
    Checks.all.flatMap(c => c.oracle.map(c.name -> _)).foreach { case (n, sql) =>
      assert(sql.trim.nonEmpty && sql.count(_ == '(') == sql.count(_ == ')'),
        s"malformed oracle for $n")
      assert(!sql.contains("\n"), s"oracle for $n has literal newlines " +
        "(breaks the single-line JSON dump readability contract)")
    }
  }

  test("valueExpr property: hits/pop in [0,1], vacuous -> 1.0 (ScalaCheck)") {
    val gen = for {
      p <- Gen.chooseNum(0L, 1000000L)
      h <- Gen.chooseNum(0L, p)
    } yield (h, p)
    // one Spark job for the whole sample, not one per case
    val cases = Gen.listOfN(200, gen).sample.get :+ ((0L, 0L))
    val got = cases.toDF("hits", "population")
      .select(col("hits"), col("population"),
        CheckDsl.valueExpr(col("hits"), col("population")))
      .as[(Long, Long, Double)].collect()
    val prop = Prop.forAll(Gen.oneOf(got)) { case (h, p, v) =>
      v >= 0.0 && v <= 1.0 &&
        (p != 0L || v == 1.0) && (p == 0L || v == h.toDouble / p.toDouble)
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }
}
