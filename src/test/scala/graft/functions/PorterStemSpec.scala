package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.plans.GraftExtensions
import graft.text.PorterStemmer

class PorterStemSpec extends SparkSpec {

  test("Column API expression matches the pure-Scala kernel") {
    import spark.implicits._
    val words = Seq("caresses", "relational", "sky", "controlling")
    val got = words.toDF("w")
      .select(PorterStem.stem(col("w"))).as[String].collect()
    assert(got.toSeq == words.map(PorterStemmer.stem))
  }

  test("null safety") {
    import spark.implicits._
    val got = Seq(Some("motoring"), None).toDF("w")
      .select(PorterStem.stem(col("w"))).as[Option[String]].collect()
    assert(got.toSeq == Seq(Some("motor"), None))
  }

  test("expression participates in codegen (no fallback errors on wide use)") {
    import spark.implicits._
    val n = (1 to 1000).map(i => s"generalization$i")
    // non-alpha suffix returns input unchanged; exercise the generated path
    val out = n.toDF("w").select(PorterStem.stem(col("w"))).as[String].collect()
    assert(out.length == 1000 && out.head == "generalization1")
  }
}

/** SQL registration via SparkSessionExtensions needs a session CREATED
  * with the extensions (getOrCreate on an existing session skips them), so
  * build a fresh one over the shared context and restore the default after.
  */
class GraftExtensionsSpec extends AnyFunSuite {
  test("porter_stem usable from SQL when extensions are injected") {
    val shared = SparkSpec.session // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", 2)
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val got = s.sql(
        "SELECT porter_stem(w) AS st FROM VALUES ('oscillators'), ('happy') AS t(w) ORDER BY st")
        .collect().map(_.getString(0)).toSeq
      assert(got == Seq("happi", "oscil"))

      // LevenshteinPrefilter: the threshold filter gains a length guard.
      // Inputs derive from range() so constant folding cannot pre-evaluate
      // the predicate at plan time.
      val pairs = s.range(6)
        .selectExpr("concat('kit', repeat('x', CAST(id AS INT))) AS a", "'kite' AS b")
      val filtered = pairs.where("levenshtein(a, b) <= 2")
      val optimized = filtered.queryExecution.optimizedPlan.toString.toLowerCase
      assert(optimized.contains("abs("), optimized) // the injected guard
      // …and converges (a non-idempotent rule would stack guards)
      assert("abs\\(".r.findAllIn(optimized).length == 1, optimized)
      // results unchanged: matches an unfiltered recomputation
      val expected = pairs.selectExpr("levenshtein(a, b) AS d")
        .collect().count(_.getInt(0) <= 2)
      assert(expected > 0 && filtered.count() == expected)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
