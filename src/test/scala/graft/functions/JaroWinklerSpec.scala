package graft.functions

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class JaroWinklerSpec extends SparkSpec {

  test("published reference values") {
    val eps = 1e-12
    assert(math.abs(JaroWinkler.similarity("martha", "marhta") - 0.9611111111111111) < eps)
    assert(math.abs(JaroWinkler.similarity("dixon", "dicksonx") - 0.8133333333333332) < eps)
    assert(math.abs(JaroWinkler.similarity("dwayne", "duane") - 0.84) < 1e-10)
    assert(math.abs(JaroWinkler.similarity("jellyfish", "smellyfish") - 0.8962962962962964) < eps)
  }

  test("edge cases: empty, equal, disjoint, window-zero") {
    assert(JaroWinkler.similarity("", "") == 1.0)
    assert(JaroWinkler.similarity("", "abc") == 0.0)
    assert(JaroWinkler.similarity("abc", "") == 0.0)
    assert(JaroWinkler.similarity("same", "same") == 1.0)
    assert(JaroWinkler.similarity("abc", "xyz") == 0.0)
    // window = max(2,2)/2-1 = 0: only same-position chars can match,
    // so a transposed bigram scores ZERO (the classic surprise)
    assert(JaroWinkler.similarity("ab", "ba") == 0.0)
  }

  test("boost threshold: no prefix bonus at jaro <= 0.7") {
    // common 4-char prefix but low jaro — bonus must NOT apply
    // (DuckDB parity case: jaro_winkler_similarity = jaro here)
    val j = JaroWinkler.similarity("prefix_low_sim", "prefzzzzzzzzzz")
    assert(math.abs(j - 0.5238095238095238) < 1e-12)
  }

  test("floored transpositions (DuckDB/rapidfuzz convention)") {
    // 'small rod' vs 'cold bolt': 4 matches, 3 out-of-order -> floored
    // t=1 gives 0.5462..., Winkler's half-count t=1.5 would give 0.5046...
    val j = JaroWinkler.similarity("small rod", "cold bolt")
    assert(math.abs(j - 0.5462962962962963) < 1e-12)
  }

  test("null safety and codegen participation on wide use") {
    import spark.implicits._
    val rows = (1 to 1000).map(i => (Some(s"name$i"), Some(s"name${i + 1}"))) :+
      ((None: Option[String], Some("x")))
    val got = rows.toDF("a", "b")
      .select(JaroWinkler.jaroWinkler(col("a"), col("b")).as("jw"))
      .as[Option[Double]].collect()
    assert(got.length == 1001 && got.last.isEmpty && got.head.exists(_ > 0.9))
  }

  test("SQL function registration via extensions") {
    import org.apache.spark.sql.SparkSession
    val shared = graft.SparkSpec.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", 2)
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.plans.GraftExtensions)
        .getOrCreate()
      // non-literal input so constant folding can't bypass codegen
      val got = s.range(1)
        .selectExpr("round(jaro_winkler(concat('marth', 'a'), 'marhta'), 4) AS jw")
        .head().getDouble(0)
      assert(got == 0.9611)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
