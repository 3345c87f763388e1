package graft.ext

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  test("backward as-of attaches the latest right row at-or-before each left time") {
    import spark.implicits._
    val left = Seq((1L, 10L, "e1"), (1L, 20L, "e2"), (2L, 5L, "e3"), (3L, 9L, "e4"))
      .toDF("k", "lt", "tag")
    val right = Seq((1L, 10L, 100L), (1L, 15L, 101L), (2L, 6L, 200L))
      .toDF("k", "rt", "v")
    val out = AsOfJoin.backward(left, right, "k", "lt", "rt", Seq("v"))
      .as[(Long, Long, String, Long, Long)].collect()
      .map(r => r._3 -> (r._4, r._5)).toMap

    // equal timestamps: the right row IS visible (>= semantics)
    assert(out("e1") == (100L, 10L))
    // strictly-later right rows are not; the latest earlier one wins
    assert(out("e2") == (101L, 15L))
    // left rows with no at-or-before match drop (inner as-of), as do
    // keys absent from the right side
    assert(!out.contains("e3") && !out.contains("e4"))
    assert(out.size == 2)
  }

  test("as-of result matches a per-row scan on random-ish data") {
    import spark.implicits._
    // deterministic pseudo-random fixture; verify against a brute-force
    // driver-side reimplementation
    val lrows = (0 until 80).map(i => ((i % 5).toLong, (i * 37 % 100).toLong, i.toLong))
    val rrows = (0 until 30).map(i => ((i % 5).toLong, (i * 23 % 90).toLong, (1000 + i).toLong))
      // one right row per (key, time): keep max id like the query contract
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
    val l = lrows.toDF("k", "lt", "id")
    val r = rrows.toDF("k", "rt", "v")
    val got = AsOfJoin.backward(l, r, "k", "lt", "rt", Seq("v"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(x => x._3 -> (x._4, x._5)).toMap
    val want = lrows.flatMap { case (k, lt, id) =>
      val matches = rrows.filter(rr => rr._1 == k && rr._2 <= lt)
      if (matches.isEmpty) None
      else {
        val m = matches.maxBy(rr => (rr._2, rr._3))
        Some(id -> (m._3, m._2))
      }
    }.toMap
    assert(got == want)
  }
}
