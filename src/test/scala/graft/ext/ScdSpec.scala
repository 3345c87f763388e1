package graft.ext

import graft.SparkSpec

class ScdSpec extends SparkSpec {

  test("type2 collapses runs into effective-dated versions") {
    import spark.implicits._
    val log = Seq(
      ("a", 10L, 1L, "P1"),
      ("a", 20L, 2L, "P1"), // same attr: same version
      ("a", 30L, 3L, "P2"), // change: version 2
      ("a", 40L, 4L, "P1"), // change back: version 3 (not merged with v1)
      ("b", 10L, 5L, "P9")  // single-row key
    ).toDF("k", "ts", "tie", "attr")

    val got = Scd.type2(log, "k", "attr", "ts", "tie")
      .as[(String, Long, String, Long, Option[Long], Long)]
      .collect().sortBy(r => (r._1, r._2)).toList

    assert(got == List(
      ("a", 1L, "P1", 10L, Some(30L), 2L),
      ("a", 2L, "P2", 30L, Some(40L), 1L),
      ("a", 3L, "P1", 40L, None, 1L),
      ("b", 1L, "P9", 10L, None, 1L)))
  }

  test("type2 versions tile the timeline: eff_to equals next eff_from") {
    import spark.implicits._
    val log = (0 until 200).map { i =>
      val k = s"k${i % 7}"
      (k, i.toLong, i.toLong, s"v${(i / 13) % 3}")
    }.toDF("k", "ts", "tie", "attr")
    val rows = Scd.type2(log, "k", "attr", "ts", "tie")
      .as[(String, Long, String, Long, Option[Long], Long)].collect()
    rows.groupBy(_._1).foreach { case (_, vs) =>
      val sorted = vs.sortBy(_._2)
      // exactly one open (current) version per key, and it is the last
      assert(sorted.init.forall(_._5.isDefined) && sorted.last._5.isEmpty)
      // each closed version's eff_to is the successor's eff_from
      sorted.sliding(2).foreach {
        case Array(prev, next) => assert(prev._5.contains(next._4))
        case _ =>
      }
      // versions are 1..n with no gaps
      assert(sorted.map(_._2).toList == (1L to sorted.length).toList)
    }
  }
}
