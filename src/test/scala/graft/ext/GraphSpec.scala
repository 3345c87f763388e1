package graft.ext

import graft.SparkSpec

class GraphSpec extends SparkSpec {

  test("connected components: chain, triangle, isolated pair") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3 forces several propagation rounds),
    // triangle 10-11-12, pair 20-21
    val edges = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L),
      (10L, 11L), (11L, 12L), (12L, 10L),
      (21L, 20L)).toDF("src", "dst")
    val got = Graph.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    graft.Caches.clearPersisted()
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("self-loops and duplicate edges are harmless") {
    import spark.implicits._
    val edges = Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L)).toDF("src", "dst")
    val got = Graph.connectedComponents(edges).as[(Long, Long)].collect().toMap
    graft.Caches.clearPersisted()
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }
}
