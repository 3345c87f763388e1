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

  test("large-star/small-star agrees with min-label on structured + random graphs") {
    import spark.implicits._
    // structured shapes: long chain (worst case for propagation),
    // star, clique, self-loop singleton, two-node islands
    val chain = (1L until 40L).map(i => (i, i + 1))
    val star = (101L to 120L).map(i => (100L, i))
    val clique = for (i <- 200L to 207L; j <- (i + 1) to 207L) yield (i, j)
    val loops = Seq((500L, 500L), (601L, 600L))
    // deterministic pseudo-random edges over a 300-node id space
    val rnd = new scala.util.Random(42)
    val random = (1 to 400).map(_ => (rnd.nextInt(300).toLong + 1000L,
      rnd.nextInt(300).toLong + 1000L))
    val edges = (chain ++ star ++ clique ++ loops ++ random).toDF("src", "dst")
    val a = Graph.connectedComponents(edges).as[(Long, Long)].collect().toMap
    graft.Caches.clearPersisted()
    val b = Graph.connectedComponentsStars(edges).as[(Long, Long)].collect().toMap
    graft.Caches.clearPersisted()
    assert(a == b)
    assert(b(40L) == 1L && b(120L) == 100L && b(500L) == 500L && b(601L) == 600L)
  }
}
