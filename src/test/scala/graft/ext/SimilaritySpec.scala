package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  test("dot / norm / cosine on known vectors") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(1.0f, 1.0f), Seq(1.0f, 1.0f)),
      (Seq(3.0f, 4.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
    val got = df.select(
      Similarity.dot(col("a"), col("b")).as("d"),
      Similarity.cosine(col("a"), col("b")).as("c"))
      .as[(Double, Double)].collect()
    assert(got(0) == (0.0, 0.0))
    assert(math.abs(got(1)._2 - 1.0) < 1e-12)
    assert(got(2)._1 == 25.0)
    assert(math.abs(got(2)._2 - 1.0) < 1e-12)
  }

  private lazy val vecs = {
    import spark.implicits._
    Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f), 0),
      (1L, Seq(0.9f, 0.1f, 0.0f), 0),
      (2L, Seq(0.0f, 1.0f, 0.0f), 1),
      (3L, Seq(0.0f, 0.95f, 0.05f), 1),
      (4L, Seq(0.0f, 0.0f, 1.0f), 2)).toDF("vec_id", "embedding", "label")
  }

  test("brute-force top-k ranks the nearest vector first") {
    import spark.implicits._
    val knn = Similarity.bruteForceTopK(
      vecs.select("vec_id", "embedding"),
      vecs.filter(col("vec_id") === 0).select("vec_id", "embedding"), k = 2)
      .as[(Long, Long, Double, Int)].collect()
    assert(knn.length == 2)
    assert(knn(0)._2 == 1L && knn(0)._4 == 1) // vec 1 is closest to vec 0
    assert(knn(0)._3 > 0.99)
  }

  test("LSH bucket ids are deterministic and bounded") {
    import spark.implicits._
    val b1 = Similarity.lshBuckets(vecs, planes = 8, dim = 3)
      .as[(Long, Long)].collect().sortBy(_._1)
    val b2 = Similarity.lshBuckets(vecs, planes = 8, dim = 3)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(b1.toSeq == b2.toSeq)
    assert(b1.forall(r => r._2 >= 0 && r._2 < 256))
  }

  test("bucketed near-dup pairs only emit same-bucket pairs with cos >= threshold") {
    import spark.implicits._
    val pairs = Similarity.cosineNearDupPairs(vecs, threshold = 0.9, planes = 4, dim = 3)
      .as[(Long, Long, Double)].collect()
    pairs.foreach { case (a, b, c) => assert(a < b && c >= 0.9) }
    // the planted near pairs have cos > 0.99; if LSH put them in one
    // bucket they must be found — verify no false positives at least
    assert(!pairs.exists { case (a, b, _) => (a, b) == (0L, 4L) })
  }

  test("ivfAssign puts each centroid in its own cluster; ivfTopK scores match brute force") {
    import spark.implicits._
    val assign = Similarity.ivfAssign(vecs.select("vec_id", "embedding"), nCentroids = 3)
      .as[(Long, Long)].collect().toMap
    (0L to 2L).foreach(c => assert(assign(c) == c)) // a centroid's nearest centroid is itself
    assert(assign(3L) == 2L) // vec 3 is closest to centroid 2 (both y-dominant)
    val brute = Similarity.bruteForceTopK(
      vecs.select("vec_id", "embedding"), vecs.select("vec_id", "embedding"), k = 4)
      .as[(Long, Long, Double, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val ivf = Similarity.ivfTopK(
      vecs.select("vec_id", "embedding"), vecs.select("vec_id", "embedding"),
      k = 4, nCentroids = 3).as[(Long, Long, Double, Int)].collect()
    ivf.foreach { case (q, v, c, _) => assert(math.abs(brute((q, v)) - c) < 1e-12) }
  }

  test("ivfTopK routes queries against CORPUS centroids (r6 ADVICE)") {
    import spark.implicits._
    // queries whose vec_ids are all >= nCentroids: seeding centroids from
    // the query set (the pre-fix behavior) would yield an EMPTY seed set
    // and an empty result; routing against the corpus centroids must
    // return each query's cluster-mates
    val queries = vecs.filter(col("vec_id") >= 3).select("vec_id", "embedding")
    val got = Similarity.ivfTopK(
      vecs.select("vec_id", "embedding"), queries, k = 4, nCentroids = 3)
      .as[(Long, Long, Double, Int)].collect()
    assert(got.nonEmpty)
    // vec 3 (y-dominant) lives in centroid 2's cluster with vec 2; its
    // candidates must be exactly its corpus-cluster-mates
    val corpusCluster = Similarity.ivfAssign(
      vecs.select("vec_id", "embedding"), nCentroids = 3)
      .as[(Long, Long)].collect().toMap
    got.foreach { case (q, v, _, _) =>
      assert(corpusCluster(v) == corpusCluster(q),
        s"candidate $v for query $q crossed clusters")
    }
    assert(got.filter(_._1 == 3L).map(_._2).toSet == Set(2L))
    // ivfPqTopK shares the routing: same disjoint query set must produce
    // rows for every query (pre-fix: empty)
    val pq = Similarity.ivfPqTopK(
      vecs.select("vec_id", "embedding"), queries, topK = 2,
      nCentroids = 3, m = 3, k = 3, dim = 3)
    assert(pq.select("query_id").distinct().count() == 2)
  }

  test("cosineNearDupPairs drops degenerate buckets beyond maxBucketSize") {
    import spark.implicits._
    // plane 0 weights for dim=3 are (-8, 6, 3): every vector below has a
    // positive dot product, so all five share one bucket of size 5
    val crowd = Seq(
      (0L, Seq(0.0f, 1.0f, 0.0f)),
      (1L, Seq(0.0f, 0.9f, 0.1f)),
      (2L, Seq(0.0f, 0.8f, 0.2f)),
      (3L, Seq(0.0f, 1.0f, 1.0f)),
      (4L, Seq(0.0f, 0.5f, 0.5f))).toDF("vec_id", "embedding")
    val capped = Similarity.cosineNearDupPairs(crowd, threshold = -1.0,
      planes = 1, dim = 3, maxBucketSize = 4)
    assert(capped.count() == 0) // bucket of 5 exceeds the cap -> dropped
    val uncapped = Similarity.cosineNearDupPairs(crowd, threshold = -1.0,
      planes = 1, dim = 3, maxBucketSize = 10)
    assert(uncapped.count() == 10) // C(5,2) pairs, each met exactly once
  }

  test("one Lloyd iteration refines centroids; separated data is a fixed point") {
    import spark.implicits._
    // exactly one vector per seed cluster: means == the seeds, so one
    // iteration must not change the assignment
    val axes = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val a0 = Similarity.ivfAssign(axes, nCentroids = 3, lloydIters = 0)
      .as[(Long, Long)].collect().toMap
    val a1 = Similarity.ivfAssign(axes, nCentroids = 3, lloydIters = 1)
      .as[(Long, Long)].collect().toMap
    assert(a0 == a1)
    // on the mixed set the y-dominant vectors (2, 3) must stay co-clustered
    // after refinement (their cluster's mean is still y-dominant)
    val refined = Similarity.ivfAssign(vecs.select("vec_id", "embedding"),
      nCentroids = 3, lloydIters = 1).as[(Long, Long)].collect().toMap
    assert(refined.size == 5)
    assert(refined(2L) == refined(3L))
  }

  test("ivfTopK recall vs brute force on separated clusters") {
    import spark.implicits._
    // 60 vectors in 3 well-separated axis clusters (vec i -> axis i%3, so
    // the seed centroids 0,1,2 land one per cluster); nprobe=1 IVF should
    // recover nearly all true neighbors
    val dim = 6
    val data = (0 until 60).map { i =>
      val axis = i % 3
      val emb = (0 until dim).map { d =>
        (if (d == axis) 1.0f else 0.0f) + ((i * 7 + d * 3) % 11) / 50.0f
      }
      (i.toLong, emb)
    }.toDF("vec_id", "embedding")
    val queries = data.filter(col("vec_id") < 6)
    val brute = Similarity.bruteForceTopK(data, queries, k = 3)
      .as[(Long, Long, Double, Int)].collect().map(r => (r._1, r._2)).toSet
    val ivf = Similarity.ivfTopK(data, queries, k = 3, nCentroids = 3)
      .as[(Long, Long, Double, Int)].collect().map(r => (r._1, r._2)).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall; brute=$brute ivf=$ivf")
  }

  test("ivfProbeCells rank 1 equals the flat assignment; nprobe=2 nests it") {
    import spark.implicits._
    val e = vecs.select("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(e, nCentroids = 3)
    val flat = Similarity.ivfAssignWith(e, cents, knownCents = Some(3L))
      .as[(Long, Long)].collect().toMap
    val p1 = Similarity.ivfProbeCells(e, cents, nprobe = 1)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(p1 == flat)
    val p2 = Similarity.ivfProbeCells(e, cents, nprobe = 2)
      .select("vec_id", "cluster").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(p2.values.forall(_.size == 2))
    flat.foreach { case (v, c) => assert(p2(v).contains(c)) }
  }

  test("nprobe=2 recall dominates nprobe=1 and reaches brute force on the boundary query") {
    import spark.implicits._
    // a query sitting BETWEEN two clusters: its nearest neighbors split
    // across both cells, so nprobe=1 must miss some and nprobe=2 must
    // recover them
    val data = (Seq(
      (100L, Seq(0.7f, 0.7f, 0.0f))) ++ // boundary query: between x and y
      (0 until 30).map { i =>
        val axis = i % 3
        (i.toLong, (0 until 3).map(d =>
          (if (d == axis) 1.0f else 0.0f) + ((i * 7 + d * 3) % 11) / 50.0f))
      }).toDF("vec_id", "embedding")
    val q = data.filter(col("vec_id") === 100L)
    def hits(nprobe: Int): Set[Long] =
      Similarity.ivfTopK(data, q, k = 6, nCentroids = 3, nprobe = nprobe)
        .select("vec_id").as[Long].collect().toSet
    val brute = Similarity.bruteForceTopK(data, q, k = 6)
      .select("vec_id").as[Long].collect().toSet
    val h1 = hits(1); val h2 = hits(2)
    assert((brute intersect h1).size < brute.size, "boundary query should miss at nprobe=1")
    assert((brute intersect h2).size > (brute intersect h1).size)
    assert(h2 == brute, s"nprobe=2 should recover the full top-6: $h2 vs $brute")
  }

  test("kmeansInertiaCurve decreases monotonically on planted clusters") {
    import spark.implicits._
    // 45 vectors around 3 axis-aligned centers with deterministic noise;
    // seeds 0,1,2 land one per cluster, so Lloyd refinement tightens
    // the centroids and spherical inertia must fall (Dhillon & Modha:
    // the mean direction maximizes the within-cluster cosine sum)
    val data = (0 until 45).map { i =>
      val axis = i % 3
      val emb = (0 until 4).map { d =>
        (if (d == axis) 1.0f else 0.0f) + ((i * 13 + d * 7) % 9) / 40.0f
      }
      (i.toLong, emb)
    }.toDF("vec_id", "embedding")
    val curve = Similarity.kmeansInertiaCurve(data, nCentroids = 3, iters = 4)
      .orderBy("iter").as[(Long, Double)].collect()
    assert(curve.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    curve.sliding(2).foreach { case Array((_, a), (_, b)) =>
      assert(b <= a + 1e-9, s"inertia rose: $a -> $b in ${curve.mkString(", ")}")
    }
    assert(curve.last._2 < curve.head._2, "refinement should strictly improve the planted fit")
    assert(curve.forall(_._2 >= 0.0))
  }

  test("lshTopK returns a subset of brute-force candidates with correct scores") {
    import spark.implicits._
    val brute = Similarity.bruteForceTopK(
      vecs.select("vec_id", "embedding"),
      vecs.select("vec_id", "embedding"), k = 4)
      .as[(Long, Long, Double, Int)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val lsh = Similarity.lshTopK(
      vecs.select("vec_id", "embedding"),
      vecs.select("vec_id", "embedding"), k = 4, planes = 2, dim = 3)
      .as[(Long, Long, Double, Int)].collect()
    lsh.foreach { case (q, v, c, _) =>
      assert(math.abs(brute((q, v)) - c) < 1e-12) // same score as brute force
    }
  }

  test("pqCodes matches a driver-side reimplementation on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val (m, k, dim) = (4, 4, 64)
    val sub = dim / m
    val rows = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    val seeds = rows.sortBy(_._1).take(k).map(_._2)
    def code(v: Seq[Double], j: Int): Int = {
      val x = v.slice(j * sub, (j + 1) * sub)
      val dists = (0 until k).map { c =>
        val cv = seeds(c).slice(j * sub, (j + 1) * sub)
        x.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum
      }
      dists.zipWithIndex.minBy { case (d, i) => (d, i) }._2
    }
    val want = rows.map { case (id, v) => id -> (0 until m).map(code(v, _)) }.toMap
    val got = Similarity.pqCodes(e, m, k, dim).collect()
      .map(r => r.getLong(0) -> (1 to m).map(r.getInt)).toMap
    assert(got == want)
  }

  test("semanticDupDrops closes duplicate groups transitively within clusters") {
    import spark.implicits._
    // cluster 0 (seed vec 0): 2 is τ-similar to 0, 3 is τ-similar ONLY
    // to 2 (cos(0,3) ≈ 0.80 < 0.9) — the transitive closure must still
    // drop 3 with keeper 0, not keep it because its only similar mate
    // was itself dropped. 1 seeds the other cluster; 4 is isolated.
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f, 0.0f)),
      (2L, Seq(0.95f, 0.3122f, 0.0f)),
      (3L, Seq(0.8049f, 0.5934f, 0.0f)),
      (4L, Seq(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val drops = Similarity.semanticDupDrops(emb, threshold = 0.9,
      nCentroids = 2, lloydIters = 0)
      .orderBy("vec_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(drops == Seq((2L, 0L, 0L), (3L, 0L, 0L)))
  }

  test("semanticDupDrops excludes clusters above maxClusterSize from pair generation") {
    import spark.implicits._
    // plant a 6-member duplicate cluster around seed 0 and a 3-member one
    // around seed 1, then set the band to [2, 4]: the oversized cluster
    // must contribute ZERO drops (its members never enter the pair join)
    // while the in-band cluster still drops its two non-keepers — the
    // Spark half of the degenerate-cluster band whose oracle mirror is
    // dedup_semantic's okc CTE (same HAVING bounds).
    val emb = (Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f, 0.0f)),
      (7L, Seq(0.02f, 0.999f, 0.0f)),
      (8L, Seq(0.0f, 0.998f, 0.03f))) ++
      (2L to 5L).map(i => (i, Seq(0.99f, 0.01f * i, 0.01f)))
    ).toDF("vec_id", "embedding")
    val drops = Similarity.semanticDupDrops(emb, threshold = 0.9,
      nCentroids = 2, lloydIters = 0, maxClusterSize = 4)
      .orderBy("vec_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(drops == Seq((7L, 1L, 1L), (8L, 1L, 1L)),
      s"oversized cluster 0 must be excluded, in-band cluster 1 kept: $drops")
    // control: without the cap the big cluster's five non-keepers drop too
    val uncapped = Similarity.semanticDupDrops(emb, threshold = 0.9,
      nCentroids = 2, lloydIters = 0)
      .orderBy("vec_id").as[(Long, Long, Long)].collect().toSeq
    assert(uncapped.map(_._1) == Seq(2L, 3L, 4L, 5L, 7L, 8L))
  }

  test("gate fixture clusters stay far below the maxClusterSize band") {
    // the dedup_semantic oracle pins the degenerate-cluster band at
    // [2, 10000]; this invariant keeps the fixture honest — if a future
    // synth ever grows a cluster within 10x of the bound, fail HERE
    // instead of as a silent oracle hash mismatch the day it crosses it.
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = emb.count()
    val c = math.max(8, math.ceil(n / 64.0).toInt)
    val sizes = Similarity.ivfAssignWith(emb,
        Similarity.ivfCentroids(emb, c, lloydIters = 1, knownCount = Some(n)))
      .groupBy("cluster").count().agg(max("count")).head().getLong(0)
    assert(sizes < 1000, s"largest fixture cluster $sizes is within 10x of the band")
  }

  test("hierarchical assignment (C > FlatAssignMax) is deterministic, valid, cell-consistent") {
    import spark.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(e, nCentroids = 20)
    val a1 = Similarity.ivfAssignWith(e, cents)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val a2 = Similarity.ivfAssignWith(e, cents)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(a1 == a2) // deterministic
    val n = e.count()
    assert(a1.map(_._1) == (0L until n).toSeq) // every vector exactly once
    assert(a1.forall(p => p._2 >= 0 && p._2 < 20)) // clusters are centroid ids
    // routing consistency: the assigned centroid must live in the same
    // coarse cell the vector routed to — the defining invariant of the
    // two-level path (flat assignment could pick any centroid)
    val q = math.ceil(math.sqrt(20.0)).toInt
    val coarse = cents.orderBy("cent_id").limit(q)
      .select(col("cent_id").as("cell"), col("cent").as("cv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val centVecs = cents.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    val vecMap = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    def cellOf(v: Seq[Double]): Long =
      coarse.map { case (id, cv) => (cos(v, cv), -id) }.max match {
        case (_, nid) => -nid
      }
    a1.foreach { case (vid, cluster) =>
      assert(cellOf(vecMap(vid)) == cellOf(centVecs(cluster)),
        s"vec $vid assigned to centroid $cluster outside its coarse cell")
    }
  }

  test("pcaTopComponent recovers a planted principal axis") {
    import spark.implicits._
    // all variance lies along (1,1,0): the rank-1 covariance's top
    // eigenvector is (1,1,0)/√2, and power iteration from the uniform
    // start must land on it (positive orientation) in one step
    val emb = Seq(
      (0L, Seq(1.0f, 1.0f, 0.0f)),
      (1L, Seq(2.0f, 2.0f, 0.0f)),
      (2L, Seq(3.0f, 3.0f, 0.0f)),
      (3L, Seq(4.0f, 4.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.pcaTopComponent(emb, dim = 3)
      .orderBy("dim").as[(Long, Double)].collect().toSeq
    val want = Seq(0.707107, 0.707107, 0.0)
    assert(got.map(_._1) == Seq(0L, 1L, 2L))
    got.map(_._2).zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-5, s"loading $g vs $w")
    }
  }

  test("pqTopK ranks by summed table lookups; rank-1 is a plausible neighbor") {
    import spark.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val out = Similarity.pqTopK(e, e.filter(col("vec_id") < 2), topK = 3)
      .as[(Long, Long, Double, Int)].collect()
    assert(out.map(_._1).distinct.sorted.toSeq == Seq(0L, 1L))
    out.groupBy(_._1).values.foreach { g =>
      assert(g.sortBy(_._4).map(_._3).toSeq == g.map(_._3).sorted.toSeq) // rank follows adist
      assert(g.forall(r => r._2 != r._1)) // self excluded
    }
  }

  test("semanticDupAgainstIndex is batching-independent (the streaming-face invariant)") {
    import spark.implicits._
    // the stream_semantic_dedup gate query appends per-micro-batch
    // results; that equals the one-shot batch result ONLY if per-vector
    // output never depends on which other batch vectors are present
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    // corpus must CONTAIN the seed ids (ivfCentroids seeds are literally
    // vec_id < nCentroids), so the batch is the TAIL of the id space
    val corpus = e.filter(col("vec_id") < 40)
    val batch = e.filter(col("vec_id") >= 40)
    val cents = Similarity.ivfCentroids(corpus, 4, 1).localCheckpoint()
    val cells = Similarity.ivfAssignWith(corpus, cents, knownCents = Some(4L))
      .join(corpus, Seq("vec_id"))
      .select(col("cluster"), col("vec_id").as("old_id"),
        col("embedding").as("old_emb")).localCheckpoint()
    def run(b: org.apache.spark.sql.DataFrame) =
      // τ = -1 keeps EVERY cell-mate pair: the invariant under test is
      // batching-independence, not threshold realism, and a non-vacuous
      // result set must survive the tiny sf0.001 fixture's near-zero
      // random cosines
      Similarity.semanticDupAgainstIndex(b, cents, cells, threshold = -1.0,
          knownCents = Some(4L))
        .as[(Long, Long, Double, Long)].collect().toSet
    val whole = run(batch)
    val split = run(batch.filter(col("vec_id") % 2 === 0)) ++
      run(batch.filter(col("vec_id") % 2 === 1))
    assert(whole.nonEmpty, "fixture produced no tau-pairs; lower the threshold")
    assert(split == whole)
  }

  test("randomProjection: deterministic, complete, and JL-plausible") {
    import spark.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = e.count()
    val p = Similarity.randomProjection(e, outDims = 16)
    val rows = p.as[(Long, Int, Double)].collect()
    // complete grid: every vector gets exactly 16 output dims
    assert(rows.length == n * 16)
    assert(rows.map(_._2).distinct.sorted.toSeq == (0 until 16))
    // deterministic across runs (the md5-derived sign matrix is fixed)
    assert(Similarity.randomProjection(e, outDims = 16)
      .as[(Long, Int, Double)].collect().toSet == rows.toSet)
    // JL sanity: projected squared-norms concentrate around the input
    // squared-norms in aggregate (E[‖Px‖²] = ‖x‖² for the ±1/√d' family)
    val inNorm = e.select(sum(Similarity.dot(col("embedding"), col("embedding"))))
      .head().getDouble(0)
    val outNorm = rows.map(r => r._3 * r._3).sum
    assert(math.abs(outNorm - inNorm) / inNorm < 0.2,
      s"aggregate norm drifted: in=$inNorm out=$outNorm")
  }

  test("ivfSplitCells: ±-extreme 2-seed split, untouched cells pass through") {
    import spark.implicits._
    // cell 1: two members near (1,0) — ids 10 (seed A: lowest id), 11 —
    // and two near (0,1) — 12 (seed B: cos to A = 0, the minimum), 13.
    // cell 2: untouched passenger.
    val assigned = Seq(
      (10L, 1L, Array(1.0f, 0.0f)),
      (11L, 1L, Array(1.0f, 0.1f)),
      (12L, 1L, Array(0.0f, 1.0f)),
      (13L, 1L, Array(0.1f, 1.0f)),
      (20L, 2L, Array(0.5f, 0.5f)))
      .toDF("vec_id", "cluster", "embedding")
    val cells = Seq(Tuple1(1L)).toDF("cluster")
    val got = Similarity.ivfSplitCells(assigned, cells, idOffset = 100L)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 1L, 11L -> 1L, 12L -> 101L, 13L -> 101L,
      20L -> 2L))
  }

  test("ivfSplitCells: degenerate identical-vector cell is a clean no-op") {
    import spark.implicits._
    // all members identical → seed B ties back to A, nobody strictly
    // prefers B → the whole cell stays put, no vector lost
    val assigned = Seq(
      (1L, 3L, Array(0.6f, 0.8f)),
      (2L, 3L, Array(0.6f, 0.8f)),
      (3L, 3L, Array(0.6f, 0.8f)))
      .toDF("vec_id", "cluster", "embedding")
    val cells = Seq(Tuple1(3L)).toDF("cluster")
    val got = Similarity.ivfSplitCells(assigned, cells, idOffset = 100L)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L))
  }
}
