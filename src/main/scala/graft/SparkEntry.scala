package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{AsOfJoin, Dedup, Multimodal, Sessions, Similarity, TextAnalysis}
import graft.index.Indexer
import graft.search.{BM25, Search}
import graft.sources.CorpusSource
import graft.streaming.{EventStream, StreamingSessionizer}
import graft.text.{Stopwords, Tokenizer}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (+ the LLM-data-pipeline extension families), each with a
  * DuckDB `oracleSql` mirror where the semantics are ANSI-SQL-expressible.
  *
  * Determinism rules applied uniformly so Spark output and DuckDB oracle
  * hash-match (SURVEY.md §7.4 float-reproducibility note):
  *  - every query ends in an ORDER BY over a unique key prefix;
  *  - every floating-point output column is `round`-ed (identical rounding
  *    applied in the SQL), integers/strings are preferred where possible;
  *  - timestamps are exported as integer epoch micro/seconds;
  *  - aggregates/window functions use explicit deterministic tie-breaks.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Full stemmed BM25 search with snippets over the documents corpus —
    * the reference's reason to exist (`pyapp.py:89-121`), one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    Search.topKWithSnippet(
      docs(spark, "/root/testdata/sf0.001"), "merge join table", k = 10, stem = true)

  // ---------------------------------------------------------------------
  // shared helpers
  // ---------------------------------------------------------------------

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** The driver's `events.parquet` carries TIMESTAMP(NANOS) which Spark's
    * vectorized Parquet reader rejects; read the nanos as long (legacy
    * conf) and rebuild a microsecond timestamp with integer `div` (exact
    * floor — the same truncation DuckDB applies converting ns → its µs
    * TIMESTAMP, so the oracle sees identical instants).
    */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tbl(s, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  private def docs(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")

  /** Fixed search terms for the oracle-checked (non-stemmed) BM25 queries. */
  private val SearchTerms = Seq("merge", "join", "table", "scan")
  private val SearchTermsSql = SearchTerms.map(t => s"'$t'").mkString(", ")

  private val FixturePath = "/root/repo/src/main/resources/cap_fixture.jsonl"

  /** Scratch dir for query-produced fixtures/artifacts that oracle SQL
    * must read back (pre-stemmed token fixture, serving artifacts). The
    * producing query writes here FIRST, then both engines read the same
    * files — so the oracle tracks whatever sfDir the gate ran, with no
    * hardcoded scale factor in the derived data.
    */
  private val WorkDir = "/root/repo/work"
  private val StemmedFlatPath = s"$WorkDir/stemmed_flat.parquet"
  private val ArtifactsPath = s"$WorkDir/artifacts"

  /** Query terms for the stemmed BM25 path, stemmed ONCE driver-side (the
    * oracle never stems — SURVEY.md §5: it scores the pre-stemmed fixture
    * with these literals embedded).
    */
  private val StemmedTerms: Seq[String] =
    Tokenizer.tokenize("sorted merges tables quickly", stem = true).distinct
  private val StemmedTermsSql = StemmedTerms.map(t => s"'$t'").mkString(", ")

  // ---- shared DuckDB SQL fragments (must mirror the Scala semantics) ----

  private val stopSql = Stopwords.sqlInList

  /** Tokenize → flat → doc_lengths → TF → IDF → stats CTE chain over the
    * `documents` table (non-stemmed tokenizer = lower → split [^a-z]+ →
    * drop empties/stopwords, exactly [[Tokenizer.tokensCol]] with
    * stem=false).
    */
  private val indexCtes: String =
    s"""toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), w -> len(w) > 0 AND w NOT IN $stopSql) AS t FROM read_parquet('/root/testdata/sf0.01/documents.parquet')),
       |flat AS (SELECT doc_id, unnest(t) AS word FROM toks),
       |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS doc_length FROM flat GROUP BY doc_id),
       |tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS term_freq FROM flat GROUP BY doc_id, word),
       |idf AS (SELECT word, CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq, log10((SELECT count(*) FROM dl) * 1.0 / count(DISTINCT doc_id)) AS idf FROM flat GROUP BY word),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, sum(doc_length) * 1.0 / count(*) AS avgdl FROM dl)""".stripMargin

  /** BM25 scored CTE (k1=1.2, b=0.75 — `pyapp.py:65`): written as
    * (1.2 + 1) and 0.25 to reproduce the exact double arithmetic of
    * [[BM25.score]] (lit(k1+1.0), lit(1-b)).
    */
  private val bm25Ctes: String =
    s"""$indexCtes,
       |scored AS (
       |  SELECT t.doc_id,
       |         sum(i.idf * (t.term_freq * (1.2 + 1)) /
       |             (t.term_freq + 1.2 * (0.25 + 0.75 * d.doc_length / (SELECT avgdl FROM stats)))) AS s
       |  FROM tf t JOIN idf i USING (word) JOIN dl d USING (doc_id)
       |  WHERE t.word IN ($SearchTermsSql)
       |  GROUP BY t.doc_id),
       |top10 AS (SELECT doc_id, round(s, 4) AS score FROM scored ORDER BY round(s, 4) DESC, doc_id LIMIT 10)""".stripMargin

  /** Serving-path index, built once per (sfDir, stem) and reused by the
    * query-path entries — faithful to the reference, whose app loads
    * PREBUILT index artifacts and never re-indexes per query
    * (`pyapp.py:30-37`, `@st.cache_resource`). The indexing operators
    * (g1–g5, tok_*) deliberately do NOT use this cache: they measure the
    * indexing pipeline itself.
    */
  private val MaxCachedIndexes = 4
  private val indexCache =
    scala.collection.mutable.LinkedHashMap.empty[(String, String, Boolean), graft.index.IndexTables]
  private def builtIndex(s: SparkSession, dir: String, stem: Boolean): graft.index.IndexTables =
    indexCache.synchronized {
      // key includes the owning session (r2 ADVICE): a restarted session
      // must not be served tables bound to a stopped one. Bounded FIFO —
      // evicted entries unpersist their flat-words cache so a long-lived
      // session does not leak persisted RDDs.
      // unpersist may throw against an already-stopped SparkContext (r3
      // ADVICE) — exactly the restart scenario the session key guards, so
      // eviction must never fail the NEW session's build
      def safeUnpersist(t: graft.index.IndexTables): Unit =
        try t.flatWords.unpersist(false) catch { case _: Throwable => () }
      val sessionKey = System.identityHashCode(s).toString
      indexCache.filterInPlace { case ((sk, _, _), t) =>
        sk == sessionKey || { safeUnpersist(t); false }
      }
      val key = (sessionKey, dir, stem)
      if (!indexCache.contains(key) && indexCache.size >= MaxCachedIndexes) {
        val (oldKey, old) = indexCache.head
        safeUnpersist(old)
        indexCache.remove(oldKey)
      }
      indexCache.getOrElseUpdate(key,
        Indexer.build(docs(s, dir).select("doc_id", "text"), stem))
    }

  /** Near-dup connected components, built ONCE per (session, sfDir) and
    * shared by `dedup_components` and `pipeline_dedup_components` (r4
    * VERDICT #4: the two CC-bearing queries were 16% of the bench, each
    * re-running the identical minhash-pairs → min-label+pointer-jump
    * supersteps). [[graft.ext.Graph.connectedComponents]] returns
    * `localCheckpoint`-ed (eager, lineage-free) labels, so reuse costs a
    * block-manager read, not a recompute — the same serve-once pattern as
    * [[builtIndex]]. Session-keyed like builtIndex (a restarted session
    * must not read blocks of a stopped context); one entry per sfDir.
    */
  private val ccCache =
    scala.collection.mutable.LinkedHashMap.empty[(String, String), DataFrame]
  private def nearDupComponents(s: SparkSession, dir: String): DataFrame =
    ccCache.synchronized {
      val sessionKey = System.identityHashCode(s).toString
      ccCache.filterInPlace { case ((sk, _), _) => sk == sessionKey }
      ccCache.getOrElseUpdate((sessionKey, dir),
        graft.ext.Graph.connectedComponents(
          Dedup.minhashPairs(docs(s, dir), k = 3, numHashes = 32, bands = 16,
              threshold = 0.8)
            .select(col("doc_a").as("src"), col("doc_b").as("dst"))))
    }

  /** Driver-side mirror of Spark's `round(col, 6)` (HALF_UP over
    * `BigDecimal.valueOf`) for S4-materialized scalar cuts — both engines
    * must see identically-rounded thresholds.
    */
  private def round6(v: Double): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Spark-side BM25 top-10 with post-rounding deterministic order. */
  private def bm25Top10(s: SparkSession, dir: String): DataFrame = {
    val t = builtIndex(s, dir, stem = false)
    Search.scoreTerms(t, SearchTerms)
      .withColumn("score", round(col("score"), 4))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(10)
  }

  /** DuckDB literal for a hyperplane weight vector (sim_lsh_buckets). */
  private def planeSql(j: Int): String =
    Similarity.planeWeights(j, 64).mkString("CAST([", ", ", "] AS DOUBLE[])")

  /** DuckDB mirror of [[Dedup.md5Hash60]]: first 15 hex digits of md5 as a
    * BIGINT (same trick the dedup_simhash oracle uses — DuckDB has no
    * `conv`, so fold the hex chars).
    */
  private def md5Hash60Sql(e: String): String =
    s"list_reduce(list_transform(string_split(substr(md5($e), 1, 15), ''), " +
      "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (a, b) -> a * 16 + b)"

  /** SimHash fingerprints per doc (shv CTE) — mirrors [[Dedup.simhash]]:
    * md5Hash60 per distinct token, tf-weighted ±1 per bit, 60-bit
    * reassembly. Shared by the dedup_simhash and dedup_simhash_near
    * oracles.
    */
  private val simhashCtes: String =
    s"""toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), w -> len(w) > 0 AND w NOT IN $stopSql) AS t FROM read_parquet('/root/testdata/sf0.01/documents.parquet')),
       |flat AS (SELECT doc_id, unnest(t) AS word FROM toks),
       |wh AS (SELECT word, list_reduce(list_transform(string_split(substr(md5(word), 1, 15), ''), c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (a, b) -> a * 16 + b) AS h
       |       FROM (SELECT DISTINCT word FROM flat)),
       |contrib AS (SELECT f.doc_id, r.bit,
       |                   CASE WHEN ((wh.h >> r.bit) & 1) = 1 THEN 1 ELSE -1 END AS c
       |            FROM flat f JOIN wh ON f.word = wh.word
       |            CROSS JOIN (SELECT unnest(range(0, 60)) AS bit) r),
       |bits AS (SELECT doc_id, bit, sum(c) AS sc FROM contrib GROUP BY doc_id, bit),
       |shv AS (SELECT doc_id, CAST(sum(CASE WHEN sc > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
       |        FROM bits GROUP BY doc_id)""".stripMargin

  /** Hashed 3-shingle sets per doc — mirrors `Dedup.shingleRows(k=3,
    * hashed=true)` → `collect_list`: tokenize, stitch 3-grams, md5Hash60
    * each, distinct per doc.
    */
  private val hashedShingleCtes: String =
    s"""toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), w -> len(w) > 0 AND w NOT IN $stopSql) AS t FROM read_parquet('/root/testdata/sf0.01/documents.parquet')),
       |shr AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS g FROM toks WHERE len(t) >= 3),
       |sh AS (SELECT doc_id, list(DISTINCT ${md5Hash60Sql("g")}) AS s FROM shr GROUP BY doc_id)""".stripMargin

  // ---------------------------------------------------------------------
  // queries
  // ---------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- core search-engine pipeline (SURVEY.md §2, over `documents`) ----
    "tok_flat_words" -> ((s, dir) =>
      Indexer.flatWords(docs(s, dir), stem = false).orderBy("doc_id", "word")),

    "g2_doc_lengths" -> ((s, dir) =>
      Indexer.docLengths(Indexer.flatWords(docs(s, dir), stem = false))
        .orderBy("doc_id")),

    "g3_term_frequencies" -> ((s, dir) =>
      Indexer.termFrequencies(Indexer.flatWords(docs(s, dir), stem = false))
        .orderBy("doc_id", "word")),

    "g4_doc_freq_idf" -> ((s, dir) => {
      val flat = Indexer.flatWords(docs(s, dir), stem = false)
      val n = Indexer.docLengths(flat).count()
      Indexer.docFreqIdf(flat, n)
        .withColumn("idf", round(col("idf"), 6))
        .orderBy("word")
    }),

    "index_incremental_idf" -> ((s, dir) => {
      // incremental index maintenance via MERGEABLE aggregate state: the
      // corpus arrives in two batches; per-batch doc-frequency partials
      // are summed (valid — the halves' doc_id sets are disjoint) instead
      // of re-scanning the old corpus. Must equal the batch-built IDF
      // table, so the oracle is g4's SQL. At 100 TB this is the shape of
      // a daily index update: new partition's partials + stored partials.
      val d = docs(s, dir)
      val oldFlat = Indexer.flatWords(d.filter(col("doc_id") < 250), stem = false)
      val newFlat = Indexer.flatWords(d.filter(col("doc_id") >= 250), stem = false)
      def partial(flat: DataFrame) = flat.select("word", "doc_id").distinct()
        .groupBy("word").agg(count(lit(1)).as("df"))
      val nDocs = Indexer.docLengths(oldFlat).count() +
        Indexer.docLengths(newFlat).count()
      partial(oldFlat).unionByName(partial(newFlat))
        .groupBy("word").agg(sum("df").as("doc_freq"))
        .withColumn("idf",
          round(log10(lit(nDocs.toDouble) / col("doc_freq")), 6))
        .orderBy("word")
    }),

    "sink_partitioned_read" -> ((s, dir) => {
      // partitioned parquet sink + partition-pruned scan: write the
      // corpus partitioned by lang, read ONE partition back — the scan
      // prunes at file listing (PartitionFilters; asserted in
      // PartitionPruneSpec), so at 100 TB the job reads 1/N-th of the
      // files, not all of them plus a filter
      val out = s"$WorkDir/docs_by_lang.parquet"
      docs(s, dir).select("doc_id", "lang", "source")
        .write.mode("overwrite").partitionBy("lang").parquet(out)
      s.read.parquet(out)
        .filter(col("lang") === "en")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    }),

    "sink_csv_roundtrip" -> ((s, dir) => {
      // CSV sink + schema'd CSV scan (no inference pass — SURVEY S1 rule
      // applies to every text format): write, read back, aggregate; the
      // oracle runs the same aggregate on the parquet source directly
      val out = s"$WorkDir/docs_csv"
      docs(s, dir).select("doc_id", "lang", "source")
        .write.mode("overwrite").option("header", "true").csv(out)
      val schema = "doc_id LONG, lang STRING, source STRING"
      s.read.schema(schema).option("header", "true").csv(out)
        .groupBy("lang", "source").agg(count(lit(1)).as("n"))
        .orderBy("lang", "source")
    }),

    "sink_orc_roundtrip" -> ((s, dir) => {
      // ORC sink + scan (the second columnar format Spark ships) — same
      // aggregate contract as the CSV roundtrip
      val out = s"$WorkDir/docs_orc"
      docs(s, dir).select("doc_id", "lang", "n_chars")
        .write.mode("overwrite").orc(out)
      s.read.orc(out)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("total_chars"))
        .orderBy("lang")
    }),

    "g1_inverted_index" -> ((s, dir) =>
      // posting list exported as a comma-joined string: the driver's
      // pandas comparator cannot hash array cells (r2's only red row);
      // array_join/array_to_string are order-preserving so the sorted
      // posting list semantics are unchanged
      Indexer.invertedIndex(Indexer.flatWords(docs(s, dir), stem = false))
        .select(col("word"), array_join(col("doc_ids"), ",").as("doc_ids"))
        .orderBy("word")),

    "g5_scoring_params" -> ((s, dir) =>
      Indexer.docLengths(Indexer.flatWords(docs(s, dir), stem = false))
        .agg(
          count(lit(1)).as("n_docs"),
          round(sum("doc_length").cast("double") / count(lit(1)), 6).as("avgdl"))),

    "bm25_search" -> ((s, dir) => bm25Top10(s, dir)),

    "j3_sql_bm25" -> ((s, dir) => {
      val t = builtIndex(s, dir, stem = false)
      t.termFrequencies.createOrReplaceTempView("term_frequencies")
      t.docLengths.createOrReplaceTempView("document_lengths")
      t.idfValues.createOrReplaceTempView("idf_values")
      s.sql(
        s"""SELECT t.doc_id,
           |       round(SUM(i.idf * (t.term_freq * (1.2 + 1)) /
           |                 (t.term_freq + 1.2 * (0.25 + 0.75 * d.doc_length / ${t.avgdl}))), 4) AS score
           |FROM term_frequencies t
           |JOIN document_lengths d ON t.doc_id = d.doc_id
           |JOIN idf_values i ON t.word = i.word
           |WHERE t.word IN ($SearchTermsSql)
           |GROUP BY t.doc_id
           |ORDER BY score DESC, t.doc_id ASC
           |LIMIT 10""".stripMargin)
    }),

    "bm25_okapi_variant" -> ((s, dir) => {
      // the reference's second scoring semantics (rank_bm25 BM25Okapi via
      // `app.py`/`nltksearchv1.py` — SURVEY.md §3.3b): k1=1.5, natural-log
      // idf = ln((N-df+0.5)/(df+0.5)) with negatives floored to
      // 0.25 × average raw idf. Same engine, different (k1, idf) inputs.
      val t = builtIndex(s, dir, stem = false)
      val raw = t.idfValues.withColumn("raw",
        log((lit(t.nDocs.toDouble) - col("doc_freq") + 0.5) / (col("doc_freq") + 0.5)))
      val avgIdf = raw.agg(avg("raw")).head().getDouble(0)
      val okapiIdf = raw
        .select(col("word"),
          when(col("raw") < 0, lit(0.25 * avgIdf)).otherwise(col("raw")).as("idf"))
      Search.scoreTerms(t.copy(idfValues = okapiIdf), SearchTerms, k1 = 1.5, b = 0.75)
        .withColumn("score", round(col("score"), 4))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(10)
    }),

    "bm25_search_stemmed" -> ((s, dir) => {
      // stemmed end-to-end path (PorterStem codegen kernel). The oracle
      // cannot stem, so — SURVEY.md §5's pre-tokenized-fixture plan — the
      // stemmer runs once here, the flat (doc_id, word) table is exported
      // to Parquet, and BOTH engines build index + BM25 from those same
      // rows (query terms pre-stemmed driver-side on both sides too).
      Indexer.flatWords(docs(s, dir).select("doc_id", "text"), stem = true)
        .write.mode("overwrite").parquet(StemmedFlatPath)
      val t = Indexer.buildFromFlat(s.read.parquet(StemmedFlatPath))
      Search.scoreTerms(t, StemmedTerms)
        .withColumn("score", round(col("score"), 4))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(10)
    }),

    "t1_search_snippet" -> ((s, dir) => {
      val d = docs(s, dir)
      broadcast(bm25Top10(s, dir))
        .join(d.select("doc_id", "text"), Seq("doc_id"))
        .withColumn("snippet", Search.snippet(col("text"), 160))
        .select("doc_id", "score", "snippet")
        .orderBy(col("score").desc, col("doc_id").asc)
    }),

    // ---- relational coverage on the star schema (SURVEY.md §2.4-2.6) ----
    "q1_pricing_summary" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q2_rollup" -> ((s, dir) =>
      // grouping-sets coverage: subtotals + grand total via ROLLUP
      tbl(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    "q4_cube" -> ((s, dir) =>
      // full grouping-sets lattice (CUBE): every (flag, status) subset
      tbl(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("sum_price"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    "j1_broadcast_join" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .join(broadcast(tbl(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("p_brand")),

    "j2_star_join" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .join(tbl(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(tbl(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(tbl(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(tbl(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")),

    "j4_semi_join" -> ((s, dir) =>
      // left-semi: customers having a high-value order (the join flavor
      // the serving-path text lookup uses at scale — SURVEY §2.4 note)
      tbl(s, dir, "customer")
        .join(tbl(s, dir, "orders").filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")),

    "j5_anti_join" -> ((s, dir) =>
      // left-anti: customers with no pending ('P') order
      tbl(s, dir, "customer")
        .join(tbl(s, dir, "orders").filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")),

    "j7_range_join" -> ((s, dir) => {
      // non-equi (range) join: orders classified into price bands via a
      // broadcast of the tiny bands table — the BroadcastNestedLoopJoin
      // is the INTENDED plan for a 4-row band side (at scale the band
      // table stays small; the fact side never shuffles)
      import s.implicits._
      val bands = Seq(
        ("low", 0.0, 100000.0), ("mid", 100000.0, 300000.0),
        ("high", 300000.0, 500000.0), ("top", 500000.0, 1e18))
        .toDF("band", "lo", "hi")
      tbl(s, dir, "orders")
        .join(broadcast(bands),
          col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy("band")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("band")
    }),

    "w4_order_gaps" -> ((s, dir) => {
      // explicit lag(): average days between a customer's consecutive
      // orders (integer day diffs -> exact cross-engine average)
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      tbl(s, dir, "orders")
        .withColumn("prev", lag(col("o_orderdate"), 1).over(w))
        .filter(col("prev").isNotNull)
        .withColumn("gap_days",
          datediff(col("o_orderdate").cast("date"), col("prev").cast("date")))
        .groupBy("o_custkey")
        .agg(round(avg("gap_days"), 6).as("avg_gap_days"),
          count(lit(1)).as("n_gaps"))
        .orderBy("o_custkey")
    }),

    "j6_outer_counts" -> ((s, dir) =>
      // left-outer with null-aware count: customers keep a 0 row when
      // they have no orders
      tbl(s, dir, "customer")
        .join(tbl(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("total"))
        .orderBy("c_custkey")),

    "skew_salted_agg" -> ((s, dir) =>
      // the skewed-aggregation scale path in the gate: each key spread
      // over 8 salt subkeys in the partial shuffle, partials merged —
      // semantically identical to the direct aggregate, which IS the
      // oracle (l_returnflag has only 3 values: maximal hot-key skew)
      graft.ext.Skew.saltedSumCount(tbl(s, dir, "lineitem"),
          key = "l_returnflag", valueCol = "l_quantity", salts = 8)
        .select(col("l_returnflag"),
          round(col("sum_value"), 2).as("sum_qty"), col("n_rows"))
        .orderBy("l_returnflag")),

    "skew_salted_distinct" -> ((s, dir) =>
      // salted exact count-distinct (r3 VERDICT #7): the value hash picks
      // the salt so identical values co-locate and dedupe in the partial
      // phase; semantically identical to count(DISTINCT …), which IS the
      // oracle. event_type has 5 values — maximal hot-key skew.
      graft.ext.Skew.saltedCountDistinct(events(s, dir),
          key = "event_type", valueCol = "user_id", salts = 8)
        .orderBy("event_type")),

    "dim_upsert" -> ((s, dir) => {
      // SCD-1 dimension upsert (the MERGE INTO shape without a table
      // format): updates override current rows on the key, inserts pass
      // through — one full-outer join + coalesce. "Updates" = customers
      // with even custkey, marked by an upper-cased segment.
      val cur = tbl(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val upd = cur.filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), upper(col("c_mktsegment")).as("u_seg"))
      cur.join(upd, Seq("c_custkey"), "full_outer")
        .select(col("c_custkey"),
          coalesce(col("u_seg"), col("c_mktsegment")).as("segment"))
        .orderBy("c_custkey")
    }),

    "g7_string_agg" -> ((s, dir) =>
      // ordered distinct string aggregation per group
      docs(s, dir)
        .groupBy("lang")
        .agg(array_join(array_sort(collect_set("source")), ",").as("sources"),
          count(lit(1)).as("n_docs"))
        .orderBy("lang")),

    "a5_percentiles" -> ((s, dir) => {
      // exact interpolated percentiles (median/p90) per segment —
      // scale-safe (r4 VERDICT #3): the previous `percentile` aggregate
      // buffered every distinct acctbal on one task per group; the
      // iterative-histogram selection in [[graft.ops.Quantiles]] computes
      // the SAME exact order statistics with O(buckets) memory anywhere.
      // The bounded group list materializes driver-side (the S5 pattern —
      // it IS the result set); values mirror the quantile_cont oracle.
      import s.implicits._
      val res = graft.ops.Quantiles.exact(
        graft.Caches.persist(tbl(s, dir, "customer")
          .select("c_mktsegment", "c_acctbal")),
        "c_acctbal", Seq(0.5, 0.9), Seq("c_mktsegment"))
      res.toSeq
        .map { case (key, gr) =>
          (key.head.asInstanceOf[String], round6(gr.quantiles(0)),
            round6(gr.quantiles(1)), gr.n)
        }
        .sortBy(_._1)
        .toDF("c_mktsegment", "p50", "p90", "n")
    }),

    "p4_in_filter" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .filter(col("l_returnflag").isin("A", "R"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy("l_returnflag")),

    "p5_point_lookup" -> ((s, dir) =>
      tbl(s, dir, "orders")
        .filter(col("o_orderkey") === 42)
        .select(
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          // o_orderdate is TIMESTAMP_NTZ; session TZ is UTC so the cast
          // reads the same wall-clock instant DuckDB's epoch_us sees
          unix_micros(col("o_orderdate").cast("timestamp")).as("o_date_us"),
          col("o_orderpriority"))),

    "p6_null_filter" -> ((s, dir) =>
      docs(s, dir)
        .filter(col("text").isNotNull && length(col("text")) > 0)
        .groupBy("lang").agg(count(lit(1)).as("n_docs"))
        .orderBy("lang")),

    "t3_slice_sample" -> ((s, dir) => {
      // SURVEY §2.6 T2: down-sample by keeping the upper half of the
      // corpus key range (reference: `nltksearchv1.py:41`); the max is a
      // driver-side scalar (S4 collect), re-entering the plan as a literal
      val d = docs(s, dir)
      val mx = d.agg(max("doc_id")).head().getLong(0)
      d.filter(col("doc_id") >= mx / 2)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    }),

    "t2_topk_orders" -> ((s, dir) =>
      tbl(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))),

    "s5_local_df" -> ((s, dir) => {
      import s.implicits._
      Seq((1, "alpha"), (2, "beta"), (3, "gamma")).toDF("k", "v").orderBy("k")
    }),

    "set_ops_custkeys" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
      val c = tbl(s, dir, "customer")
      val big = o.filter(col("o_totalprice") > 400000).select(col("o_custkey").as("custkey"))
      val bld = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("custkey"))
      val pend = o.filter(col("o_orderstatus") === "P").select(col("o_custkey").as("custkey"))
      big.union(bld).distinct().except(pend).orderBy("custkey")
    }),

    "topk_per_key" -> ((s, dir) => {
      // the custom whole-operator path in the gate: k best orders per
      // customer via graft.plans.TopKPerKey (bounded per-key heaps,
      // partial before the key shuffle — no window, no partition sort);
      // rounding applied before selection on both sides so ties are
      // identical, tie-broken by orderkey for a total order
      val o = tbl(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
      graft.ops.TopK.perKey(o, Seq("o_custkey"),
          Seq(("o_totalprice", true), ("o_orderkey", false)), k = 2)
        .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
    }),

    "set_ops_intersect" -> ((s, dir) => {
      val big = tbl(s, dir, "orders").filter(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("custkey"))
      val bld = tbl(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      big.intersect(bld).orderBy("custkey")
    }),

    "g8_unpivot" -> ((s, dir) => {
      // melt: the pivot's inverse (wide per-type counts back to long
      // form) via the native unpivot operator
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(count(lit(1)))
      val filled = types.foldLeft(p)((df, t) =>
        df.withColumn(t, coalesce(col(t), lit(0L))))
      filled.unpivot(Array(col("user_id")), types.map(col).toArray, "event_type", "n")
        .orderBy("user_id", "event_type")
    }),

    "d2_ship_latency" -> ((s, dir) =>
      // calendar arithmetic: average order→ship latency in days per
      // return flag (datediff of DATE casts; integer days, so the avg is
      // an exact integer-sum ratio on both engines)
      tbl(s, dir, "lineitem")
        .join(tbl(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
          round(avg(datediff(col("l_shipdate").cast("date"),
            col("o_orderdate").cast("date"))), 6).as("avg_days"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    "agg_corr" -> ((s, dir) =>
      // bivariate aggregates: correlation + sample covariance per group
      tbl(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(corr("l_quantity", "l_extendedprice"), 6).as("corr_qty_price"),
          round(covar_samp("l_quantity", "l_extendedprice"), 2).as("covar_qty_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    "w1_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      tbl(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy("o_custkey")
    }),

    "w3_ntile" -> ((s, dir) => {
      // quartile bucketing of customers by total spend — scale-safe shape
      // (r3 VERDICT #4): the previous ntile(4) OVER (ORDER BY spend) ran
      // a GLOBAL unpartitioned window (all customers through one task).
      // Instead: three exact cut values (driver materializes 3 doubles —
      // the S4 scalar pattern), then a codegen when-chain assigns
      // buckets; no global sort anywhere. Cuts are 6dp-rounded on both
      // sides so the engines' interpolated quantiles agree; quartile 1 =
      // top spenders, matching the old DESC ntile.
      val spend = graft.Caches.persist(tbl(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(round(sum("o_totalprice"), 2).as("spend")))
      // exact cuts via bounded-memory iterative-histogram selection (r4
      // VERDICT #3 — `percentile`'s one-task O(distinct) buffer removed)
      val qs = graft.ops.Quantiles.exact(spend, "spend", Seq(0.75, 0.5, 0.25))
        .values.head.quantiles.map(round6)
      spend.withColumn("quartile",
        when(col("spend") >= qs(0), 1)
          .when(col("spend") >= qs(1), 2)
          .when(col("spend") >= qs(2), 3)
          .otherwise(4))
        .orderBy("o_custkey")
    }),

    "d1_monthly_orders" -> ((s, dir) =>
      // calendar bucketing: month truncation (UTC) via date_trunc
      tbl(s, dir, "orders")
        .withColumn("month_start",
          unix_micros(date_trunc("month", col("o_orderdate").cast("timestamp"))))
        .groupBy("month_start")
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("month_start")),

    "g6_pivot" -> ((s, dir) => {
      // pivot event_type counts into columns per user
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(count(lit(1)))
      types.foldLeft(p)((df, t) => df.withColumn(t, coalesce(col(t), lit(0L))))
        .orderBy("user_id")
    }),

    "f7_highlight" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          regexp_replace(substring(col("text"), 1, 80), "merge", "[merge]").as("hl"))
        .orderBy("doc_id")),

    // ---- event-time operators over `events` ----
    "w2_running_sum" -> ((s, dir) =>
      Sessions.runningSum(events(s, dir))
        .select(col("event_id"), col("user_id"),
          round(col("running_value"), 6).as("running_value"))
        .orderBy("event_id")),

    "events_tumbling" -> ((s, dir) =>
      Sessions.tumbling(events(s, dir))
        .select(col("bucket_start"), col("event_type"), col("n_events"),
          round(col("sum_value"), 6).as("sum_value"))
        .orderBy("bucket_start", "event_type")),

    "events_sliding" -> ((s, dir) =>
      // native sliding windows (1h width, 30min slide — every event lands
      // in exactly two windows); oracle enumerates the two aligned starts
      events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 6).as("sum_value"))
        .select(unix_timestamp(col("window.start")).as("bucket_start"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy("bucket_start", "event_type")),

    "events_sessionize" -> ((s, dir) =>
      Sessions.sessionize(events(s, dir))
        .orderBy("user_id", "session_seq")),

    "events_session_window" -> ((s, dir) =>
      // Spark's NATIVE session windows (third sessionization face, next
      // to gaps-and-islands and the stateful streaming one): window end
      // is defined as last-event + gap, mirrored in the oracle
      events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("t_start"),
          unix_micros(col("session_window.end")).as("t_end"),
          col("n_events"))
        .orderBy("user_id", "t_start")),

    "events_json_props" -> ((s, dir) =>
      Sessions.jsonPropAgg(events(s, dir))
        .orderBy("event_type")),

    "asof_latest_order" -> ((s, dir) => {
      // point-in-time enrichment: each event carries the user's most
      // recent order at-or-before the event (kdb/pandas/DuckDB "ASOF"),
      // composed as union + one window pass — no range cross-join. The
      // right side is pre-deduped per (key, time) with max(o_orderkey) so
      // both engines pick deterministically among equal-time orders.
      val e = events(s, dir)
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ets"))
      val o = tbl(s, dir, "orders")
        .select(col("o_custkey").as("user_id"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("ots"),
          col("o_orderkey"))
        .groupBy("user_id", "ots")
        .agg(max("o_orderkey").as("last_orderkey"))
      AsOfJoin.backward(e, o, key = "user_id",
          leftTime = "ets", rightTime = "ots", carry = Seq("last_orderkey"))
        .select(col("event_id"), col("user_id"), col("ets"),
          col("last_orderkey"), (col("ets") - col("asof_time")).as("us_since_order"))
        .orderBy("event_id")
    }),

    "asof_forward_tol" -> ((s, dir) => {
      // forward as-of WITH tolerance (r3 VERDICT #9 — the two parameters
      // every production as-of API has), as the classic funnel join:
      // each view event attaches the same user's NEXT purchase event
      // at-or-after it, but only within 1 hour (the tolerance drops
      // nearest-matches farther out). Same union + one-window-pass plan
      // as the backward direction; purchases pre-deduped per (user, ts)
      // with max event_id for cross-engine determinism.
      val ev = events(s, dir)
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ets"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("pts"), col("event_id").as("pe"))
        .groupBy("user_id", "pts")
        .agg(max("pe").as("purchase_event"))
      AsOfJoin.forward(views, buys, key = "user_id",
          leftTime = "ets", rightTime = "pts", carry = Seq("purchase_event"),
          tolerance = Some(3600L * 1000000L))
        .select(col("event_id"), col("user_id"), col("ets"),
          col("purchase_event"), (col("asof_time") - col("ets")).as("us_to_purchase"))
        .orderBy("event_id")
    }),

    "stream_sessionize" -> ((s, dir) => {
      // stateful streaming sessionizer (flatMapGroupsWithState) run to
      // completion; emits CLOSED sessions only, so the batch oracle is
      // the gaps-and-islands sessionization minus each user's final
      // (still-open) session
      val sess = StreamingSessionizer.sessionize(
        EventStream.readEvents(s, dir, "events.parquet"))
      StreamingSessionizer.runToCompletion(s, sess, "stream_sessionize_sink")
        .orderBy("user_id", "session_seq")
    }),

    "stream_tumbling" -> ((s, dir) => {
      val agg = EventStream.tumblingCounts(
        EventStream.readEvents(s, dir, "events.parquet"))
      EventStream.runToCompletion(s, agg, "stream_tumbling_sink")
        .select(col("bucket_start"), col("event_type"), col("n_events"),
          round(col("sum_value"), 6).as("sum_value"))
        .orderBy("bucket_start", "event_type")
    }),

    "stream_dedup_users" -> ((s, dir) => {
      // streaming stateful dedup (dropDuplicates over the state store),
      // then distinct-user counts from the drained sink — a streaming
      // dedup op with a batch-equivalent oracle
      val dedup = EventStream.dedupUsers(
        EventStream.readEvents(s, dir, "events.parquet"))
      EventStream.runToCompletion(s, dedup, "stream_dedup_sink",
        org.apache.spark.sql.streaming.OutputMode.Append())
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("event_type")
    }),

    "stream_term_counts" -> ((s, dir) => {
      // the INDEXING pipeline as a stream: corpus files stream in and
      // global term counts are maintained incrementally (Complete mode)
      // — streaming index maintenance, with a batch-equivalence oracle.
      // Same tokenizer lineage as the batch indexer (flatWords).
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val docsStream = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
      val counts = Indexer.flatWords(
          docsStream.select("doc_id", "text"), stem = false)
        .groupBy("word").agg(count(lit(1)).as("n"))
      EventStream.runToCompletion(s, counts, "stream_term_sink")
        .orderBy("word")
    }),

    "stream_enrich_segment" -> ((s, dir) => {
      // stream-static join: streaming events enriched per micro-batch
      // against the static customer dimension, aggregated by segment;
      // batch-equivalence oracle
      val dim = tbl(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      val enriched = EventStream.enrichedSegmentCounts(
        EventStream.readEvents(s, dir, "events.parquet"), dim)
      EventStream.runToCompletion(s, enriched, "stream_enrich_sink")
        .select(col("c_mktsegment"), col("n_events"),
          round(col("sum_value"), 6).as("sum_value"))
        .orderBy("c_mktsegment")
    }),

    "fuzzy_levenshtein" -> ((s, dir) => {
      // bounded edit-distance similarity on adjacent doc pairs (prefix-
      // capped at 40 chars — levenshtein is O(m·n) per pair; a real
      // fuzzy-dedup pass runs it only on banding candidates)
      val d = docs(s, dir)
        .select(col("doc_id"), substring(col("text"), 1, 40).as("pre"))
      val a = d.select(col("doc_id").as("doc_a"), col("pre").as("pre_a"))
      val b = d.select(col("doc_id").as("doc_b"), col("pre").as("pre_b"))
      a.join(b, col("doc_b") === col("doc_a") + 1)
        .select(col("doc_a"),
          levenshtein(col("pre_a"), col("pre_b")).cast("long").as("edit_dist"))
        .orderBy("doc_a")
    }),

    "q6_forecast_revenue" -> ((s, dir) =>
      // TPC-H Q6 shape: tight multi-predicate scan + global agg — the
      // pushdown showcase (all four predicates reach the parquet scan)
      tbl(s, dir, "lineitem")
        .filter(
          col("l_shipdate").cast("timestamp") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate").cast("timestamp") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
          count(lit(1)).as("n"))),

    "q17_small_qty" -> ((s, dir) => {
      // TPC-H Q17 shape: correlated scalar subquery (per-part average
      // quantity) decorrelated into a groupBy + equi-join — exact
      // cross-engine because integer-valued quantities sum exactly
      val li = tbl(s, dir, "lineitem")
      val avgq = li.groupBy("l_partkey").agg(avg("l_quantity").as("avg_qty"))
      li.join(avgq, Seq("l_partkey"))
        .filter(col("l_quantity") < col("avg_qty") * 0.5)
        .agg(round(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"),
          count(lit(1)).as("n"))
    }),

    "agg_variance" -> ((s, dir) =>
      // higher-moment aggregates per group (sample variance / stddev)
      tbl(s, dir, "customer")
        .groupBy("c_mktsegment")
        .agg(round(var_samp("c_acctbal"), 2).as("var_bal"),
          round(stddev_samp("c_acctbal"), 4).as("sd_bal"),
          count(lit(1)).as("n"))
        .orderBy("c_mktsegment")),

    "agg_max_by" -> ((s, dir) =>
      // argmax per group, tie-broken deterministically: max over the
      // (value, key) struct orders lexicographically, so equal balances
      // resolve by highest custkey — one hash aggregate, no window
      tbl(s, dir, "customer")
        .groupBy("c_mktsegment")
        .agg(max(struct(col("c_acctbal"), col("c_custkey"))).as("m"))
        .select(col("c_mktsegment"),
          col("m.c_custkey").as("top_custkey"),
          round(col("m.c_acctbal"), 2).as("top_acctbal"))
        .orderBy("c_mktsegment")),

    "hist_doc_lengths" -> ((s, dir) =>
      // histogram binning: corpus length distribution in 200-char buckets
      docs(s, dir)
        .groupBy((floor(col("n_chars") / 200) * 200).as("bucket_lo"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("bucket_lo")),

    "q19_disjunctive" -> ((s, dir) =>
      // TPC-H Q19 shape: OR-of-ANDs selection — exercises disjunctive
      // predicate handling (CNF conversion / partial pushdown)
      tbl(s, dir, "lineitem")
        .join(broadcast(tbl(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_size").between(1, 15) && col("l_quantity").between(1, 20)) ||
          (col("p_size").between(16, 35) && col("l_quantity").between(21, 35)) ||
          (col("p_size").between(36, 50) && col("l_quantity").between(36, 50)))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n"))),

    "w5_trailing_hour" -> ((s, dir) => {
      // RANGE window frame (value-based, vs w2's ROWS frame): events in
      // the user's trailing hour, inclusive of the current instant
      val w = Window.partitionBy("user_id").orderBy(col("us"))
        .rangeBetween(-3600000000L, 0L)
      events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("n_trailing_hour", count(lit(1)).over(w))
        .select("event_id", "user_id", "us", "n_trailing_hour")
        .orderBy("event_id")
    }),

    "q3_shipping_priority" -> ((s, dir) =>
      // TPC-H Q3 shape: selective dims, 3-way join, agg, top-k
      tbl(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(tbl(s, dir, "orders")
          .filter(col("o_orderdate").cast("timestamp") < lit("1998-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(tbl(s, dir, "lineitem")
          .filter(col("l_shipdate").cast("timestamp") > lit("1998-01-01").cast("timestamp")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)),

    // ---- dedup extension family ----
    "dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(docs(s, dir)).orderBy("fingerprint")),

    "dedup_keep_first" -> ((s, dir) => {
      // the dedup RESULT: corpus filtered to each content group's keeper
      // (min doc_id) via a broadcast-able semi-join on the fingerprint
      val d = docs(s, dir)
      val keepers = Dedup.exactGroups(d).select(col("keeper_doc_id").as("doc_id"))
      d.join(keepers, Seq("doc_id"), "left_semi")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    }),

    "dedup_jaccard_adjacent" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = d.select(col("doc_id").as("doc_a"), (col("doc_id") + 1).as("doc_b"))
      Dedup.jaccardForPairs(d, pairs, 3)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("doc_a")
    }),

    "dedup_minhash" -> ((s, dir) =>
      // MinHash-LSH banded candidate generation + exact-Jaccard verify at
      // threshold 0.8. Fully oracle-checked (r2 VERDICT item 4): with
      // (bands=16, r=2) recall at j≥0.8 is 1-(1-j²)^16 ≈ 1-8e-8 and the
      // permutations are fixed constants, so the verified pair set
      // deterministically equals the exact all-pairs j≥0.8 set — which is
      // what the DuckDB oracle computes (500 docs at gate scale). The
      // signature-internal est_jaccard is pinned by DedupSpec instead.
      Dedup.minhashPairs(docs(s, dir), k = 3, numHashes = 32, bands = 16,
          threshold = 0.8)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("doc_a", "doc_b")),

    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhash(docs(s, dir)).orderBy("doc_id")),

    "dedup_components" -> ((s, dir) =>
      // near-dup pairs → connected components (iterative min-label
      // propagation): the cluster ids a keep-one-per-cluster pass needs;
      // oracle = DuckDB recursive-CTE transitive closure. CC runs once
      // per (session, sfDir) — shared with pipeline_dedup_components
      nearDupComponents(s, dir)
        .select(col("node").as("doc_id"), col("component"))
        .orderBy("doc_id")),

    "pipeline_dedup_near" -> ((s, dir) => {
      // corpus with near-duplicates REMOVED (keep the lowest doc_id of
      // each pair; greedy doc_b removal — deterministic and mirrored in
      // SQL): the pipeline stage that follows candidate generation
      val d = docs(s, dir)
      val losers = Dedup.minhashPairs(d, k = 3, numHashes = 32, bands = 16,
          threshold = 0.8)
        .select(col("doc_b").as("doc_id")).distinct()
      d.join(losers, Seq("doc_id"), "left_anti")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),

    "pipeline_dedup_components" -> ((s, dir) => {
      // component-based keepers (r3 VERDICT #5): the pair-based doc_b
      // removal above is correct for a transitive cluster {1,2,3} with
      // edges (1,2),(2,3) only by accident of pair orientation; the
      // semantically right stage keeps the MIN doc_id per CONNECTED
      // COMPONENT of the near-dup graph and drops everything else.
      // Chains the existing pieces: minhash pairs → connected components
      // → anti-join. The component label IS the min reachable node id,
      // so losers are simply nodes whose label differs from themselves.
      val d = docs(s, dir)
      val losers = nearDupComponents(s, dir)
        .filter(col("node") =!= col("component"))
        .select(col("node").as("doc_id"))
      d.join(losers, Seq("doc_id"), "left_anti")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),

    "dedup_simhash_near" -> ((s, dir) =>
      // SimHash near-dup pairs via Hamming banding (Manku et al. WWW'07):
      // 4 bands × 15 bits, capped equality self-join, verify hamming ≤ 3
      Dedup.simhashNearDup(docs(s, dir), bands = 4, bits = 60, maxHamming = 3)
        .orderBy("doc_a", "doc_b")),

    // ---- similarity-search extension family (over `embeddings`) ----
    "sim_knn" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      Similarity.bruteForceTopK(
        e.select("vec_id", "embedding"),
        e.filter(col("vec_id") < 8).select("vec_id", "embedding"), k = 5)
        .select(col("query_id"), col("vec_id"), round(col("cos"), 6).as("cos"), col("rank"))
        .orderBy("query_id", "rank")
    }),

    "sim_ivf_assign" -> ((s, dir) =>
      // real IVF (r2 VERDICT item 8): seed centroids refined by one Lloyd
      // iteration (assign → per-cluster means, rounded 6dp for
      // cross-engine determinism → reassign); oracle mirrors the same
      // fixed iteration
      Similarity.ivfAssign(tbl(s, dir, "embeddings").select("vec_id", "embedding"),
        nCentroids = 8, lloydIters = 1)
        .orderBy("vec_id")),

    "sim_lsh_buckets" -> ((s, dir) =>
      Similarity.lshBuckets(tbl(s, dir, "embeddings"), planes = 8, dim = 64)
        .groupBy("bucket").agg(count(lit(1)).as("n_vecs"))
        .orderBy("bucket")),

    "sim_lsh_topk" -> ((s, dir) => {
      // bucketed ANN top-k — the 100 TB path: candidates restricted to
      // the query's LSH bucket (equi-join), recall traded for the
      // elimination of the cross join; deterministic planes → full oracle
      val e = tbl(s, dir, "embeddings").select("vec_id", "embedding")
      Similarity.lshTopK(e, e.filter(col("vec_id") < 8), k = 5,
          planes = 8, dim = 64)
        .select(col("query_id"), col("vec_id"),
          round(col("cos"), 6).as("cos"), col("rank"))
        .orderBy("query_id", "rank")
    }),

    "sim_ivf_topk" -> ((s, dir) => {
      // IVF ANN with nprobe=1 (r3 VERDICT #6): candidates restricted to
      // the query's centroid cluster — the equi-join scale path, like
      // sim_lsh_topk but with data-dependent (seed) centroids instead of
      // hyperplanes. Deterministic seed assignment → full oracle.
      val e = tbl(s, dir, "embeddings").select("vec_id", "embedding")
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 8), k = 5, nCentroids = 8)
        .select(col("query_id"), col("vec_id"),
          round(col("cos"), 6).as("cos"), col("rank"))
        .orderBy("query_id", "rank")
    }),

    "sim_neardup_pairs" -> ((s, dir) =>
      // embedding-cosine near-dup pairs inside capped LSH buckets, fully
      // oracle-checked (r2 VERDICT item 3). The synthetic embeddings are
      // random — max ALL-pairs cosine ≈ 0.51 at sf0.01 — so the demo
      // threshold sits in the observed upper tail (≥ 0.35 → 13 rows);
      // real corpora with planted near-dups would run ≥ 0.8.
      Similarity.cosineNearDupPairs(
          tbl(s, dir, "embeddings").select("vec_id", "embedding"),
          threshold = 0.35)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("vec_a", "vec_b")),

    // ---- text-analysis extension family ----
    "text_quality" -> ((s, dir) =>
      TextAnalysis.qualityMetrics(docs(s, dir))
        .select(col("doc_id"), col("n_tokens"),
          round(col("mean_token_len"), 6).as("mean_token_len"),
          round(col("stopword_ratio"), 6).as("stopword_ratio"),
          round(col("alpha_ratio"), 6).as("alpha_ratio"))
        .orderBy("doc_id")),

    "lang_id" -> ((s, dir) =>
      TextAnalysis.languageId(docs(s, dir))
        .select("doc_id", "lang", "pred_lang")
        .orderBy("doc_id")),

    "tok_token_counts" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TextAnalysis.wsTokenCount(col("text")).cast("long").as("ws_tokens"),
        TextAnalysis.bpeishTokenCount(col("text")).cast("long").as("bpeish_tokens"))
        .orderBy("doc_id")),

    "fingerprint_rolling" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TextAnalysis.rollingFingerprint(col("text"), 200).as("fp"))
        .orderBy("doc_id")),

    "text_bigram_counts" -> ((s, dir) =>
      // corpus-wide n-gram language-model statistics: top-20 bigrams by
      // frequency (shingle machinery with k=2, UNhashed — the strings
      // are the output here; per-doc distinct like all shingle ops)
      Dedup.shingleRows(docs(s, dir), k = 2)
        .groupBy(col("shingle").as("bigram"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("n_docs").desc, col("bigram").asc)
        .limit(20)),

    "sample_hash_bucket" -> ((s, dir) =>
      // reproducible down-sampling — the training-data op behind data
      // versioning and held-out splits: bucket = 60-bit md5 of the doc
      // id, mod 10; keep buckets 0-2 (a 30% sample). NOT rand()/
      // TABLESAMPLE: the same rows are kept on any engine, cluster
      // size, partitioning, or rerun. Narrow, scan-speed at any scale.
      docs(s, dir)
        .withColumn("bucket",
          pmod(Dedup.md5Hash60(col("doc_id").cast("string")), lit(10L)))
        .filter(col("bucket") < 3)
        .select("doc_id", "lang", "bucket")
        .orderBy("doc_id")),

    "text_lm_score" -> ((s, dir) => {
      // LM-based quality scoring (the CCNet-style filter an LLM data
      // pipeline runs after dedup): score every document by the average
      // log10 probability of its bigrams under the corpus's own
      // add-one-smoothed bigram model. All counts are hash aggregates
      // over compact token keys; the scoring join is bigram-string
      // equi-join (AQE broadcasts the LM table while it fits); the one
      // window (bigram formation via lead) is partitioned by doc_id.
      val toks = docs(s, dir).select(col("doc_id"),
        posexplode(TextAnalysis.rawTokens(col("text"))).as(Seq("pos", "w")))
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val big = graft.Caches.persist(
        toks.withColumn("w2", lead("w", 1).over(w))
          .filter(col("w2").isNotNull)
          .withColumn("bg", concat(col("w"), lit(" "), col("w2"))))
      val c2 = big.groupBy("bg").agg(count(lit(1)).as("c2"))
      val c1 = big.groupBy("w").agg(count(lit(1)).as("c1"))
      // vocabulary size over ALL token occurrences (scalar materialize,
      // the S4 pattern) — the add-one denominator
      val vocab = toks.select("w").distinct().count()
      big
        .join(c2, Seq("bg"))
        .join(c1, Seq("w"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(avg(log10((col("c2") + 1).cast("double") / (col("c1") + vocab))), 6)
            .as("lm_score"))
        .orderBy("doc_id")
    }),

    "doc_embedding_norms" -> ((s, dir) =>
      // the text↔vector linkage a multimodal training pipeline relies
      // on: documents joined to their embedding row (doc_id = vec_id in
      // the driver's fixtures), emitting the L2 norm per doc
      docs(s, dir).select(col("doc_id"), col("lang"))
        .join(tbl(s, dir, "embeddings")
          .select(col("vec_id").as("doc_id"), col("embedding")), Seq("doc_id"))
        .select(col("doc_id"), col("lang"),
          round(Similarity.norm(col("embedding")), 6).as("l2_norm"))
        .orderBy("doc_id")),

    "tfidf_top_terms" -> ((s, dir) => {
      // top-3 characteristic terms per document by tf·idf — window rank
      // over the TF ⋈ IDF join (serving-index tables). No forced
      // broadcast: unlike the |query|-row IDF side in search, this joins
      // the WHOLE vocabulary — AQE picks broadcast while it fits and
      // falls back to a shuffle join at real-corpus vocab sizes.
      val t = builtIndex(s, dir, stem = false)
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tfidf").desc, col("word").asc)
      t.termFrequencies
        .join(t.idfValues.select("word", "idf"), Seq("word"))
        .withColumn("tfidf", col("term_freq") * col("idf"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("word"),
          round(col("tfidf"), 6).as("tfidf"), col("rank"))
        .orderBy("doc_id", "rank")
    }),

    "pipeline_clean_corpus" -> ((s, dir) => {
      // the composed training-data pipeline: quality-gate the corpus,
      // then keep one doc per exact-content group — the operators above
      // used the way a 100 TB data-cleaning job chains them
      val d = docs(s, dir)
      val quality = TextAnalysis.qualityMetrics(d)
        .filter(col("n_tokens") >= 20 && col("stopword_ratio") < 0.5)
      val keepers = Dedup.exactGroups(d).select(col("keeper_doc_id").as("doc_id"))
      quality.join(keepers, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("lang"), col("n_tokens"))
        .orderBy("doc_id")
    }),

    // ---- multimodal plumbing ----
    "multimodal_features" -> ((s, dir) =>
      Multimodal.extractFeatures(Multimodal.asMediaTable(docs(s, dir)))
        .select(col("media_id"), col("n_bytes"),
          round(col("mean_byte"), 6).as("mean_byte"), col("width"), col("height"))
        .orderBy("media_id")),

    "multimodal_resize" -> ((s, dir) =>
      Multimodal.resizeStride(Multimodal.asMediaTable(docs(s, dir)), stride = 4)
        .orderBy("media_id")),

    "multimodal_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(Multimodal.asMediaTable(docs(s, dir)), nFrames = 4)
        .withColumn("frame_mean", round(col("frame_mean"), 6))
        .orderBy("media_id", "frame_idx")),

    // ---- nested-corpus ingest (CAP fixture; SURVEY.md §2.3) ----
    "s1_corpus_ingest" -> ((s, dir) =>
      CorpusSource.explodeOpinions(CorpusSource.readJsonl(s, FixturePath))
        .select(col("doc_id"), col("opinion_author"), col("opinion_type"),
          length(col("opinion_text")).cast("long").as("opinion_len"))
        .orderBy("doc_id", "opinion_author", "opinion_type", "opinion_len")),

    "u4_concat_opinions" -> ((s, dir) =>
      CorpusSource.concatOpinions(CorpusSource.readJsonl(s, FixturePath))
        .orderBy("doc_id")),

    "opinion_text_first" -> ((s, dir) =>
      // the reference's seventh artifact (opinion_text.parquet,
      // pyapp.py:37,114): deterministic per-case display text — first
      // opinion by array position (r2 VERDICT "What's missing" #1)
      CorpusSource.firstOpinionText(CorpusSource.readJsonl(s, FixturePath))
        .orderBy("doc_id")),

    "serve_from_artifacts" -> ((s, dir) => {
      // the reference's ACTUAL serving mode (pyapp.py:30-37): artifacts
      // prebuilt on disk, the app loads them and never re-indexes. Write
      // all eight artifacts (incl. the display-text table and the
      // preprocessed corpus, searchenginespark.py:74-77), load them
      // back, score, and join snippets from the LOADED text artifact —
      // result must be bitwise-identical to the build-then-search path,
      // so the oracle is the t1_search_snippet SQL.
      val t = builtIndex(s, dir, stem = false)
      Indexer.writeArtifacts(s, t, ArtifactsPath,
        opinionText = Some(docs(s, dir)
          .select(col("doc_id"), col("text").as("opinion_text"))),
        preprocessedDocs = Some(Indexer.preprocessedDocs(docs(s, dir), stem = false)))
      val loaded = Indexer.loadArtifacts(s, ArtifactsPath)
      val top = Search.scoreTerms(loaded, SearchTerms)
        .withColumn("score", round(col("score"), 4))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(10)
      broadcast(top)
        .join(s.read.parquet(s"$ArtifactsPath/opinion_text.parquet"), Seq("doc_id"))
        .withColumn("snippet", Search.snippet(col("opinion_text"), 160))
        .select("doc_id", "score", "snippet")
        .orderBy(col("score").desc, col("doc_id").asc)
    })
  )

  // ---------------------------------------------------------------------
  // oracle SQL (DuckDB) — one per query above, omitted only where the
  // semantics are not ANSI-SQL-expressible (stemmer, minhash permutations)
  // ---------------------------------------------------------------------

  def oracleSql: Map[String, String] = Map(
    "tok_flat_words" ->
      s"WITH $indexCtes SELECT doc_id, word FROM flat ORDER BY doc_id, word",

    "g2_doc_lengths" ->
      s"WITH $indexCtes SELECT doc_id, doc_length FROM dl ORDER BY doc_id",

    "g3_term_frequencies" ->
      s"WITH $indexCtes SELECT doc_id, word, term_freq FROM tf ORDER BY doc_id, word",

    "g4_doc_freq_idf" ->
      s"WITH $indexCtes SELECT word, doc_freq, round(idf, 6) AS idf FROM idf ORDER BY word",

    "g1_inverted_index" ->
      s"WITH $indexCtes SELECT word, array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS doc_ids FROM flat GROUP BY word ORDER BY word",

    "g5_scoring_params" ->
      s"WITH $indexCtes SELECT n_docs, round(avgdl, 6) AS avgdl FROM stats",

    "bm25_search" ->
      s"WITH $bm25Ctes SELECT doc_id, score FROM top10",

    "j3_sql_bm25" ->
      s"WITH $bm25Ctes SELECT doc_id, score FROM top10",

    "bm25_okapi_variant" ->
      s"""WITH $indexCtes,
         |rawidf AS (SELECT word, ln(((SELECT count(*) FROM dl) - doc_freq + 0.5) / (doc_freq + 0.5)) AS raw FROM idf),
         |oka AS (SELECT word, CASE WHEN raw < 0 THEN 0.25 * (SELECT avg(raw) FROM rawidf) ELSE raw END AS idf FROM rawidf),
         |scored2 AS (
         |  SELECT t.doc_id,
         |         sum(o.idf * (t.term_freq * (1.5 + 1)) /
         |             (t.term_freq + 1.5 * (0.25 + 0.75 * d.doc_length / (SELECT avgdl FROM stats)))) AS s
         |  FROM tf t JOIN oka o USING (word) JOIN dl d USING (doc_id)
         |  WHERE t.word IN ($SearchTermsSql)
         |  GROUP BY t.doc_id)
         |SELECT doc_id, round(s, 4) AS score FROM scored2
         |ORDER BY round(s, 4) DESC, doc_id LIMIT 10""".stripMargin,

    "bm25_search_stemmed" ->
      // scores the pre-stemmed fixture the Spark query exported (SURVEY §5)
      // — same CTE shapes as bm25Ctes, but `flat` comes from the fixture
      // and the IN-list is the pre-stemmed terms; the oracle never stems
      s"""WITH flat AS (SELECT doc_id, word FROM read_parquet('$StemmedFlatPath/*.parquet')),
         |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS doc_length FROM flat GROUP BY doc_id),
         |tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS term_freq FROM flat GROUP BY doc_id, word),
         |idf AS (SELECT word, log10((SELECT count(*) FROM dl) * 1.0 / count(DISTINCT doc_id)) AS idf FROM flat GROUP BY word),
         |stats AS (SELECT sum(doc_length) * 1.0 / count(*) AS avgdl FROM dl),
         |scored AS (
         |  SELECT t.doc_id,
         |         sum(i.idf * (t.term_freq * (1.2 + 1)) /
         |             (t.term_freq + 1.2 * (0.25 + 0.75 * d.doc_length / (SELECT avgdl FROM stats)))) AS s
         |  FROM tf t JOIN idf i USING (word) JOIN dl d USING (doc_id)
         |  WHERE t.word IN ($StemmedTermsSql)
         |  GROUP BY t.doc_id)
         |SELECT doc_id, round(s, 4) AS score FROM scored
         |ORDER BY round(s, 4) DESC, doc_id LIMIT 10""".stripMargin,

    "t1_search_snippet" ->
      s"""WITH $bm25Ctes
         |SELECT t.doc_id, t.score,
         |       CASE WHEN len(d.text) > 160 THEN substr(d.text, 1, 160) || '...' ELSE d.text END AS snippet
         |FROM top10 t JOIN read_parquet('/root/testdata/sf0.01/documents.parquet') d USING (doc_id)
         |ORDER BY t.score DESC, t.doc_id""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_price,
        |       round(avg(l_discount), 6) AS avg_disc,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_rollup" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q4_cube" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n, round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "index_incremental_idf" ->
      // identical to g4: merged per-batch partials must equal batch build
      s"WITH $indexCtes SELECT word, doc_freq, round(idf, 6) AS idf FROM idf ORDER BY word",

    "sink_partitioned_read" ->
      """SELECT doc_id, lang, source FROM read_parquet('/root/testdata/sf0.01/documents.parquet')
        |WHERE lang = 'en' ORDER BY doc_id""".stripMargin,

    "sink_csv_roundtrip" ->
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS n
        |FROM read_parquet('/root/testdata/sf0.01/documents.parquet')
        |GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    "sink_orc_roundtrip" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM read_parquet('/root/testdata/sf0.01/documents.parquet')
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "j1_broadcast_join" ->
      """SELECT p_brand,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "j2_star_join" ->
      """SELECT r_name, n_name,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "j4_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "j5_anti_join" ->
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "j7_range_join" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('low', 0.0, 100000.0), ('mid', 100000.0, 300000.0),
        |  ('high', 300000.0, 500000.0), ('top', 500000.0, 1e18))
        |SELECT band, CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band ORDER BY band""".stripMargin,

    "w4_order_gaps" ->
      """WITH g AS (
        |  SELECT o_custkey,
        |         date_diff('day', CAST(lag(o_orderdate) OVER w AS DATE), CAST(o_orderdate AS DATE)) AS gap_days
        |  FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
        |SELECT o_custkey, round(avg(gap_days), 6) AS avg_gap_days, CAST(count(*) AS BIGINT) AS n_gaps
        |FROM g WHERE gap_days IS NOT NULL
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "j6_outer_counts" ->
      """SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders,
        |       round(coalesce(sum(o_totalprice), 0.0), 2) AS total
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "skew_salted_agg" ->
      // oracle = the DIRECT aggregate the salted two-phase must equal
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
        |       CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "skew_salted_distinct" ->
      // oracle = the DIRECT count-distinct the salted two-phase must equal
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "asof_forward_tol" ->
      // DuckDB ASOF with the mirrored (<=) inequality picks the nearest
      // later purchase; the tolerance is a post-filter on the matched
      // distance in BOTH engines (a view whose nearest purchase is >1h
      // away drops — not "any purchase within 1h")
      """WITH v AS (SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ets FROM events WHERE event_type = 'view'),
        |p AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS pts, max(event_id) AS purchase_event
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT v.event_id, v.user_id, v.ets, p.purchase_event,
        |       p.pts - v.ets AS us_to_purchase
        |FROM v ASOF JOIN p ON v.user_id = p.user_id AND v.ets <= p.pts
        |WHERE p.pts - v.ets <= 3600000000
        |ORDER BY v.event_id""".stripMargin,

    "dim_upsert" ->
      """SELECT c.c_custkey,
        |       CASE WHEN c.c_custkey % 2 = 0 THEN upper(c.c_mktsegment) ELSE c.c_mktsegment END AS segment
        |FROM customer c ORDER BY c_custkey""".stripMargin,

    "g7_string_agg" ->
      """SELECT lang,
        |       array_to_string(list_sort(list(DISTINCT source)), ',') AS sources,
        |       CAST(count(*) AS BIGINT) AS n_docs
        |FROM read_parquet('/root/testdata/sf0.01/documents.parquet')
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "a5_percentiles" ->
      """SELECT c_mktsegment,
        |       round(quantile_cont(c_acctbal, 0.5), 6) AS p50,
        |       round(quantile_cont(c_acctbal, 0.9), 6) AS p90,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "p4_in_filter" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem WHERE l_returnflag IN ('A', 'R')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "p5_point_lookup" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |       round(o_totalprice, 2) AS o_totalprice,
        |       CAST(epoch_us(o_orderdate) AS BIGINT) AS o_date_us,
        |       o_orderpriority
        |FROM orders WHERE o_orderkey = 42""".stripMargin,

    "p6_null_filter" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        |FROM read_parquet('/root/testdata/sf0.01/documents.parquet') WHERE text IS NOT NULL AND len(text) > 0
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "t2_topk_orders" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "t3_slice_sample" ->
      """SELECT doc_id, lang, source FROM read_parquet('/root/testdata/sf0.01/documents.parquet')
        |WHERE doc_id >= (SELECT max(doc_id) // 2 FROM read_parquet('/root/testdata/sf0.01/documents.parquet'))
        |ORDER BY doc_id""".stripMargin,

    "s5_local_df" ->
      "SELECT k, v FROM (VALUES (1, 'alpha'), (2, 'beta'), (3, 'gamma')) AS t(k, v) ORDER BY k",

    "set_ops_custkeys" ->
      """SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
        |  UNION
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |) ORDER BY custkey""".stripMargin,

    "topk_per_key" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY round(o_totalprice, 2) DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 2 ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin,

    "set_ops_intersect" ->
      """SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
        |  INTERSECT
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |) ORDER BY custkey""".stripMargin,

    "g8_unpivot" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |t AS (SELECT unnest(['click','error','purchase','signup','view']) AS event_type),
        |c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2)
        |SELECT u.user_id, t.event_type, coalesce(c.n, 0) AS n
        |FROM u CROSS JOIN t LEFT JOIN c ON c.user_id = u.user_id AND c.event_type = t.event_type
        |ORDER BY u.user_id, t.event_type""".stripMargin,

    "d2_ship_latency" ->
      """SELECT l_returnflag,
        |       round(avg(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))), 6) AS avg_days,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_corr" ->
      """SELECT l_returnflag,
        |       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |       round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "w1_window_rank" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "w3_ntile" ->
      // percentile-cut quartiles mirrored: DuckDB quantile_cont and Spark
      // percentile both linearly interpolate at exact dyadic fractions of
      // 2dp-rounded spends; cuts rounded to 6dp on both sides
      """WITH spend AS (SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
        |               FROM orders GROUP BY o_custkey),
        |cuts AS (SELECT round(quantile_cont(spend, 0.75), 6) AS p75,
        |                round(quantile_cont(spend, 0.5), 6) AS p50,
        |                round(quantile_cont(spend, 0.25), 6) AS p25
        |         FROM spend)
        |SELECT o_custkey, spend,
        |       CAST(CASE WHEN spend >= p75 THEN 1
        |                 WHEN spend >= p50 THEN 2
        |                 WHEN spend >= p25 THEN 3
        |                 ELSE 4 END AS INTEGER) AS quartile
        |FROM spend, cuts ORDER BY o_custkey""".stripMargin,

    "d1_monthly_orders" ->
      """SELECT CAST(epoch_us(date_trunc('month', o_orderdate)) AS BIGINT) AS month_start,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "g6_pivot" ->
      """SELECT user_id,
        |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "f7_highlight" ->
      """SELECT doc_id, regexp_replace(substr(text, 1, 80), 'merge', '[merge]', 'g') AS hl
        |FROM read_parquet('/root/testdata/sf0.01/documents.parquet') ORDER BY doc_id""".stripMargin,

    "w2_running_sum" ->
      """SELECT event_id, user_id,
        |       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_value
        |FROM events ORDER BY event_id""".stripMargin,

    "events_tumbling" ->
      """SELECT CAST(floor(epoch_us(ts) / 3600000000) * 3600 AS BIGINT) AS bucket_start,
        |       event_type,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       round(sum(value), 6) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "events_sliding" ->
      // every event lands in exactly two 30min-aligned hour windows:
      // floor-to-30min and that minus 1800s
      """WITH e AS (SELECT event_type, value, epoch_us(ts) // 1000000 AS sec FROM events),
        |w AS (SELECT event_type, value, (sec // 1800 - i.i) * 1800 AS bucket_start
        |      FROM e CROSS JOIN (SELECT unnest(range(0, 2)) AS i) i)
        |SELECT CAST(bucket_start AS BIGINT) AS bucket_start, event_type,
        |       CAST(count(*) AS BIGINT) AS n_events, round(sum(value), 6) AS sum_value
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "stream_term_counts" ->
      s"WITH $indexCtes SELECT word, CAST(count(*) AS BIGINT) AS n FROM flat GROUP BY word ORDER BY word",

    "stream_enrich_segment" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_events,
        |       round(sum(value), 6) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "fuzzy_levenshtein" ->
      """WITH d AS (SELECT doc_id, substr(text, 1, 40) AS pre FROM read_parquet('/root/testdata/sf0.01/documents.parquet'))
        |SELECT a.doc_id AS doc_a, CAST(levenshtein(a.pre, b.pre) AS BIGINT) AS edit_dist
        |FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
        |ORDER BY doc_a""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q17_small_qty" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem l
        |WHERE l_quantity < 0.5 * (SELECT avg(l2.l_quantity) FROM lineitem l2
        |                          WHERE l2.l_partkey = l.l_partkey)""".stripMargin,

    "agg_variance" ->
      """SELECT c_mktsegment, round(var_samp(c_acctbal), 2) AS var_bal,
        |       round(stddev_samp(c_acctbal), 4) AS sd_bal,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "agg_max_by" ->
      // same argmax via a window (mechanism-free oracle; (acctbal,
      // custkey) is a unique sort key so both engines agree)
      """SELECT c_mktsegment, c_custkey AS top_custkey, round(c_acctbal, 2) AS top_acctbal
        |FROM (SELECT *, row_number() OVER (PARTITION BY c_mktsegment
        |                                   ORDER BY c_acctbal DESC, c_custkey DESC) AS rn
        |      FROM customer)
        |WHERE rn = 1 ORDER BY c_mktsegment""".stripMargin,

    "hist_doc_lengths" ->
      """SELECT CAST(floor(n_chars / 200) * 200 AS BIGINT) AS bucket_lo,
        |       CAST(count(*) AS BIGINT) AS n_docs
        |FROM read_parquet('/root/testdata/sf0.01/documents.parquet')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events),
        |g AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_session
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |         FROM g)
        |SELECT user_id, session_seq, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(min(us) AS BIGINT) AS t_start, CAST(max(us) AS BIGINT) AS t_end
        |FROM sess GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin,

    "events_session_window" ->
      // same gaps-and-islands CTEs as events_sessionize; session end =
      // last event + the 30-minute gap (session_window semantics). The
      // new-session predicate is `>=` here (NOT the `>` of the
      // gaps-and-islands queries, which define their own convention):
      // Spark's native session_window is end-EXCLUSIVE, so an event at
      // exactly prev_ts + gap starts a new session (r3 ADVICE — the `>`
      // variant passed only because no exact 30-min gap existed).
      """WITH e AS (SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events),
        |g AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_session
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |         FROM g)
        |SELECT user_id, CAST(min(us) AS BIGINT) AS t_start,
        |       CAST(max(us) + 1800000000 AS BIGINT) AS t_end,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM sess GROUP BY user_id, session_seq ORDER BY user_id, t_start""".stripMargin,

    "events_json_props" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "asof_latest_order" ->
      // DuckDB's native ASOF JOIN is the oracle for the union+window
      // composition; right side pre-deduped identically
      """WITH e AS (SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ets FROM events),
        |o AS (SELECT o_custkey AS user_id, CAST(epoch_us(o_orderdate) AS BIGINT) AS ots,
        |             max(o_orderkey) AS last_orderkey
        |      FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.ets, o.last_orderkey,
        |       e.ets - o.ots AS us_since_order
        |FROM e ASOF JOIN o ON e.user_id = o.user_id AND e.ets >= o.ots
        |ORDER BY e.event_id""".stripMargin,

    "stream_sessionize" ->
      // batch gaps-and-islands sessionization MINUS each user's final
      // session (the streaming run emits only gap-CLOSED sessions; the
      // last one per user is still open in state)
      """WITH e AS (SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events),
        |g AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_session
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |         FROM g),
        |agg AS (SELECT user_id, session_seq, CAST(count(*) AS BIGINT) AS n_events,
        |               CAST(min(us) AS BIGINT) AS t_start, CAST(max(us) AS BIGINT) AS t_end
        |        FROM sess GROUP BY user_id, session_seq)
        |SELECT user_id, session_seq, n_events, t_start, t_end FROM agg
        |QUALIFY session_seq < max(session_seq) OVER (PARTITION BY user_id)
        |ORDER BY user_id, session_seq""".stripMargin,

    "stream_tumbling" ->
      """SELECT CAST(floor(epoch_us(ts) / 3600000000) * 3600 AS BIGINT) AS bucket_start,
        |       event_type,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       round(sum(value), 6) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "stream_dedup_users" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q19_disjunctive" ->
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_size BETWEEN 16 AND 35 AND l_quantity BETWEEN 21 AND 35)
        |   OR (p_size BETWEEN 36 AND 50 AND l_quantity BETWEEN 36 AND 50)""".stripMargin,

    "w5_trailing_hour" ->
      """SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS us,
        |       CAST(count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |                           RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_trailing_hour
        |FROM events ORDER BY event_id""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT o_orderkey,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       CAST(count(*) AS BIGINT) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY o_orderkey
        |ORDER BY round(sum(l_extendedprice * (1 - l_discount)), 2) DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS fingerprint, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS keeper_doc_id
        |FROM read_parquet('/root/testdata/sf0.01/documents.parquet') GROUP BY md5(text) ORDER BY fingerprint""".stripMargin,

    "dedup_keep_first" ->
      """SELECT doc_id, lang, source FROM read_parquet('/root/testdata/sf0.01/documents.parquet')
        |WHERE doc_id IN (SELECT min(doc_id) FROM read_parquet('/root/testdata/sf0.01/documents.parquet') GROUP BY md5(text))
        |ORDER BY doc_id""".stripMargin,

    "dedup_jaccard_adjacent" ->
      // shingles md5Hash60-hashed on BOTH sides (r2 bench hotspot fix):
      // identical Jaccard, but set-ops move 8-byte values
      s"""WITH $hashedShingleCtes
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE), 6) AS jaccard
         |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
         |ORDER BY doc_a""".stripMargin,

    "dedup_minhash" ->
      // exact all-pairs Jaccard ≥ 0.8 over hashed shingle sets — equals
      // the LSH-verified pair set (recall 1-(1-j²)^16 at the 500-doc gate)
      s"""WITH $hashedShingleCtes,
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |             CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) AS j
         |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, round(j, 6) AS jaccard FROM p WHERE j >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_simhash" ->
      s"WITH $simhashCtes SELECT doc_id, simhash FROM shv ORDER BY doc_id",

    "dedup_components" ->
      s"""WITH RECURSIVE $hashedShingleCtes,
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) >= 0.8),
         |e AS (SELECT doc_a AS src, doc_b AS dst FROM p UNION SELECT doc_b, doc_a FROM p),
         |n AS (SELECT DISTINCT src AS node FROM e),
         |reach(node, r) AS (
         |  SELECT node, node FROM n
         |  UNION
         |  SELECT reach.node, e.dst FROM reach JOIN e ON e.src = reach.r)
         |SELECT node AS doc_id, min(r) AS component FROM reach
         |GROUP BY node ORDER BY doc_id""".stripMargin,

    "pipeline_dedup_near" ->
      s"""WITH $hashedShingleCtes,
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) >= 0.8)
         |SELECT doc_id, lang FROM read_parquet('/root/testdata/sf0.01/documents.parquet')
         |WHERE doc_id NOT IN (SELECT doc_b FROM p)
         |ORDER BY doc_id""".stripMargin,

    "pipeline_dedup_components" ->
      // transitive closure (as in dedup_components) → keeper = min node
      // per component → losers are nodes above their component minimum
      s"""WITH RECURSIVE $hashedShingleCtes,
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) >= 0.8),
         |e AS (SELECT doc_a AS src, doc_b AS dst FROM p UNION SELECT doc_b, doc_a FROM p),
         |n AS (SELECT DISTINCT src AS node FROM e),
         |reach(node, r) AS (
         |  SELECT node, node FROM n
         |  UNION
         |  SELECT reach.node, e.dst FROM reach JOIN e ON e.src = reach.r),
         |comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)
         |SELECT doc_id, lang FROM read_parquet('/root/testdata/sf0.01/documents.parquet')
         |WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> component)
         |ORDER BY doc_id""".stripMargin,

    "dedup_simhash_near" ->
      // Hamming banding mirrored: 4 bands × 15 bits, bucket-capped
      // equality self-join, full-fingerprint verify at hamming ≤ 3
      s"""WITH $simhashCtes,
         |bands AS (SELECT doc_id, simhash, unnest(range(0, 4)) AS band FROM shv),
         |bk AS (SELECT doc_id, simhash, band, (simhash >> CAST(band * 15 AS BIGINT)) & 32767 AS bkey FROM bands),
         |ok AS (SELECT band, bkey FROM bk GROUP BY band, bkey HAVING count(*) BETWEEN 2 AND 1000),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |                CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |         FROM bk a JOIN ok ON a.band = ok.band AND a.bkey = ok.bkey
         |         JOIN bk b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,

    "sim_knn" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe FROM read_parquet('/root/testdata/sf0.01/embeddings.parquet') WHERE vec_id < 8),
        |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM read_parquet('/root/testdata/sf0.01/embeddings.parquet')),
        |sc AS (SELECT query_id, vec_id,
        |              list_dot_product(qe, ce) / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))) AS cos
        |       FROM q CROSS JOIN c WHERE vec_id <> query_id),
        |r AS (SELECT query_id, vec_id, cos,
        |             CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
        |      FROM sc)
        |SELECT query_id, vec_id, round(cos, 6) AS cos, rank
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "sim_ivf_assign" ->
      // one Lloyd iteration mirrored: seed assign → per-cluster per-dim
      // means rounded to 6dp (kills distributed-vs-single-node double
      // summation-order ulps) → final assign
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM read_parquet('/root/testdata/sf0.01/embeddings.parquet')),
        |c0 AS (SELECT vec_id AS cent_id, ve AS ce FROM v WHERE vec_id < 8),
        |s0 AS (SELECT vec_id, cent_id,
        |              list_dot_product(ve, ce) / (sqrt(list_dot_product(ve, ve)) * sqrt(list_dot_product(ce, ce))) AS cos
        |       FROM v CROSS JOIN c0),
        |a0 AS (SELECT vec_id, cent_id AS cluster FROM
        |         (SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn FROM s0)
        |       WHERE rn = 1),
        |comp AS (SELECT a0.cluster AS cent_id, r.i AS pos, round(avg(v.ve[r.i]), 6) AS m
        |         FROM a0 JOIN v USING (vec_id) CROSS JOIN (SELECT unnest(range(1, 65)) AS i) r
        |         GROUP BY a0.cluster, r.i),
        |c1 AS (SELECT cent_id, list(m ORDER BY pos) AS ce FROM comp GROUP BY cent_id),
        |s1 AS (SELECT vec_id, cent_id,
        |              list_dot_product(ve, ce) / (sqrt(list_dot_product(ve, ve)) * sqrt(list_dot_product(ce, ce))) AS cos
        |       FROM v CROSS JOIN c1),
        |r1 AS (SELECT vec_id, cent_id,
        |              row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
        |       FROM s1)
        |SELECT vec_id, cent_id AS cluster FROM r1 WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    "sim_ivf_topk" ->
      // seed-centroid assignment (the a0 CTE of sim_ivf_assign, no Lloyd
      // refinement — ivfTopK probes the deterministic seed clusters),
      // then candidates = cluster-mates only, ranked per query. The
      // queries (vec_id < 8) ARE the seed set, so their assignment is a0
      // restricted to vec_id < 8 — the identical computation ivfAssign
      // runs on the query side.
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM read_parquet('/root/testdata/sf0.01/embeddings.parquet')),
        |c0 AS (SELECT vec_id AS cent_id, ve AS ce FROM v WHERE vec_id < 8),
        |s0 AS (SELECT vec_id, cent_id,
        |              list_dot_product(ve, ce) / (sqrt(list_dot_product(ve, ve)) * sqrt(list_dot_product(ce, ce))) AS cos
        |       FROM v CROSS JOIN c0),
        |a0 AS (SELECT vec_id, cent_id AS cluster FROM
        |         (SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn FROM s0)
        |       WHERE rn = 1),
        |c AS (SELECT a.vec_id, a.cluster, v.ve AS ce FROM a0 a JOIN v USING (vec_id)),
        |q AS (SELECT a.vec_id AS query_id, a.cluster, v.ve AS qe FROM a0 a JOIN v USING (vec_id) WHERE a.vec_id < 8),
        |sc AS (SELECT q.query_id, c.vec_id,
        |              list_dot_product(q.qe, c.ce) / (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(c.ce, c.ce))) AS cos
        |       FROM c JOIN q ON c.cluster = q.cluster AND c.vec_id <> q.query_id),
        |r AS (SELECT query_id, vec_id, cos,
        |             CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
        |      FROM sc)
        |SELECT query_id, vec_id, round(cos, 6) AS cos, rank FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "sim_lsh_topk" -> {
      val terms = (0 until 8).map { j =>
        s"(CASE WHEN list_dot_product(e, ${planeSql(j)}) > 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM read_parquet('/root/testdata/sf0.01/embeddings.parquet')),
         |b AS (SELECT vec_id, e, CAST($terms AS BIGINT) AS bucket FROM d),
         |q AS (SELECT vec_id AS query_id, e AS qe, bucket FROM b WHERE vec_id < 8),
         |sc AS (SELECT q.query_id, c.vec_id,
         |              list_dot_product(q.qe, c.e) / (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(c.e, c.e))) AS cos
         |       FROM b c JOIN q ON c.bucket = q.bucket AND c.vec_id <> q.query_id),
         |r AS (SELECT query_id, vec_id, cos,
         |             CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
         |      FROM sc)
         |SELECT query_id, vec_id, round(cos, 6) AS cos, rank FROM r WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin
    },

    "sim_neardup_pairs" -> {
      val terms = (0 until 8).map { j =>
        s"(CASE WHEN list_dot_product(e, ${planeSql(j)}) > 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM read_parquet('/root/testdata/sf0.01/embeddings.parquet')),
         |b AS (SELECT vec_id, e, CAST($terms AS BIGINT) AS bucket FROM d),
         |ok AS (SELECT bucket FROM b GROUP BY bucket HAVING count(*) BETWEEN 2 AND 1000),
         |p AS (SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
         |             list_dot_product(x.e, y.e) / (sqrt(list_dot_product(x.e, x.e)) * sqrt(list_dot_product(y.e, y.e))) AS cos
         |      FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
         |      WHERE x.bucket IN (SELECT bucket FROM ok))
         |SELECT vec_a, vec_b, round(cos, 6) AS cos FROM p WHERE cos >= 0.35
         |ORDER BY vec_a, vec_b""".stripMargin
    },

    "sim_lsh_buckets" -> {
      val terms = (0 until 8).map { j =>
        s"(CASE WHEN list_dot_product(e, ${planeSql(j)}) > 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM read_parquet('/root/testdata/sf0.01/embeddings.parquet')),
         |b AS (SELECT vec_id, CAST($terms AS BIGINT) AS bucket FROM d)
         |SELECT bucket, CAST(count(*) AS BIGINT) AS n_vecs FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
    },

    "text_quality" ->
      s"""WITH q AS (SELECT doc_id, text, list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), w -> len(w) > 0) AS tk FROM read_parquet('/root/testdata/sf0.01/documents.parquet'))
         |SELECT doc_id,
         |       CAST(len(tk) AS BIGINT) AS n_tokens,
         |       round(CASE WHEN len(tk) > 0 THEN CAST(list_aggregate(list_transform(tk, w -> len(w)), 'sum') AS DOUBLE) / len(tk) ELSE 0 END, 6) AS mean_token_len,
         |       round(CASE WHEN len(tk) > 0 THEN CAST(len(list_filter(tk, w -> w IN $stopSql)) AS DOUBLE) / len(tk) ELSE 0 END, 6) AS stopword_ratio,
         |       round(CASE WHEN len(text) > 0 THEN CAST(len(text) - len(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE) / len(text) ELSE 0 END, 6) AS alpha_ratio
         |FROM q ORDER BY doc_id""".stripMargin,

    "lang_id" -> {
      val profiles = TextAnalysis.langProfiles.map { case (lang, ws) =>
        lang -> ws.map(w => s"'$w'").mkString("(", ",", ")")
      }
      val counts = profiles.map { case (lang, inList) =>
        s"len(list_filter(tk, w -> w IN $inList)) AS c_$lang"
      }.mkString(",\n             ")
      val langs = profiles.map(_._1)
      val greatest = s"greatest(${langs.map("c_" + _).mkString(", ")})"
      val cases = langs.map(l => s"WHEN c_$l = $greatest THEN '$l'").mkString(" ")
      s"""WITH q AS (SELECT doc_id, lang, list_distinct(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), w -> len(w) > 0)) AS tk FROM read_parquet('/root/testdata/sf0.01/documents.parquet')),
         |sc AS (SELECT doc_id, lang,
         |             $counts
         |       FROM q)
         |SELECT doc_id, lang,
         |       CASE WHEN $greatest = 0 THEN 'und' $cases ELSE 'und' END AS pred_lang
         |FROM sc ORDER BY doc_id""".stripMargin
    },

    "tok_token_counts" ->
      """SELECT doc_id,
        |       CAST(len(list_filter(regexp_split_to_array(text, '\s+'), w -> len(w) > 0)) AS BIGINT) AS ws_tokens,
        |       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS bpeish_tokens
        |FROM read_parquet('/root/testdata/sf0.01/documents.parquet') ORDER BY doc_id""".stripMargin,

    "text_bigram_counts" ->
      s"""WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), w -> len(w) > 0 AND w NOT IN $stopSql) AS t FROM read_parquet('/root/testdata/sf0.01/documents.parquet')),
         |bg AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))) AS bigram
         |       FROM toks WHERE len(t) >= 2)
         |SELECT bigram, CAST(count(*) AS BIGINT) AS n_docs FROM bg
         |GROUP BY bigram ORDER BY n_docs DESC, bigram LIMIT 20""".stripMargin,

    "sample_hash_bucket" ->
      // identical md5-fold bucket on both sides (the dedup_simhash
      // md5Hash60 mirror) — the sample is engine-independent by design
      s"""WITH b AS (SELECT doc_id, lang, ${md5Hash60Sql("CAST(doc_id AS VARCHAR)")} % 10 AS bucket
         |           FROM read_parquet('/root/testdata/sf0.01/documents.parquet'))
         |SELECT doc_id, lang, bucket FROM b WHERE bucket < 3 ORDER BY doc_id""".stripMargin,

    "text_lm_score" ->
      // occurrence-level bigram/unigram counts + add-one smoothing,
      // mirrored; per-bigram log-probs are identical integers-in,
      // doubles-out on both engines, and the per-doc average is
      // 6dp-rounded (the repo's distributed-vs-single-node float rule)
      """WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), w -> len(w) > 0) AS tk FROM read_parquet('/root/testdata/sf0.01/documents.parquet')),
        |t AS (SELECT doc_id, unnest(tk) AS w FROM d),
        |b AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS bg FROM d WHERE len(tk) >= 2),
        |bw AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS w FROM b),
        |c2 AS (SELECT bg, CAST(count(*) AS BIGINT) AS c2 FROM b GROUP BY bg),
        |c1 AS (SELECT w, CAST(count(*) AS BIGINT) AS c1 FROM bw GROUP BY w),
        |v AS (SELECT count(DISTINCT w) AS vocab FROM t),
        |s AS (SELECT bw.doc_id, log10(CAST(c2.c2 + 1 AS DOUBLE) / (c1.c1 + v.vocab)) AS lp
        |      FROM bw JOIN c2 USING (bg) JOIN c1 USING (w) CROSS JOIN v)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, round(avg(lp), 6) AS lm_score
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "doc_embedding_norms" ->
      """SELECT d.doc_id, d.lang,
        |       round(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))), 6) AS l2_norm
        |FROM read_parquet('/root/testdata/sf0.01/documents.parquet') d
        |JOIN read_parquet('/root/testdata/sf0.01/embeddings.parquet') e ON e.vec_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "tfidf_top_terms" ->
      s"""WITH $indexCtes,
         |x AS (SELECT t.doc_id, t.word, t.term_freq * i.idf AS tfidf FROM tf t JOIN idf i USING (word)),
         |r AS (SELECT doc_id, word, tfidf,
         |             CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS INTEGER) AS rank
         |      FROM x)
         |SELECT doc_id, word, round(tfidf, 6) AS tfidf, rank FROM r WHERE rank <= 3
         |ORDER BY doc_id, rank""".stripMargin,

    "fingerprint_rolling" ->
      """WITH p AS (SELECT doc_id, substr(text, 1, 200) AS pre FROM read_parquet('/root/testdata/sf0.01/documents.parquet'))
        |SELECT doc_id,
        |       CAST(list_reduce(list_transform(range(1, len(pre) + 1), i -> CAST(ascii(substr(pre, i, 1)) AS BIGINT)),
        |                        (a, b) -> (a * 131 + b) % 1000000007) AS BIGINT) AS fp
        |FROM p ORDER BY doc_id""".stripMargin,

    "multimodal_features" ->
      """WITH p AS (SELECT doc_id AS media_id, text, octet_length(CAST(text AS BLOB)) AS n FROM read_parquet('/root/testdata/sf0.01/documents.parquet')),
        |w AS (SELECT *, greatest(1, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT)) AS wd FROM p)
        |SELECT media_id,
        |       CAST(n AS BIGINT) AS n_bytes,
        |       round(CASE WHEN n = 0 THEN 0 ELSE CAST(list_aggregate(list_transform(range(1, len(text) + 1), i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)), 'sum') AS DOUBLE) / n END, 6) AS mean_byte,
        |       CAST(wd AS INTEGER) AS width,
        |       CAST(greatest(1, n // wd) AS INTEGER) AS height
        |FROM w ORDER BY media_id""".stripMargin,

    "pipeline_clean_corpus" -> (
      """WITH d AS (SELECT * FROM read_parquet('/root/testdata/sf0.01/documents.parquet')),
        |q AS (SELECT doc_id, lang,
        |             CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), w -> len(w) > 0)) AS BIGINT) AS n_tokens,
        |             CASE WHEN len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), w -> len(w) > 0)) > 0
        |                  THEN CAST(len(list_filter(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), w -> len(w) > 0), w -> w IN """.stripMargin +
      Stopwords.sqlInList +
      """)) AS DOUBLE) / len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), w -> len(w) > 0))
        |                  ELSE 0 END AS stopword_ratio
        |      FROM d),
        |keepers AS (SELECT min(doc_id) AS doc_id FROM d GROUP BY md5(text))
        |SELECT q.doc_id, q.lang, q.n_tokens
        |FROM q
        |WHERE q.n_tokens >= 20 AND q.stopword_ratio < 0.5
        |  AND q.doc_id IN (SELECT doc_id FROM keepers)
        |ORDER BY q.doc_id""".stripMargin),

    "multimodal_resize" ->
      """WITH p AS (SELECT doc_id AS media_id, text, octet_length(CAST(text AS BLOB)) AS n
        |           FROM read_parquet('/root/testdata/sf0.01/documents.parquet')),
        |r AS (SELECT media_id, n,
        |             list_transform(range(1, n // 4 + 1), i -> CAST(ascii(substr(text, CAST((i - 1) * 4 + 1 AS INT), 1)) AS BIGINT)) AS picks
        |      FROM p)
        |SELECT media_id, CAST(n AS BIGINT) AS orig_bytes,
        |       CAST(len(picks) AS BIGINT) AS resized_bytes,
        |       round(CAST(coalesce(list_aggregate(picks, 'sum'), 0) AS DOUBLE) / greatest(len(picks), 1), 6) AS resized_mean
        |FROM r ORDER BY media_id""".stripMargin,

    "multimodal_frames" ->
      """WITH p AS (SELECT doc_id AS media_id, text, octet_length(CAST(text AS BLOB)) AS n
        |           FROM read_parquet('/root/testdata/sf0.01/documents.parquet')),
        |f AS (SELECT media_id, text, n, n // 4 AS flen, unnest(range(0, 4)) AS frame_idx
        |      FROM p WHERE n >= 4),
        |fr AS (SELECT media_id, frame_idx, substr(text, frame_idx * flen + 1, flen) AS frame FROM f)
        |SELECT media_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        |       CAST(len(frame) AS BIGINT) AS n_frame_bytes,
        |       round(CAST(list_aggregate(list_transform(range(1, len(frame) + 1), i -> CAST(ascii(substr(frame, i, 1)) AS BIGINT)), 'sum') AS DOUBLE) / len(frame), 6) AS frame_mean
        |FROM fr ORDER BY media_id, frame_idx""".stripMargin,

    "s1_corpus_ingest" ->
      s"""SELECT id AS doc_id, u.author AS opinion_author, u.type AS opinion_type, CAST(len(u.text) AS BIGINT) AS opinion_len
         |FROM (SELECT id, unnest(casebody.data.opinions) AS u FROM read_json_auto('$FixturePath'))
         |ORDER BY doc_id, opinion_author, opinion_type, opinion_len""".stripMargin,

    "u4_concat_opinions" ->
      s"""SELECT id AS doc_id, coalesce(array_to_string(list_transform(casebody.data.opinions, o -> o.text), ' '), '') AS full_text
         |FROM read_json_auto('$FixturePath') ORDER BY doc_id""".stripMargin,

    "opinion_text_first" ->
      s"""SELECT id AS doc_id, casebody.data.opinions[1].text AS opinion_text
         |FROM read_json_auto('$FixturePath')
         |WHERE len(casebody.data.opinions) > 0
         |ORDER BY doc_id""".stripMargin,

    "serve_from_artifacts" ->
      // identical to t1_search_snippet: loading artifacts must not change
      // a single bit of the search result
      s"""WITH $bm25Ctes
         |SELECT t.doc_id, t.score,
         |       CASE WHEN len(d.text) > 160 THEN substr(d.text, 1, 160) || '...' ELSE d.text END AS snippet
         |FROM top10 t JOIN read_parquet('/root/testdata/sf0.01/documents.parquet') d USING (doc_id)
         |ORDER BY t.score DESC, t.doc_id""".stripMargin
  )
}
