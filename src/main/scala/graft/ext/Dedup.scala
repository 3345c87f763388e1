package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType


/** Deduplication operators for large-scale training-data pipelines —
  * extension family beyond the reference surface (builder brief; VERDICT.md
  * "LLM-data-pipeline operators"). All operate on a (doc_id, text) corpus.
  *
  * Scale design (100 TB story):
  *  - exact dedup is a hash aggregate on a 128-bit content fingerprint —
  *    shuffles (fingerprint, doc_id) pairs only, never text;
  *  - MinHash-LSH shuffles on band keys: candidate generation is a
  *    self-equi-join per LSH bucket, NEVER an all-pairs cross join; the
  *    within-bucket verify joins only the candidate pairs back to shingle
  *    sets. Bucket skew (a degenerate band key shared by millions of docs)
  *    is the known hot spot — AQE skew-join splitting handles moderate
  *    skew, and the band width r trades recall vs bucket size;
  *  - SimHash is two hash aggregates (doc×bit lattice), linear shuffle;
  *  - n-gram Jaccard is only ever computed on candidate pairs (or an
  *    explicitly bounded pair set), not the cross product.
  *
  * Hashing note: fingerprints use md5/conv — same value computable in
  * DuckDB — so the exact/simhash paths are oracle-checkable. MinHash perm
  * coefficients are fixed constants: results are deterministic run-to-run.
  */
object Dedup {

  /** 60-bit integer hash of a string, identically computable in DuckDB
    * (`conv(substr(md5(x),1,15),16,10)`): the first 15 hex digits of md5.
    * Codegen-friendly (md5/conv are native expressions).
    */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** The 20-bit per-row content fold behind every dataset fingerprint
    * (batch, streaming, and the capstone audit): Σ of these is the
    * order-independent fingerprint, and 20-bit rows keep the BIGINT sum
    * exact out to ~10¹² rows. ONE definition — the stream ≡ batch
    * fingerprint equality argument depends on every call site folding
    * identically.
    */
  def rowFold20(docId: Column, text: Column): Column =
    md5Hash60(concat_ws("|", docId, text)).bitwiseAND(lit(1048575L))

  /** Exact duplicate groups: content fingerprint → group size + keeper
    * (min doc_id). Output: (fingerprint, n_docs, keeper_doc_id).
    */
  def exactGroups(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), md5(col("text")).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keeper_doc_id"))

  /** One row per (doc_id, distinct word-level k-shingle). Built
    * relationally — posexplode tokens, codegen'd stopword InSet filter,
    * window `lead` to stitch k consecutive kept tokens — because the
    * array-lambda formulation runs interpreted and costs ~30× more (see
    * [[graft.index.Indexer.flatWords]]). Documents with fewer than k
    * tokens produce no rows. Scale: one shuffle on doc_id (window sort),
    * then a distinct hash-aggregate; all codegen.
    *
    * With `hashed = true` each shingle is reduced to its [[md5Hash60]]
    * long IMMEDIATELY after assembly, so the distinct aggregate — and
    * every downstream shuffle / collect_list / set operation — moves
    * 8-byte values instead of multi-word strings. Jaccard over hashed
    * shingles equals Jaccard over the strings mod negligible 60-bit
    * collisions, and the identical hash is computable in DuckDB, so
    * oracles stay exact. This was the r2 bench's #1 hotspot (VERDICT.md:
    * `dedup_jaccard_adjacent` shuffled raw 3-gram strings twice).
    */
  def shingleRows(docs: DataFrame, k: Int = 3, stem: Boolean = false,
      hashed: Boolean = false): DataFrame = {
    val raw = docs
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), "[^a-z]+")).as(Seq("pos", "w")))
      .filter(length(col("w")) > 0 &&
        !col("w").isin(graft.text.Stopwords.alphaOnly: _*))
    val toks =
      if (stem) raw.withColumn("w", graft.functions.PorterStem.stem(col("w")))
      else raw
    val win = Window.partitionBy("doc_id").orderBy("pos")
    val withNext = (1 until k).foldLeft(toks) { (df, o) =>
      df.withColumn(s"w$o", lead(col("w"), o).over(win))
    }
    val parts = col("w") +: (1 until k).map(o => col(s"w$o"))
    val assembled = withNext
      .filter(col(s"w${k - 1}").isNotNull)
      .select(col("doc_id"), concat_ws(" ", parts: _*).as("shingle"))
    val narrow =
      if (hashed) assembled.select(col("doc_id"), md5Hash60(col("shingle")).as("shingle"))
      else assembled
    narrow.distinct()
  }

  /** Distinct k-shingle set per document as an array column (for
    * set-algebra Jaccard); array order is nondeterministic — treat as a
    * set (intersect/union only).
    */
  def shingles(docs: DataFrame, k: Int = 3, stem: Boolean = false,
      hashed: Boolean = false): DataFrame =
    shingleRows(docs, k, stem, hashed)
      .groupBy("doc_id").agg(collect_list("shingle").as("shingles"))

  /** A pre-materialized [[shingleRows]] table TAGGED with the parameters
    * it was built with (r6 ADVICE): a bare DataFrame handed into
    * [[minhashPairs]]/[[jaccardForPairs]] silently overrode those
    * functions' `k`/`hashed` arguments — a memo built at a different k
    * (or over unhashed shingles) produced plausible but wrong Jaccard
    * values with no error. Consumers now `require` the tag to match
    * their own parameters, so a mismatch fails loudly at plan time.
    */
  final case class ShingledRows(rows: DataFrame, k: Int, hashed: Boolean) {
    def requireMatches(k: Int, hashed: Boolean): Unit = {
      require(this.k == k,
        s"preShingleRows was built with k=${this.k} but the caller asked for k=$k")
      require(this.hashed == hashed,
        s"preShingleRows was built with hashed=${this.hashed} but the caller asked for hashed=$hashed")
    }
  }

  // Fixed MinHash permutation family h_i(x) = (a_i * x + b_i) mod p —
  // coefficients from a small deterministic LCG so runs are reproducible.
  private[graft] val MinhashP = 2147483647L // 2^31 - 1 (Mersenne prime)
  private[graft] def perms(n: Int): (Seq[Long], Seq[Long]) = {
    var seed = 42L
    def next(): Long = { seed = (seed * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; seed }
    val as = Seq.fill(n)(1L + next() % (MinhashP - 1))
    val bs = Seq.fill(n)(next() % MinhashP)
    (as, bs)
  }

  /** MinHash signature column over a `shingles` array column: for each of
    * `numHashes` permutations, min over shingles of (a*h(s)+b) mod p where
    * h is `xxhash64` (native codegen'd hash — Catalyst's project collapsing
    * inlines the base-hash expression into every permutation's lambda, so
    * the per-shingle hash must be cheap; an md5-based hash here cost 10×
    * the whole query). Pure higher-order functions — no UDF, no shuffle.
    */
  def minhashSignature(shingleCol: Column, numHashes: Int = 32): Column = {
    val (as, bs) = perms(numHashes)
    val aArr = array(as.map(lit): _*)
    val bArr = array(bs.map(lit): _*)
    val hashes = transform(shingleCol, s => pmod(xxhash64(s), lit(MinhashP)))
    transform(sequence(lit(0), lit(numHashes - 1)), i =>
      array_min(transform(hashes, h =>
        pmod(element_at(aArr, i + 1) * h + element_at(bArr, i + 1), lit(MinhashP)))))
  }

  /** Same signature family as [[minhashSignature]] but computed over
    * (doc_id, shingle) ROWS as `numHashes` codegen'd min-aggregates →
    * array reassembly. Higher-order lambdas are interpreted (no
    * whole-stage codegen) and cost ~µs per element; the aggregate form
    * runs ~10× faster and is the right shape at 100 TB anyway: one
    * hash-aggregate shuffle of (doc, 32 longs) with map-side partials.
    * Input: [[shingleRows]] output; output: (doc_id, sig).
    */
  def minhashSignatures(shingleRows: DataFrame, numHashes: Int = 32): DataFrame = {
    val (as, bs) = perms(numHashes)
    val mins = (0 until numHashes).map { i =>
      min(pmod(lit(as(i)) * col("h") + lit(bs(i)), lit(MinhashP))).as(s"m$i")
    }
    shingleRows
      .withColumn("h", pmod(xxhash64(col("shingle")), lit(MinhashP)))
      .groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** MinHash-LSH candidate pairs with exact-Jaccard verification.
    *
    * Pipeline: shingles → signatures → explode into `bands` band keys →
    * self-join on (band, key) with doc_a < doc_b → distinct candidate
    * pairs → join shingle sets back → exact Jaccard → threshold filter.
    *
    * Output: (doc_a, doc_b, est_jaccard, jaccard) sorted for determinism.
    */
  def minhashPairs(docs: DataFrame, k: Int = 3, numHashes: Int = 32,
      bands: Int = 16, threshold: Double = 0.0,
      maxBucketSize: Int = 100,
      preShingleRows: Option[ShingledRows] = None): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    preShingleRows.foreach(_.requireMatches(k, hashed = true))
    val r = numHashes / bands
    // shingle rows and signatures feed multiple branches (both join sides,
    // bucket-size counts, exact verify) — persist once instead of
    // recomputing the tokenize→window pipeline per branch (SURVEY.md §3.2
    // lesson applied here; these tables are small relative to the corpus).
    // Persists go through the Caches registry so the harness can unpersist
    // after each query (r2 VERDICT "cache hygiene"). Shingles are hashed to
    // longs up front — every downstream shuffle/set-op moves 8-byte values.
    // `preShingleRows` lets a caller supply an already-materialized
    // (checkpointed) hashed-shingle table — the SparkEntry dedup family
    // shares one — which is used as-is, no second persist.
    val shr = preShingleRows.map(_.rows).getOrElse(
      graft.Caches.persist(shingleRows(docs, k, hashed = true)))
    val sh = graft.Caches.persist(
      shr.groupBy("doc_id").agg(collect_list("shingle").as("shingles")))
    val sig = graft.Caches.persist(minhashSignatures(shr, numHashes))

    val banded = sig.select(col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .select(col("doc_id"), col("sig"), col("band"),
        // band key = the r signature values of this band, string-joined
        concat_ws(",", slice(col("sig"), col("band") * r + 1, lit(r)).cast("array<string>")).as("band_key"))

    // Skew guard — the 100 TB essential: degenerate band keys (a minhash
    // value shared by a huge fraction of the corpus) would make the
    // self-join quadratic in the bucket size. Cap bucket membership; a
    // production pipeline logs the dropped buckets.
    val okBuckets = banded.groupBy("band", "band_key")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n").between(2, maxBucketSize))

    val pruned = banded.join(okBuckets, Seq("band", "band_key"))
    val a = pruned.select(col("band"), col("band_key"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = pruned.select(col("band"), col("band_key"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    val cand = a.join(b, Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sig_a", "sig_b")
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("est_jaccard",
        // codegen signature-agreement count (was an interpreted
        // zip_with+filter over the 32-slot sigs — the last non-stub HOF)
        graft.functions.ArrayEqCount.count(col("sig_a"), col("sig_b"))
          .cast("double") / numHashes)
      .select("doc_a", "doc_b", "est_jaccard")

    val setA = sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val setB = sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    cand
      .join(setA, Seq("doc_a")).join(setB, Seq("doc_b"))
      .withColumn("jaccard", jaccardCol(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "est_jaccard", "jaccard")
      .orderBy(col("jaccard").desc, col("doc_a").asc, col("doc_b").asc)
  }

  /** Exact Jaccard similarity of two array-set columns. */
  def jaccardCol(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Exact n-gram Jaccard for an explicit pair set: joins `pairs`
    * (doc_a, doc_b) to the shingle table twice — pair-bounded, never a
    * cross join. Shingles are md5Hash60-hashed by default (see
    * [[shingleRows]]): set-ops over long arrays instead of string arrays,
    * same Jaccard mod negligible collisions, DuckDB-mirrorable exactly.
    * Output: (doc_a, doc_b, jaccard).
    */
  def jaccardForPairs(docs: DataFrame, pairs: DataFrame, k: Int = 3,
      hashed: Boolean = true,
      preShingleRows: Option[ShingledRows] = None): DataFrame = {
    preShingleRows.foreach(_.requireMatches(k, hashed))
    // referenced by both join sides — persist (registry-tracked) to avoid
    // rebuilding the tokenize→window shingle pipeline twice; a caller-
    // supplied checkpointed shingle-row table (the SparkEntry shared memo)
    // skips even the first build
    val sh = preShingleRows match {
      case Some(shr) => graft.Caches.persist(
        shr.rows.groupBy("doc_id").agg(collect_list("shingle").as("shingles")))
      case None => graft.Caches.persist(shingles(docs, k, hashed = hashed))
    }
    pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), jaccardCol(col("sh_a"), col("sh_b")).as("jaccard"))
  }

  /** SimHash per document over md5-hashed tokens (each token occurrence
    * contributes ±1 per bit — equivalent to tf-weighting).
    *
    * Shape (r3 rewrite): exploded token rows → one md5Hash60 per
    * OCCURRENCE → `bits` codegen'd conditional-sum aggregates per doc →
    * bit reassembly from the signs. One hash-aggregate shuffle of
    * (doc, 60 longs) with map-side partials — the [[minhashSignatures]]
    * pattern. The previous per-row nested higher-order fold ran
    * interpreted and re-evaluated the token-hash array per bit: ~40 s at
    * sf0.1 vs well under a second for this plan (the SCALE.md per-token
    * rule: exploded rows + codegen expressions, never array lambdas).
    * Token-less documents produce no row (matching the SQL oracle's
    * semantics). 60 usable bits (from [[md5Hash60]]).
    * Output: (doc_id, simhash). Deterministic; oracle-computable.
    */
  def simhash(docs: DataFrame, bits: Int = 60, stem: Boolean = false): DataFrame = {
    val usable = math.min(bits, 60)
    val flat = graft.index.Indexer.flatWords(docs, stem)
      .withColumn("h", md5Hash60(col("word")))
    val signSums = (0 until usable).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === lit(1L), lit(1L))
        .otherwise(lit(-1L))).as(s"b$b")
    }
    flat.groupBy("doc_id").agg(signSums.head, signSums.tail: _*)
      .select(col("doc_id"),
        (0 until usable).map(b =>
          when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Hamming distance between two simhash longs (for near-dup banding). */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Shingle-containment near-duplicate pairs — the ASYMMETRIC companion
    * to Jaccard: C(A→B) = |S(A) ∩ S(B)| / |S(A)| over hashed k-shingle
    * sets. Jaccard misses subset-duplicates (a short doc wholly contained
    * in a much longer one scores |A|/|B| ≈ 0), which is exactly the
    * quote/boilerplate/excerpt case a curation pipeline needs to catch;
    * containment scores it 1.0 regardless of the size ratio.
    *
    * Candidate generation is an inverted shingle index (shingle →
    * posting list of doc_ids) self-joined per shingle — the sparse
    * "join on shared features" shape, NEVER an all-pairs cross join —
    * with a DOCUMENT-FREQUENCY CAP: shingles appearing in more than
    * `maxDf` documents are dropped from the index before the join, which
    * bounds every posting-list self-join at maxDf² pairs. That is the
    * standard scale lever (stop-shingle removal): df-heavy shingles are
    * boilerplate n-grams that contribute candidates quadratically while
    * carrying no near-dup signal. The resulting containment is therefore
    * computed over the DF-CAPPED shingle space on BOTH numerator and
    * denominator — a documented, oracle-mirrored semantics, not a silent
    * approximation.
    *
    * Output: directed pairs (doc_a, doc_b, containment) with
    * containment = C(doc_a → doc_b) ≥ threshold, doc_a ≠ doc_b.
    */
  /** The df-capped posting table: `shingleRows` restricted to shingles
    * whose document frequency is ≤ `maxDf` — one hash agg for df, one
    * join back (result persisted, registry-tracked). THE
    * candidate-generation cap of the family (the tfidf_cosine_pairs
    * scale lesson, docs/SCALE.md): a boilerplate shingle shared by
    * thousands of docs makes posting self-joins quadratic while
    * carrying no near-dup signal. Shared by [[containmentPairs]] and
    * the incremental-dedup gate query so the cap SEMANTICS (df counted
    * over distinct docs, ≤ comparison) live in exactly one place —
    * both have DuckDB mirrors of this definition.
    */
  def cappedPostings(shingleRows: DataFrame, maxDf: Int): DataFrame =
    graft.Caches.persist(
      shingleRows.join(shingleRows.groupBy("shingle")
        .agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf), Seq("shingle")))

  /** MAXIMAL exact duplicated token spans across documents — the
    * suffix-array-style exact-substring dedup of Lee et al., "Dedupli-
    * cating Training Data Makes Language Models Better" (ACL 2022),
    * re-expressed as relational algebra instead of a suffix array:
    *
    *  1. positioned `k`-gram fingerprints, built from the token ARRAY
    *     by an indexed transform in the scan's narrow pass (no window,
    *     no token-grain shuffle before aggregation);
    *  2. occurrence-capped postings (`2 ≤ occurrences ≤ maxDf`, and
    *     cross-document by a single-phase min≠max doc check — never a
    *     countDistinct expand): boilerplate k-grams that appear
    *     everywhere can only create O(df²) candidate pairs, so they are
    *     dropped exactly like the containment family's df cap;
    *  3. a same-fingerprint position join (candidate pairs bounded by
    *     Σ df² over capped fingerprints), and
    *  4. the gaps-and-islands trick per (doc pair, diagonal): a
    *     duplicated span of L tokens is L−k+1 consecutive gram matches
    *     on one diagonal pa−pb, so `pa − row_number()` groups each
    *     maximal run; run length = matches + k − 1. The window is
    *     partitioned by (doc_a, doc_b, diag) — pair-bounded state, no
    *     global window at any corpus size.
    *
    * Output: (doc_a, doc_b, start_a, start_b, run_tokens) for every
    * maximal cross-document duplicated span of ≥ `minRunTokens` tokens.
    * All arithmetic is exact integers; fingerprints are [[md5Hash60]]
    * of the space-joined gram, so a DuckDB oracle reproduces them
    * bit-for-bit.
    */
  def substringRuns(docs: DataFrame, k: Int = 8, maxDf: Int = 50,
      minRunTokens: Int = 12): DataFrame = {
    require(k >= 2 && minRunTokens >= k,
      s"need k >= 2 and minRunTokens >= k, got k=$k minRunTokens=$minRunTokens")
    val fps = graft.Caches.persist(docs
      .select(col("doc_id"), TextAnalysis.rawTokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"), posexplode(
        transform(slice(col("toks"), lit(1), size(col("toks")) - (k - 1)),
          (_, i) => md5Hash60(
            concat_ws(" ", slice(col("toks"), i + lit(1), lit(k))))))
        .as(Seq("pos", "fp"))))
    val keep = fps.groupBy("fp")
      .agg(count(lit(1)).as("df"),
        min("doc_id").as("d0"), max("doc_id").as("d1"))
      .filter(col("df") >= 2 && col("df") <= maxDf &&
        col("d0") =!= col("d1"))
      .select("fp")
    val capped = fps.join(keep, Seq("fp"), "left_semi")
    val pairs = capped
      .select(col("fp"), col("doc_id").as("doc_a"), col("pos").as("pa"))
      .join(capped.select(col("fp"), col("doc_id").as("doc_b"),
        col("pos").as("pb")), Seq("fp"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("pa"), col("pb"),
        (col("pa") - col("pb")).as("diag"))
    val w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    pairs.withColumn("isl", col("pa") - row_number().over(w))
      .groupBy("doc_a", "doc_b", "diag", "isl")
      .agg(min("pa").as("start_a"), min("pb").as("start_b"),
        (count(lit(1)) + (k - 1)).cast(LongType).as("run_tokens"))
      .filter(col("run_tokens") >= minRunTokens)
      .select("doc_a", "doc_b", "start_a", "start_b", "run_tokens")
  }

  def containmentPairs(docs: DataFrame, k: Int = 3, threshold: Double = 0.5,
      maxDf: Int = 100,
      preShingleRows: Option[ShingledRows] = None): DataFrame = {
    preShingleRows.foreach(_.requireMatches(k, hashed = true))
    val shr = preShingleRows.map(_.rows).getOrElse(
      graft.Caches.persist(shingleRows(docs, k, hashed = true)))
    val rare = cappedPostings(shr, maxDf)
    // |S(A)| over the same capped space (the denominator contract above)
    val sizes = rare.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val shared = rare.select(col("shingle"), col("doc_id").as("doc_a"))
      .join(rare.select(col("shingle"), col("doc_id").as("doc_b")), Seq("shingle"))
      .filter(col("doc_a") =!= col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), Seq("doc_a"))
      .withColumn("containment", col("n_shared").cast("double") / col("sz_a"))
      .filter(col("containment") >= threshold)
      .select("doc_a", "doc_b", "containment")
  }

  /** SimHash near-duplicate pairs via Hamming banding — the classic
    * pigeonhole trick (Manku et al., WWW'07 "Detecting Near-Duplicates
    * for Web Crawling"): split the `bits`-bit fingerprint into `bands`
    * contiguous slices; any pair within Hamming distance < `bands` must
    * agree EXACTLY on at least one slice, so candidates come from
    * per-band equality self-joins (never an all-pairs scan), then the
    * full-fingerprint Hamming check verifies. Same banded-equi-join shape
    * as [[minhashPairs]], including the degenerate-bucket cap.
    * Output: (doc_a, doc_b, hamming) with hamming ≤ maxHamming.
    */
  /** Manku pigeonhole near-dup pairs over an ARBITRARY (id, hash)
    * fingerprint table — [[simhashNearDup]]'s banding core generalized
    * so non-text fingerprints (the 64-bit grid-8 image aHash, audio
    * envelopes) get the same candidates-never-all-pairs shape (r12
    * VERDICT #7: exact-equal bucketing let near-identical images that
    * differ in a few bits escape). Any pair within Hamming distance
    * < `bands` agrees exactly on ≥ 1 of the `bands` contiguous slices,
    * so candidates come from per-band equality self-joins
    * (bucket-capped), then the full-hash Hamming check verifies.
    * Output: (id_a, id_b, hamming) with id_a < id_b, hamming ≤
    * maxHamming. `bits` may be 64: shiftright is arithmetic, but the
    * band mask strips the sign-extension bits.
    */
  def hammingNearDup(hashes: DataFrame, idCol: String, hashCol: String,
      bits: Int = 64, bands: Int = 4, maxHamming: Int = 3,
      maxBucketSize: Int = 1000): DataFrame = {
    require(bits % bands == 0, "bits must divide into bands")
    require(maxHamming < bands,
      "pigeonhole guarantee needs maxHamming < bands (else recall drops)")
    val width = bits / bands
    require(width <= 63, "band width must fit a positive long mask")
    val mask = (1L << width) - 1
    val sh = graft.Caches.persist(
      hashes.select(col(idCol).as("id"), col(hashCol).as("hsh")))
    val keys = array((0 until bands).map(b =>
      shiftright(col("hsh"), b * width).bitwiseAND(lit(mask))): _*)
    val banded = sh.select(col("id"), col("hsh"),
      posexplode(keys).as(Seq("band", "bkey")))
    val okBuckets = banded.groupBy("band", "bkey")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n").between(2, maxBucketSize))
      .select("band", "bkey")
    val pruned = banded.join(okBuckets, Seq("band", "bkey"))
    val a = pruned.select(col("band"), col("bkey"),
      col("id").as("id_a"), col("hsh").as("h_a"))
    val b = pruned.select(col("band"), col("bkey"),
      col("id").as("id_b"), col("hsh").as("h_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming(col("h_a"), col("h_b")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  def simhashNearDup(docs: DataFrame, bands: Int = 4, bits: Int = 60,
      maxHamming: Int = 3, maxBucketSize: Int = 1000,
      stem: Boolean = false): DataFrame = {
    require(bits % bands == 0, "bits must divide into bands")
    require(maxHamming < bands,
      "pigeonhole guarantee needs maxHamming < bands (else recall drops)")
    val width = bits / bands
    val mask = (1L << width) - 1
    val sh = graft.Caches.persist(simhash(docs, bits, stem))
    // band keys as an array of codegen shift/mask expressions (shiftright
    // takes a literal count), exploded to (doc_id, simhash, band, bkey)
    val keys = array((0 until bands).map(b =>
      shiftright(col("simhash"), b * width).bitwiseAND(lit(mask))): _*)
    val banded = sh.select(col("doc_id"), col("simhash"),
      posexplode(keys).as(Seq("band", "bkey")))
    val okBuckets = banded.groupBy("band", "bkey")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n").between(2, maxBucketSize))
      .select("band", "bkey")
    val pruned = banded.join(okBuckets, Seq("band", "bkey"))
    val a = pruned.select(col("band"), col("bkey"),
      col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
    val b = pruned.select(col("band"), col("bkey"),
      col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", hamming(col("sim_a"), col("sim_b")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** EXACT set-similarity self-join via prefix filtering (the AllPairs
    * family — Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity
    * Search", WWW'07): every document pair with set Jaccard ≥
    * `threshold` over hashed k-shingle sets (same domain as
    * [[minhashPairs]]), with NO approximation and NO all-pairs
    * comparison — the exact-threshold complement to the probabilistic
    * LSH path. Output: (doc_a, doc_b, jaccard) with doc_a < doc_b,
    * jaccard rounded to 6dp, ordered.
    *
    * Mechanism: rank each document's distinct words by GLOBAL rarity
    * (ascending document frequency, word tiebreak — one total order
    * shared by all docs). A pair with |a∩b| ≥ α must share a token
    * within the first |d|-α+1 tokens of each side (prefix-filtering
    * lemma), and Jaccard ≥ τ implies |a∩b| ≥ τ·max(|a|,|b|), so joining
    * on prefix tokens of length |d|-⌈τ·|d|⌉+1 is LOSSLESS. Candidates
    * then pass a size filter (min ≥ τ·max, also implied by J ≥ τ) and an
    * exact intersection-count verify.
    *
    * Scale (100 TB): the quadratic blowup of a token self-join is
    * confined to PREFIX tokens, which the rarity ordering makes the
    * rarest tokens of each document — inverted lists for prefix tokens
    * are short by construction, and the τ-dependent prefix keeps only
    * (1-τ)·|d|+1 tokens per doc in the join at all. The verify joins
    * candidate pairs back to token sets (pair-bounded, like
    * [[jaccardForPairs]]). All shuffles move (word, doc_id, size)
    * triples; text never leaves the tokenizer. Skew note: a frequent
    * token enters a doc's prefix only when the doc consists almost
    * entirely of frequent tokens — residual hot lists split by AQE skew
    * join ([[graft.plans]] AqeSkewJoinSpec evidence).
    *
    * The ceil guard (`- 1e-9`) keeps IEEE rounding on the SAFE side: an
    * over-rounded ⌈τ·|d|⌉ would SHORTEN the prefix and silently lose
    * pairs; the epsilon can only lengthen it.
    */
  def allPairs(docs: DataFrame, threshold: Double = 0.8, k: Int = 3,
      preShingleRows: Option[ShingledRows] = None): DataFrame = {
    preShingleRows.foreach(_.requireMatches(k, hashed = true))
    val toks = preShingleRows.map(_.rows).getOrElse(
        graft.Caches.persist(shingleRows(docs, k, hashed = true)))
      .withColumnRenamed("shingle", "word")
    allPairsOnTokens(toks, threshold)
  }

  /** [[allPairs]] core over an arbitrary distinct (doc_id, word) token
    * table — the set domain is the caller's choice (hashed k-shingles for
    * the dedup gate; whole words for topical similarity).
    */
  def allPairsOnTokens(toks0: DataFrame, threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold must be in (0, 1]")
    val toks = graft.Caches.persist(toks0.select("doc_id", "word"))
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val wordDf = toks.groupBy("word").agg(count(lit(1)).as("df"))
    val prefix = toks
      .join(wordDf, Seq("word"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("word"))))
      .join(sizes, Seq("doc_id"))
      .filter(col("rk") <=
        col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)) + 1)
      .select(col("word"), col("doc_id"), col("sz"))
    val a = prefix.select(col("word"), col("doc_id").as("doc_a"), col("sz").as("sz_a"))
    val b = prefix.select(col("word"), col("doc_id").as("doc_b"), col("sz").as("sz_b"))
    val cand = a.join(b, Seq("word"))
      .filter(col("doc_a") < col("doc_b") &&
        least(col("sz_a"), col("sz_b")).cast("double") >=
          lit(threshold) * greatest(col("sz_a"), col("sz_b")).cast("double"))
      .select("doc_a", "doc_b", "sz_a", "sz_b")
      .dropDuplicates("doc_a", "doc_b")
    val ta = toks.select(col("doc_id").as("doc_a"), col("word"))
    val tb = toks.select(col("doc_id").as("doc_b"), col("word"))
    cand
      .join(ta, Seq("doc_a"))
      .join(tb, Seq("doc_b", "word"))
      .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }
}
