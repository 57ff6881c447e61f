package graft.operators

import graft.{EngineConf, Q, Tables}
import graft.functions.{GraftFunctions, VectorOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Category I (dedup half) — deduplication operators over `documents`
  * and `embeddings` (SURVEY.md §2.1.I + training-data-pipeline
  * mandate: exact, shingle-Jaccard, MinHash+LSH, SimHash, embedding-
  * cosine near-dup).
  *
  * Corpus hazard (FIXTURES.md): the vocabulary is tiny, so unigram-set
  * Jaccard saturates at 1.0 between unrelated docs — all shingle-based
  * ops here use 3-word grams.
  *
  * Scale design: `dedup_near` is the exact quadratic-within-block
  * baseline (blocking on lang + length keeps candidate pairs bounded);
  * `dedup_minhash` is the 100-TB path — LSH banding finds candidates
  * in O(n · bands) with a bucket join, then verifies exact Jaccard on
  * candidates only. `dedup_simhash` blocks on 16-bit signature chunks
  * (pigeonhole: hamming ≤ 3 over 4 chunks ⇒ one chunk equal).
  */
object Dedup {

  /** Per-doc record (doc_id, lang, n_chars, distinct 3-word shingle
    * set as one array) — THE persisted shingle base. One exchange
    * builds it: the explode → aggregate dedups in the same shuffle
    * the old explode → distinct paid, and every other consumer is
    * then row-local.
    *
    * HASH-NARROW since r19 (the fingerprint-shuffle discipline
    * applied at the source): shingles are xxhash64'd MAP-SIDE, so the
    * build exchange, the cached frame, and every downstream shuffle
    * carry 8-byte longs instead of ~40-byte strings — measured ~5x.
    * The r17 string base exhausted this box's 64 GB of spill at the
    * 5M-doc decade before the band join even finished; nothing
    * downstream ever needed the strings: dedup Jaccards are COUNTS of
    * distinct elements (identical on hashed sets modulo a ~2⁻⁶⁴
    * within-pair collision, the tolerance dedup_exact_fingerprint
    * already carries — and the DuckDB oracle computes ground truth
    * from the text, so no oracle value depends on the representation).
    *
    * The MinHash signature columns do NOT ride this aggregation since
    * the r19 OPTIMIZATION round: at the r19-build's 16×3 banding they
    * are 48 `min(hash(sh, i))` accumulators over every shingle
    * INSTANCE, and the only consumer that rebuilds this frame warm is
    * dedup_near — which never reads them (dedup_minhash and
    * dedup_clusters read the disk-backed pair artifact and skip the
    * build entirely). Riding here they tripled dedup_near's warm cost
    * when the band fix tripled MinhashFuncs (quiet bench 1.35 →
    * 2.55 s); they now live in [[minhashSigs]], paid only when the
    * pair artifact is actually (re)built. Guide §1.2: don't compute
    * what the query throws away.
    *
    * The slice length is clamped at 0 — docs under 3 whitespace
    * tokens yield no shingles (and so never appear in shingle-based
    * dedup output) instead of crashing on a negative slice length. */
  private def shingleSets(s: SparkSession, d: String): DataFrame =
    graft.Cache.cached(s, d, "dedup.shingleSets") {
      shingleRows(s, d)
        .groupBy("doc_id")
        .agg(first("lang").as("lang"), first("n_chars").as("n_chars"),
          collect_set(xxhash64(col("sh"))).as("shset"))
    }

  /** Exploded raw-string shingle rows (doc_id, lang, n_chars, sh) —
    * the shared lineage under [[shingleSets]] and [[minhashSigs]].
    * Not cached: both consumers aggregate it away immediately. */
  private def shingleRows(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        explode(expr(
          "transform(slice(ws, 1, greatest(size(ws) - 2, 0))," +
            " (w, i) -> concat(w, ' ', element_at(ws, i + 2), ' '," +
            " element_at(ws, i + 3)))")).as("sh"))

  /** The [[MinhashFuncs]] MinHash signature values per doc, as
    * min(hash(sh, i)) over the raw shingle STRINGS — the same
    * min-of-murmur3-(value, seed) definition the r9
    * array_min/transform form computed (min over the multiset == min
    * over the set), with partial aggregation making them map-side.
    * Split out of [[shingleSets]] in the r19 optimization round (see
    * its doc): this frame is only ever built under the disk-backed
    * pair-artifact build, so a warm process (and every bench pass
    * after the first) never pays the 48-accumulator scan. The extra
    * corpus pass this costs ON artifact build is one explode +
    * hash-agg — amortized into the once-per-corpus-snapshot indexing
    * job, exactly like the LSH/IVF index builds. */
  private def minhashSigs(s: SparkSession, d: String): DataFrame =
    graft.Cache.cached(s, d, "dedup.mhSigs") {
      val aggs = (0 until MinhashFuncs).map(i =>
        min(hash(col("sh"), lit(i))).as(s"mh_$i"))
      shingleRows(s, d)
        .groupBy("doc_id")
        .agg(aggs.head, aggs.tail: _*)
    }

  /** Exploded (doc_id, lang, n_chars, sh) shingle rows, derived from
    * the persisted set frame — CPU-cheap per use, no second
    * materialization. */
  private def shingles(s: SparkSession, d: String): DataFrame =
    shingleSets(s, d).select(col("doc_id"), col("lang"),
      col("n_chars"), explode(col("shset")).as("sh"))

  val queries: Map[String, Q] = Map(
    // Exact dedup: survivor = min doc_id per text (deterministic pick,
    // never "first"). Hash-groupBy on the text — at scale you'd group
    // on text_fingerprint instead to avoid shuffling full texts.
    "dedup_exact" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy("text")
        .agg(min("doc_id").as("keep_id"),
          count(lit(1)).as("n_copies"),
          min("n_chars").as("n_chars"))
        .select("keep_id", "n_copies", "n_chars")
        .orderBy("keep_id")),

    // The 100-TB twin of dedup_exact (the caveat documented there):
    // group on the rolling-hash fingerprint (same expression as
    // text_fingerprint) so the dedup shuffle carries only narrow
    // (fp, doc_id, n_chars) rows, never full texts. Docs whose fp is
    // unique ARE unique (no verify needed — a collision requires two
    // docs sharing the fp); only the docs in fp-collision groups — a
    // tiny set: true duplicates plus ~n²/1e9 accidental collisions —
    // re-group on the FULL text (broadcast semi-join on their ids),
    // which both verifies equality and splits any accidental
    // collision into its true groups. Output is therefore exactly
    // dedup_exact's, and the oracle is the same survivor SQL.
    "dedup_exact_fingerprint" -> ((s, d) => {
      GraftFunctions.ensureRegistered(s)
      val docs = Tables.documents(s, d)
      // ONE fp pass since the r19 optimization round. The previous
      // shape computed `collided` as its own aggregate and re-derived
      // singles/collided instances by (anti-)joining the fps frame
      // against it — correct, but the un-persisted fps lineage made
      // the plan evaluate rollingFingerprint over the FULL corpus 4×
      // (the before plan shows 5 documents scans; plans/r19/
      // dedup_exact_fingerprint_before.txt). Now the per-fp doc list
      // rides ONE hash aggregate over narrow (fp, doc_id, n_chars)
      // rows: fp is computed once per doc, the corpus is scanned
      // twice (fp pass + the full-text verify re-read), and the only
      // wide exchange still carries no text. Per-group state is the
      // fp's duplicate set — the same set the broadcast(collidedIds)
      // already bounded (a billion-dup fp would break both shapes
      // equally; planted duplicate groups are small by construction).
      // Cached: singles and collidedIds both read this frame, and an
      // un-persisted two-consumer lineage duplicates the whole
      // scan+fp+aggregate subtree (the round-8 ReuseExchange finding,
      // re-confirmed by PlanSpec when this rewrite first landed
      // without the persist).
      val groups = graft.Cache.cached(s, d, "dedup.fpGroups") {
        docs.select(col("doc_id"), col("n_chars"),
            GraftFunctions.rollingFingerprint(col("text")).as("fp"))
          .groupBy("fp")
          .agg(collect_list(struct(col("doc_id"), col("n_chars")))
            .as("ds"))
      }
      val singles = groups.filter(size(col("ds")) === 1)
        .select(col("ds")(0).getField("doc_id").as("keep_id"),
          lit(1L).as("n_copies"),
          col("ds")(0).getField("n_chars").as("n_chars"))
      val collidedIds = groups.filter(size(col("ds")) > 1)
        .select(explode(col("ds")).as("x"))
        .select(col("x").getField("doc_id").as("doc_id"))
      val verified = docs.join(broadcast(collidedIds), Seq("doc_id"))
        .groupBy("text")
        .agg(min("doc_id").as("keep_id"),
          count(lit(1)).as("n_copies"),
          min("n_chars").as("n_chars"))
        .select("keep_id", "n_copies", "n_chars")
      singles.unionByName(verified).orderBy("keep_id")
    }),

    // Near-dup via exact 3-gram shingle Jaccard, candidates blocked to
    // same lang + |n_chars| diff <= 20, J >= 0.8. ONE shingle
    // equi-join: matching rows group straight into intersection
    // counts (shingle sets are distinct per doc), no candidate
    // materialization + re-join.
    "dedup_near" -> ((s, d) => {
      val sh = shingles(s, d)
      // Set sizes are row-local over the persisted set frame — the
      // old groupBy(count) re-shuffled every shingle row for a number
      // the array already knows.
      val sizes = shingleSets(s, d)
        .select(col("doc_id"), size(col("shset")).cast("long").as("nsh"))
      // Both sides project EVERY column to a side-unique name (sh →
      // sh1/sh2 included): a `df("sh") === df("sh")` condition on two
      // projections of one cached frame is the ambiguous-self-join
      // shape Spark 4 only rescues via its "trivially true predicate"
      // fixup — a rewrite the project periodically tightens into
      // AMBIGUOUS_SELF_JOIN errors. Unique names need no rescue.
      val a = sh.select(col("doc_id").as("d1"), col("lang").as("lang1"),
        col("n_chars").as("nc1"), col("sh").as("sh1"))
      val b = sh.select(col("doc_id").as("d2"), col("lang").as("lang2"),
        col("n_chars").as("nc2"), col("sh").as("sh2"))
      a.join(b,
          col("sh1") === col("sh2") && col("d1") < col("d2")
            && col("lang1") === col("lang2")
            && abs(col("nc1") - col("nc2")) <= 20)
        .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
        .join(sizes.withColumnRenamed("doc_id", "d1")
          .withColumnRenamed("nsh", "n1"), "d1")
        .join(sizes.withColumnRenamed("doc_id", "d2")
          .withColumnRenamed("nsh", "n2"), "d2")
        .withColumn("jac", round(col("inter").cast("double")
          / (col("n1") + col("n2") - col("inter")), 4))
        .filter(col("jac") >= 0.8)
        .select("d1", "d2", "jac")
        .orderBy("d1", "d2")
    }),

    // Near-dup via MinHash + LSH banding (48 murmur3 hash functions,
    // 16 bands x 3 rows since r19 — see MinhashBands for the measured
    // hot-bucket quadratic the 2-row scheme grew at 5M docs), then
    // exact-Jaccard verification of the candidates — the scale path:
    // no all-pairs join anywhere. P[miss] for J=0.8 is
    // (1-0.8^3)^16 ~ 1.0e-5 per pair; exact verification makes every
    // emitted pair true, so at t2 scale the output equals the
    // unblocked exact-Jaccard ground truth.
    //
    // Exchange budget (the round-2 version paid 6 shuffles): the
    // band self-join is left UNHINTED — the bands frame is n·8 rows
    // (linear in corpus size), so forcing a broadcast there would OOM
    // at 100-TB scale; AQE picks BHJ while it fits and degrades to a
    // shuffled equi-join on (band, h0, h1) beyond. The candidate
    // dedup is one tiny exchange over (d1, d2) pairs, and the Jaccard
    // verify attaches the per-doc shingle sets with the intersection
    // computed row-locally — broadcast joins up to a measured doc
    // bound, co-partitioned hash joins past it (the NARROW candidate
    // set is banding-bounded at any scale, but candidates JOINED
    // WITH their shingle sets are corpus-content-sized: the 500k-doc
    // fixture killed the old always-broadcast verify on the driver;
    // see minhashPairsBuild).
    "dedup_minhash" -> ((s, d) =>
      minhashPairs(s, d).orderBy("d1", "d2")),

    // PARAGRAPH-level boilerplate detection — the sub-document dedup
    // pass real corpus prep runs alongside whole-doc dedup (repeated
    // headers/footers/navigation survive document dedup): texts chunk
    // into consecutive 10-word "paragraphs", a chunk appearing in
    // MORE THAN ONE document is boilerplate, and each doc reports its
    // chunk + boilerplate-chunk counts. All integers. Scale shape:
    // the dedup_exact_fingerprint discipline applied at chunk level —
    // the corpus-wide frequency shuffle carries only
    // (rollingFingerprint(chunk), doc_id); chunk STRINGS shuffle only
    // for the broadcast-reached multi-doc-fingerprint candidate set,
    // whose exact per-string recount removes hash collisions (so the
    // result is string-exact and matches the plain-string oracle).
    "dedup_paragraphs" -> ((s, d) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      // The chunk frame is PERSISTED (r19 optimization round): four
      // consumers read it (candidate agg, candidate-instance join,
      // boiler recount via candInst, per-doc totals), and the
      // un-persisted lineage re-ran the chunk explode +
      // rollingFingerprint per consumer — the before plan shows FIVE
      // documents scans (plans/r19/dedup_paragraphs_before.txt).
      // Chunk strings live in the cache but still never cross an
      // exchange: the corpus-wide frequency shuffle stays keyed on
      // (fp, doc_id), candidate instances reach the recount through
      // broadcast joins — the scale shape is unchanged.
      val fps = graft.Cache.cached(s, d, "dedup.paraChunks") {
        Tables.documents(s, d)
          .withColumn("ws", split(col("text"), " "))
          .withColumn("nch", expr("size(ws) div 10"))
          .filter(col("nch") > 0)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, nch)," +
              " i -> array_join(slice(ws, (i - 1) * 10 + 1, 10), ' '))"))
            .as("chunk"))
          .withColumn("fp",
            graft.functions.GraftFunctions.rollingFingerprint(
              col("chunk")))
      }
      // narrow (fp, doc_id) shuffle; candidates = fps seen in >1 doc
      val cand = fps.select("fp", "doc_id").groupBy("fp")
        .agg(countDistinct("doc_id").as("ndf"))
        .filter(col("ndf") > 1).select("fp")
      val candInst = fps.join(broadcast(cand), "fp")
        .select("doc_id", "chunk")
      // exact recount on the candidate STRINGS removes collisions
      val boiler = candInst.groupBy("chunk")
        .agg(countDistinct("doc_id").as("nd"))
        .filter(col("nd") > 1).select("chunk")
      val perDocBoiler = candInst.join(broadcast(boiler), "chunk")
        .groupBy("doc_id").agg(count(lit(1)).as("n_boiler"))
      fps.groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
        .join(perDocBoiler, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chunks"),
          coalesce(col("n_boiler"), lit(0L)).as("n_boiler"))
        .orderBy("doc_id")
    }),

    // Near-dup survivorship clustering: connected components over the
    // verified MinHash pair graph (a doc transitively near-dup with
    // another belongs to one cluster; the cluster id is its min
    // doc_id — the survivor a dedup pass would keep). Iterative
    // min-label propagation: the driver LOOPS, the data never leaves
    // the cluster — each step is one join + one aggregate, and the
    // step count is the component diameter (near-dup components are
    // tiny chains; a convergence check guards the semantics). At
    // whole-corpus scale with giant components you'd switch to the
    // alternating large-star/small-star formulation — same
    // declarative building blocks, fewer rounds.
    // Oracle: DuckDB WITH RECURSIVE transitive closure — an
    // INDEPENDENT fixed-point formulation of the same answer.
    "dedup_clusters" -> ((s, d) => {
      val labels = ccLabels(s, d)
      val sizes = labels.groupBy("lbl").agg(count(lit(1)).as("csize"))
      labels.select(col("n").as("doc_id"), col("lbl").as("cluster"))
        .join(sizes.withColumnRenamed("lbl", "cluster"), "cluster")
        .select("doc_id", "cluster", "csize")
        .orderBy("doc_id")
    }),

    // SimHash near-dup: 64-bit signature from xxhash64(word) weighted
    // by term frequency; candidate pairs share one of four 16-bit
    // signature chunks (pigeonhole for hamming <= 3); emit pairs with
    // bit_count(sig1 XOR sig2) <= 3. No-oracle (signature depends on
    // Spark's xxhash64); DedupSpec pins semantics (exact dups have
    // hamming 0; output sorted; native == composable signature).
    // Signatures come from the ONE-PASS native SimHash64 expression
    // (round 9) — the explode + twin-aggregate form ([[simhash]])
    // stays as the executable spec.
    "dedup_simhash" -> ((s, d) => {
      // Persisted (r19 optimization round): the chunk self-join
      // references the signature frame on both sides, and the
      // un-persisted lineage ran the SimHash64 text kernel over the
      // full corpus TWICE (plans/r19/dedup_simhash_before.txt shows
      // two documents scans). The frame is two longs per doc.
      val sigs = graft.Cache.cached(s, d, "dedup.simSigs")(
        simhashNative(s, Tables.documents(s, d)))
      val chunks = sigs.select(col("doc_id"), col("sig"),
          explode(expr("transform(sequence(0, 3)," +
            " c -> struct(c AS c, shiftright(sig, c * 16) & 65535 AS v))"))
            .as("ch"))
        .select(col("doc_id"), col("sig"),
          col("ch.c").as("c"), col("ch.v").as("v"))
      chunks.as("x").join(chunks.as("y"),
          col("x.c") === col("y.c") && col("x.v") === col("y.v")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
          bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .orderBy("d1", "d2")
    }),

    // Embedding-space near-dup: pairs with cosine >= 0.45 (double
    // accumulation; threshold sits in a visible gap of the fixture's
    // cosine distribution). Exact brute-force baseline — reads the
    // SHARED persisted half-pair set (Similarity.halfPairs), so the
    // O(n²) scoring runs once per session across the three queries
    // that need it.
    "dedup_embed" -> ((s, d) =>
      Similarity.halfPairs(s, d)
        .filter(col("cos") >= 0.45)
        .select("v1", "v2", "cos")
        .orderBy("v1", "v2")),

    // The 100-TB twin of dedup_embed: multi-table hyperplane-LSH
    // blocking (the SHARED Similarity.lshCandidates index, Hamming-1
    // probe on every table) finds candidate pairs in
    // O(n · occupancy · tables), then exact cosine verifies — the
    // dedup_minhash candidate→verify pattern applied to vectors.
    // Oracle = the SAME SQL as dedup_embed: with the tuned table
    // count the deterministic fixed-seed blocking covers every
    // qualifying pair on the fixtures (SimilaritySpec pins block
    // recall 1.0 plus a margin check at cos ≥ 0.40), so output
    // hash-matches the exact baseline. Contingency if the driver ever
    // moves t2 to a new SF where coverage breaks: demote this key to
    // no-oracle and keep the equality spec at the fixture SFs.
    // Threshold honesty: cos 0.45 is a 63° angle — a WEAK similarity,
    // the adversarial case for LSH; real near-dup embeddings sit at
    // cos ≥ 0.9 where far fewer tables cover.
    //
    // No candidate distinct(): duplicate collisions re-score a cheap
    // vecDot instead of paying a full exchange over the candidate
    // set; the dedup happens after the cos ≥ 0.45 filter, where a
    // handful of rows remain.
    "dedup_embed_ann" -> ((s, d) => {
      val n = EngineConf.parquetRowCount(s, s"$d/embeddings.parquet")
      embedAnnPairs(s, d, Similarity.LshTables, Similarity.lshBits(n),
        Similarity.LshSeed, Similarity.DedupH1Tables, threshold = 0.45)
    })
  )

  /** The dedup_minhash pipeline sans final sort (shared with
    * dedup_clusters): verified near-dup pairs (d1 < d2, jac ≥ 0.8)
    * from MinHash banding + row-local exact-Jaccard verify.
    * Persisted (round 9): dedup_clusters (sorted first in the bench)
    * builds the pair graph for its CC edges, and dedup_minhash used
    * to re-run the band self-join + verify chain from the cached
    * shingles — now it reads this frame.
    *
    * Disk-backed since r17 ([[graft.Cache.diskBacked]]): the verified
    * pair graph is the second genuinely materialize-once artifact in
    * the engine (after the ANN index) — a dedup pipeline computes it
    * once per corpus snapshot and every dedup/clustering/survivorship
    * job reads it, so a released cache re-OPENS the tiny (d1, d2,
    * jac) table instead of re-running shingle → minhash → band join →
    * exact verify. The OTHER cache groups (geo./events./text./
    * pipeline.) stay session-memo-only on purpose: their midpoints
    * are query-local transforms a deployment recomputes per job, not
    * shared indexes — disk-backing them would game the bench, not
    * model a deployment. */
  private[operators] def minhashPairs(s: SparkSession,
      d: String): DataFrame =
    graft.Cache.diskBacked(s, d, "dedup.pairs", "documents.parquet",
      Seq("d1")) { minhashPairsBuild(s, d) }

  /** Banding geometry. r19 moved 8 bands × 2 rows → [[MinhashBands]]
    * bands × [[MinhashRows]] rows after the 1000x documents decade
    * caught a QUADRATIC in the 2-row scheme: a 2-row band bucket is
    * "docs sharing the two globally-minimum common-shingle hashes",
    * and those buckets grow LINEARLY with the corpus (829 docs at
    * 500k → 8,170 at 5M, measured by BandOccProbe), so raw candidate
    * pairs grew 97x across one decade (8.3M → 809M) and the pair
    * build exhausted 64 GB of spill. A third row multiplies another
    * ~4% coincidence probability into every hot bucket (occupancy
    * p³·n instead of p²·n) while 16 bands keep recall BETTER than the
    * old scheme: P[miss | J=0.8] = (1−0.8³)¹⁶ ≈ 1.0e-5 vs the old
    * (1−0.8²)⁸ ≈ 2.8e-4. Verified-pair outputs stay the exact
    * ground truth the oracle computes (misses re-checked at every SF
    * and both off-fixture decades after the change). */
  private[operators] val MinhashBands = 16
  private[operators] val MinhashRows = 3
  private[operators] val MinhashFuncs = MinhashBands * MinhashRows

  /** The (doc_id, band, h0..h{rows-1}) LSH banding rows, from the
    * [[minhashSigs]] signature frame (same min-of-murmur3-(value,
    * seed) values the r9 array_min/transform fold computed). */
  private[operators] def minhashBands(s: SparkSession,
      d: String): DataFrame = {
    val mh = minhashSigs(s, d).select(
      col("doc_id") +: (0 until MinhashFuncs).map(i => col(s"mh_$i")): _*)
    val bandStructs = (0 until MinhashBands).map(b =>
      struct(lit(b).as("band") +: (0 until MinhashRows).map(r =>
        col(s"mh_${MinhashRows * b + r}").as(s"h$r")): _*))
    mh.select(col("doc_id"), explode(array(bandStructs: _*)).as("bd"))
      .select(col("doc_id") +: (col("bd.band").as("band") +:
        (0 until MinhashRows).map(r => col(s"bd.h$r").as(s"h$r"))): _*)
  }

  private[graft] def minhashPairsBuild(s: SparkSession, d: String,
      broadcastMaxDocs: Long = VerifyBroadcastMaxDocs,
      pruneMaxDocs: Long = VerifyPruneMaxDocs): DataFrame = {
    val bands = minhashBands(s, d)
    // The candidate pair set is reused by every verify tier (and
    // three times on the pruned path), so it rides the session cache
    // — released with the rest of the dedup. group.
    val cand = graft.Cache.cached(s, d, "dedup.cand") {
      val keyEq = (0 until MinhashRows)
        .map(r => col(s"x.h$r") === col(s"y.h$r"))
        .foldLeft(col("x.band") === col("y.band"))(_ && _)
      bands.as("x").join(bands.as("y"),
          keyEq && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .distinct()
    }
    val sets = shingleSets(s, d)
    // Verify-attach dispatch, three tiers (r19 extends the r17 two):
    // the NARROW (d1, d2) candidate set is banding-bounded at any
    // scale, but candidates JOINED WITH their shingle sets are
    // corpus-content-sized.
    //  1. nDocs ≤ broadcastMaxDocs — the oracle-fixture fast path:
    //     double-broadcast, zero exchanges (hashed sets since r19 —
    //     smaller broadcast, same Jaccards; see shingleSets).
    //  2. ≤ pruneMaxDocs — the single-box scale path, measured at the
    //     5M-doc decade where the r17 full-frame attach exhausted
    //     64 GB of spill: the set frames SEMI-PRUNE against the
    //     broadcast candidate-id lists, so only matched docs' sets
    //     ever reach an exchange — the corpus-sized set frame streams
    //     through a broadcast-hash filter instead of shuffling.
    //  3. beyond pruneMaxDocs (candidate ids no longer broadcastable
    //     — the true 100-TB tail) — the prune drops out and the
    //     attaches co-partition the full set frame: the r17 tier-2
    //     shape at 1/5 the bytes.
    // DedupSpec pins all three tiers pair- and Jaccard-identical.
    val nDocs = EngineConf.parquetRowCount(s, s"$d/documents.parquet")
    def jacOut(attached: DataFrame): DataFrame = attached
      .withColumn("inter",
        size(array_intersect(col("set1"), col("set2"))))
      .withColumn("jac", round(col("inter").cast("double")
        / (size(col("set1")) + size(col("set2")) - col("inter")), 4))
      .filter(col("jac") >= 0.8)
      .select("d1", "d2", "jac")
    val s1 = sets.select(col("doc_id").as("d1"), col("shset").as("set1"))
    val s2 = sets.select(col("doc_id").as("d2"), col("shset").as("set2"))
    if (nDocs <= broadcastMaxDocs)
      jacOut(broadcast(broadcast(cand).join(s1, "d1")).join(s2, "d2"))
    else {
      val (a1, a2) =
        if (nDocs <= pruneMaxDocs)
          (s1.join(broadcast(cand.select("d1").distinct()),
            Seq("d1"), "left_semi"),
           s2.join(broadcast(cand.select("d2").distinct()),
             Seq("d2"), "left_semi"))
        else (s1, s2)
      jacOut(cand.join(a1, "d1").join(a2, "d2"))
    }
  }

  /** Doc-count bound for [[minhashPairsBuild]]'s broadcast verify
    * path: at 100k docs the planted-rate candidate set joined with
    * its shingle sets is ~tens of MB (safe to broadcast); the 500k
    * fixture measured it past the driver's broadcast build budget.
    * Beyond the bound the verify joins run co-partitioned. */
  private[operators] val VerifyBroadcastMaxDocs = 100000L

  /** Doc-count bound for the tier-2 semi-prune: candidate IDS are
    * banding-bounded (linear in the duplicate rate — ~0.5% of docs at
    * the planted rates), so broadcasting them holds far past any
    * single box; 50M docs ≈ a few MB of ids. Past it the attach
    * degrades to the co-partitioned full-frame form (tier 3). */
  private[operators] val VerifyPruneMaxDocs = 50000000L

  /** Connected-component labels (n → min doc_id of its component)
    * over the symmetric MinHash pair graph, memoized per (session,
    * dir). Delegates to [[ccFixedPoint]]. */
  private def ccLabels(s: SparkSession, d: String): DataFrame =
    graft.Cache.cached(s, d, "dedup.ccLabels") {
      // Symmetric edge set in ONE pass over the verified pairs (a
      // union of two selects would execute the verify pipeline twice).
      val edges = graft.Cache.cached(s, d, "dedup.ccEdges") {
        minhashPairs(s, d)
          .select(explode(array(
            struct(col("d1").as("a"), col("d2").as("b")),
            struct(col("d2").as("a"), col("d1").as("b")))).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))
      }
      ccFixedPoint(edges)
    }

  /** Connected components over a SYMMETRIC edge set (a, b) — returns
    * (n, lbl) with lbl = min node id of n's component, for every node
    * appearing in the edges. Package-visible so DedupSpec can drive
    * it with synthetic pathological graphs (long chains) independent
    * of the fixture's near-dup pair graph.
    *
    * Algorithm: min-label propagation with POINTER JUMPING
    * (Shiloach-Vishkin-style shortcutting). Each round runs
    * propagate (lbl'(n) = min(lbl(n), min over neighbors)) then
    * shortcut (lbl''(n) = lbl'(lbl'(n)) — labels are node ids, so a
    * self-join chases one pointer hop). Propagation alone needs
    * diameter rounds; the shortcut halves label-chain depth each
    * round, so convergence is O(log diameter) — the same round bound
    * as alternating large-star/small-star, with the propagate/
    * shortcut pair in place of the two star operations. A 12-round
    * cap therefore covers diameters into the thousands (spec-proven
    * on a 64-node chain) instead of the ~20 the propagate-only loop
    * managed in 10.
    *
    * Both operations only ever DECREASE labels, so the fixed point is
    * reached exactly when sum(lbl) stops falling, and a stable sum
    * over a composite round implies each inner operation was stable.
    * At a propagate fixed point labels are constant along every edge,
    * i.e. equal to the component min — shortcutting never changes
    * that fixed point (the min node's label is itself).
    *
    * Each round's frame is PERSISTED and its predecessor released —
    * without that, round k's convergence count re-executes rounds
    * 1..k-1 and the loop goes quadratic in stages (measured
    * 14.7 s → ~3 s at sf0.1). The driver loops; the data never
    * leaves the cluster. */
  private[operators] def ccFixedPoint(edges: DataFrame,
      maxRounds: Int = 12,
      log: String => Unit = System.err.println,
      localSolveMaxEdges: Long = 1L << 20): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // Small-graph fast path — the SAME decision a broadcast join
    // makes: when the pair graph is below a bounded threshold (1M
    // edges ≈ 16 MB of longs, the autoBroadcastJoinThreshold scale),
    // a single-task union-find replaces ~2·log(diameter) distributed
    // jobs whose per-job overhead dominates at this size (measured:
    // the sf0.1 graph is 47 nodes, yet the loop's ~7 rounds cost
    // ~5 s of pure job scheduling). The union-find runs LAZILY in
    // one mapPartitions task over a coalesce(1) of the edge frame
    // (the zoneRank r13 discipline — formerly an eager driver
    // collect at construction); only the threshold count() remains a
    // build-time job, and near-dup pair counts are corpus-dependent,
    // so no static bound can replace it here. Near-dup pair graphs
    // are sparse BY CONSTRUCTION (banding emits rare candidates), so
    // even a 100-TB corpus often lands here; past the threshold the
    // distributed pointer-jump below runs unchanged (spec-covered by
    // forcing localSolveMaxEdges = 0).
    if (edges.count() <= localSolveMaxEdges) {
      val s = edges.sparkSession
      import s.implicits._
      return edges.select(col("a").cast("long"), col("b").cast("long"))
        .as[(Long, Long)]
        .coalesce(1)
        .mapPartitions(localUnionFind)
        .toDF("n", "lbl")
    }
    // Initialization WITH the first propagation step fused in: every
    // node appears as `a` in the symmetric edge set, so one
    // aggregation seeds lbl = min(self, min neighbor) — no join, and
    // one fewer loop round.
    var labels = edges.groupBy("a")
      .agg(min("b").as("mb"))
      .select(col("a").as("n"), least(col("a"), col("mb")).as("lbl"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    def propagate(l: DataFrame): DataFrame = {
      val nbMin = edges
        .join(l.select(col("n").as("a"), col("lbl").as("albl")), "a")
        .groupBy(col("b").as("n")).agg(min("albl").as("nbmin"))
      l.join(nbMin, Seq("n"), "left")
        .select(col("n"),
          least(col("lbl"), coalesce(col("nbmin"), col("lbl")))
            .as("lbl"))
    }
    // lbl''(n) = lbl(lbl(n)): the invariant lbl(x) <= x means every
    // label IS a node with its own (smaller-or-equal) label to chase.
    def shortcut(l: DataFrame): DataFrame =
      l.as("x")
        .join(l.select(col("n").as("pn"), col("lbl").as("plbl")).as("p"),
          col("x.lbl") === col("pn"), "left")
        .select(col("x.n").as("n"),
          least(col("x.lbl"), coalesce(col("plbl"), col("x.lbl")))
            .as("lbl"))
    // coalesce: sum over an EMPTY frame is null — a pair-free corpus
    // (no near-dups at all) must converge to an empty labeling, not
    // NPE the convergence check.
    def lblSum(df: DataFrame): Long =
      df.agg(coalesce(sum("lbl"), lit(0L))).head.getLong(0)
    var prevSum = lblSum(labels)
    var converged = false
    var round = 0
    // Adaptive retry: one doubling of the round cap (with a logged
    // warning) before giving up — a component just past the expected
    // diameter degrades to a slower run instead of a dead query. The
    // loop below runs straight through the extension: rounds are
    // stateless beyond `labels`, so "retry" is simply more rounds.
    var cap = maxRounds
    var extended = false
    while (!converged && round < cap) {
      // localCheckpoint (eager) BOTH materializes the round and
      // TRUNCATES lineage. Truncation is load-bearing: the shortcut
      // self-join references the previous frame twice, so without it
      // the logical plan DOUBLES per round — exponential analyze/
      // codegen cost long before any data is large. On a multi-node
      // cluster prefer spark.sparkContext.setCheckpointDir + reliable
      // .checkpoint() (survives executor loss); local blocks suffice
      // for this single-JVM build.
      val next = shortcut(propagate(labels)).localCheckpoint()
      val nextSum = lblSum(next)
      converged = nextSum == prevSum
      prevSum = nextSum
      labels.unpersist(blocking = false)
      labels = next
      round += 1
      if (!converged && round == cap && !extended) {
        extended = true
        cap = maxRounds * 2
        log(s"[graft] ccFixedPoint: no convergence in " +
          s"$maxRounds rounds — extending once to $cap")
      }
    }
    require(converged,
      s"connected components did not converge in $cap " +
        "propagate+shortcut rounds (cap already doubled once from " +
        s"$maxRounds) — component label chains deeper than ~2^$cap; " +
        "raise maxRounds")
    // Returned (and possibly re-persisted by Cache) while still
    // holding the final round's blocks — an extra persist is a no-op.
    labels
  }

  /** Min-label union-find over a fully-local edge list — the
    * single-task body of [[ccFixedPoint]]'s bounded path. Emits
    * every node with its component minimum, sorted by node (the
    * order the eager driver version produced). */
  private def localUnionFind(
      it: Iterator[(Long, Long)]): Iterator[(Long, Long)] = {
    val es = it.toArray
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent(rb) = ra
      else if (rb < ra) parent(ra) = rb
    }
    parent.keys.toSeq.sorted.iterator.map(n => (n, find(n)))
  }

  /** The dedup_embed_ann pipeline, parameterized so the AnnSweep tool
    * can measure pair coverage of candidate configs with the exact
    * code the declared query runs. */
  private[operators] def embedAnnPairs(s: SparkSession, d: String,
      nTables: Int, bits: Int, seed: Long, nH1: Int,
      threshold: Double): DataFrame =
    Similarity.lshCandidates(s, d, nTables, bits, seed, nH1)
      .filter(col("v1") < col("v2"))
      .filter(col("cos") >= threshold)
      .dropDuplicates("v1", "v2")
      .orderBy("v1", "v2")

  /** One-pass native SimHash signatures (doc_id, sig) — the declared
    * path; [[simhash]] is its executable spec (DedupSpec asserts
    * equality over the corpus). */
  private[operators] def simhashNative(s: SparkSession,
      docs: DataFrame): DataFrame = {
    GraftFunctions.ensureRegistered(s)
    docs.select(col("doc_id"),
      GraftFunctions.simHash64(col("text")).as("sig"))
  }

  /** 64-bit SimHash per doc over whitespace tokens — the COMPOSABLE
    * form, kept as the executable spec of [[simhashNative]].
    *
    * Shape: one (doc, word, cnt, hash) row per distinct term, then 64
    * per-bit weighted sums as AGG COLUMNS of a single hash aggregate
    * (not 64 exploded rows per term — that costs a 64x row blow-up
    * and a huge shuffle; columns ride the same partial agg for free).
    * Summing tf·±1 per distinct term equals summing ±1 per
    * occurrence, which is what the native one-pass kernel does.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
      .withColumn("h", xxhash64(col("w")))
    val bitSums = (0 until 64).map(b =>
      sum(when(expr(s"(shiftright(h, $b) & 1) = 1"), col("cnt"))
        .otherwise(-col("cnt"))).as(s"s_$b"))
    val sig = (0 until 64).map(b =>
      when(col(s"s_$b") > 0, lit(1L << b)).otherwise(0L))
      .reduce(_ + _)
    toks.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), sig.as("sig"))
  }

  /** Exact shingle-Jaccard pair CTEs (DuckDB): `jacp` ends with the
    * verified (d1 < d2, jac ≥ 0.8) pairs. Shared by the near-dup pair
    * oracles AND (with a RECURSIVE closure appended) the clustering
    * oracle. %BLOCK% is the optional candidate-blocking predicate. */
  private val exactJaccardCtes =
    """ds AS (
      |  SELECT DISTINCT doc_id, lang, n_chars, shingle FROM (
      |    SELECT doc_id, lang, n_chars,
      |      w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win
      |        AS shingle
      |    FROM (SELECT doc_id, lang, n_chars,
      |            unnest(string_split(text, ' ')) AS w,
      |            generate_subscripts(string_split(text, ' '), 1) AS pos
      |          FROM documents) t
      |    WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
      |  ) s WHERE shingle IS NOT NULL
      |), sz AS (
      |  SELECT doc_id, count(*) AS nsh FROM ds GROUP BY 1
      |), cpairs AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
      |  FROM ds a JOIN ds b ON a.shingle = b.shingle
      |    AND a.doc_id < b.doc_id%BLOCK%
      |  GROUP BY 1, 2
      |), jacp AS (
      |  SELECT d1, d2,
      |    round(inter * 1.0 / (s1.nsh + s2.nsh - inter), 4) AS jac
      |  FROM cpairs
      |  JOIN sz s1 ON d1 = s1.doc_id
      |  JOIN sz s2 ON d2 = s2.doc_id
      |  WHERE round(inter * 1.0 / (s1.nsh + s2.nsh - inter), 4) >= 0.8
      |)""".stripMargin

  private val exactJaccardSql =
    s"WITH $exactJaccardCtes\n" +
      "SELECT d1, d2, jac FROM jacp ORDER BY d1, d2"

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies,
        | CAST(min(n_chars) AS BIGINT) AS n_chars
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,

    "dedup_paragraphs" ->
      """WITH ws AS (
        |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
        |), ch AS (
        |  SELECT doc_id, unnest(list_transform(
        |    range(0, CAST(len(l) // 10 AS INT)),
        |    i -> array_to_string(l[(i*10+1):(i*10+10)], ' '))) AS chunk
        |  FROM ws
        |), f AS (
        |  SELECT chunk, count(DISTINCT doc_id) AS nd FROM ch GROUP BY 1
        |)
        |SELECT doc_id, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_boiler
        |FROM ch JOIN f USING (chunk)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Same ground truth as dedup_exact — the fingerprint grouping +
    // full-text verify is an exact algorithm, not an approximation.
    "dedup_exact_fingerprint" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies,
        | CAST(min(n_chars) AS BIGINT) AS n_chars
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,

    "dedup_near" -> exactJaccardSql.replace("%BLOCK%",
      "\n    AND a.lang = b.lang AND abs(a.n_chars - b.n_chars) <= 20"),

    // MinHash output = unblocked exact ground truth (LSH recall at
    // J >= 0.8 is effectively 1 at t2 scale; verified locally).
    "dedup_minhash" -> exactJaccardSql.replace("%BLOCK%", ""),

    // Transitive closure over the same verified pair graph — an
    // independent (recursive-CTE) formulation of the fixed point the
    // engine's min-label propagation computes.
    "dedup_clusters" ->
      (s"WITH RECURSIVE ${exactJaccardCtes.replace("%BLOCK%", "")},\n" +
        """edges AS (
          |  SELECT d1 AS a, d2 AS b FROM jacp
          |  UNION SELECT d2, d1 FROM jacp
          |), reach(n, m) AS (
          |  SELECT a, a FROM edges
          |  UNION
          |  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
          |), lab AS (
          |  SELECT n AS doc_id, min(m) AS cluster FROM reach GROUP BY n
          |), sizes AS (
          |  SELECT cluster AS c2, count(*) AS csize FROM lab GROUP BY 1
          |)
          |SELECT doc_id, cluster, csize
          |FROM lab JOIN sizes ON cluster = c2
          |ORDER BY doc_id""".stripMargin),

    "dedup_embed" ->
      """SELECT a.vec_id AS v1, b.vec_id AS v2,
        | round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |   CAST(b.embedding AS DOUBLE[])), 4) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |   CAST(b.embedding AS DOUBLE[])), 4) >= 0.45
        |ORDER BY v1, v2""".stripMargin,

    // Same ground truth as dedup_embed: the LSH blocking is tuned to
    // cover every qualifying pair on the fixtures, so the hash match
    // against the EXACT oracle is itself the block-recall-1.0 proof.
    "dedup_embed_ann" ->
      """SELECT a.vec_id AS v1, b.vec_id AS v2,
        | round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |   CAST(b.embedding AS DOUBLE[])), 4) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |   CAST(b.embedding AS DOUBLE[])), 4) >= 0.45
        |ORDER BY v1, v2""".stripMargin
  )
}
