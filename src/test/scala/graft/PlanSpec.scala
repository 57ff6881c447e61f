package graft

import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan shape pins — PLANS.md's audit as executable
  * assertions, so a refactor that silently loses a pushdown, a
  * broadcast, or an exchange-sharing property fails CI instead of
  * surfacing as a 100-TB regression. Substring checks are kept
  * deliberately loose (node names, not full plan text) to survive
  * Spark formatting changes. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, SparkSpec.sf001)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  private def countOf(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  /** Number of SHUFFLE exchanges: count each node once via its
    * numbered detail header ("(7) Exchange"), which excludes
    * BroadcastExchange and the tree-section duplicate. */
  private def shuffleExchanges(p: String): Int =
    p.linesIterator.count(_.trim.matches("\\(\\d+\\) Exchange"))

  test("scan_filter_pushdown: predicate reaches the parquet reader") {
    val p = plan("scan_filter_pushdown")
    assert(p.contains("PushedFilters"))
    assert(p.contains("LessThanOrEqual(l_shipdate"))
  }

  test("scan_projection: column pruning holds at the scan") {
    val p = plan("scan_projection")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema"))
    assert(readSchema.isDefined)
    // exactly the projected columns — nothing else read
    assert(readSchema.get.contains("l_orderkey"))
    assert(!readSchema.get.contains("l_extendedprice"))
  }

  test("join_broadcast: dimension side broadcasts (no fact shuffle)") {
    assert(plan("join_broadcast").contains("BroadcastHashJoin"))
  }

  test("join_5way: the whole dim chain broadcasts") {
    assert(countOf(plan("join_5way"), "BroadcastHashJoin") >= 4)
  }

  test("agg_pricing_summary: partial+final aggregation split") {
    assert(countOf(plan("agg_pricing_summary"), "HashAggregate") >= 2)
  }

  test("geo_voyages: all windows + agg ride ONE data exchange") {
    // expected exchanges: 1 hash (user_id) + 1 range (final sort);
    // a third would mean a window lost the shared partitioning
    assert(shuffleExchanges(plan("geo_voyages")) <= 2)
  }

  test("text_pack_bins: two-phase prefix — the data-sized window" +
      " partitions by (lang, bkt)") {
    // The two-phase rewrite's point (the window_distinct_users
    // pattern): the corpus-sized running sum must partition by
    // (lang, doc_id-range bucket) so parallelism scales with data,
    // not languages; the per-lang window survives only on the tiny
    // bucket-offsets frame, which re-attaches via broadcast. Budget:
    // (lang,bkt) window + offsets agg + offsets lang window +
    // (lang,bin) agg + final range sort = 5.
    val p = plan("text_pack_bins")
    assert(shuffleExchanges(p) <= 5)
    assert(p.linesIterator.exists(l =>
      l.contains("hashpartitioning") && l.contains("lang")
        && l.contains("bkt")),
      "no exchange partitions by (lang, bkt) — the prefix sum " +
        "regressed to the serial per-lang window")
    assert(p.contains("BroadcastExchange"),
      "the bucket offsets no longer re-attach via broadcast")
  }

  test("stream_session: both windows share the user_id exchange") {
    assert(shuffleExchanges(plan("stream_session")) <= 2)
  }

  test("dedup_minhash: query reads the pair artifact; the indexing " +
      "job's candidate-verify joins broadcast") {
    // Since r17 the verified pair graph is an on-disk artifact
    // (Cache.diskBacked), so the QUERY plan is an artifact scan plus
    // the presentation sort — no join at all.
    val p = plan("dedup_minhash")
    assert(p.contains("graft_idx_"),
      s"query path should scan the pair-graph artifact:\n$p")
    // The INDEXING job keeps the verify-attach discipline: the two
    // shingle-set verify joins broadcast the tiny candidate set
    // against per-doc set rows. The band self-join stays deliberately
    // unpinned: its input is n·8 rows, so the planner must stay free
    // to degrade it from BHJ to a shuffled join as the corpus grows —
    // banning SortMergeJoin plan-wide would freeze a non-scalable
    // choice into CI.
    val bp = graft.operators.Dedup
      .minhashPairsBuild(spark, SparkSpec.sf001)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(countOf(bp, "BroadcastHashJoin") >= 2)
  }

  test("dedup_exact_fingerprint: ONE fp pass, collision verify joins" +
      " broadcast") {
    // The scale twin's contract since the r19 optimization round: the
    // per-fp doc list rides ONE hash aggregate over narrow (fp,
    // doc_id, n_chars) rows — rollingFingerprint is evaluated at a
    // SINGLE projection site (the before shape re-evaluated it over
    // the full corpus 4×: plans/r19/dedup_exact_fingerprint_before
    // .txt) — and full texts re-group only for the tiny fp-collision
    // set, reached via a BROADCAST id join.
    val p = plan("dedup_exact_fingerprint")
    assert(countOf(p, "BroadcastHashJoin") >= 1)
    assert(!p.contains("SortMergeJoin"))
    // one Project computes the fp; the detail section mentions the
    // expression once as "fingerprint_hash(text…) AS fp" — more AS
    // sites means a branch re-derived it
    assert(countOf(p, "fingerprint_hash") <= 2,
      s"fingerprint_hash evaluated at >1 site:\n$p")
    // exactly 2 corpus scans: the fp pass + the full-text verify
    assert(countOf(p, "documents.parquet") == 2, p)
  }

  test("similarity_knn: brute force is BNLJ + TakeOrderedAndProject") {
    val p = plan("similarity_knn")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("geo_headings: hop window, sector agg, modal windows share ONE" +
      " user exchange") {
    // 1 hash (user_id) + 1 range (final sort); a third would mean a
    // window or the agg lost the shared partitioning
    assert(shuffleExchanges(plan("geo_headings")) <= 2)
  }

  test("geo_speed_flags: hop window and per-vessel agg share ONE" +
      " user exchange") {
    assert(shuffleExchanges(plan("geo_speed_flags")) <= 2)
  }

  test("pipeline_corpus_prep: narrow-fingerprint dedup + two-phase pack") {
    // The dedup stage's contract (the dedup_exact_fingerprint shape):
    // the corpus-wide dedup shuffle partitions on the FINGERPRINT and
    // carries only (fp, doc_id, lang, toks) — full texts re-group
    // only for the tiny fp-collision set, reached via BROADCAST joins
    // (singles anti-join + collided-id semi-join), never a sort-merge
    // over texts. Packing adds the (lang, bkt) two-phase exchange.
    val p = plan("pipeline_corpus_prep")
    assert(p.linesIterator.exists(l =>
      l.contains("hashpartitioning") && l.contains("fp#")),
      "the dedup shuffle no longer keys on the narrow fingerprint")
    assert(countOf(p, "BroadcastHashJoin") >= 3)
    assert(!p.contains("SortMergeJoin"),
      "a sort-merge join appeared — full texts are shuffling")
    assert(p.linesIterator.exists(l =>
      l.contains("hashpartitioning") && l.contains("lang")
        && l.contains("bkt")),
      "no exchange partitions by (lang, bkt)")
    assert(shuffleExchanges(p) <= 8)
  }

  test("window_distinct_users: the running sum partitions by" +
      " (type, day) buckets") {
    // The two-phase prefix sum's entire point: the intra-bucket
    // window partitions by (event_type, day), so parallelism scales
    // with buckets instead of the 5 event types. A hashpartitioning
    // on event_type alone here would mean the rewrite regressed to
    // the serial per-type window.
    val p = plan("window_distinct_users")
    assert(p.linesIterator.exists(l =>
      l.contains("hashpartitioning") && l.contains("event_type")
        && l.contains("day")),
      "no exchange partitions by (event_type, day)")
  }

  test("geo_zone_dwell: hop window and (user, zone) agg share ONE" +
      " user exchange") {
    // 1 hash (user_id) + 1 range (final sort); the (user_id, zone)
    // aggregate's clustering is satisfied by the window's hash
    // partitioning (user_id ⊆ group keys) — a third exchange would
    // mean that property broke
    assert(shuffleExchanges(plan("geo_zone_dwell")) <= 2)
  }

  test("geo_zone_entries: entry window partitions by (zone, user)") {
    // 1 hash (user_id ordinal window — the bbox prefilter's gap
    // detector) + 1 hash ((zone, user_id) window) + 1 hash (per-zone
    // distinct agg — zone alone is a coarser key than the window's,
    // so this re-shuffle is expected) + 1 range (final sort)
    assert(shuffleExchanges(plan("geo_zone_entries")) <= 4)
    assert(plan("geo_zone_entries").contains("Window"))
  }

  test("events_funnel: all three stage windows share ONE user exchange") {
    val p = plan("events_funnel")
    // 1 hash (user_id, shared by all three unordered windows and the
    // per-user collapse) + 1 single-partition (global count) + the
    // trivial 3-row sort; more would mean a stage window re-shuffled
    assert(countOf(p, "Window") >= 3)
    assert(shuffleExchanges(p) <= 3)
  }

  test("join_skew_salted and join_interval joins stay unhinted-" +
      "broadcastable at this SF") {
    // Both must keep a hash-join form the planner chose (broadcast
    // here, free to degrade to shuffle at scale) — a nested-loop or
    // cartesian node would mean the equi-keys got lost.
    Seq("join_skew_salted", "join_interval").foreach { q =>
      val p = plan(q)
      assert(p.contains("HashJoin"), s"$q lost its equi-join form")
      assert(!p.contains("CartesianProduct"))
      assert(!p.contains("BroadcastNestedLoopJoin"))
    }
  }

  test("text_repetition: a pure map — no shuffle except the final sort") {
    // All gram math is row-local array work; the only exchange the
    // plan may contain is the presentation sort's range partitioning.
    // A hash exchange appearing here means someone rewrote the
    // row-local form into an aggregation — the 100-TB property lost.
    val p = plan("text_repetition")
    assert(shuffleExchanges(p) <= 1)
    assert(!p.contains("SortMergeJoin") && !p.contains("HashAggregate"))
  }

  test("text_contamination: the overlap join broadcasts the bench side") {
    // The corpus side must stream map-side past the benchmark
    // shingles (small by construction — eval sets don't scale with
    // the corpus). The totals-with-hits stitch join is left unhinted.
    assert(countOf(plan("text_contamination"), "BroadcastHashJoin") >= 1)
  }

  test("agg_histogram: partial+final split on the bucket key") {
    assert(countOf(plan("agg_histogram"), "HashAggregate") >= 2)
  }

  test("pipeline_mixture_weights: ONE domain agg, window totals, no" +
      " second corpus pass") {
    // Since the r19 optimization round the totals are a bounded
    // global window over the domain aggregate (|langs|·|sources|
    // rows) — the old agg + crossJoin(broadcast) made the domain
    // frame a two-consumer lineage and re-ran the corpus aggregate
    // for the 1-row total. Exactly one documents scan and one
    // Window, no join of any kind.
    val p = plan("pipeline_mixture_weights")
    assert(countOf(p, "documents.parquet") == 1, p)
    assert(p.contains("Window"))
    assert(!p.contains("Join"), p)
  }

  test("text_postings: sample window caps state before any collect") {
    // row_number + filter rn<=10 MUST precede the collect_list: the
    // plan shape proof that no task materializes a full stop-word
    // postings list. Window and both aggs share the term key.
    val p = plan("text_postings")
    assert(p.contains("Window"))
    assert(p.contains("collect_list"))
    assert(p.contains("<= 10"), "the rn cap filter vanished — " +
      "collect_list would see unbounded per-term postings")
    // Spark compiles the rank cap into WindowGroupLimit on both
    // sides of the window exchange: each map task keeps only its
    // local top-10 per term BEFORE the shuffle, so a stop-word's
    // postings never even travel. Losing this node is a silent
    // regression to shuffling full postings lists.
    assert(countOf(p, "WindowGroupLimit") >= 2,
      "the rank cap no longer pushes below the window exchange")
  }

  test("geo_od_matrix: sessionization, endpoint frames, and collapse" +
      " ride ONE user exchange") {
    // Pinned on the RAW builder (the declared query reads the
    // session-persisted frame, whose explain inlines the cached
    // lineage and double-counts): 1 hash (user_id — both voyage
    // windows, both endpoint frames, and the (user, voyage, o, d)
    // collapse are sub-partitions) + 1 hash (the OD agg's coarser
    // key) + 1 range (final sort)
    // Clear the geo session cache first: if an earlier suite warmed
    // geo.od, CacheManager substitutes the persisted frame into this
    // identical raw plan and the formatted explain inlines the cached
    // lineage's exchanges (5 warm vs 3 cold) — an order-dependent
    // count that says nothing about the engine plan. Exact prefix:
    // clearing all of "geo." would also unpersist geo.coPairs and
    // force later suites to rebuild that expensive intermediate.
    graft.Cache.clear(spark, "geo.od")
    val raw = operators.GeoOps
      .odMatrixBuild(spark, SparkSpec.sf001)
      .orderBy("o_zone", "d_zone")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(shuffleExchanges(raw) <= 3)
    // ... and the declared query must actually READ the shared cache
    // (the sessionization runs once per session, not once per
    // consumer).
    assert(plan("geo_od_matrix").contains("InMemoryTableScan"))
  }

  test("geo_od_matrix build: voyage endpoints come from flags, not a" +
      " second full-width sort") {
    // r20 rewrite: o/d zones used to be an unbounded first/last window
    // over (user_id, voyage) — a SECOND full sort of every sessionized
    // event plus a 4-key dedup aggregate. They now come from
    // is_new/lead endpoint flags filtered to ≤ 2 rows per voyage
    // before the aggregate. The regression signature is the unbounded-
    // following frame (only that window used one); its absence pins
    // the rewrite without matching brittle expression ids.
    graft.Cache.clear(spark, "geo.od")
    val raw = operators.GeoOps
      .odMatrixBuild(spark, SparkSpec.sf001)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!raw.contains("unboundedfollowing"),
      "the endpoint first/last window is back — a second full-width " +
        "sort of the sessionized events at scale")
    // both surviving window functions (lag gap + cumsum voyage + lead
    // endpoint flag) must share the ONE byUser sort: exactly one Sort
    // node may sit below a Window node
    val windowSorts = raw.linesIterator.count(_.trim.matches("\\(\\d+\\) Window"))
    assert(windowSorts <= 2, s"window chain split: $windowSorts Window nodes")
  }

  test("events_anomaly_mad: both median windows share ONE user exchange") {
    // 1 hash (user_id — both percentile windows) + 1 range (final
    // sort); a third exchange means the second window re-shuffled
    val p = plan("events_anomaly_mad")
    assert(countOf(p, "Window") >= 2)
    assert(shuffleExchanges(p) <= 2)
  }

  test("text_zipf: two-phase top-k — bucket rank precedes lang rank") {
    // (lang, w) agg + (lang, bkt) sub-rank window + lang rank window
    // (over ≤ 16·1000 survivors) + final sort = 4; the regression
    // reuses the lang partitioning. An exchange on lang alone BEFORE
    // the bucket rank would mean the two-phase rewrite regressed to
    // sorting whole vocabularies per language.
    val p = plan("text_zipf")
    assert(shuffleExchanges(p) <= 4)
    assert(p.linesIterator.exists(l =>
      l.contains("hashpartitioning") && l.contains("lang")
        && l.contains("bkt")),
      "no exchange partitions by (lang, bkt)")
    assert(countOf(p, "<= 1000") >= 2)
  }

  test("geo_lanes_top: the global top-20 never fully sorts the matrix") {
    assert(plan("geo_lanes_top").contains("TakeOrderedAndProject"))
  }

  test("join_asof_nearest: both directional frames ride ONE user" +
      " exchange") {
    // backward (running last) and forward (first following) frames
    // sort identically, so one hash exchange + the final range sort
    // is the whole shuffle budget; a join node would mean the merge
    // regressed to the click×purchase form
    val p = plan("join_asof_nearest")
    assert(shuffleExchanges(p) <= 2)
    assert(!p.contains("Join"), "the as-of merge regressed to a join")
  }

  test("geo_triangles: every graph join stays an equi-join") {
    // Degree join, wedge self-join, and closing-edge semi-join all
    // key on vertex ids — a CartesianProduct or nested-loop node
    // here means the equi-keys got lost and a hub would go quadratic
    // in the worst way.
    val p = plan("geo_triangles")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("pipeline_quality_filter: a pure map — no shuffle except the sort") {
    val p = plan("pipeline_quality_filter")
    assert(shuffleExchanges(p) <= 1)
    assert(!p.contains("HashAggregate") && !p.contains("Join"))
  }

  test("events_gap_hist: lag window + partial+final bucket agg") {
    // 1 hash (user_id window) + 1 hash (bucket agg) + 1 range (sort)
    val p = plan("events_gap_hist")
    assert(shuffleExchanges(p) <= 3)
    assert(countOf(p, "HashAggregate") >= 2)
  }

  test("events_markov: sequence window, pair agg, row-sum window, sort") {
    // 1 hash (user_id lead window) + 1 hash ((from, to) agg) +
    // 1 hash (from_type row-sum window — types-sized input) +
    // 1 range (sort). A fifth would mean the pair agg stopped
    // feeding the row-sum window directly.
    assert(shuffleExchanges(plan("events_markov")) <= 4)
  }

  test("source_partitioned_prune: the type filter prunes partitions") {
    // The filter must land in PartitionFilters (directory-level
    // pruning), not merely PushedFilters (row-group skipping): at
    // 100 TB this is the difference between listing one partition
    // and scanning the lake.
    val p = plan("source_partitioned_prune")
    assert(p.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("purchase")),
      "event_type = 'purchase' no longer reaches PartitionFilters")
  }

  test("source_bucketed_join: co-located SMJ — zero exchanges below" +
      " the join") {
    // Both sides bucketed 8 ways on the join key: the sort-merge join
    // must read pre-partitioned buckets with NO shuffle; the only
    // exchanges are the post-join segment agg + final sort.
    val p = plan("source_bucketed_join")
    assert(p.contains("SortMergeJoin"))
    assert(countOf(p, "Bucketed: true") >= 2,
      "a side lost its bucketed layout — the join shuffle is back")
    assert(shuffleExchanges(p) <= 2)
  }

  test("events_dau_wau: the trailing window is the explode-7 EQUI" +
      " join, not a range nested loop") {
    // days × rows range predicates compile to BNLJ; the explode-7
    // rewrite is 7·n rows + a hash join, the shape that survives a
    // decade-long horizon.
    val p = plan("events_dau_wau")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "the trailing-7-day window regressed to a range nested loop")
  }

  test("events_concurrency: the GLOBAL running sum is two-phased" +
      " by day") {
    // No partition key exists for a global concurrency sweep, so the
    // data-sized running sum must partition by day buckets; only the
    // ~#days offsets frame may ride an unpartitioned window, and it
    // re-attaches via broadcast.
    val p = plan("events_concurrency")
    assert(p.linesIterator.exists(l =>
      l.contains("hashpartitioning") && l.contains("day")),
      "the boundary running sum regressed to a single partition")
    assert(p.contains("BroadcastExchange"),
      "the day offsets no longer re-attach via broadcast")
  }

  test("dedup_paragraphs: the corpus-wide shuffle keys on the chunk" +
      " FINGERPRINT") {
    // The dedup_exact_fingerprint discipline at chunk level: the
    // frequency exchange carries (fp, doc_id); chunk strings shuffle
    // only for the broadcast-reached candidate set.
    val p = plan("dedup_paragraphs")
    assert(p.linesIterator.exists(l =>
      l.contains("hashpartitioning") && l.contains("fp#")),
      "the chunk-frequency shuffle no longer keys on the fingerprint")
    assert(countOf(p, "BroadcastHashJoin") >= 2)
  }

  test("join_theta_range: the self-join keys on (user, MINUTE BUCKET)" +
      " — per-user history pairing is the measured 100x quadratic") {
    // r18: the user_id-only equi form read slope 1.97 at the 100x
    // suite point (6.2 s → 578 s) — candidates were O(history²) per
    // user. The bucket key must be IN the join condition, or the
    // plan has regressed to exactly that.
    val p = plan("join_theta_range")
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
    // Formatted plans carry join keys in the detail section
    // ("Left keys [2]: [user_id#…, bkt#…]") — the header Join line
    // has no attributes.
    val keyLines = p.linesIterator
      .filter(l => l.contains("keys") && l.contains("user_id")).toSeq
    assert(keyLines.nonEmpty, s"no user_id join keys in:\n$p")
    assert(keyLines.forall(_.contains("bkt")),
      s"theta join lost its time-band key:\n${keyLines.mkString("\n")}")
  }

  test("join_range_banded: the band join is an EQUI join — no BNLJ") {
    // The rewrite's whole point: bucket ± 1 explode turns |x−y| ≤ w
    // into a hash-joinable equi key. A BNLJ or cartesian here means
    // the banding regressed to the O(n·m) theta baseline.
    val p = plan("join_range_banded")
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Join"))
  }

  test("agg_mode: two partial+final aggregates, no extra shuffles") {
    // (status, priority) counts + per-status argmin + final sort = 3
    val p = plan("agg_mode")
    assert(countOf(p, "HashAggregate") >= 4) // 2 aggs x partial+final
    assert(shuffleExchanges(p) <= 3)
  }

  test("window_gap_fill: LOCF rides ONE user exchange") {
    val p = plan("window_gap_fill")
    assert(shuffleExchanges(p) <= 2) // user_id window + final sort
    assert(p.contains("Window"))
  }

  test("text_keywords: rn <= 3 caps per-doc state via WindowGroupLimit") {
    // Same pushdown contract as text_postings: the rank cap must
    // compile to WindowGroupLimit so no task holds more than 3 rows
    // per doc before the filter.
    assert(countOf(plan("text_keywords"), "WindowGroupLimit") >= 1)
  }

  test("geo_zone_rank / geo_zone_components: bounded single-task" +
      " path, and construction runs ZERO Spark jobs") {
    // The 30° zone universe proves ≤ 72² edges ≪ the 100k threshold
    // with no job (staticMaxEdges), so BUILDING these queries must
    // run nothing — the round-8 "construction is an action" contract
    // is closed (round-12 advice). The bounded path itself must be
    // the lazy single-task recurrence (Coalesce 1 + MapPartitions),
    // NOT the 20-exchange distributed iteration chain (9.2 s of
    // stage scheduling for 72 nodes when measured) and NOT an eager
    // driver collect. The distributed path is exercised and
    // equality-forced in GeoOpsSpec.
    // Pre-warm the table memo: spark.read.parquet's schema-inference
    // footer read is a 1-task job, paid ONCE per (session, dir,
    // table) since Tables memoizes loads — not a per-construction
    // cost. Loading here keeps the zero-job assertion about the
    // operators, not the catalog.
    Tables.events(spark, SparkSpec.sf001)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val (pRank, pComp) =
      try {
        val pr = plan("geo_zone_rank")
        val pc = plan("geo_zone_components")
        // The listener bus is async: give it time to drain before
        // asserting. (A marker job is no flush anchor — under AQE
        // even range(1).count() fans into several jobs with
        // unrecognizable async stage names.)
        Thread.sleep(3000)
        assert(jobs.get() == 0,
          s"building the zone-graph queries submitted ${jobs.get()}" +
            " Spark job(s); construction must be plan-only")
        (pr, pc)
      } finally spark.sparkContext.removeSparkListener(listener)
    Seq("geo_zone_rank" -> pRank, "geo_zone_components" -> pComp)
      .foreach { case (name, p) =>
        assert(p.contains("MapPartitions"),
          s"$name lost the bounded single-task shape")
        assert(p.contains("Coalesce"),
          s"$name no longer collapses the bounded graph to one task")
      }
  }

  test("dedup_clusters: bounded component labeling is the lazy" +
      " single-task path, not an eager collect") {
    // ConstructionSpec whitelists this query's threshold count, so a
    // regression from the lazy mapPartitions union-find back to a
    // driver collect would slip through it — the plan shape is the
    // pin: the labeling must appear as MapPartitions over a
    // Coalesce, and an eager version would show a LocalTableScan /
    // ExistingRDD of pre-computed labels instead.
    val p = plan("dedup_clusters")
    assert(p.contains("MapPartitions"),
      "bounded union-find lost the lazy single-task shape")
    assert(!p.contains("LocalTableScan"),
      "labels are driver-precomputed again (eager collect regression)")
  }

  test("window_ntile: the global quartile is two-phased by acctbal" +
      " bucket") {
    // The last global window in the declared surface is gone: the
    // data-sized rank must partition by the floor(acctbal) bucket
    // (parallelism scales with the value range, not 1), and only the
    // tiny bucket-counts frame may ride an unpartitioned window,
    // re-attaching via broadcast — the events_concurrency contract
    // at ntile.
    val p = plan("window_ntile")
    assert(p.linesIterator.exists(l =>
      l.contains("hashpartitioning") && l.contains("bkt")),
      "the quartile rank regressed to a single-partition window")
    assert(p.contains("BroadcastExchange"),
      "the bucket offsets no longer re-attach via broadcast")
  }

  test("events_retention: cohort frame and join share the user_id key") {
    // 2 hash exchanges on user_id (cohort agg + the event side of the
    // join), 1 hash on (cohort_day, offset), 1 range (final sort).
    // A fifth exchange would mean the join stopped reusing the
    // aggregate's partitioning.
    assert(shuffleExchanges(plan("events_retention")) <= 4)
  }

  test("window_rank / topk_per_group: rank filter plants a " +
      "WindowGroupLimit below the window") {
    // The `row_number <= k` pattern must keep its buffers bounded at
    // k rows per group — Spark 4's WindowGroupLimit pushdown does
    // exactly that, and SpillSpec measured the consequence (the
    // pattern cannot be made to spill: nothing larger than k is ever
    // buffered). At 100 TB that is the difference between a top-k
    // whose memory is O(k) and one whose memory is the largest
    // group. A refactor that breaks the pushdown's preconditions
    // (e.g. filtering on a derived rank column) fails here.
    Seq("window_rank", "topk_per_group").foreach { q =>
      val p = plan(q)
      assert(p.contains("WindowGroupLimit"),
        s"$q: no WindowGroupLimit in the plan — the window now " +
          "buffers whole groups where it could buffer k rows")
    }
  }
}
