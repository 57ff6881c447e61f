package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Suite-wide pin: building a query returns a LAZY plan — no Spark
  * jobs run until an action. The r13 loader memoization made this
  * true for the whole surface (parquet schema inference was a 1-task
  * job per un-memoized read, charged to every construction), and the
  * zone-graph ops dropped their eager driver fast paths; this spec
  * keeps the property from decaying one query at a time.
  *
  * The whitelist is every query whose construction RUNS something by
  * documented design, each with the reason. Anything else submitting
  * even one job fails with the query named.
  */
class ConstructionSpec extends SparkSpec {

  /** Construction-time jobs accepted by design. */
  private val whitelisted: Map[String, String] = Map(
    // ccFixedPoint's bounded-path dispatch counts the pair graph —
    // the broadcast-threshold-planner analogue; pair counts are
    // corpus-dependent, so no static bound can replace the count.
    "dedup_clusters" -> "pair-graph threshold count",
    // The roundtrip/layout queries' SEMANTICS are "write this
    // layout, read it back": the write (and the re-read's schema
    // inference over scratch files) is the operator under test.
    "sink_upsert_merge" -> "MERGE rewrites the target table",
    "source_bucketed_join" -> "one-time bucketed layout write",
    "source_csv_roundtrip" -> "csv write + schema-inferring re-read",
    "source_jsonl_roundtrip" -> "jsonl write + schema-inferring re-read",
    "source_orc_roundtrip" -> "orc write + re-read",
    "source_partitioned_prune" -> "partitioned layout write + re-read",
    "source_schema_evolution" -> "two-vintage layout write + re-read")

  test("every non-whitelisted query constructs with ZERO Spark jobs") {
    // Pre-warm the table memo: first-load schema inference is a
    // once-per-session catalog cost, not a per-construction one.
    Tables.names.foreach(n => Tables.table(spark, SparkSpec.sf001, n))
    val jobs =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.add((js.time,
          js.stageInfos.headOption.map(_.name).getOrElse("?")))
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val windows =
      scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    try {
      SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
        val t0 = System.currentTimeMillis()
        SparkEntry.queries(name)(spark, SparkSpec.sf001)
        // A whitelisted construction may submit ASYNC jobs (AQE
        // stages of its count/write) that would otherwise land in
        // the NEXT query's attribution window — give them time to
        // arrive inside this one (generous: a loaded box can delay
        // the async pool well past the quiet-box latency).
        if (whitelisted.contains(name)) Thread.sleep(1500)
        windows += ((name, t0, System.currentTimeMillis()))
      }
      Thread.sleep(3000) // drain the async listener bus
      val seen = jobs.toArray(Array.empty[(Long, String)])
      val offenders = windows.flatMap { case (name, t0, t1) =>
        val mine = seen.filter(j => j._1 >= t0 && j._1 <= t1)
        if (mine.nonEmpty && !whitelisted.contains(name))
          Some(s"$name (${mine.length} job(s): " +
            mine.map(_._2.takeWhile(_ != '\n')).mkString("; ") + ")")
        else None
      }
      assert(offenders.isEmpty,
        "queries ran Spark jobs at CONSTRUCTION (lazy-plan contract):\n  "
          + offenders.mkString("\n  "))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
