package graft

import org.scalatest.funsuite.AnyFunSuite

class EngineConfSpec extends AnyFunSuite {

  test("small jobs floor at the parallelism") {
    assert(EngineConf.shufflePartitionsFor(1L << 20, 32) == 32)
  }

  test("100 TB shuffle sizes to ~400k spill-free partitions") {
    val p = EngineConf.shufflePartitionsFor(100L << 40, 8000)
    assert(p > 390000 && p < 420000, s"got $p")
  }

  test("confs include AQE + skew handling + UTC") {
    val c = EngineConf.confsFor(10L << 30, 32)
    assert(c("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(c("spark.sql.shuffle.partitions").toInt >= 32)
    assert(c("spark.sql.session.timeZone") == "UTC")
  }

  test("tuned sessions size cached-plan output by bytes, not by " +
      "shuffle.partitions") {
    // The r16 pin: EngineConf.tuned enables
    // canChangeCachedPlanOutputPartitioning, so a persisted plan
    // whose final stage is a tiny exchange coalesces instead of
    // freezing at spark.sql.shuffle.partitions — the frozen layout
    // cost every exchange over every Cache midpoint 32 near-empty
    // tasks per reference per execution (PLANS.md r16). Assert on
    // the shared spec session (built through tuned): a ~100-row
    // aggregated+sorted persist must come out with FEWER cached
    // partitions than the session's shuffle.partitions would force.
    val s = spark
    assert(s.conf.get(
      "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning")
      == "true")
    import org.apache.spark.sql.functions._
    val df = s.range(0, 10000)
      .groupBy((col("id") % 100).as("k")).count()
      .orderBy("k")
      .persist()
    try {
      df.count() // materialize
      val parts = df.rdd.getNumPartitions
      val conf = s.conf.get("spark.sql.shuffle.partitions").toInt
      assert(parts < conf,
        s"cached 100-row frame kept $parts partitions (conf $conf) — " +
          "cached-plan coalescing is off")
    } finally { df.unpersist(); () }
  }

  def spark = SparkSpec.spark
}
