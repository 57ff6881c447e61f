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
}
