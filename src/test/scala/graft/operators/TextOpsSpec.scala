package graft.operators

import graft.SparkSpec

/** Structural pins for the shard-packing operator (value-level gate
  * is the DuckDB oracle). */
class TextOpsSpec extends SparkSpec {

  test("text_pack_bins: bins conserve docs and tokens, fill contiguously") {
    val rows = TextOps.queries("text_pack_bins")(spark, SparkSpec.sf001)
      .collect()
    assert(rows.map(_.getLong(2)).sum == 500L) // every doc packed once
    rows.groupBy(_.getString(0)).values.foreach { rs =>
      val bins = rs.map(_.getLong(1)).sorted
      // contiguous fill: bin ids are consecutive from 0 (a bin can
      // only open once the previous prefix crossed its boundary)
      assert(bins.head == 0L)
      assert(bins.toSeq == (0L until bins.length).toSeq)
      // every bin except possibly the last holds >= the budget minus
      // one straddling doc: weaker, portable invariant — non-empty
      rs.foreach(r => assert(r.getLong(3) > 0))
    }
  }
}
