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

  test("text_edit_distance: blocked chain equals the naive per-lang window") {
    // The range-blocked chain (intra-block lead + boundary-join
    // reconstruction) must produce EXACTLY the naive single-window
    // pair set — at block sizes small enough that every language
    // spans many blocks, so the cross-block reconstruction is
    // actually exercised, not vacuously bypassed.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, graft.SparkSpec.sf001)
    val w = Window.partitionBy("lang").orderBy("doc_id")
    val naive = docs
      .withColumn("next_id", lead("doc_id", 1).over(w))
      .withColumn("next_text", lead("text", 1).over(w))
      .filter(col("next_id").isNotNull)
      .select(col("doc_id"), col("next_id"), col("lang"),
        levenshtein(col("text"), col("next_text")).as("edit_dist"),
        (length(col("next_text")) - length(col("text")))
          .as("len_delta"))
      .orderBy("doc_id")
      .collect().map(_.toString).toSeq
    assert(naive.nonEmpty)
    Seq(4L, 16L, 64L).foreach { bs =>
      val blocked = TextOps.editDistanceChain(docs, bs)
        .collect().map(_.toString).toSeq
      assert(blocked == naive,
        s"blockSize=$bs: blocked chain diverges from the naive window")
    }
  }
}
