package graft.operators

import graft.SparkSpec

/** ANN quality: multi-table multi-probe LSH and IVF recall against
  * the brute-force twin, LSH-blocked embedding dedup coverage, plus
  * structural invariants of the top-k outputs. Recall here is
  * DETERMINISTIC per dataset (fixed-seed hyperplanes/seeds), so these
  * are regression pins, not flaky statistical tests. */
class SimilaritySpec extends SparkSpec {

  private def topkPairs(sf: String): Set[(Long, Long)] =
    Similarity.queries("similarity_topk_per_query")(spark, sf)
      .filter("rk <= 3").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet

  private def recall(name: String, sf: String): Double = {
    val brute = topkPairs(sf)
    val ann = Similarity.queries(name)(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    (brute & ann).size.toDouble / brute.size
  }

  test("ann_lsh recall@3 vs brute force >= 0.9") {
    Seq(SparkSpec.sf0001, SparkSpec.sf001).foreach { sf =>
      val r = recall("ann_lsh", sf)
      info(f"ann_lsh recall@3 = $r%.3f at $sf")
      assert(r >= 0.9, f"recall $r%.3f too low at $sf")
    }
  }

  test("ann_ivf recall@3 vs brute force >= 0.9") {
    Seq(SparkSpec.sf0001, SparkSpec.sf001).foreach { sf =>
      val r = recall("ann_ivf", sf)
      info(f"ann_ivf recall@3 = $r%.3f at $sf")
      assert(r >= 0.9, f"recall $r%.3f too low at $sf")
    }
  }

  test("dedup_embed_ann == dedup_embed exactly (block recall 1.0)") {
    Seq(SparkSpec.sf0001, SparkSpec.sf001).foreach { sf =>
      val exact = Dedup.queries("dedup_embed")(spark, sf).collect()
        .map(_.toString).toSeq
      val blocked = Dedup.queries("dedup_embed_ann")(spark, sf).collect()
        .map(_.toString).toSeq
      assert(exact.nonEmpty)
      assert(blocked == exact,
        s"LSH blocking missed/added pairs at $sf")
    }
  }

  test("ivf cells partition the collection") {
    val (assigned, means) = Similarity.ivfIndex(spark, SparkSpec.sf0001, 16)
    assert(assigned.count() == 500)          // every vector assigned
    assert(assigned.select("vec_id").distinct().count() == 500)
    assert(means.count() <= 16)              // at most k non-empty cells
  }

  test("similarity_topk_per_query: every vector gets <= 5 ranked rows") {
    val rows = Similarity.queries("similarity_topk_per_query")(
      spark, SparkSpec.sf0001).collect()
    val byV = rows.groupBy(_.getLong(0))
    assert(byV.values.forall(_.length <= 5))
    byV.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length))
      // ranks ordered by non-increasing cosine
      val cs = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (x, y) => x >= y })
    }
  }

  test("similarity_knn pairs are canonical (v1 < v2) and sorted") {
    val rows = Similarity.queries("similarity_knn")(
      spark, SparkSpec.sf0001).collect()
    assert(rows.length == 20)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    val cs = rows.map(_.getDouble(2))
    assert(cs.zip(cs.tail).forall { case (x, y) => x >= y })
  }
}
