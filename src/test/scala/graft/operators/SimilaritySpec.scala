package graft.operators

import graft.SparkSpec

/** ANN quality: multi-table LSH recall against the brute-force twin,
  * plus structural invariants of the top-k outputs. */
class SimilaritySpec extends SparkSpec {

  test("ann_lsh recall@3 vs brute force is useful (> 0.35)") {
    val sf = SparkSpec.sf0001
    val brute = Similarity.queries("similarity_topk_per_query")(spark, sf)
      .filter("rk <= 3").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ann = Similarity.queries("ann_lsh")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & ann).size.toDouble / brute.size
    info(f"ann_lsh recall@3 = $recall%.3f (candidates pruned vs n^2)")
    assert(recall > 0.35, f"recall $recall%.3f too low")
  }

  test("ann_ivf recall@3 vs brute force is useful (> 0.3)") {
    val sf = SparkSpec.sf0001
    val brute = Similarity.queries("similarity_topk_per_query")(spark, sf)
      .filter("rk <= 3").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ann = Similarity.queries("ann_ivf")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & ann).size.toDouble / brute.size
    info(f"ann_ivf recall@3 = $recall%.3f")
    assert(recall > 0.3, f"recall $recall%.3f too low")
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
