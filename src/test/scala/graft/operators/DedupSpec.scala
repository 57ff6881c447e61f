package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dedup semantics against the sf0.1 fixtures (FIXTURES.md: 8 text
  * values appear exactly twice at sf0.1; none below). */
class DedupSpec extends SparkSpec {

  private lazy val exactDupPairs: Set[(Long, Long)] = {
    val docs = graft.Tables.documents(spark, SparkSpec.sf01)
    docs.groupBy("text")
      .agg(min("doc_id").as("d1"), max("doc_id").as("d2"),
        count(lit(1)).as("n"))
      .filter(col("n") === 2)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("fixture has exactly 8 exact-dup pairs at sf0.1") {
    assert(exactDupPairs.size == 8)
  }

  test("dedup_exact survivors: one per distinct text, min doc_id") {
    val out = Dedup.queries("dedup_exact")(spark, SparkSpec.sf01)
    assert(out.count() == 4992) // 5000 rows - 8 second copies
    val copies = out.filter(col("n_copies") === 2).count()
    assert(copies == 8)
  }

  test("dedup_minhash finds every exact-dup pair with jac 1.0") {
    val got = Dedup.queries("dedup_minhash")(spark, SparkSpec.sf01)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    exactDupPairs.foreach { p =>
      assert(got.contains(p), s"minhash missed exact dup $p")
      assert(got(p) == 1.0, s"exact dup $p jac ${got(p)} != 1.0")
    }
    assert(got.values.forall(_ >= 0.8))
  }

  test("dedup_simhash: exact dups have hamming 0; output sorted") {
    val rows = Dedup.queries("dedup_simhash")(spark, SparkSpec.sf01)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2)))
    val got = rows.toMap
    exactDupPairs.foreach { p =>
      assert(got.get(p).contains(0), s"exact dup $p missing/nonzero")
    }
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted)
  }

  test("native SimHash64 == composable explode/agg signature, corpus" +
      " + edge strings") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val s = spark
    import s.implicits._
    // full sf0.01 corpus
    val docs = graft.Tables.documents(spark, SparkSpec.sf001)
    val mism = Dedup.simhash(docs)
      .join(docs.select(org.apache.spark.sql.functions.col("doc_id"),
        graft.functions.GraftFunctions.simHash64(
          org.apache.spark.sql.functions.col("text")).as("nsig")),
        "doc_id")
      .filter(org.apache.spark.sql.functions.col("sig") =!=
        org.apache.spark.sql.functions.col("nsig"))
      .count()
    assert(mism == 0L, s"$mism corpus signatures diverge")
    // edge strings: empty, consecutive/leading/trailing separators
    // (split keeps empty tokens), single token, non-ASCII
    val edge = Seq((1L, ""), (2L, " "), (3L, "a  b"), (4L, " x "),
      (5L, "solo"), (6L, "数据 处理 引擎"))
      .toDF("doc_id", "text")
    val em = Dedup.simhash(edge)
      .join(edge.select(org.apache.spark.sql.functions.col("doc_id"),
        graft.functions.GraftFunctions.simHash64(
          org.apache.spark.sql.functions.col("text")).as("nsig")),
        "doc_id")
      .collect()
    em.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"edge doc ${r.getLong(0)}: ${r.getLong(1)} != ${r.getLong(2)}"))
  }

  test("dedup_clusters: labels are component minima over the pair graph") {
    val pairs = Dedup.queries("dedup_minhash")(spark, SparkSpec.sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val rows = Dedup.queries("dedup_clusters")(spark, SparkSpec.sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val label = rows.map(r => r._1 -> r._2).toMap
    // every paired doc is labeled; endpoints of an edge share a label
    pairs.foreach { case (a, b) =>
      assert(label.contains(a) && label.contains(b))
      assert(label(a) == label(b), s"edge ($a,$b) split across clusters")
    }
    // the cluster id is a member of its own cluster and is the min
    rows.groupBy(_._2).foreach { case (c, rs) =>
      assert(rs.map(_._1).min == c)
      // size column matches the actual membership count
      assert(rs.forall(_._3 == rs.length))
    }
  }

  test("dedup_exact_fingerprint == dedup_exact (fp grouping is exact)") {
    Seq(SparkSpec.sf001, SparkSpec.sf01).foreach { sf =>
      val exact = Dedup.queries("dedup_exact")(spark, sf)
        .collect().map(_.toString).toSeq
      val viaFp = Dedup.queries("dedup_exact_fingerprint")(spark, sf)
        .collect().map(_.toString).toSeq
      assert(viaFp == exact, s"fingerprint dedup diverges at $sf")
    }
  }

  test("ccFixedPoint converges on a diameter-99 chain (pointer jump)") {
    // Pathological near-dup shape: one long chain (progressively
    // edited boilerplate), diameter far past what propagate-only
    // rounds could cover. 100 nodes 0-1-2-...-99, symmetric edges.
    val s = spark; import s.implicits._
    val edges = (0L until 99L)
      .flatMap(i => Seq((i, i + 1), (i + 1, i)))
      .toDF("a", "b")
    // localSolveMaxEdges = 0 forces the DISTRIBUTED pointer-jump path
    // (the default would take the small-graph union-find shortcut)
    val labels = Dedup.ccFixedPoint(edges, localSolveMaxEdges = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels.size == 100)
    assert(labels.values.forall(_ == 0L),
      "every chain node must label to the component min 0")
    // and the small-graph fast path agrees exactly
    val fast = Dedup.ccFixedPoint(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fast == labels, "fast path diverges from pointer jump")
  }

  test("ccFixedPoint matches union-find on seeded random graphs") {
    // Property check beyond the fixed chain fixtures: three seeded
    // random graphs (60 nodes, 80 directed edges) compared against a
    // driver-side union-find with min-root union — an independent
    // sequential algorithm for the same fixed point.
    val s = spark; import s.implicits._
    val rng = new scala.util.Random(11)
    (1 to 3).foreach { trial =>
      val n = 60
      val raw = Seq.fill(80)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x
        else { parent(x) = find(parent(x)); parent(x) }
      raw.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val sym = raw.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      // force the distributed path: comparing the fast path (itself a
      // union-find) against this spec's union-find would be circular
      val labels = Dedup.ccFixedPoint(sym.toDF("a", "b"),
          localSolveMaxEdges = 0).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val nodes = sym.map(_._1).distinct
      assert(labels.keySet == nodes.toSet)
      nodes.foreach { nd =>
        assert(labels(nd) == find(nd.toInt).toLong,
          s"trial $trial: node $nd labeled ${labels(nd)}, " +
            s"union-find says ${find(nd.toInt)}")
      }
    }
  }

  test("ccFixedPoint retry path: cap doubles once, then converges") {
    // A component just past the configured round cap must degrade to
    // a slower run (one logged cap doubling), not a dead query: a
    // 64-node chain needs ~7 propagate+shortcut rounds, so
    // maxRounds=5 is insufficient and the extension to 10 carries it
    // through.
    val s = spark; import s.implicits._
    val edges = (0L until 63L)
      .flatMap(i => Seq((i, i + 1), (i + 1, i)))
      .toDF("a", "b")
    val warnings = scala.collection.mutable.Buffer[String]()
    val labels = Dedup.ccFixedPoint(edges, maxRounds = 5,
        log = warnings += _, localSolveMaxEdges = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(warnings.exists(_.contains("extending once")),
      "the cap extension should have fired and logged")
    assert(labels.size == 64)
    assert(labels.values.forall(_ == 0L),
      "every chain node must label to the component min 0")
  }

  test("ccFixedPoint converges to empty on an empty edge set") {
    // A corpus with zero near-dup pairs must yield zero clusters,
    // not NPE the label-sum convergence check.
    val s = spark; import s.implicits._
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.ccFixedPoint(edges).count() == 0)
    // the distributed path too (localSolveMaxEdges = -1 disables the
    // fast path even for the empty frame)
    assert(Dedup.ccFixedPoint(edges, localSolveMaxEdges = -1).count() == 0)
  }

  test("ccFixedPoint labels disjoint components independently") {
    val s = spark; import s.implicits._
    // two chains + an isolated pair: 0..30, 100..140, 500-501
    val comps = Seq((0L, 30L, 0L), (100L, 140L, 100L), (500L, 501L, 500L))
    val edges = comps.flatMap { case (lo, hi, _) =>
      (lo until hi).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    }.toDF("a", "b")
    val labels = Dedup.ccFixedPoint(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    comps.foreach { case (lo, hi, want) =>
      (lo to hi).foreach(n => assert(labels(n) == want,
        s"node $n labeled ${labels(n)}, expected $want"))
    }
  }

  test("dedup_near is idempotent on a deduped corpus") {
    // After dropping the 8 higher-id exact copies, rerunning exact
    // dedup changes nothing (idempotence property).
    val docs = graft.Tables.documents(spark, SparkSpec.sf01)
    val survivors = docs.groupBy("text")
      .agg(min("doc_id").as("doc_id"))
    val again = survivors.groupBy("text").count()
      .filter(col("count") > 1).count()
    assert(again == 0)
  }
}
