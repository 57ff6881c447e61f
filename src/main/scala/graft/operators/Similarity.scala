package graft.operators

import graft.{Q, Tables}
import graft.functions.GraftFunctions
import graft.functions.GraftFunctions.vecDot
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Category I (similarity half) — vector similarity search over
  * `embeddings` (SURVEY.md §2.1.I + training-data-pipeline mandate).
  *
  * `similarity_knn` / `similarity_topk_per_query` are the exact
  * brute-force baselines (all-pairs cosine). `ann_lsh` is the scale
  * path: random-hyperplane LSH buckets vectors so each query only
  * scores its bucket — the bucket join replaces the cross join, which
  * is what survives 100 TB.
  *
  * Perf shape: squared norms are computed ONCE per vector before the
  * pair join (not per pair), and the per-pair dot product is the
  * native codegen'd [[graft.functions.expressions.VecDot]] — double
  * accumulation in element order, so 4-dp rounds hash-match DuckDB's
  * `list_cosine_similarity(CAST(… AS DOUBLE[]))`.
  */
object Similarity {

  /** embeddings + precomputed squared norm (one pass, n rows). */
  private def vecs(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.ensureRegistered(s)
    Tables.embeddings(s, d)
      .withColumn("nsq", vecDot(col("embedding"), col("embedding")))
  }

  /** Scored vector pairs under the given join predicate (the
    * predicate lives IN the join so pruned pairs never reach the dot
    * product). */
  private def pairs(s: SparkSession, d: String,
      cond: org.apache.spark.sql.Column): DataFrame = {
    val e = vecs(s, d)
    val a = e.select(col("vec_id").as("v1"), col("embedding").as("ea"),
      col("nsq").as("na"))
    val b = e.select(col("vec_id").as("v2"), col("embedding").as("eb"),
      col("nsq").as("nb"))
    a.join(b, cond)
      .withColumn("cos", round(
        vecDot(col("ea"), col("eb")) / sqrt(col("na") * col("nb")), 4))
  }

  /** Deterministic random hyperplanes: nPlanes x dim coefficients from
    * a fixed-seed PRNG (stable across runs and JVMs). */
  def hyperplanes(nPlanes: Int, dim: Int): Seq[(Int, Seq[Double])] = {
    val rng = new java.util.Random(42)
    (0 until nPlanes).map(p => (p, Seq.fill(dim)(rng.nextGaussian())))
  }

  val queries: Map[String, Q] = Map(
    // Global top-20 most-similar pairs (v1 < v2), brute force.
    "similarity_knn" -> ((s, d) =>
      pairs(s, d, col("v1") < col("v2"))
        .select("v1", "v2", "cos")
        .orderBy(col("cos").desc, col("v1"), col("v2"))
        .limit(20)),

    // Per-query top-5 neighbors with rank, brute force. Cosine is
    // symmetric, so score each unordered pair ONCE (v1 < v2) and
    // mirror the scored rows — halves the O(n²) dot products; the
    // mirror union is a cheap narrow-row projection. (Measured: a
    // row_number window over the mirrored rows beats per-group
    // collect_list+array_sort top-k ~2x here — struct array buffers
    // don't pay off at this group size.)
    "similarity_topk_per_query" -> ((s, d) => {
      val half = pairs(s, d, col("v1") < col("v2"))
        .select("v1", "v2", "cos")
      val full = half.unionAll(half.select(
        col("v2").as("v1"), col("v1").as("v2"), col("cos")))
      val w = Window.partitionBy("v1")
        .orderBy(col("cos").desc, col("v2"))
      full
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select("v1", "rk", "v2", "cos")
        .orderBy("v1", "rk")
    }),

    // ANN: multi-table random-hyperplane LSH (4 tables x 5 bits) ->
    // per-table bucket join -> union of candidates -> exact cosine ->
    // top-3 per query. No-oracle (approximate by construction);
    // AnnSpec measures recall against the brute-force twin. The
    // bucket join + candidate-union is the 100-TB shape: cost is
    // O(n * bucket_occupancy * tables), never O(n^2).
    "ann_lsh" -> ((s, d) => {
      val nTables = 6
      // Bucket fan-out scales with collection size (targets ~64
      // vectors/bucket) — the one O(1) driver-side action here is the
      // count, which any planner would take.
      val n = Tables.embeddings(s, d).count()
      val bitsPerTable = math.max(4,
        (math.log(n / 64.0) / math.log(2)).ceil.toInt)
      val planes = hyperplanes(nPlanes = nTables * bitsPerTable, dim = 64)
        .map { case (p, cs) => (p / bitsPerTable, p % bitsPerTable, cs) }
      val planesDf = broadcast(
        s.createDataFrame(planes).toDF("tbl", "bit_pos", "coef"))
      val sigs = vecs(s, d).crossJoin(planesDf)
        .withColumn("bit",
          when(vecDot(col("embedding"), col("coef")) >= 0,
            expr("shiftleft(1, CAST(bit_pos AS INT))")).otherwise(0))
        .groupBy("vec_id", "embedding", "nsq", "tbl")
        .agg(sum("bit").as("bucket"))
      val a = sigs.select(col("vec_id").as("v1"),
        col("embedding").as("ea"), col("nsq").as("na"),
        col("tbl"), col("bucket"))
      val b = sigs.select(col("vec_id").as("v2"),
        col("embedding").as("eb"), col("nsq").as("nb"),
        col("tbl"), col("bucket"))
      // Cosine is computed BEFORE the candidate dedup so only narrow
      // (v1, v2, cos) rows shuffle — re-scoring a pair that collides
      // in two tables is cheaper than shuffling two 64-float arrays.
      val w = Window.partitionBy("v1")
        .orderBy(col("cos").desc, col("v2"))
      a.join(b, Seq("tbl", "bucket"))
        .filter(col("v1") =!= col("v2"))
        .withColumn("cos", round(
          vecDot(col("ea"), col("eb")) / sqrt(col("na") * col("nb")), 4))
        .select("v1", "v2", "cos")
        .dropDuplicates("v1", "v2")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("v1", "rk", "v2", "cos")
        .orderBy("v1", "rk")
    }),

    // ANN via IVF: coarse-quantize into ~sqrt-scale cells (one Lloyd
    // step from deterministic seeds), probe each query's 2 nearest
    // cells, exact cosine inside the probed cells, top-3. No-oracle
    // (approximate); AnnSpec measures recall. The per-cell join is
    // the IVF scale shape: candidates ~ n * nprobe / k, never n².
    "ann_ivf" -> ((s, d) => {
      val n = Tables.embeddings(s, d).count()
      val k = math.max(4, math.sqrt(n / 2.0).ceil.toInt)
      val (assigned, means) = ivfIndex(s, d, k)
      val wProbe = Window.partitionBy("vec_id")
        .orderBy(col("pcos").desc, col("pcell"))
      val probes = assigned.crossJoin(
          broadcast(means.select(col("cell").as("pcell"),
            col("centroid"), col("cnsq"))))
        .withColumn("pcos",
          vecDot(col("embedding"), col("centroid"))
            / sqrt(col("nsq") * col("cnsq")))
        .withColumn("prk", row_number().over(wProbe))
        .filter(col("prk") <= 2)
        .select(col("vec_id").as("v1"), col("embedding").as("ea"),
          col("nsq").as("na"), col("pcell"))
      val members = assigned.select(col("vec_id").as("v2"),
        col("embedding").as("eb"), col("nsq").as("nb"),
        col("cell").as("pcell"))
      val wTop = Window.partitionBy("v1")
        .orderBy(col("cos").desc, col("v2"))
      probes.join(members, Seq("pcell"))
        .filter(col("v1") =!= col("v2"))
        .withColumn("cos", round(
          vecDot(col("ea"), col("eb")) / sqrt(col("na") * col("nb")), 4))
        .select("v1", "v2", "cos")
        .dropDuplicates("v1", "v2")
        .withColumn("rk", row_number().over(wTop))
        .filter(col("rk") <= 3)
        .select("v1", "rk", "v2", "cos")
        .orderBy("v1", "rk")
    })
  )

  /** IVF index build: deterministic seeds (k lowest vec_ids) + one
    * Lloyd step (assign to nearest centroid by cosine, recompute
    * element-wise mean, re-assign). Returns (assignments with columns
    * vec_id/embedding/nsq/cell, centroid means with cell/centroid/
    * cnsq). */
  def ivfIndex(s: SparkSession, d: String,
      k: Int): (DataFrame, DataFrame) = {
    GraftFunctions.ensureRegistered(s)
    val v = vecs(s, d)
    def nearest(cents: DataFrame): DataFrame =
      v.crossJoin(broadcast(cents))
        .withColumn("cos",
          vecDot(col("embedding"), col("centroid"))
            / sqrt(col("nsq") * col("cnsq")))
        .groupBy("vec_id", "embedding", "nsq")
        .agg(max_by(col("cell"),
          struct(col("cos"), -col("cell"))).as("cell"))
    def meansOf(assigned: DataFrame): DataFrame = assigned
      .select(col("cell"), posexplode(col("embedding")))
      .groupBy("cell", "pos").agg(avg(col("col")).as("m"))
      .groupBy("cell")
      .agg(expr("transform(array_sort(collect_list(struct(pos, m)))," +
        " s -> s.m)").as("centroid"))
      .withColumn("cnsq", vecDot(col("centroid"), col("centroid")))
    val seeds = v.orderBy("vec_id").limit(k)
      .select(col("vec_id"), col("embedding"))
      .withColumn("cell",
        (row_number().over(Window.orderBy("vec_id")) - 1))
      .select(col("cell"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("centroid"))
      .withColumn("cnsq", vecDot(col("centroid"), col("centroid")))
    val means = meansOf(nearest(seeds)) // one Lloyd step
    (nearest(means), means)
  }

  val oracles: Map[String, String] = Map(
    "similarity_knn" ->
      """SELECT a.vec_id AS v1, b.vec_id AS v2,
        | round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |   CAST(b.embedding AS DOUBLE[])), 4) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |ORDER BY cos DESC, v1, v2 LIMIT 20""".stripMargin,

    "similarity_topk_per_query" ->
      """SELECT v1, CAST(rk AS INTEGER) AS rk, v2, cos FROM (
        |  SELECT a.vec_id AS v1, b.vec_id AS v2,
        |    round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |      CAST(b.embedding AS DOUBLE[])), 4) AS cos,
        |    row_number() OVER (PARTITION BY a.vec_id
        |      ORDER BY round(list_cosine_similarity(
        |        CAST(a.embedding AS DOUBLE[]),
        |        CAST(b.embedding AS DOUBLE[])), 4) DESC, b.vec_id) AS rk
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        |) t WHERE rk <= 5 ORDER BY v1, rk""".stripMargin
  )
}
