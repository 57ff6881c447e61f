package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Sampling operators — the data-mixing/subsampling stage of a
  * training-data pipeline.
  *
  * All three declared queries are HASH-THRESHOLD samples (round 9 —
  * previously the fraction/stratified pair rode Spark's seeded
  * Bernoulli draw, which is deterministic only inside Spark and so
  * sat in the no-oracle set): membership is a pure function of the
  * row key — `md5(key)` hex prefix compared LEXICOGRAPHICALLY
  * against a threshold. Lowercase hex strings of equal length order
  * exactly like their numeric values and every engine prints md5 the
  * same way, so the sample is reproducible in Spark, DuckDB, or a
  * shell pipeline, immune to partitioning/seed/row order — and
  * therefore oracle-checkable. A 5-hex-digit prefix gives 16^5 =
  * 1,048,576 buckets: threshold '19999' (= 104,857 buckets) is rate
  * 0.09999..., 'ccccc' is 0.79999... — the engineering definition IS
  * the threshold, not the decimal rate.
  *
  * Scale notes: per-row hash + compare — no shuffle, no driver
  * state, linear scans that parallelize perfectly; the Spark-seeded
  * `.sample`/`.sampleBy` forms remain available as engine-internal
  * twins ([[seededFraction]]/[[seededStratified]], spec-checked for
  * double-run determinism) for users who want Spark's faster
  * per-partition draw and don't need portability.
  */
object Sampling {

  /** Engine-internal seeded twins — Spark's native per-partition
    * Bernoulli draw (fast, seed-deterministic on a fixed input
    * partitioning, NOT portable across engines). Kept out of the
    * declared surface so every declared sampling query is
    * oracle-checked. */
  private[graft] def seededFraction(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Tables.lineitem(s, d)
      .sample(withReplacement = false, fraction = 0.1, seed = 42)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")

  private[graft] def seededStratified(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Tables.documents(s, d)
      .stat.sampleBy("lang",
        Map("en" -> 0.2, "de" -> 0.8, "es" -> 0.8, "fr" -> 0.8,
          "zh" -> 0.8), seed = 42)
      .select("doc_id", "lang")
      .orderBy("doc_id")

  val queries: Map[String, Q] = Map(
    // Portable Bernoulli(≈0.1) sample of lineitem: md5 of the
    // (orderkey, linenumber) composite, 5-hex prefix < '19999'.
    // NOTE the composite is NOT unique in this synthetic lineitem
    // (duplicate (orderkey, linenumber) pairs exist) — harmless for
    // membership (duplicates share one draw: still Bernoulli over
    // keys) but it forces l_quantity into the ORDER BY to keep the
    // output order total (SURVEY §2.0 compare contract).
    "sample_fraction" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(substring(md5(concat_ws("-",
          col("l_orderkey"), col("l_linenumber"))), 1, 5) < "19999")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")),

    // Portable stratified sample: per-language thresholds over
    // documents (downsample en to ≈0.2, keep others at ≈0.8 — the
    // classic data-mix op), as a CASE over the same md5 prefix.
    "sample_stratified" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(substring(md5(col("doc_id").cast("string")), 1, 5) <
          when(col("lang") === "en", "33333").otherwise("ccccc"))
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    // Deterministic hash split: stable train/eval assignment as a
    // pure function of the key (md5 hex is identical across engines)
    // — reproducible anywhere, immune to partitioning. ~1/16 eval.
    "sample_hash_split" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("split",
          when(substring(md5(col("doc_id").cast("string")), 1, 1) === "0",
            "eval").otherwise("train"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "split"))
  )

  val oracles: Map[String, String] = Map(
    "sample_fraction" ->
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem
        |WHERE substring(md5(CAST(l_orderkey AS VARCHAR) || '-' ||
        |    CAST(l_linenumber AS VARCHAR)), 1, 5) < '19999'
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,

    "sample_stratified" ->
      """SELECT doc_id, lang
        |FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 5) <
        |  CASE WHEN lang = 'en' THEN '33333' ELSE 'ccccc' END
        |ORDER BY doc_id""".stripMargin,

    "sample_hash_split" ->
      """SELECT lang,
        | CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
        |   THEN 'eval' ELSE 'train' END AS split,
        | count(*) AS n
        |FROM documents GROUP BY 1, 2 ORDER BY lang, split""".stripMargin
  )
}
