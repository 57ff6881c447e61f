package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Sampling operators — the data-mixing/subsampling stage of a
  * training-data pipeline (declared no-oracle: sampling is
  * seed-deterministic on a fixed input partitioning, which the
  * RegistrySpec double-run asserts, but is not SQL-portable).
  *
  * Scale notes: `sample`/`sampleBy` are per-partition Bernoulli draws
  * — no shuffle, no driver state, linear scans that parallelize
  * perfectly. The hash-based variant IS cross-engine deterministic
  * (pure function of the key), making reproducible train/eval splits
  * portable across engines — that one carries an oracle.
  */
object Sampling {

  val queries: Map[String, Q] = Map(
    // Seeded Bernoulli sample of lineitem.
    "sample_fraction" -> ((s, d) =>
      Tables.lineitem(s, d)
        .sample(withReplacement = false, fraction = 0.1, seed = 42)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    // Stratified sample: per-language fractions over documents
    // (upsample rare langs, downsample en — the classic data-mix op).
    "sample_stratified" -> ((s, d) => {
      val fractions = Map("en" -> 0.2, "de" -> 0.8, "es" -> 0.8,
        "fr" -> 0.8, "zh" -> 0.8)
      Tables.documents(s, d)
        .stat.sampleBy("lang", fractions, seed = 42)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),

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
    "sample_hash_split" ->
      """SELECT lang,
        | CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
        |   THEN 'eval' ELSE 'train' END AS split,
        | count(*) AS n
        |FROM documents GROUP BY 1, 2 ORDER BY lang, split""".stripMargin
  )
}
