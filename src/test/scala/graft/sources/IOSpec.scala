package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Source/sink roundtrips for the non-parquet formats. */
class IOSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-io").toString
    s"$d/$name"
  }

  test("upsertParquet: merge-by-key, idempotent, version-resolved") {
    val s = spark
    import s.implicits._
    val path = tmp("upsert")
    // initial load
    IO.upsertParquet(spark, path,
      Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
        .toDF("id", "v", "ver"), Seq("id"), "ver")
    // batch: update id=2, insert id=4, with an in-batch dup for id=4
    // (ver 3 must win over ver 2)
    val batch = Seq((2L, "B", 2L), (4L, "d", 2L), (4L, "D", 3L))
      .toDF("id", "v", "ver")
    IO.upsertParquet(spark, path, batch, Seq("id"), "ver")
    def state() = spark.read.parquet(path).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val after = state()
    assert(after == Seq((1L, "a", 1L), (2L, "B", 2L), (3L, "c", 1L),
      (4L, "D", 3L)))
    // idempotence: re-applying the same batch changes nothing
    IO.upsertParquet(spark, path, batch, Seq("id"), "ver")
    assert(state() == after)
  }

  test("upsert target-compat guard: whitelist matches what the " +
      "vectorized reader can actually widen (r17 advice)") {
    import org.apache.spark.sql.types._
    // Positive: the reader-supported widenings.
    for ((f, t) <- Seq(
        IntegerType -> IntegerType, ByteType -> ShortType,
        ByteType -> LongType, ShortType -> IntegerType,
        IntegerType -> LongType, IntegerType -> DoubleType,
        FloatType -> DoubleType, DateType -> TimestampNTZType,
        DecimalType(10, 2) -> DecimalType(12, 2),
        DecimalType(10, 2) -> DecimalType(14, 4)))
      assert(IO.readerWidenable(f, t), s"$f -> $t should be widenable")
    // Negative: narrowings, and casts Cast.canUpCast ADMITS but the
    // reader cannot perform — the exact gap the guard had.
    for ((f, t) <- Seq(
        LongType -> IntegerType, DoubleType -> FloatType,
        IntegerType -> StringType, // canUpCast says yes; reader dies
        DateType -> StringType, LongType -> DoubleType,
        DecimalType(12, 2) -> DecimalType(10, 2),
        DecimalType(10, 2) -> DecimalType(10, 4), // loses int digits
        StringType -> LongType, TimestampNTZType -> DateType))
      assert(!IO.readerWidenable(f, t), s"$f -> $t must be rejected")
    assert(org.apache.spark.sql.catalyst.expressions.Cast
      .canUpCast(IntegerType, StringType),
      "premise: canUpCast admits int->string (why the whitelist exists)")
    // End-to-end: an int32 target with long-declared updates passes
    // the guard and merges; a string-declared updates column over the
    // same int32 target fails FAST with the named column.
    val s = spark
    import s.implicits._
    val path = tmp("upsert_widen")
    Seq((1, 1L), (2, 1L)).toDF("id", "ver")
      .write.mode("overwrite").parquet(path)
    IO.upsertParquet(spark, path,
      Seq((2L, 2L), (3L, 2L)).toDF("id", "ver"), Seq("id"), "ver")
    assert(spark.read.parquet(path).count() == 3)
    val e = intercept[IllegalArgumentException] {
      IO.upsertParquet(spark, tmpIntTarget(), Seq(("x", 1L))
        .toDF("id", "ver"), Seq("id"), "ver")
    }
    assert(e.getMessage.contains("'id'"), e.getMessage)
    // Premise checks: each non-integral whitelisted widening is one
    // the vectorized reader actually performs (the whitelist must be
    // a SUBSET of reader behavior, or the guard waves through a
    // mid-job death).
    def roundtrip(write: org.apache.spark.sql.DataFrame,
        readAs: DataType): org.apache.spark.sql.Row = {
      val p = tmp(s"widen_${readAs.simpleString.replaceAll("[^a-z0-9]", "_")}")
      write.write.mode("overwrite").parquet(p)
      spark.read.schema(StructType(Seq(StructField("c", readAs))))
        .parquet(p).head()
    }
    assert(roundtrip(Seq(7).toDF("c"), LongType).getLong(0) == 7L)
    assert(roundtrip(Seq(7).toDF("c"), DoubleType).getDouble(0) == 7.0)
    assert(roundtrip(Seq(1.5f).toDF("c"), DoubleType).getDouble(0) == 1.5)
    assert(roundtrip(
      Seq("12345678.91").toDF("c")
        .select(col("c").cast(DecimalType(10, 2)).as("c")),
      DecimalType(14, 4)).getDecimal(0)
      == new java.math.BigDecimal("12345678.9100"))
    assert(roundtrip(
      Seq(java.sql.Date.valueOf("2024-03-01")).toDF("c"),
      TimestampNTZType).getAs[java.time.LocalDateTime](0)
      == java.time.LocalDateTime.of(2024, 3, 1, 0, 0))
  }

  private def tmpIntTarget(): String = {
    val s = spark
    import s.implicits._
    val p = tmp("upsert_str_over_int")
    Seq((1, 1L)).toDF("id", "ver").write.mode("overwrite").parquet(p)
    p
  }

  test("memoized-setup queries: second in-session invocation returns" +
      " the identical result") {
    // source_bucketed_join memoizes the bucketed layout write and
    // sink_upsert_merge the base snapshot write per (session, dir) —
    // the declared ops are the shuffle-free join and the MERGE, not
    // the setup I/O. The contract that makes memoization safe is
    // that a SECOND invocation (merge replayed onto the already-
    // merged target; join over the already-written layout) returns
    // byte-identical rows — pin it, since Bench's pass2 and any
    // long-lived session rely on exactly this.
    Seq("source_bucketed_join", "sink_upsert_merge").foreach { q =>
      val first = graft.SparkEntry.queries(q)(spark, SparkSpec.sf001)
        .collect().map(_.mkString("|")).toSeq
      val second = graft.SparkEntry.queries(q)(spark, SparkSpec.sf001)
        .collect().map(_.mkString("|")).toSeq
      assert(first.nonEmpty && first == second,
        s"$q drifted between in-session invocations")
    }
  }

  test("orc roundtrip preserves schema exactly; filters push down") {
    val lineitem = graft.Tables.lineitem(spark, SparkSpec.sf0001)
      .select("l_orderkey", "l_quantity", "l_returnflag")
    val path = tmp("lineitem_orc")
    IO.writeOrc(lineitem, path)
    val back = IO.readOrc(spark, path)
    assert(back.schema == lineitem.schema) // columnar: no inference loss
    assert(back.count() == lineitem.count())
    // Pushdown reaches the ORC reader just like parquet (same DSv2
    // scan machinery) — the property that makes the format a peer
    // sink at scale.
    val plan = back.filter(col("l_quantity") > 25)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("l_quantity"), s"no ORC pushdown in:\n$plan")
  }

  test("csv roundtrip preserves rows under an explicit schema") {
    val nation = graft.Tables.nation(spark, SparkSpec.sf0001)
    val path = tmp("nation_csv")
    IO.writeCsv(nation, path)
    val back = IO.readCsv(spark, path,
      schemaDdl = Some("n_nationkey INT, n_name STRING, n_regionkey INT"))
    assert(back.count() == 25)
    assert(back.schema.map(_.dataType.typeName).toSeq
      == Seq("integer", "string", "integer"))
    val names = back.select("n_name").orderBy("n_name")
      .collect().map(_.getString(0))
    assert(names.length == 25 && names.head == "NATION_0")
  }

  test("json roundtrip preserves values and nested-free schema") {
    val docs = graft.Tables.documents(spark, SparkSpec.sf0001).limit(50)
    val path = tmp("docs_json")
    IO.writeJson(docs, path)
    val back = IO.readJson(spark, path,
      schemaDdl = Some(
        "doc_id BIGINT, text STRING, lang STRING, source STRING," +
          " n_chars BIGINT"))
    assert(back.count() == 50)
    val chk = back.agg(sum(length(col("text"))).as("c"),
        sum("n_chars").as("n")).collect()(0)
    assert(chk.getLong(0) == chk.getLong(1)) // n_chars == len(text)
  }

  test("partitioned parquet write prunes directories on read") {
    val docs = graft.Tables.documents(spark, SparkSpec.sf0001)
    val path = tmp("docs_part")
    IO.writeParquet(docs, path, partitionBy = Seq("lang"))
    // partition dirs exist
    val dirs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("lang=")))
    // partition filter prunes to one dir's rows
    val en = IO.readParquet(spark, path).filter(col("lang") === "en")
    val plan = en.queryExecution.executedPlan.toString
    assert(en.count() ==
      docs.filter(col("lang") === "en").count())
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      plan.take(400))
  }
}
