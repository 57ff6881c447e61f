package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}

/** Source/sink surface beyond the parquet tables (SURVEY.md §2.1.A):
  * thin, schema-explicit wrappers so user code never relies on
  * inference for production paths.
  *
  * 100-TB notes: readers accept directory globs (partitioned
  * layouts); writers default to snappy parquet and expose
  * partitionBy — the seam where a lakehouse layout (date/source
  * partition columns, sorted-within-file) is enforced.
  */
object IO {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String,
      header: Boolean = true, schemaDdl: Option[String] = None): DataFrame = {
    val r = spark.read.option("header", header.toString)
    schemaDdl.fold(r.option("inferSchema", "true"))(s => r.schema(s))
      .csv(path)
  }

  def readJson(spark: SparkSession, path: String,
      schemaDdl: Option[String] = None): DataFrame = {
    val r = spark.read
    schemaDdl.fold(r)(s => r.schema(s)).json(path)
  }

  private def writer(df: DataFrame,
      partitionBy: Seq[String]): DataFrameWriter[Row] = {
    val w = df.write.mode("overwrite")
    if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
  }

  def writeParquet(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit =
    writer(df, partitionBy).parquet(path)

  def writeCsv(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit =
    writer(df, partitionBy).option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit =
    writer(df, partitionBy).json(path)

  // ORC — the other columnar lakehouse format Spark supports
  // natively (predicate pushdown + column pruning work the same as
  // parquet through the DSv2 reader). Avro is deliberately absent:
  // the spark-avro connector jar is not on this classpath.
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit =
    writer(df, partitionBy).orc(path)

  /** Idempotent key-based upsert into a parquet target — MERGE
    * semantics without a table format: rows from `updates` replace
    * target rows with the same key; unmatched target rows survive;
    * re-applying the same batch is a no-op (exactly the property an
    * at-least-once ingest feed needs). Deterministic survivor when
    * `updates` itself carries duplicate keys: the row with the
    * highest `versionCol` wins, ties broken by preferring the update
    * over the target.
    *
    * Mechanics: full-outer-style anti+union rewrite into a temp dir,
    * then an atomic-enough swap (at 100 TB this is exactly what a
    * lakehouse MERGE compiles to — minus the transaction log, which
    * is out of scope for a file sink; callers needing concurrent
    * writers should layer a format with a log underneath). Cost is
    * one anti-join of target × update keys (broadcast when the batch
    * is small — the common ingest shape) + a rewrite of the target.
    *
    * Schema contract: target and updates share ONE schema by column
    * name (the union already required it — a mismatch failed the
    * merge). The target is read WITH the updates' schema, which
    * skips the parquet footer-inference job `spark.read.parquet`
    * would otherwise run per merge — at one merge per micro-batch
    * (the streaming upsert twin) that job is a scheduler round-trip
    * paid every batch. Because the declared schema replaces
    * inference, a physically different target (e.g. an int32 key
    * where the updates declare long) would otherwise surface as a
    * reader-dependent scan error mid-job — so one target footer is
    * checked DRIVER-SIDE per merge (an FS open, not a Spark job):
    * every updates column must exist in the target with an equal type
    * or one on the explicit whitelist of widenings the Spark 4
    * vectorized parquet reader actually performs, else the merge
    * fails fast with a named-column error. (The first cut used
    * `Cast.canUpCast`, which is strictly BROADER than the reader —
    * e.g. it allows atomic→string — so an incompatible target could
    * pass the guard and still die mid-job; r17 advice.)
    */
  def upsertParquet(spark: SparkSession, targetPath: String,
      updates: DataFrame, keyCols: Seq[String],
      versionCol: String): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc)
    val dedupedUpdates = updates
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    val hconf = spark.sessionState.newHadoopConf()
    val dstPath = new org.apache.hadoop.fs.Path(targetPath)
    val dstFs = dstPath.getFileSystem(hconf)
    val merged =
      if (!dstFs.exists(dstPath)) dedupedUpdates
      else {
        assertUpsertTargetCompatible(hconf, dstFs, dstPath,
          dedupedUpdates.schema)
        val target =
          spark.read.schema(dedupedUpdates.schema).parquet(targetPath)
        target.join(broadcast(dedupedUpdates.select(keyCols.map(col): _*)),
            keyCols, "left_anti")
          .unionByName(dedupedUpdates)
      }
    // Write the merge to a sibling tmp dir FIRST (the read of the old
    // target completes inside this action), then swap. Single-writer
    // assumption, stated in the scaladoc.
    val tmp = new org.apache.hadoop.fs.Path(targetPath + ".tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    dstFs.delete(dstPath, true)
    dstFs.rename(tmp, dstPath)
  }

  /** The type widenings the Spark 4 vectorized parquet reader
    * supports when the declared read schema is wider than the file
    * (SPARK-40876 lineage: integral upcasts, int→double, float→
    * double, decimal widening that keeps every integer digit, and
    * date→timestamp_ntz). Deliberately NOT `Cast.canUpCast`: that
    * predicate admits casts (any atomic→string, int→decimal beyond
    * the reader's set, …) the reader cannot execute, and this guard
    * exists precisely to fail BEFORE the reader does. */
  private[sources] def readerWidenable(
      from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    val intRank = Map[DataType, Int](
      ByteType -> 1, ShortType -> 2, IntegerType -> 3, LongType -> 4)
    (from, to) match {
      case (f, t) if f == t => true
      case (f, t) if intRank.contains(f) && intRank.contains(t) =>
        intRank(f) < intRank(t)
      case (ByteType | ShortType | IntegerType, DoubleType) => true
      case (FloatType, DoubleType) => true
      case (f: DecimalType, t: DecimalType) =>
        t.scale >= f.scale &&
          t.precision - t.scale >= f.precision - f.scale
      case (DateType, TimestampNTZType) => true
      case _ => false
    }
  }

  /** Fail-fast guard for [[upsertParquet]]'s declared-schema read:
    * reads ONE part-file footer on the driver (no job, no inference
    * pass over the directory) and asserts every updates column exists
    * in the target with an equal or [[readerWidenable]] type.
    * Matching is exact by name (the merge's unionByName is too). */
  private def assertUpsertTargetCompatible(
      hconf: org.apache.hadoop.conf.Configuration,
      dstFs: org.apache.hadoop.fs.FileSystem,
      dstPath: org.apache.hadoop.fs.Path,
      expected: org.apache.spark.sql.types.StructType): Unit = {
    val part = dstFs.listStatus(dstPath).map(_.getPath)
      .filter(p => p.getName.startsWith("part-")
        && p.getName.endsWith(".parquet"))
      .sortBy(_.getName).headOption
    part.foreach { p =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, hconf))
      val fileSchema =
        try {
          new org.apache.spark.sql.execution.datasources.parquet
            .ParquetToSparkSchemaConverter()
            .convert(reader.getFooter.getFileMetaData.getSchema)
        } finally reader.close()
      val fileTypes = fileSchema.fields.map(f => f.name -> f.dataType).toMap
      expected.fields.foreach { f =>
        fileTypes.get(f.name) match {
          case None => throw new IllegalArgumentException(
            s"upsertParquet: target $dstPath lacks column '${f.name}' "
              + "required by the updates schema (target columns: "
              + fileSchema.fieldNames.mkString(", ") + ")")
          case Some(t) if !readerWidenable(t, f.dataType) =>
            throw new IllegalArgumentException(
              s"upsertParquet: target column '${f.name}' is stored as "
                + s"$t, which is not readable as the updates' declared "
                + s"${f.dataType}; rewrite the target or align the "
                + "updates schema")
          case _ =>
        }
      }
    }
  }

  /** Persist as a bucketed + sorted managed table: co-locates rows by
    * join key so equi-joins between tables bucketed the same way need
    * NO shuffle (SortMergeJoin reads pre-partitioned, pre-sorted
    * buckets). The lakehouse layout for the repeated big-big joins of
    * a 100-TB star schema — see BucketingSpec for the plan proof.
    * `path` makes the table EXTERNAL at that location (so callers can
    * keep scratch data out of the session's warehouse dir). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      bucketCols: Seq[String], path: Option[String] = None): Unit = {
    import org.apache.spark.sql.functions.col
    // ONE file per bucket: repartition on the bucket columns with
    // numPartitions = buckets — Spark's bucket id is pmod(murmur3,
    // buckets), the same function HashPartitioning applies, so each
    // writer task holds exactly its bucket and writes exactly one
    // file. Without this, every upstream partition emits a file per
    // bucket it touches (measured r17: a 32-partition frame × 32
    // buckets = 1024 ~9 kB files, and EVERY later scan paid ~15-20 s
    // of per-file open/footer overhead — the layout tax dominated the
    // layout's benefit). One file per bucket also makes sortBy a
    // total per-bucket order, which is what lets a later merge-join
    // skip its sort. Write parallelism = buckets; callers size
    // `buckets` for their data, not for write concurrency.
    val w = df.repartition(buckets, bucketCols.map(col): _*)
      .write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }
}
