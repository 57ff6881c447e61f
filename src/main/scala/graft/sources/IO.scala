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

  /** Persist as a bucketed + sorted managed table: co-locates rows by
    * join key so equi-joins between tables bucketed the same way need
    * NO shuffle (SortMergeJoin reads pre-partitioned, pre-sorted
    * buckets). The lakehouse layout for the repeated big-big joins of
    * a 100-TB star schema — see BucketingSpec for the plan proof. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      bucketCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
