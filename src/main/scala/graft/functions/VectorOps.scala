package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `array<float>` embedding columns.
  *
  * Everything here is built from codegen'd higher-order functions
  * (`zip_with` / `aggregate`) — no UDFs, so the hot path stays inside
  * WholeStageCodegen and the expressions survive pushdown/pruning.
  *
  * Floats are cast to double BEFORE any arithmetic and folded in array
  * order, matching DuckDB's `list_cosine_similarity(CAST(… AS
  * DOUBLE[]))` accumulation so 4-dp rounds are hash-stable across
  * engines.
  */
object VectorOps {

  /** Sum of an array<double> column in element order. */
  def arraySum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two float-array columns, double accumulation. */
  def dot(a: Column, b: Column): Column =
    arraySum(zip_with(a, b,
      (x, y) => x.cast("double") * y.cast("double")))

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity rounded to 4dp (cross-engine safe). */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / sqrt(normSq(a) * normSq(b)), 4)

  /** Cosine without rounding — for engine-internal ranking. */
  def cosineRaw(a: Column, b: Column): Column =
    dot(a, b) / sqrt(normSq(a) * normSq(b))
}
