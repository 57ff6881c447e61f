package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation: salted equi-join.
  *
  * AQE's skew-join handles most cases at runtime (PLANS.md), but the
  * classic explicit form still matters when one build-side key is so
  * hot that even split shuffle blocks overload a task — e.g. one
  * vessel emitting half the AIS stream. The fact side gets a
  * deterministic salt derived from a high-cardinality column; the
  * dimension side is replicated across all salt values, so every
  * salted key still finds its match and the hot key's rows spread
  * over `saltBuckets` tasks.
  *
  * Replication cost = dim_rows × saltBuckets — use only with a small
  * dimension (it is broadcast-sized by definition here).
  */
object Skew {

  def saltedJoin(fact: DataFrame, dim: DataFrame, joinKey: String,
      saltFrom: String, saltBuckets: Int): DataFrame = {
    // saltFrom must be a DIFFERENT, higher-cardinality column than the
    // join key: a salt derived from the join key itself is constant
    // per key, so the hot key's rows would still land in one task —
    // a silent no-op of the whole mitigation.
    require(saltFrom != joinKey,
      s"saltFrom must differ from joinKey '$joinKey': a salt that is " +
        "a function of the join key cannot spread a hot key")
    // Fresh name so a real `_salt` column on either input can't be
    // captured by the join condition.
    val salt = s"_salt_${java.util.UUID.randomUUID.toString.take(8)}"
    val salted = fact.withColumn(salt,
      pmod(hash(col(saltFrom)), lit(saltBuckets)))
    val replicated = dim.withColumn(salt,
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(joinKey, salt)).drop(salt)
  }
}
