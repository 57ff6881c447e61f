package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Category F — sorts, limits, top-k, set operations (SURVEY.md §2.1.F).
  *
  * Global ORDER BY + LIMIT plans as TakeOrderedAndProject: per-partition
  * top-k then a driver-side k-merge — O(k) driver memory at any scale,
  * never a full global sort. Set ops are hash-based shuffles on the
  * full row.
  */
object SetsSorts {

  val queries: Map[String, Q] = Map(
    // Multi-key sort, mixed asc/desc, LIMIT.
    "sort_multikey" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber")
        .orderBy(col("l_returnflag").asc, col("l_extendedprice").desc,
          col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(100)),

    // Global top-k (TakeOrderedAndProject).
    "topk_global" -> ((s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)),

    // Bag union: high-value customers + high-balance suppliers.
    "set_union_all" -> ((s, d) => {
      val c = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
        .select(col("c_name").as("name"), col("c_acctbal").as("bal"))
      val sup = Tables.supplier(s, d).filter(col("s_acctbal") > 9000)
        .select(col("s_name").as("name"), col("s_acctbal").as("bal"))
      c.unionAll(sup).orderBy("name")
    }),

    // Set union (dedup).
    "set_union_distinct" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val sup = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      c.union(sup).distinct().orderBy("nationkey")
    }),

    // INTERSECT: nation keys present on both sides.
    "set_intersect" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val sup = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      c.intersect(sup).orderBy("nationkey")
    }),

    // EXCEPT: nations with customers but no top-balance supplier
    // (supplier side filtered so the difference is non-empty at every
    // scale factor — see FIXTURES.md distributions).
    "set_except" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val sup = Tables.supplier(s, d).filter(col("s_acctbal") > 9800)
        .select(col("s_nationkey").as("nationkey"))
      c.except(sup).orderBy("nationkey")
    }),

    // BAG semantics (EXCEPT ALL / INTERSECT ALL): multiplicities
    // subtract / take the minimum instead of collapsing to distinct —
    // the other half of the set-op family (SQL:2003 ALL variants,
    // `Dataset.exceptAll`/`intersectAll`). Aggregated per key so the
    // multiplicity arithmetic is visible in the output.
    "set_except_all" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val sup = Tables.supplier(s, d)
        .select(col("s_nationkey").as("nationkey"))
      c.exceptAll(sup)
        .groupBy("nationkey").agg(count(lit(1)).as("n"))
        .orderBy("nationkey")
    }),

    "set_intersect_all" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val sup = Tables.supplier(s, d)
        .select(col("s_nationkey").as("nationkey"))
      c.intersectAll(sup)
        .groupBy("nationkey").agg(count(lit(1)).as("n"))
        .orderBy("nationkey")
    })
  )

  val oracles: Map[String, String] = Map(
    "sort_multikey" ->
      """SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber
        |FROM lineitem
        |ORDER BY l_returnflag ASC, l_extendedprice DESC,
        |         l_orderkey ASC, l_linenumber ASC
        |LIMIT 100""".stripMargin,

    "topk_global" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin,

    "set_union_all" ->
      """SELECT * FROM (
        |  SELECT c_name AS name, c_acctbal AS bal FROM customer
        |  WHERE c_acctbal > 9000
        |  UNION ALL
        |  SELECT s_name AS name, s_acctbal AS bal FROM supplier
        |  WHERE s_acctbal > 9000
        |) t ORDER BY name""".stripMargin,

    "set_union_distinct" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "set_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9800
        |ORDER BY nationkey""".stripMargin,

    "set_except_all" ->
      """SELECT nationkey, count(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  EXCEPT ALL
        |  SELECT s_nationkey AS nationkey FROM supplier
        |) t GROUP BY nationkey ORDER BY nationkey""".stripMargin,

    "set_intersect_all" ->
      """SELECT nationkey, count(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  INTERSECT ALL
        |  SELECT s_nationkey AS nationkey FROM supplier
        |) t GROUP BY nationkey ORDER BY nationkey""".stripMargin
  )
}
