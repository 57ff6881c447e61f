package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Category C — joins, every flavor (SURVEY.md §2.1.C).
  *
  * Scale notes (100 TB): equi-joins shuffle both sides on the key
  * unless one side is broadcast — dims (region/nation/part/customer)
  * are broadcast-size even at SF 100k, so `join_broadcast` pins that
  * strategy explicitly and the others leave Catalyst/AQE free to pick
  * it. The theta/as-of self-joins are equi on the entity id with a
  * range residual: Spark plans SMJ partitioned by user_id, so state is
  * bounded per key and never O(n²) globally.
  */
object Joins {

  val queries: Map[String, Q] = Map(
    // Equi inner join + aggregate: orders x customer -> per-segment totals.
    "join_inner" -> ((s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("total_price"))
        .orderBy("c_mktsegment")),

    // Same semantics, physical strategy pinned: broadcast the dim side.
    "join_broadcast" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
        .orderBy("p_brand")),

    // Left outer: every customer, order count may be 0.
    "join_left_outer" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("total_spend"))
        .orderBy("c_custkey")),

    // Right outer — the mirrored preserve-side flavor (the planner
    // may flip it into a left join; the declared semantics are what's
    // graded): every order keeps its row, unmatched (impossible here
    // by FK, but the operator's contract) pads the supplier side.
    // Built as orders ⟖ customer to exercise the RIGHT keyword path
    // rather than re-alias join_left_outer.
    "join_right_outer" -> ((s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"), "right")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum("o_totalprice"), lit(0.0)), 2)
            .as("total_spend"))
        .orderBy("c_custkey")),

    // Full outer: part usage, padded on both sides.
    "join_full_outer" -> ((s, d) => {
      val usage = Tables.lineitem(s, d)
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("n_li"), round(sum("l_quantity"), 2).as("qty"))
      Tables.part(s, d)
        .join(usage, col("p_partkey") === col("l_partkey"), "full_outer")
        .select(
          coalesce(col("p_partkey"), col("l_partkey")).as("partkey"),
          col("p_name"),
          coalesce(col("n_li"), lit(0L)).as("n_li"),
          coalesce(col("qty"), lit(0.0)).as("qty"))
        .orderBy("partkey")
    }),

    // Semi join (EXISTS): customers having a >400k order.
    "join_semi" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // Anti join (NOT EXISTS): customers with no URGENT order.
    "join_anti" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // Bounded cartesian product.
    "join_cross" -> ((s, d) =>
      Tables.region(s, d)
        .crossJoin(Tables.nation(s, d).filter(col("n_nationkey") < 5))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")),

    // Theta/range self-join: same-user event pairs within 60 s,
    // different types. TIME-BANDED since r18: the first form was equi
    // on user_id alone with the range as a residual, which evaluates
    // O(history²) candidate pairs PER USER — invisible at fixture SF,
    // but the r18 full-suite 100x point measured it at slope 1.97
    // (6.2 s → 578 s), the single undeclared quadratic in the suite.
    // The banded form adds the 60 s bucket to the join key (probe
    // side explodes into bucket and bucket+1 — any b.ts within
    // (a.ts, a.ts+60] lands in one of the two, and in exactly one,
    // so no dedup is needed): candidates become per-(user, minute)
    // occupancy², which the events axis holds CONSTANT as history
    // grows — the same band-coverage lemma join_range_banded uses on
    // the value axis. Same qualifying pairs, same oracle.
    "join_theta_range" -> ((s, d) => {
      val e = Tables.events(s, d).select("user_id", "ts", "event_type")
      def mins(c: Column): Column =
        floor(c.cast("timestamp").cast("long") / 60)
      val a = e.select(col("user_id"), col("ts").as("ts_a"),
        col("event_type").as("type_a"),
        explode(array(mins(col("ts")), mins(col("ts")) + 1)).as("bkt"))
      val b = e.select(col("user_id"), col("ts").as("ts_b"),
        col("event_type").as("type_b"), mins(col("ts")).as("bkt"))
      a.join(b, Seq("user_id", "bkt"))
        .filter(col("ts_a") < col("ts_b")
          && col("ts_b") <= col("ts_a") + expr("INTERVAL 60 SECONDS")
          && col("type_a") =!= col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("type_a", "type_b")
    }),

    // As-of join: each purchase -> most recent prior click of the same
    // user (AIS analog: position -> last port call). Spark has no
    // native as-of; the scalable form is a MERGE, not a join: union
    // both sides tagged, sort per user by (ts, kind, event_id) with
    // clicks before purchases on ties (<= semantics), and carry the
    // running last click forward. O(n log n), bounded per-key window
    // state — no O(clicks x purchases) intermediate, which is what
    // kills the join+row_number form on a hot user at 100 TB.
    "join_asof" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(0).as("kind"),
          col("event_id"),
          col("event_id").as("click_id"),
          lit(null).cast("long").as("purchase_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("kind"),
          col("event_id"),
          lit(null).cast("long").as("click_id"),
          col("event_id").as("purchase_id"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionAll(purchases)
        .withColumn("last_click",
          last(col("click_id"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("purchase_id"), col("last_click").as("click_id"))
        .orderBy("purchase_id")
    }),

    // NEAREST as-of: each purchase -> the click of the same user with
    // the smallest |time gap|, either direction (the sensor-fusion
    // flavor: align each reading with the closest reference sample).
    // ONE union-merge pass computes both candidates — running last
    // click (backward frame) and first following click (forward
    // frame) over the SAME sort — then an integer-µs compare picks
    // the closer; ties go backward, which also absorbs same-ts
    // clicks (they sort before the purchase, land in the backward
    // frame at gap 0, and win any tie). Still O(events) per user —
    // no click×purchase intermediate. The oracle is the independent
    // join+rank formulation with the tie-break spelled out.
    "join_asof_nearest" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(0).as("kind"),
          col("event_id"),
          col("event_id").as("click_id"),
          unix_micros(col("ts")).as("c_us"),
          lit(null).cast("long").as("purchase_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("kind"),
          col("event_id"),
          lit(null).cast("long").as("click_id"),
          lit(null).cast("long").as("c_us"),
          col("event_id").as("purchase_id"))
      val ord = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("kind"), col("event_id"))
      val wB = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wF = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      clicks.unionAll(purchases)
        .withColumn("b_id", last(col("click_id"), ignoreNulls = true).over(wB))
        .withColumn("b_us", last(col("c_us"), ignoreNulls = true).over(wB))
        .withColumn("f_id", first(col("click_id"), ignoreNulls = true).over(wF))
        .withColumn("f_us", first(col("c_us"), ignoreNulls = true).over(wF))
        .filter(col("kind") === 1)
        .withColumn("p_us", unix_micros(col("ts")))
        .withColumn("pick_b",
          col("f_id").isNull || (col("b_id").isNotNull
            && (col("p_us") - col("b_us")) <= (col("f_us") - col("p_us"))))
        .select(col("purchase_id"),
          when(col("pick_b"), col("b_id")).otherwise(col("f_id"))
            .as("click_id"),
          when(col("pick_b"), col("b_us") - col("p_us"))
            .otherwise(col("f_us") - col("p_us")).as("gap_us"))
        .orderBy("purchase_id")
    }),

    // Forward as-of: each purchase -> EARLIEST following click (ts >=
    // purchase) of the same user — the mirror of join_asof, same
    // union-merge shape with a forward-looking frame (first instead
    // of running last). Kind ordering flips so same-ts clicks sort
    // AFTER the purchase and land inside its frame (>= semantics).
    "join_asof_forward" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(0).as("kind"),
          col("event_id"),
          lit(null).cast("long").as("click_id"),
          col("event_id").as("purchase_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(1).as("kind"),
          col("event_id"),
          col("event_id").as("click_id"),
          lit(null).cast("long").as("purchase_id"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("kind"), col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      purchases.unionAll(clicks)
        .withColumn("next_click",
          first(col("click_id"), ignoreNulls = true).over(w))
        .filter(col("kind") === 0)
        .select(col("purchase_id"), col("next_click").as("click_id"))
        .orderBy("purchase_id")
    }),

    // Tolerance as-of: the as-of merge with a MAX STALENESS — each
    // purchase pairs with its most recent prior click only if that
    // click is at most 1 h old, else NULL (sensor-fusion semantics:
    // a position report takes the last weather fix unless the fix is
    // stale). Same union-merge shape as join_asof — one user_id
    // exchange, bounded per-key state, no click×purchase
    // intermediate — carrying the last click's ts alongside its id;
    // the staleness test is integer µs. The oracle keeps the
    // join+row_number formulation with the tolerance as a join-window
    // predicate — equivalent because if the MOST RECENT prior click
    // is stale, every earlier one is staler.
    "join_asof_tolerance" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(0).as("kind"),
          col("event_id"),
          col("event_id").as("click_id"),
          lit(null).cast("long").as("purchase_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("kind"),
          col("event_id"),
          lit(null).cast("long").as("click_id"),
          col("event_id").as("purchase_id"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionAll(purchases)
        .withColumn("last_click",
          last(col("click_id"), ignoreNulls = true).over(w))
        .withColumn("last_click_us",
          last(when(col("kind") === 0, unix_micros(col("ts"))),
            ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("purchase_id"),
          when(unix_micros(col("ts")) - col("last_click_us")
            <= 3600L * 1000000L, col("last_click")).as("click_id"))
        .orderBy("purchase_id")
    }),

    // Multi-join pipeline (TPC-H Q5-ish): revenue by nation in ASIA.
    "join_5way" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name")))
,
    // Interval join (batch twin of streaming.Streams.intervalJoin):
    // every (purchase, click) pair of the same user with the click in
    // the 15 minutes up to the purchase — ALL pairs, not the as-of
    // latest. Equi-join on user_id with an integer-µs range residual:
    // shuffles once on the user key; the range predicate evaluates
    // row-locally inside the matched key group (the join one would
    // bound with a bucketed-time key at extreme per-user volumes).
    "join_interval" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          unix_micros(col("ts")).as("pt"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          unix_micros(col("ts")).as("ct"))
      p.join(c, Seq("user_id"))
        .filter(col("ct") <= col("pt")
          && col("ct") >= col("pt") - 900L * 1000000L)
        .select("purchase_id", "click_id", "user_id")
        .orderBy("purchase_id", "click_id")
    }),

    // The explicit skew-mitigation path as a GRADED query: the salted
    // equi-join ([[Skew.saltedJoin]] — fact side salted on a
    // high-cardinality column, dim side replicated across the salt
    // range) must produce exactly the plain join's answer; the oracle
    // IS the plain join SQL, so the hash match proves the
    // rewrite-equivalence on real data, not just on SkewSpec's
    // synthetic hot key. Supplier per-nation volumes over lineitem —
    // the join one would salt if a few suppliers dominated the feed.
    "join_skew_salted" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select("l_suppkey", "l_orderkey", "l_quantity")
      val sup = Tables.supplier(s, d)
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      Skew.saltedJoin(li, sup, joinKey = "l_suppkey",
          saltFrom = "l_orderkey", saltBuckets = 8)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_items"),
          round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy("s_nationkey")
    }),

    // BANDED range join — the SCALABLE form of the |x − y| ≤ w theta
    // join (join_theta_range is the tiny-side BNLJ baseline): both
    // sides bucket by floor(value / w), the probe side explodes into
    // its bucket ± 1 (any y within w of x lies in one of those three
    // buckets — the band-coverage lemma), and the join becomes an
    // EQUI hash join on the bucket key with an exact residual filter.
    // O(n · occupancy) pairs examined instead of O(n · m); shuffles
    // partition on the bucket, so parallelism scales with the value
    // range. Suppliers paired with parts priced within ±25 of their
    // account balance, counted per supplier.
    "join_range_banded" -> ((s, d) => {
      val w = 25.0
      val sup = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_acctbal"))
        .withColumn("b", floor(col("s_acctbal") / w).cast("long"))
        .withColumn("jb", explode(array(col("b") - 1, col("b"),
          col("b") + 1)))
      val par = Tables.part(s, d)
        .select(col("p_partkey"), col("p_retailprice"))
        .withColumn("jb", floor(col("p_retailprice") / w).cast("long"))
      sup.join(par, "jb")
        .filter(abs(col("s_acctbal") - col("p_retailprice")) <= w)
        .groupBy("s_suppkey")
        .agg(count(lit(1)).as("n_parts"),
          min("p_partkey").as("first_part"))
        .orderBy("s_suppkey")
    })
  )

  val oracles: Map[String, String] = Map(
    "join_inner" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        | round(sum(o_totalprice), 2) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "join_broadcast" ->
      """SELECT p_brand, count(*) AS n_items,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "join_left_outer" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
        | round(coalesce(sum(o_totalprice), 0), 2) AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,

    "join_right_outer" ->
      """SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n_orders,
        | round(coalesce(sum(o_totalprice), 0), 2) AS total_spend
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_mktsegment ORDER BY c_custkey""".stripMargin,

    "join_full_outer" ->
      """SELECT coalesce(p_partkey, l_partkey) AS partkey, p_name,
        | coalesce(n_li, 0) AS n_li, coalesce(qty, 0.0) AS qty
        |FROM part FULL OUTER JOIN (
        |  SELECT l_partkey, count(*) AS n_li, round(sum(l_quantity), 2) AS qty
        |  FROM lineitem GROUP BY l_partkey
        |) u ON p_partkey = l_partkey
        |ORDER BY partkey""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "join_cross" ->
      """SELECT r_name, n_name
        |FROM region CROSS JOIN (SELECT * FROM nation WHERE n_nationkey < 5) n
        |ORDER BY r_name, n_name""".stripMargin,

    "join_theta_range" ->
      """SELECT a.event_type AS type_a, b.event_type AS type_b,
        | count(*) AS n_pairs
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.ts < b.ts
        |  AND b.ts <= a.ts + INTERVAL 60 SECOND
        |  AND a.event_type <> b.event_type
        |GROUP BY 1, 2 ORDER BY type_a, type_b""".stripMargin,

    "join_asof" ->
      """SELECT purchase_id, click_id FROM (
        |  SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |    row_number() OVER (PARTITION BY p.event_id
        |                       ORDER BY c.ts DESC, c.event_id DESC) AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |    ON p.user_id = c.user_id AND c.ts <= p.ts
        |) t WHERE rn = 1 ORDER BY purchase_id""".stripMargin,

    "join_asof_nearest" ->
      """SELECT purchase_id, click_id, gap_us FROM (
        |  SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |    epoch_us(c.ts) - epoch_us(p.ts) AS gap_us,
        |    row_number() OVER (PARTITION BY p.event_id
        |      ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)),
        |        CASE WHEN c.ts <= p.ts THEN 0 ELSE 1 END,
        |        CASE WHEN c.ts <= p.ts THEN -c.event_id
        |          ELSE c.event_id END) AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |    ON p.user_id = c.user_id
        |) t WHERE rn = 1 ORDER BY purchase_id""".stripMargin,

    "join_asof_forward" ->
      """SELECT purchase_id, click_id FROM (
        |  SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |    row_number() OVER (PARTITION BY p.event_id
        |                       ORDER BY c.ts ASC, c.event_id ASC) AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |    ON p.user_id = c.user_id AND c.ts >= p.ts
        |) t WHERE rn = 1 ORDER BY purchase_id""".stripMargin,

    "join_asof_tolerance" ->
      """SELECT purchase_id, click_id FROM (
        |  SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |    row_number() OVER (PARTITION BY p.event_id
        |                       ORDER BY c.ts DESC, c.event_id DESC) AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |    ON p.user_id = c.user_id AND c.ts <= p.ts
        |       AND c.ts >= p.ts - INTERVAL 1 HOUR
        |) t WHERE rn = 1 ORDER BY purchase_id""".stripMargin,

    "join_5way" ->
      """SELECT n_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "join_interval" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |  p.user_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        |  AND epoch_us(c.ts) <= epoch_us(p.ts)
        |  AND epoch_us(c.ts) >= epoch_us(p.ts) - 900000000
        |ORDER BY purchase_id, click_id""".stripMargin,

    // The PLAIN join: matching it is the salted rewrite's
    // equivalence proof.
    "join_skew_salted" ->
      """SELECT s_nationkey, count(*) AS n_items,
        | round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    // The PLAIN theta join: matching it proves the banded rewrite's
    // bucket ± 1 coverage on real data.
    "join_range_banded" ->
      """SELECT s_suppkey, count(*) AS n_parts,
        | min(p_partkey) AS first_part
        |FROM supplier JOIN part
        |  ON abs(s_acctbal - p_retailprice) <= 25
        |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin
  )
}
