package graft.gate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Relational operator inventory for the correctness gate (SURVEY.md §2.5
  * R-series + §2.9 coverage notes), expressed over the driver's TPC-H-ish
  * tables with exact DuckDB oracles.
  *
  * Determinism rules used throughout (cross-engine hash-match):
  *   - money/double sums -> SUM(CAST(FLOOR(x*100) AS BIGINT)) "cents":
  *     exact integers under any aggregation order;
  *   - averages -> one double division of two exact integers;
  *   - timestamps -> epoch micros (exact int) or yyyy-MM-dd strings;
  *   - every ORDER BY carries a unique tiebreak key.
  */
object RelationalQueries {

  private def cents(c: org.apache.spark.sql.Column) =
    floor(c * 100).cast("long")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // R4/R7-style grouped aggregate (TPC-H Q1 shape).
    "q1_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_price_cents"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("sum_disc_cents"),
          count(lit(1)).as("cnt"))
    }),

    // Filter + projection pushdown (R1-style predicate -> parquet scan).
    "q2_filter" -> ((s, d) => {
      Tables.lineitem(s, d)
        .where(col("l_shipdate").cast("date") >= "1995-01-01" &&
          col("l_shipdate").cast("date") <= "1996-12-31" &&
          col("l_quantity") < 10)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_returnflag"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
    }),

    // 3-table join + aggregate (E4 payload-join shape).
    "q3_join_agg" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val customer = Tables.customer(s, d)
      val nation = Tables.nation(s, d)
      // measured r22: pre-aggregating per custkey before the join is
      // the 100 TB shape (§2.3) but LOSES ~7% at this SF — AQE
      // broadcasts the customer side, so the big side never shuffles
      // and the pre-agg only adds an exchange. Kept as-is.
      orders.join(customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("order_cnt"),
          sum(cents(col("o_totalprice"))).as("revenue_cents"))
    }),

    // Broadcast dimension join chain (I5 opening-catalog shape).
    "q4_dims" -> ((s, d) => {
      val region = Tables.region(s, d)
      val nation = Tables.nation(s, d)
      val customer = Tables.customer(s, d)
      customer
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("customer_cnt"),
          countDistinct("n_name").as("nation_cnt"))
    }),

    // LEFT join + ORDER BY ... LIMIT (R3 game-search scan shape).
    "q5_left_join_sort" -> ((s, d) => {
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"),
          "left")
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
          col("o_orderstatus"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("o_totalprice"))
        .orderBy(col("order_date").desc, col("o_orderkey").desc)
        .limit(50)
    }),

    // Semi-join by id set (R5 PGN batch fetch shape).
    "q6_semi_join" -> ((s, d) => {
      val bigOrders = Tables.orders(s, d).where(col("o_totalprice") > 400000)
        .select("o_orderkey")
      Tables.lineitem(s, d)
        .join(bigOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .agg(count(lit(1)).as("line_cnt"),
          sum(col("l_quantity").cast("long")).as("qty_sum"))
    }),

    // Top-k with deterministic tiebreak (V3/V13 TakeOrderedAndProject).
    "q7_topk" -> ((s, d) => {
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    }),

    // Offset pagination via row_number over an already-limited page
    // (R3 OFFSET; scale-safe: window runs on <= 120 rows).
    "q8_pagination" -> ((s, d) => {
      val ordCols = Seq(col("o_orderdate").desc, col("o_orderkey").desc)
      val page = Tables.orders(s, d)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .orderBy(col("order_date").desc, col("o_orderkey").desc)
        .limit(120)
      page.withColumn("rn", row_number().over(
        Window.orderBy(col("order_date").desc, col("o_orderkey").desc)))
        .where(col("rn") > 100)
    }),

    // DISTINCT (exact dedup primitive).
    "q9_distinct" -> ((s, d) =>
      Tables.orders(s, d).select("o_orderstatus", "o_orderpriority")
        .distinct()),

    // Set operations: UNION/INTERSECT/EXCEPT.
    "q10_setops" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val auto = c.where(col("c_mktsegment") === "AUTOMOBILE")
        .select("c_custkey")
      val rich = c.where(col("c_acctbal") > 5000).select("c_custkey")
      val firstNation = c.where(col("c_nationkey") === 0).select("c_custkey")
      auto.intersect(rich).union(firstNation).except(
        c.where(col("c_acctbal") < 0).select("c_custkey"))
        .distinct()
    }),

    // Window functions: row_number / lag / exact running sum per user.
    // Tables.events pins ts to epoch-nanosecond longs.
    "q11_window" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_us"), col("event_id"))
      val wSum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("ts_us"), col("value"))
        .withColumn("rn", row_number().over(w))
        .withColumn("prev_value", lag("value", 1).over(w))
        .withColumn("runsum_micro",
          sum(floor(col("value") * 1000000).cast("long")).over(wSum))
        .where(col("rn") <= 5)
    }),

    // Range/theta join against a small inline band table (I5 ECO-range
    // broadcast join shape).
    "q12_range_join" -> ((s, d) => {
      import s.implicits._
      val bands = Seq(("small", 0, 10), ("mid", 10, 25), ("large", 25, 51))
        .toDF("band", "lo", "hi")
      Tables.lineitem(s, d)
        .join(broadcast(bands),
          col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
        .groupBy("band")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("long")).as("qty_sum"))
    }),

    // Conditional aggregation (CASE pivot).
    "q13_conditional_agg" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          sum(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0))
            .as("urgent_cnt"))
        .withColumn("urgent_ratio",
          col("urgent_cnt").cast("double") / col("cnt").cast("double"))
    }),

    // ROLLUP grouping sets (SQL form: the Dataset rollup API trips the
    // ambiguous-self-join analyzer on re-read relations; SQL is identical
    // Catalyst plans without the Dataset-id bookkeeping).
    "q14_rollup" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("g_customer")
      Tables.nation(s, d).createOrReplaceTempView("g_nation")
      Tables.region(s, d).createOrReplaceTempView("g_region")
      s.sql(
        """SELECT r_name, n_name, COUNT(*) AS cnt
           FROM g_customer JOIN g_nation ON c_nationkey = n_nationkey
           JOIN g_region ON n_regionkey = r_regionkey
           GROUP BY ROLLUP(r_name, n_name)""")
    }),

    // JSON field extraction (tags JSONB analog -- games.tags parse-on-read).
    "q15_json" -> ((s, d) => {
      Tables.events(s, d)
        .select(get_json_object(col("props"), "$.k").cast("int").as("k_val"))
        .groupBy("k_val").agg(count(lit(1)).as("cnt"))
    }),

    // TPC-H Q3 shape: 3-way join, filter both sides, agg, top-k.
    "q19_shipping_priority" -> ((s, d) => {
      val orders = Tables.orders(s, d)
        .where(col("o_orderdate").cast("date") < "1996-01-01")
      val lineitem = Tables.lineitem(s, d)
        .where(col("l_shipdate").cast("date") > "1996-01-01")
      val customer = Tables.customer(s, d)
        .where(col("c_mktsegment") === "BUILDING")
      // measured r22: pre-aggregating revenue per order before the
      // joins is the 100 TB shape (§2.3) but LOSES ~20% at this SF —
      // AQE broadcasts the filtered orders/customer sides, so the
      // line-item side never shuffles and the pre-agg only adds an
      // exchange. Kept as-is.
      lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue_cents"))
        .orderBy(desc("revenue_cents"), col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q10 shape: returned-item revenue by customer, top-k.
    "q20_returned_items" -> ((s, d) => {
      // pre-aggregate revenue per ORDER before any join (r22, guide
      // §2.3 "aggregate before you shuffle"): each R-lineitem belongs
      // to exactly one order and revenue is exact integer cents, so
      // sum-of-per-order-sums == the flat sum; the join input shrinks
      // from line items to distinct orders and the wide join carries
      // one cents column. c_name/n_name are functionally dependent on
      // c_custkey (unique keys), so grouping by custkey first and
      // attaching names after is the identical grouping.
      val orderRev = Tables.lineitem(s, d)
        .where(col("l_returnflag") === "R")
        .groupBy("l_orderkey")
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("__or_cents"))
      val custRev = orderRev
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(sum(col("__or_cents")).as("revenue_cents"))
      custRev
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          col("revenue_cents"))
        .orderBy(desc("revenue_cents"), col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q18 shape: HAVING over an aggregated subquery feeding a join.
    "q21_big_orders" -> ((s, d) => {
      val bigKeys = Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
        .where(col("total_qty") > 150)
      Tables.orders(s, d)
        .join(bigKeys, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("total_qty"))
        .orderBy(desc("total_qty"), col("o_orderkey"))
        .limit(50)
    }),

    // Correlated EXISTS (Catalyst decorrelates to a semi-join).
    "q17_exists" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("g_orders")
      Tables.lineitem(s, d).createOrReplaceTempView("g_lineitem")
      s.sql(
        """SELECT o_orderkey, o_totalprice FROM g_orders o
           WHERE EXISTS (SELECT 1 FROM g_lineitem l
                         WHERE l.l_orderkey = o.o_orderkey
                           AND l.l_quantity >= 49)
           ORDER BY o_orderkey LIMIT 100""")
    }),

    // Scalar subquery (orders above the global mean price; mean via
    // exact integer cents so the threshold is engine-identical).
    "q18_scalar_subquery" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("g_orders")
      s.sql(
        """SELECT COUNT(*) AS above_avg_cnt FROM g_orders
           WHERE o_totalprice * 100 >
             (SELECT CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                       AS DOUBLE) / COUNT(*) FROM g_orders)""")
    }),

    // Tumbling event-time window (streaming-style agg in batch; §2.9).
    // 6h buckets via exact epoch-microsecond arithmetic on the ns longs.
    "q16_tumble" -> ((s, d) => {
      val bucketUs = 6L * 3600 * 1000000
      Tables.events(s, d)
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("w_start_us",
          expr(s"ts_us div $bucketUs") * bucketUs)
        .groupBy("w_start_us", "event_type")
        .agg(count(lit(1)).as("cnt"),
          sum(floor(col("value") * 1000000).cast("long")).as("value_micro"))
    }),

    // Gap-based sessionization via native session_window (one shuffle;
    // same operator works under Structured Streaming). Gap 6h.
    "q22_sessionize" -> ((s, d) => {
      val gapUs = 6L * 3600 * 1000000
      val e = Tables.events(s, d)
        .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("value"))
      graft.operators.Sessionize.sessions(e, "user_id", "ts_us", gapUs,
        aggs = Seq(
          sum(floor(col("value") * 1000000).cast("long")).as("value_micro")))
    }),

    // As-of join (latest purchase at-or-before each click, per user) —
    // union + single keyed window carry, no range join, one shuffle.
    "q23_asof_join" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("ts_us"), col("event_type"), col("value"))
      val clicks = e.where(col("event_type") === "click")
        .select("event_id", "user_id", "ts_us")
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us").as("p_ts_us"),
          col("event_id").as("p_event_id"),
          floor(col("value") * 1000000).cast("long").as("p_value_micro"))
      graft.operators.AsofJoin.asof(clicks, purchases, Seq("user_id"),
        leftTs = "ts_us", rightTs = "p_ts_us",
        payload = Seq("p_event_id", "p_value_micro"), tiebreak = "p_event_id")
    }),

    // Ranking window functions: rank / dense_rank / ntile / lead over a
    // deterministic (unique-tiebreak) order within each nation.
    "q25_rank_funcs" -> ((s, d) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(desc("c_acctbal"), col("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"),
          floor(col("c_acctbal") * 100).cast("long").as("acctbal_cents"))
        .withColumn("rnk", rank().over(
          Window.partitionBy("c_nationkey")
            .orderBy(desc("acctbal_cents"), col("c_custkey"))))
        .withColumn("drnk", dense_rank().over(
          Window.partitionBy("c_nationkey")
            .orderBy(desc("acctbal_cents"), col("c_custkey"))))
        .withColumn("quartile", ntile(4).over(
          Window.partitionBy("c_nationkey")
            .orderBy(desc("acctbal_cents"), col("c_custkey"))))
        .withColumn("next_bal_cents", lead("acctbal_cents", 1).over(
          Window.partitionBy("c_nationkey")
            .orderBy(desc("acctbal_cents"), col("c_custkey"))))
        .where(col("rnk") <= 8)
    }),

    // CUBE grouping sets (completes ROLLUP from q14).
    "q26_cube" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("g_orders2")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
             SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS price_cents
           FROM g_orders2
           GROUP BY CUBE(o_orderstatus, o_orderpriority)""")
    }),

    // PIVOT: event counts per user across a fixed column set (the
    // Dataset pivot operator with explicit values -> no extra distinct
    // scan to discover them).
    "q28_pivot" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type",
          Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
    }),

    // Exact percentiles (linear interpolation over cents ints; one
    // double interpolation per output -> cross-engine stable at micro
    // quantization).
    "q27_percentile" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderstatus"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .groupBy("o_orderstatus")
        .agg(
          floor(expr("percentile(cents, 0.25)") * 1000).cast("long")
            .as("p25_milli"),
          floor(expr("percentile(cents, 0.5)") * 1000).cast("long")
            .as("p50_milli"),
          floor(expr("percentile(cents, 0.75)") * 1000).cast("long")
            .as("p75_milli"))
    }),

    // Two-phase salted aggregation (hot-key spread); must equal the plain
    // one-phase GROUP BY -- the oracle is exactly that.
    "q24_salted_agg" -> ((s, d) => {
      graft.core.Skew.saltedAgg(
        Tables.lineitem(s, d)
          .select(col("l_returnflag"), col("l_quantity"),
            floor(col("l_extendedprice") * 100).cast("long").as("price_cents")),
        keys = Seq("l_returnflag"), salts = 16,
        sums = Map(
          "qty_sum" -> col("l_quantity").cast("long"),
          "price_cents_sum" -> col("price_cents")))
    }))

  def oracles: Map[String, String] = Map(
    // NOTE: every SUM that reaches the output is wrapped CAST(... AS BIGINT):
    // DuckDB's SUM(BIGINT) yields HUGEINT (int128), which the driver's
    // Arrow-based fetch renders as float64 and hash-mismatches Spark's int64.
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(FLOOR(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
           CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
           COUNT(*) AS cnt
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q2_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_date
         FROM lineitem
         WHERE CAST(l_shipdate AS DATE) >= DATE '1995-01-01'
           AND CAST(l_shipdate AS DATE) <= DATE '1996-12-31'
           AND l_quantity < 10""",
    "q3_join_agg" ->
      """SELECT n_name, COUNT(*) AS order_cnt,
           CAST(SUM(CAST(FLOOR(o_totalprice*100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""",
    "q4_dims" ->
      """SELECT r_name, COUNT(*) AS customer_cnt,
           COUNT(DISTINCT n_name) AS nation_cnt
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name""",
    "q5_left_join_sort" ->
      """SELECT o_orderkey, o_custkey, c_name, o_orderstatus,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_totalprice
         FROM orders LEFT JOIN customer ON o_custkey = c_custkey
         ORDER BY order_date DESC, o_orderkey DESC LIMIT 50""",
    "q6_semi_join" ->
      """SELECT COUNT(*) AS line_cnt,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
         FROM lineitem WHERE l_orderkey IN
           (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)""",
    "q7_topk" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",
    "q8_pagination" ->
      """SELECT * FROM (
           SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
             ROW_NUMBER() OVER (ORDER BY strftime(o_orderdate, '%Y-%m-%d') DESC,
               o_orderkey DESC) AS rn
           FROM orders) t
         WHERE rn > 100 AND rn <= 120""",
    "q9_distinct" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    "q10_setops" ->
      """SELECT DISTINCT c_custkey FROM (
           (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
            INTERSECT
            SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
           UNION
           SELECT c_custkey FROM customer WHERE c_nationkey = 0
           EXCEPT
           SELECT c_custkey FROM customer WHERE c_acctbal < 0)""",
    "q11_window" ->
      """SELECT * FROM (
           SELECT event_id, user_id,
             epoch_ns(ts)//1000 AS ts_us, value,
             ROW_NUMBER() OVER w AS rn,
             LAG(value, 1) OVER w AS prev_value,
             CAST(SUM(CAST(FLOOR(value*1000000) AS BIGINT))
               OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS runsum_micro
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts)//1000, event_id)) t
         WHERE rn <= 5""",
    "q12_range_join" ->
      """SELECT band, COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
         FROM lineitem
         JOIN (VALUES ('small', 0, 10), ('mid', 10, 25), ('large', 25, 51))
           v(band, lo, hi)
           ON l_quantity >= lo AND l_quantity < hi
         GROUP BY band""",
    "q13_conditional_agg" ->
      """SELECT o_orderstatus, COUNT(*) AS cnt,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
             AS BIGINT) AS urgent_cnt,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
             AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS urgent_ratio
         FROM orders GROUP BY o_orderstatus""",
    "q14_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS cnt
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP(r_name, n_name)""",
    "q15_json" ->
      """SELECT CAST(props->>'k' AS INT) AS k_val, COUNT(*) AS cnt
         FROM events GROUP BY k_val""",
    "q19_shipping_priority" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100) AS BIGINT))
             AS BIGINT) AS revenue_cents
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE CAST(o_orderdate AS DATE) < DATE '1996-01-01'
           AND CAST(l_shipdate AS DATE) > DATE '1996-01-01'
           AND c_mktsegment = 'BUILDING'
         GROUP BY l_orderkey, order_date
         ORDER BY revenue_cents DESC, l_orderkey LIMIT 10""",
    "q20_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100) AS BIGINT))
             AS BIGINT) AS revenue_cents
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE l_returnflag = 'R'
         GROUP BY c_custkey, c_name, n_name
         ORDER BY revenue_cents DESC, c_custkey LIMIT 20""",
    "q21_big_orders" ->
      """SELECT o_orderkey, o_custkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date, total_qty
         FROM orders
         JOIN (SELECT l_orderkey,
                 CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
               FROM lineitem GROUP BY l_orderkey
               HAVING total_qty > 150) big
           ON o_orderkey = big.l_orderkey
         ORDER BY total_qty DESC, o_orderkey LIMIT 50""",
    "q17_exists" ->
      """SELECT o_orderkey, o_totalprice FROM orders o
         WHERE EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey
                         AND l.l_quantity >= 49)
         ORDER BY o_orderkey LIMIT 100""",
    "q18_scalar_subquery" ->
      """SELECT COUNT(*) AS above_avg_cnt FROM orders
         WHERE o_totalprice * 100 >
           (SELECT CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                     AS DOUBLE) / COUNT(*) FROM orders)""",
    "q16_tumble" ->
      """SELECT (epoch_ns(ts)//1000//21600000000) * 21600000000 AS w_start_us,
           event_type, COUNT(*) AS cnt,
           CAST(SUM(CAST(FLOOR(value*1000000) AS BIGINT)) AS BIGINT)
             AS value_micro
         FROM events GROUP BY 1, 2""",
    // session_window semantics: consecutive-event gap STRICTLY > 6h splits
    // (Spark merges at exactly ==gap); session bounds are min/max event
    // time (not +gap).
    "q22_sessionize" ->
      """WITH e AS (
           SELECT user_id, epoch_ns(ts)//1000 AS ts_us, value FROM events),
         m AS (
           SELECT user_id, ts_us, value,
             CASE WHEN ts_us - LAG(ts_us)
                 OVER (PARTITION BY user_id ORDER BY ts_us) > 21600000000
               THEN 1 ELSE 0 END AS new_s
           FROM e),
         g AS (
           SELECT user_id, ts_us, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
               ROWS UNBOUNDED PRECEDING) AS sid
           FROM m)
         SELECT user_id, MIN(ts_us) AS session_start_us,
           MAX(ts_us) AS session_end_us, COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value*1000000) AS BIGINT)) AS BIGINT)
             AS value_micro
         FROM g GROUP BY user_id, sid""",
    // (user_id, ts_us) is unique per event type in the generator, so the
    // ASOF tie rule can't differ from our max-tiebreak rule.
    "q23_asof_join" ->
      """WITH e AS (
           SELECT event_id, user_id, epoch_ns(ts)//1000 AS ts_us,
             event_type, value
           FROM events)
         SELECT l.event_id, l.user_id, l.ts_us,
           r.event_id AS p_event_id,
           CAST(FLOOR(r.value*1000000) AS BIGINT) AS p_value_micro
         FROM (SELECT * FROM e WHERE event_type = 'click') l
         ASOF LEFT JOIN (SELECT * FROM e WHERE event_type = 'purchase') r
           ON l.user_id = r.user_id AND r.ts_us <= l.ts_us""",
    "q25_rank_funcs" ->
      """SELECT * FROM (
           SELECT c_custkey, c_nationkey,
             CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
             RANK() OVER w AS rnk,
             DENSE_RANK() OVER w AS drnk,
             NTILE(4) OVER w AS quartile,
             LEAD(CAST(FLOOR(c_acctbal * 100) AS BIGINT), 1) OVER w
               AS next_bal_cents
           FROM customer
           WINDOW w AS (PARTITION BY c_nationkey
             ORDER BY CAST(FLOOR(c_acctbal * 100) AS BIGINT) DESC, c_custkey)
         ) t WHERE rnk <= 8""",
    "q26_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS price_cents
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""",
    "q28_pivot" ->
      """SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             AS BIGINT) AS view,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
             AS BIGINT) AS signup,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
             AS BIGINT) AS error
         FROM events GROUP BY user_id""",
    "q27_percentile" ->
      """SELECT o_orderstatus,
           CAST(FLOOR(quantile_cont(CAST(FLOOR(o_totalprice*100) AS BIGINT),
             0.25) * 1000) AS BIGINT) AS p25_milli,
           CAST(FLOOR(quantile_cont(CAST(FLOOR(o_totalprice*100) AS BIGINT),
             0.5) * 1000) AS BIGINT) AS p50_milli,
           CAST(FLOOR(quantile_cont(CAST(FLOOR(o_totalprice*100) AS BIGINT),
             0.75) * 1000) AS BIGINT) AS p75_milli
         FROM orders GROUP BY o_orderstatus""",
    "q24_salted_agg" ->
      """SELECT l_returnflag, COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
           CAST(SUM(CAST(FLOOR(l_extendedprice*100) AS BIGINT)) AS BIGINT)
             AS price_cents_sum
         FROM lineitem GROUP BY l_returnflag""")
}
