package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the query catalog. */
object Q {
  import org.apache.spark.sql.Column

  type Fn = (SparkSession, String) => DataFrame
  final case class Entry(fn: Fn, oracle: Option[String])

  def rd(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // shared constructions used by the construct-and-recover queries —
  // ONE definition each, mirrored by one SQL fragment each
  def tok(text: Column, i: Int): Column = element_at(split(text, " "), i)

  def cap(c: Column): Column =
    concat(upper(c.substr(lit(1), lit(1))), lower(c.substr(lit(2), lit(100))))

  def dateCol(id: Column): Column = concat(
    lpad((pmod(id, lit(12)) + 1).cast("string"), 2, "0"), lit("/"),
    lpad((pmod(id, lit(28)) + 1).cast("string"), 2, "0"), lit("/"),
    (lit(1980) + pmod(id, lit(40))).cast("string"))

  val sqlTok1 = "string_split(text,' ')[1]"
  val sqlTok2 = "string_split(text,' ')[2]"
  def sqlCap(t: String) = s"upper(substr($t,1,1))||lower(substr($t,2))"
  val sqlDate =
    "lpad(CAST(doc_id % 12 + 1 AS VARCHAR),2,'0')||'/'||lpad(CAST(doc_id % 28 + 1 AS VARCHAR),2,'0')||'/'||CAST(1980 + doc_id % 40 AS VARCHAR)"
}

/** Core relational operators (scan/filter/project/join/agg/window/sort/
  * limit/distinct) over the TPC-H-ish tables. Conventions for oracle
  * parity with DuckDB:
  *  - money sums go through DECIMAL casts (exact integer arithmetic on
  *    both engines — no float summation-order drift);
  *  - every ORDER BY carries a unique tiebreak;
  *  - every computed column is aliased identically in Spark and SQL.
  */
object CoreQueries {
  import Q._

  val entries: Seq[(String, Entry)] = Seq(

    // A-analog — grouped aggregation with decimal-exact sums (TPC-H Q1 shape).
    // Sums are computed in exact DECIMAL arithmetic, but the TERMINAL
    // projection renders them as VARCHAR: the round driver hashes typed
    // values, and wide decimals (>18 digits, i.e. not INT64-backed) drift
    // in driver-side representation between engines even when the values
    // are byte-equal. Strings of an exact decimal cannot drift.
    "q1_lineitem_agg" -> Entry(
      (s, d) => {
        import s.implicits._
        rd(s, d, "lineitem")
          .filter($"l_shipdate" <= lit("1998-09-01"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            sum($"l_quantity".cast("decimal(18,2)")).cast("decimal(28,2)")
              .cast("string").as("sum_qty"),
            sum($"l_extendedprice".cast("decimal(18,2)")).cast("decimal(28,2)")
              .cast("string").as("sum_base_price"),
            sum($"l_extendedprice".cast("decimal(18,2)") *
              (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(4,2)")))
              .cast("decimal(28,4)").cast("string").as("sum_disc_price"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS VARCHAR) AS sum_qty,
             |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS VARCHAR) AS sum_base_price,
             |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(28,4)) AS VARCHAR) AS sum_disc_price,
             |  count(*) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // three-way join + agg + top-k (TPC-H Q3 shape); lineitem⋈orders is the
    // big shuffle join, customer side filtered before the join
    "q3_top_revenue" -> Entry(
      (s, d) => {
        import s.implicits._
        val c = rd(s, d, "customer").filter($"c_mktsegment" === "BUILDING")
        val o = rd(s, d, "orders")
        val l = rd(s, d, "lineitem")
        // dimension-first join order (guide §3.1): orders is pre-filtered
        // by the broadcast BUILDING-customer semi-side and projected to
        // the join key BEFORE meeting lineitem, so the big fact table is
        // joined against a ~1/5-of-orders build side and never shuffled
        // (r5 shape shuffled the full lineitem AND orders on orderkey:
        // plan SortMergeJoin + 2 Exchange -> BroadcastHashJoin, 0
        // fact-side Exchange). At larger scale the same plan degrades
        // gracefully: drop the broadcast hint and AQE picks SMJ when the
        // filtered orders side outgrows the broadcast threshold.
        l.join(broadcast(o.join(broadcast(c), $"o_custkey" === $"c_custkey")
            .select($"o_orderkey")),
          $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_orderkey")
          .agg(sum($"l_extendedprice".cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(4,2)")))
            .cast("decimal(28,4)").as("revenue"))
          .orderBy($"revenue".desc, $"o_orderkey")
          .limit(10)
          // top-10 is selected on the exact decimal; only the TERMINAL
          // projection goes to VARCHAR (driver-hash-stable representation)
          .select($"o_orderkey", $"revenue".cast("string").as("revenue"))
      },
      Some("""SELECT o_orderkey, CAST(revenue AS VARCHAR) AS revenue FROM (
             |  SELECT o_orderkey,
             |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(28,4)) AS revenue
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  WHERE c_mktsegment = 'BUILDING'
             |  GROUP BY o_orderkey
             |  ORDER BY revenue DESC, o_orderkey LIMIT 10)""".stripMargin)),

    // Multi-level OLAP aggregation in ONE pass: ROLLUP computes the
    // (region, nation), region-subtotal, and grand-total levels from a
    // single scan + shuffle (Catalyst's Expand feeds one hash aggregate;
    // no per-level re-scan). All three dims broadcast; the revenue sum is
    // exact decimal, so the terminal VARCHAR is hash-stable. NULL rollup
    // slots are COALESCEd to 'ALL' so the presentation sort never touches
    // engine-specific NULL ordering.
    "q_rollup_revenue" -> Entry(
      (s, d) => {
        import s.implicits._
        // the whole dimension side — orders⋈customer⋈nation⋈region
        // projected to (o_orderkey, r_name, n_name) — is built first and
        // broadcast, so the fact table is NEVER shuffled (r5 plan:
        // lineitem⋈orders SortMergeJoin with 2 fact-scale Exchanges ->
        // BroadcastHashJoin, remaining Exchanges only over the tiny
        // rollup key space). The revenue term is also projected ONCE
        // before the rollup Expand so the decimal multiply runs per
        // input row, not per expanded (×3) row. At larger scale drop
        // the hint on the orders chain and AQE reverts to SMJ when the
        // dimension side exceeds the broadcast threshold.
        val dims = rd(s, d, "orders").select($"o_orderkey", $"o_custkey")
          .join(broadcast(rd(s, d, "customer")
            .select($"c_custkey", $"c_nationkey")), $"o_custkey" === $"c_custkey")
          .join(broadcast(rd(s, d, "nation")), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(rd(s, d, "region")), $"n_regionkey" === $"r_regionkey")
          .select($"o_orderkey", $"r_name", $"n_name")
        rd(s, d, "lineitem")
          .select($"l_orderkey",
            ($"l_extendedprice".cast("decimal(18,2)") *
              (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(4,2)")))
              .as("term"))
          .join(broadcast(dims), $"l_orderkey" === $"o_orderkey")
          .rollup($"r_name", $"n_name")
          .agg(sum($"term")
            .cast("decimal(28,4)").as("rev"), grouping_id().as("gid"))
          .select($"gid".cast("long").as("lvl"),
            coalesce($"r_name", lit("ALL")).as("region"),
            coalesce($"n_name", lit("ALL")).as("nation"),
            $"rev".cast("string").as("revenue"))
          .orderBy($"lvl", $"region", $"nation")
      },
      Some("""SELECT CAST(GROUPING_ID(r_name, n_name) AS BIGINT) AS lvl,
             |  COALESCE(r_name, 'ALL') AS region,
             |  COALESCE(n_name, 'ALL') AS nation,
             |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(28,4)) AS VARCHAR) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY ROLLUP (r_name, n_name)
             |ORDER BY lvl, region, nation""".stripMargin)),

    // dimension joins — both sides broadcast (star-schema pattern)
    "q_join_broadcast" -> Entry(
      (s, d) => {
        import s.implicits._
        rd(s, d, "customer")
          .join(broadcast(rd(s, d, "nation")), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(rd(s, d, "region")), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name")
          .agg(count(lit(1)).as("n_customers"),
            sum($"c_acctbal".cast("decimal(18,2)")).cast("decimal(28,2)")
              .cast("string").as("sum_acctbal"))
          .orderBy($"r_name")
      },
      Some("""SELECT r_name, count(*) AS n_customers,
             |  CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS VARCHAR) AS sum_acctbal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    // EXISTS — left semi join
    "q_semi_join" -> Entry(
      (s, d) => {
        import s.implicits._
        val big = rd(s, d, "orders").filter($"o_totalprice" > 400000.0)
        rd(s, d, "customer")
          .join(big, $"c_custkey" === $"o_custkey", "left_semi")
          .select($"c_custkey", $"c_name")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // NOT EXISTS — left anti join
    "q_anti_join" -> Entry(
      (s, d) => {
        import s.implicits._
        val big = rd(s, d, "orders").filter($"o_totalprice" > 400000.0)
        rd(s, d, "customer")
          .join(big, $"c_custkey" === $"o_custkey", "left_anti")
          .select($"c_custkey", $"c_mktsegment")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_mktsegment FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // window function — top-3 orders per customer (O1 stable-order analog)
    "q_window_topk" -> Entry(
      (s, d) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"o_custkey")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
        rd(s, d, "orders")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 3)
          // rn as BIGINT (DuckDB row_number() is BIGINT); price as VARCHAR
          // of the exact DECIMAL — any terminal DECIMAL risks driver-side
          // float64 coercion drift ("123.4" vs "123.40")
          .select($"o_custkey", $"rn".cast("long").as("rn"), $"o_orderkey",
            $"o_totalprice".cast("decimal(18,2)").cast("string").as("price"))
          .orderBy($"o_custkey", $"rn")
          .limit(500)
      },
      Some("""SELECT o_custkey, rn, o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) WHERE rn <= 3
             |ORDER BY o_custkey, rn LIMIT 500""".stripMargin)),

    // global sort + limit (L1)
    "q_sort_limit" -> Entry(
      (s, d) => {
        import s.implicits._
        rd(s, d, "orders")
          .select($"o_orderkey", $"o_totalprice".cast("decimal(18,2)").as("price"))
          .orderBy($"price".desc, $"o_orderkey")
          .limit(10)
          .select($"o_orderkey", $"price".cast("string").as("price"))
      },
      Some("""SELECT o_orderkey, CAST(price AS VARCHAR) AS price FROM (
             |  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price
             |  FROM orders ORDER BY price DESC, o_orderkey LIMIT 10)""".stripMargin)),

    // D1 — distinct
    "q_distinct" -> Entry(
      (s, d) => {
        import s.implicits._
        rd(s, d, "orders")
          .select($"o_orderstatus", $"o_orderpriority")
          .distinct()
          .orderBy($"o_orderstatus", $"o_orderpriority")
      },
      Some("""SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
             |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)),

    // time-bucketed aggregation over the event stream table. The hour
    // bucket is grouped as a timestamp but RENDERED as a formatted string
    // (UTC session tz both sides): terminal timestamp columns drift in
    // driver-side representation between engines; strings cannot.
    "q_events_hourly" -> Entry(
      (s, d) => {
        import s.implicits._
        rd(s, d, "events")
          .groupBy(date_trunc("hour", $"ts").as("hour_ts"), $"event_type")
          .agg(count(lit(1)).as("n"),
            sum($"value".cast("decimal(18,2)")).cast("decimal(28,2)")
              .cast("string").as("sum_value"))
          .select(date_format($"hour_ts", "yyyy-MM-dd HH:mm:ss").as("hour"),
            $"event_type", $"n", $"sum_value")
          .orderBy($"hour", $"event_type")
      },
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type, count(*) AS n,
             |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS VARCHAR) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin)),

    // as-of join — an operator Spark has no native form for, COMPOSED from
    // built-ins per the preference order (no custom plan needed): for each
    // purchase, the latest view by the same user at-or-before its
    // timestamp. One shuffle on user_id (union + running last-non-null
    // over the interleaved event order), not a range join or per-probe
    // scan — the event-stream feature-join shape a training pipeline uses
    // at scale.
    "q_asof_join" -> Entry(
      (s, d) => {
        import s.implicits._
        val e = rd(s, d, "events")
        val quotes = e.filter($"event_type" === "view")
          .select($"user_id", $"ts", lit(0).as("src"),
            lit(null).cast("long").as("purchase_id"), $"event_id".as("view_id"))
        val probes = e.filter($"event_type" === "purchase")
          .select($"user_id", $"ts", lit(1).as("src"),
            $"event_id".as("purchase_id"), lit(null).cast("long").as("view_id"))
        // views sort before probes at equal ts (at-or-before is inclusive);
        // among equal-ts views the max view_id wins — all deterministic
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id")
          .orderBy($"ts", $"src", $"view_id", $"purchase_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        quotes.unionByName(probes)
          .withColumn("asof_view", last($"view_id", ignoreNulls = true).over(w))
          .filter($"src" === 1)
          .select($"purchase_id", $"user_id",
            coalesce($"asof_view", lit(-1L)).as("view_id"))
          .orderBy($"purchase_id")
      },
      Some("""SELECT p.event_id AS purchase_id, p.user_id,
             |  coalesce((SELECT max(q.event_id) FROM events q
             |            WHERE q.event_type = 'view' AND q.user_id = p.user_id
             |              AND q.ts = (SELECT max(q2.ts) FROM events q2
             |                          WHERE q2.event_type = 'view'
             |                            AND q2.user_id = p.user_id
             |                            AND q2.ts <= p.ts)), -1) AS view_id
             |FROM events p WHERE p.event_type = 'purchase'
             |ORDER BY purchase_id""".stripMargin)),

    // RANGE (interval-containment) join, binned: which maintenance
    // windows cover each event's timestamp. The naive Spark plan for
    // `e.ts >= w.start AND e.ts < w.end` is BroadcastNestedLoopJoin —
    // O(events x windows) and only viable while one side broadcasts. The
    // scale form bins time into hours: an event belongs to exactly ONE
    // bin, a window explodes into the 1-3 bins it covers, the join
    // becomes an EQUI-join on bin (shuffle- or broadcast-hash), and the
    // exact containment predicate filters within the bin — output
    // duplicate-free by construction (one bin per event). All arithmetic
    // in integer microseconds (parquet ts is TIMESTAMP_NTZ; epoch under
    // the UTC session). The oracle runs the DIRECT inequality join —
    // algorithm-independent ground truth. Windows derive from documents:
    // window k starts at 2024-01-01 + 97k min, lasts 30 + (k % 120) min.
    "q_range_join_binned" -> Entry(
      (s, d) => {
        import s.implicits._
        val binUs = 3600L * 1000000L
        val baseS = 1704067200L // 2024-01-01 00:00:00 UTC
        val ev = rd(s, d, "events").select($"event_id",
          unix_micros($"ts".cast("timestamp")).as("es"))
        val win = rd(s, d, "documents").select($"doc_id".as("window_id"))
          .withColumn("s_us", (lit(baseS) + $"window_id" * 97L * 60L) * 1000000L)
          .withColumn("e_us",
            $"s_us" + (lit(30L) + pmod($"window_id", lit(120L))) * 60L * 1000000L)
        val evb = ev.withColumn("bin", floor($"es" / binUs).cast("long"))
        val wb = win.withColumn("bin",
          explode(sequence(floor($"s_us" / binUs).cast("long"),
            floor(($"e_us" - 1) / binUs).cast("long"))))
        evb.join(wb, "bin")
          .where($"es" >= $"s_us" && $"es" < $"e_us")
          .select($"event_id", $"window_id")
          .orderBy($"event_id", $"window_id")
      },
      Some("""WITH w AS (SELECT doc_id AS window_id,
             |  (1704067200 + doc_id*97*60) * 1000000 AS s_us,
             |  (1704067200 + doc_id*97*60 + (30 + doc_id%120)*60) * 1000000 AS e_us
             |  FROM documents)
             |SELECT e.event_id, w.window_id
             |FROM (SELECT event_id, epoch_us(ts) AS es FROM events) e
             |JOIN w ON e.es >= w.s_us AND e.es < w.e_us
             |ORDER BY event_id, window_id""".stripMargin)),

    // batch sessionization: 30-minute-gap sessions per user via
    // lag + running sum (the windowed-analytics shape of the streaming
    // sessionizer). Gap compare on integer microseconds — exact parity.
    "q_sessionize" -> Entry(
      (s, d) => {
        import s.implicits._
        val wOrd = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"ts", $"event_id")
        // parquet ts is TIMESTAMP_NTZ; cast to instant under the UTC
        // session tz for integer-microsecond arithmetic
        val micros = unix_micros($"ts".cast("timestamp"))
        val prev = lag(micros, 1).over(wOrd)
        val newSess = when(prev.isNull || micros - prev > lit(1800L * 1000000L), 1)
          .otherwise(0)
        rd(s, d, "events")
          .withColumn("new_sess", newSess)
          .withColumn("session_idx", sum($"new_sess").over(
            org.apache.spark.sql.expressions.Window
              .partitionBy($"user_id").orderBy($"ts", $"event_id")
              .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          .groupBy($"user_id", $"session_idx")
          .agg(count(lit(1)).as("n_events"),
            date_format(min($"ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"))
          .orderBy($"user_id", $"session_idx")
      },
      Some("""WITH g AS (
             |  SELECT user_id, ts, event_id,
             |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
             |           (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
             |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             |    THEN 1 ELSE 0 END AS new_sess
             |  FROM events),
             |s AS (SELECT user_id, ts,
             |        CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
             |      FROM g)
             |SELECT user_id, session_idx, count(*) AS n_events,
             |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
             |FROM s GROUP BY user_id, session_idx
             |ORDER BY user_id, session_idx""".stripMargin)),

    // JSON-ish props field via regexp (portable, no JSON-path dialect drift)
    "q_events_props_regex" -> Entry(
      (s, d) => {
        import s.implicits._
        rd(s, d, "events")
          .withColumn("k", regexp_extract($"props", "\"k\":\\s*(\\d+)", 1).cast("int"))
          .groupBy(pmod($"k", lit(10)).as("k_bucket"))
          .agg(count(lit(1)).as("n"))
          .orderBy($"k_bucket")
      },
      Some("""SELECT CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT) % 10 AS k_bucket,
             |  count(*) AS n
             |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin)),

    // SALTED skew join — the explicit hot-key pattern (AQE's skew-join
    // split only fires on sort-merge stats; when one fact key dominates
    // a partition regardless, salting is the deterministic fix): the
    // fact side gets salt = event_id % 8 (uniform, row-local), the dim
    // side is fanned out ×8 by an explode, and the join key becomes
    // (key, salt) so one hot user's rows spread over 8 tasks instead of
    // one. shuffle_hash hint pins the shuffled-hash plan — a broadcast
    // of the fanned dim would be both legal and pointless here; at
    // 100 TB the dim is too big to broadcast and this IS the plan.
    // Semantics are oracle-identical to the unsalted join (the salt is
    // partitioning metadata, not data). The final agg re-merges the
    // salt shards of each segment.
    "q_skew_salted_join" -> Entry(
      (s, d) => {
        import s.implicits._
        val S = 8
        val fact = rd(s, d, "events")
          .select($"user_id", $"value".cast("decimal(18,2)").as("v"),
            pmod($"event_id", lit(S.toLong)).as("salt"))
        val dim = rd(s, d, "customer")
          .select($"c_custkey", $"c_mktsegment")
          .withColumn("salt",
            explode(lit((0L until S.toLong).toArray)))
        fact.join(dim.hint("shuffle_hash"),
            fact("user_id") === dim("c_custkey") &&
              fact("salt") === dim("salt"))
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n_events"),
            sum($"v").cast("decimal(28,2)").cast("string").as("total_value"))
          .orderBy($"c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS n_events,
             |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS VARCHAR) AS total_value
             |FROM events JOIN customer ON user_id = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))
  )
}
