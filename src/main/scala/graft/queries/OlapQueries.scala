package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OLAP surface beyond the single ROLLUP entry (q_rollup_revenue) plus
  * corpus-operations queries: CUBE, explicit-values PIVOT, a
  * time-RANGE-framed rolling window, a snapshot diff (corpus release
  * comparison), and a z-score outlier screen. Oracle conventions as in
  * CoreQueries: double money through DECIMAL casts rendered as VARCHAR,
  * timestamps through strftime/date_format, unique sort tiebreaks.
  */
object OlapQueries {
  import Q._

  val entries: Seq[(String, Entry)] = Seq(

    // CUBE over (event_type, hour-of-day): all four grouping levels in
    // ONE pass (Expand -> single hash agg — the same one-scan shape
    // PlanSpec pins for ROLLUP). Rolled-up dimensions surface as
    // 'ALL'/-1 instead of NULL so the sort is total.
    "q_cube_events" -> Entry(
      (s, d) => {
        import s.implicits._
        rd(s, d, "events")
          .select($"event_type", hour($"ts").cast("long").as("hr"),
            $"value".cast("decimal(18,2)").as("v"))
          .cube($"event_type", $"hr")
          .agg(count(lit(1)).as("n"),
            sum($"v").cast("decimal(28,2)").cast("string").as("sum_value"))
          .select(coalesce($"event_type", lit("ALL")).as("event_type"),
            coalesce($"hr", lit(-1L)).as("hr"), $"n", $"sum_value")
          .orderBy($"event_type", $"hr")
      },
      Some("""SELECT coalesce(event_type, 'ALL') AS event_type,
             |  coalesce(hr, -1) AS hr, count(*) AS n,
             |  CAST(CAST(sum(v) AS DECIMAL(28,2)) AS VARCHAR) AS sum_value
             |FROM (SELECT event_type, hour(ts) AS hr,
             |        CAST(value AS DECIMAL(18,2)) AS v FROM events)
             |GROUP BY CUBE (event_type, hr)
             |ORDER BY event_type, hr""".stripMargin)),

    // GROUPING SETS — the third member of the multi-level family (CUBE
    // above, ROLLUP in CoreQueries): exactly the two single-dimension
    // marginals, no combined level, still ONE Expand pass. Uses the
    // Dataset.groupingSets API new in Spark 4.
    "q_grouping_sets" -> Entry(
      (s, d) => {
        import s.implicits._
        rd(s, d, "events")
          .select($"event_type", hour($"ts").cast("long").as("hr"))
          .groupingSets(Seq(Seq($"event_type"), Seq($"hr")),
            $"event_type", $"hr")
          .agg(count(lit(1)).as("n"))
          .select(coalesce($"event_type", lit("ALL")).as("event_type"),
            coalesce($"hr", lit(-1L)).as("hr"), $"n")
          .orderBy($"event_type", $"hr")
      },
      Some("""SELECT coalesce(event_type, 'ALL') AS event_type,
             |  coalesce(hr, -1) AS hr, count(*) AS n
             |FROM (SELECT event_type, hour(ts) AS hr FROM events)
             |GROUP BY GROUPING SETS ((event_type), (hr))
             |ORDER BY event_type, hr""".stripMargin)),

    // PIVOT with an EXPLICIT value list (order status -> columns): the
    // explicit list matters at scale — Spark's value-less pivot runs a
    // driver-side distinct collect over the pivot column first; naming
    // the values keeps the plan a single Expand-free aggregate.
    "q_pivot_status" -> Entry(
      (s, d) => {
        import s.implicits._
        rd(s, d, "orders")
          .select(year($"o_orderdate").cast("long").as("yr"),
            $"o_orderstatus",
            $"o_totalprice".cast("decimal(18,2)").as("v"))
          .groupBy($"yr")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(sum($"v").cast("decimal(28,2)").cast("string"))
          .select($"yr", $"F".as("f_total"), $"O".as("o_total"),
            $"P".as("p_total"))
          .orderBy($"yr")
      },
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
             |  CAST(CAST(sum(CASE WHEN o_orderstatus = 'F'
             |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DECIMAL(28,2)) AS VARCHAR) AS f_total,
             |  CAST(CAST(sum(CASE WHEN o_orderstatus = 'O'
             |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DECIMAL(28,2)) AS VARCHAR) AS o_total,
             |  CAST(CAST(sum(CASE WHEN o_orderstatus = 'P'
             |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DECIMAL(28,2)) AS VARCHAR) AS p_total
             |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin)),

    // Trailing-1-hour rolling profile per user: a RANGE frame over
    // integer event-time microseconds (count + decimal-exact value sum
    // of everything within the last hour, per event). The frame is
    // TIME-bounded, not corpus-bounded, and the window partitions by
    // user_id — one user-keyed exchange, no global order, no growth
    // with corpus size beyond the per-user hour density.
    "q_rolling_1h" -> Entry(
      (s, d) => {
        import s.implicits._
        val micros = unix_micros($"ts".cast("timestamp"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"us")
          .rangeBetween(-3600L * 1000000L, 0L)
        rd(s, d, "events")
          .withColumn("us", micros)
          .withColumn("n_1h", count(lit(1)).over(w))
          .withColumn("sum_1h",
            sum($"value".cast("decimal(18,2)")).over(w)
              .cast("decimal(28,2)").cast("string"))
          .select($"event_id", $"user_id", $"n_1h", $"sum_1h")
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, user_id,
             |  count(*) OVER w AS n_1h,
             |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w
             |    AS DECIMAL(28,2)) AS VARCHAR) AS sum_1h
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin)),

    // Corpus snapshot diff — the release-over-release comparison a
    // curated corpus publishes (docs added / removed / changed /
    // unchanged). Old snapshot = doc_id % 7 != 0, new snapshot drops
    // doc_id % 11 == 3 (so all four statuses occur) and perturbs text
    // for doc_id % 5 == 0; the diff is ONE doc_id equi-join
    // (co-partitionable by id at scale) + a row-local hash compare +
    // a bounded 4-row aggregate.
    "q_snapshot_diff" -> Entry(
      (s, d) => {
        import s.implicits._
        // hashed once: docs feeds both snapshot sides of the full-outer
        // join (the r5 plan md5-scanned the corpus per side)
        val docs = rd(s, d, "documents").select($"doc_id", md5($"text").as("h"))
          .localCheckpoint()
        val old = docs.filter(pmod($"doc_id", lit(7)) =!= 0)
          .select($"doc_id", $"h".as("oh"))
        val nw = docs.filter(pmod($"doc_id", lit(11)) =!= 3)
          .select($"doc_id",
            when(pmod($"doc_id", lit(5)) === 0, md5(concat($"h", lit("v2"))))
              .otherwise($"h").as("nh"))
        old.join(nw, Seq("doc_id"), "full_outer")
          .withColumn("status",
            when($"oh".isNull, "added")
              .when($"nh".isNull, "removed")
              .when($"oh" =!= $"nh", "changed")
              .otherwise("same"))
          .groupBy($"status")
          .agg(count(lit(1)).as("n_docs"),
            min($"doc_id").as("min_doc_id"), max($"doc_id").as("max_doc_id"))
          .orderBy($"status")
      },
      Some("""WITH docs AS (SELECT doc_id, md5(text) AS h FROM documents),
             |old AS (SELECT doc_id, h AS oh FROM docs WHERE doc_id % 7 != 0),
             |nw AS (SELECT doc_id,
             |    CASE WHEN doc_id % 5 = 0 THEN md5(h || 'v2') ELSE h END AS nh
             |  FROM docs WHERE doc_id % 11 != 3),
             |j AS (SELECT coalesce(old.doc_id, nw.doc_id) AS doc_id, oh, nh
             |  FROM old FULL OUTER JOIN nw ON old.doc_id = nw.doc_id)
             |SELECT CASE WHEN oh IS NULL THEN 'added'
             |    WHEN nh IS NULL THEN 'removed'
             |    WHEN oh != nh THEN 'changed' ELSE 'same' END AS status,
             |  count(*) AS n_docs, min(doc_id) AS min_doc_id,
             |  max(doc_id) AS max_doc_id
             |FROM j GROUP BY 1 ORDER BY status""".stripMargin)),

    // Ordered event funnel (view -> click -> purchase): each stage is
    // the first qualifying event STRICTLY AFTER the user's previous
    // stage, the product-analytics primitive (Amplitude/Mixpanel-style).
    // Topology: every join and aggregate is keyed on user_id, so one
    // hash partitioning serves the whole chain (exchange reuse); each
    // stage frame is at most one row per user, and the raw events are
    // filtered to one type BEFORE each join — the fact table is scanned
    // once per stage but never windowed and never self-joined on an
    // inequality. At 100 TB: three user-keyed shuffles of filtered
    // single-type slices, no cross product, no per-user sort.
    "q_funnel_conversion" -> Entry(
      (s, d) => {
        import s.implicits._
        val ev = rd(s, d, "events").select($"user_id", $"event_type", $"ts")
        // per-stage frames checkpointed: stage k feeds BOTH the next
        // stage's join and its own count leg of the output union — the
        // r5 plan re-ran the whole prefix chain per union leg (the view
        // subtree executed 3x, click 2x)
        val v = ev.filter($"event_type" === "view")
          .groupBy($"user_id").agg(min($"ts").as("t_view"))
          .localCheckpoint()
        val c = ev.filter($"event_type" === "click").join(v, "user_id")
          .filter($"ts" > $"t_view")
          .groupBy($"user_id").agg(min($"ts").as("t_click"))
          .localCheckpoint()
        val p = ev.filter($"event_type" === "purchase").join(c, "user_id")
          .filter($"ts" > $"t_click")
          .groupBy($"user_id").agg(min($"ts").as("t_purchase"))
        v.agg(count(lit(1)).as("n_users"))
          .select(lit(1L).as("stage_idx"), lit("view").as("stage"), $"n_users")
          .union(c.agg(count(lit(1)).as("n_users"))
            .select(lit(2L).as("stage_idx"), lit("click").as("stage"), $"n_users"))
          .union(p.agg(count(lit(1)).as("n_users"))
            .select(lit(3L).as("stage_idx"), lit("purchase").as("stage"), $"n_users"))
          .orderBy($"stage_idx")
      },
      Some("""WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
             |    WHERE event_type = 'view' GROUP BY user_id),
             |c AS (SELECT e.user_id, min(e.ts) AS t_click
             |    FROM events e JOIN v ON e.user_id = v.user_id
             |    WHERE e.event_type = 'click' AND e.ts > v.t_view
             |    GROUP BY e.user_id),
             |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
             |    FROM events e JOIN c ON e.user_id = c.user_id
             |    WHERE e.event_type = 'purchase' AND e.ts > c.t_click
             |    GROUP BY e.user_id)
             |SELECT CAST(1 AS BIGINT) AS stage_idx, 'view' AS stage,
             |  count(*) AS n_users FROM v
             |UNION ALL
             |SELECT 2, 'click', count(*) FROM c
             |UNION ALL
             |SELECT 3, 'purchase', count(*) FROM p
             |ORDER BY stage_idx""".stripMargin)),

    // Cohort retention matrix: users grouped by first-seen epoch week,
    // activity counted per week offset — the second standard product-
    // analytics shape. Week index is integer epoch arithmetic
    // (floor(epoch/604800)) so both engines bucket identically; the
    // fractional second cannot move a row across a week boundary.
    // Topology: first-seen agg and the activity join are BOTH keyed on
    // user_id (co-partitioned, exchange reuse), then one bounded agg on
    // (cohort_wk, week_offset) — a frame of O(weeks²) rows. countDistinct
    // is exact here; at 100 TB swap for approx_count_distinct or keep
    // exact via the two-level (cohort, offset, user) pre-distinct, which
    // is the same user-keyed shuffle already paid.
    "q_retention_cohort" -> Entry(
      (s, d) => {
        import s.implicits._
        val ew = rd(s, d, "events")
          .select($"user_id",
            floor(unix_timestamp($"ts") / 604800L).cast("long").as("wk"))
        val first = ew.groupBy($"user_id").agg(min($"wk").as("cohort_wk"))
        ew.join(first, "user_id")
          .groupBy($"cohort_wk", ($"wk" - $"cohort_wk").as("week_offset"))
          .agg(countDistinct($"user_id").as("n_users"))
          .orderBy($"cohort_wk", $"week_offset")
      },
      Some("""WITH ew AS (SELECT user_id,
             |    CAST(floor(epoch(ts) / 604800) AS BIGINT) AS wk FROM events),
             |f AS (SELECT user_id, min(wk) AS cohort_wk FROM ew GROUP BY user_id)
             |SELECT f.cohort_wk, ew.wk - f.cohort_wk AS week_offset,
             |  count(DISTINCT ew.user_id) AS n_users
             |FROM ew JOIN f ON ew.user_id = f.user_id
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Partial-aggregate MERGE (incremental rollup maintenance): daily
    // partials (count + exact decimal sum per (day, event_type)) are
    // computed in two independent increments — the append-only pattern
    // where each day's batch aggregates once and HISTORY IS NEVER
    // RESCANNED — then the monthly rollup re-aggregates the partial
    // states (counts add, sums add). At 100 TB the increments are
    // yesterday's partial table plus today's delta; this query pins that
    // merging partials is EXACTLY equivalent to aggregating the raw
    // events (the oracle computes the monthly rollup directly). Shape:
    // two disjoint filtered aggs + one union + one tiny re-agg — the
    // union'd partial frame is O(days × types), not O(events).
    "q_incremental_agg_merge" -> Entry(
      (s, d) => {
        import s.implicits._
        val ev = rd(s, d, "events")
          .select(date_format($"ts", "yyyy-MM-dd").as("day"),
            dayofmonth($"ts").as("dom"), $"event_type",
            $"value".cast("decimal(18,2)").as("v"))
        def partial(f: org.apache.spark.sql.Column) = ev.filter(f)
          .groupBy($"day", $"event_type")
          .agg(count(lit(1)).as("pn"), sum($"v").as("pv"))
        partial($"dom" <= 15).union(partial($"dom" > 15))
          .groupBy(substring($"day", 1, 7).as("mon"), $"event_type")
          .agg(sum($"pn").as("n_events"),
            sum($"pv").cast("decimal(28,2)").cast("string").as("total_value"))
          .orderBy($"mon", $"event_type")
      },
      Some("""SELECT strftime(ts, '%Y-%m') AS mon, event_type,
             |  count(*) AS n_events,
             |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS VARCHAR) AS total_value
             |FROM events GROUP BY 1, 2 ORDER BY mon, event_type""".stripMargin)),

    // z-score length outliers per source: moment sums (n, Σx, Σx²) as
    // exact BIGINTs through one bounded per-source agg, mean/std/z in a
    // pinned IEEE chain (sqrt is correctly rounded in both engines),
    // flagged docs recovered by a broadcast join of the tiny stats
    // frame back onto the scan — the corpus is never windowed.
    "ta_zscore_outliers" -> Entry(
      (s, d) => {
        import s.implicits._
        val stats = rd(s, d, "documents")
          .groupBy($"source")
          .agg(count(lit(1)).as("n"),
            sum($"n_chars").as("sx"),
            sum($"n_chars" * $"n_chars").as("sxx"))
          .withColumn("mean", $"sx".cast("double") / $"n")
          .withColumn("stddev",
            sqrt($"sxx".cast("double") / $"n" - $"mean" * $"mean"))
        rd(s, d, "documents")
          .join(broadcast(stats), "source")
          .withColumn("z", ($"n_chars" - $"mean") / $"stddev")
          .filter(abs($"z") > 2.0)
          .select($"doc_id", $"source", $"n_chars", round($"z", 3).as("z"))
          .orderBy($"source", $"doc_id")
      },
      Some("""WITH st AS (SELECT source, count(*) AS n,
             |    sum(n_chars) AS sx, sum(n_chars * n_chars) AS sxx
             |  FROM documents GROUP BY source),
             |m AS (SELECT source, CAST(sx AS DOUBLE) / n AS mean,
             |    sqrt(CAST(sxx AS DOUBLE) / n
             |         - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)) AS stddev
             |  FROM st)
             |SELECT doc_id, d.source, n_chars,
             |  round((n_chars - mean) / stddev, 3) AS z
             |FROM documents d JOIN m ON d.source = m.source
             |WHERE abs((n_chars - mean) / stddev) > 2.0
             |ORDER BY d.source, doc_id""".stripMargin)),

    // 2-D skyline / Pareto frontier (min price, max size) over part —
    // the dominance query (Börzsönyi et al. 2001). DEFINITION (the
    // oracle): p is on the frontier iff no q has price<=, size>= with
    // one strict. The ENGINE never runs the quadratic NOT EXISTS and
    // never globally orders the corpus; it uses the standard sound
    // skyline prune (dominance is transitive, so rows dominated by a
    // dropped row are also dominated by a surviving one):
    //   phase 1 — per-PRICE-BUCKET max-size summary (bounded rows),
    //     cumulative max over the tiny summary, broadcast back: a row
    //     dominated by any strictly-cheaper bucket's max dies at the
    //     scan (this removes the overwhelming mass);
    //   phase 2 — per-bucket windows on the SURVIVORS only (partitioned
    //     by bucket — never a global order): running max over strictly
    //     cheaper cents kills within-bucket dominance, a same-price
    //     partition max kills strictly-taller price ties.
    // Prices go through round(x*100) BIGINT cents in BOTH engines so no
    // double comparison or cast-rounding asymmetry exists.
    "q_skyline_pareto" -> Entry(
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val parts = rd(s, d, "part")
          .select($"p_partkey", $"p_size".cast("long").as("size"),
            expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("pc"))
          .withColumn("bk", expr("pc div 10000"))
        val summ = parts.groupBy($"bk").agg(max($"size").as("bmax"))
        val wcum = Window.orderBy($"bk")
          .rowsBetween(Window.unboundedPreceding, -1)
        val cum = summ.select($"bk", max($"bmax").over(wcum).as("mlow"))
        val surv = parts.join(broadcast(cum), Seq("bk"))
          .filter($"mlow".isNull || $"size" > $"mlow")
        val wLt = Window.partitionBy($"bk").orderBy($"pc")
          .rangeBetween(Window.unboundedPreceding, -1)
        val wTie = Window.partitionBy($"bk", $"pc")
        surv
          .withColumn("mlt", max($"size").over(wLt))
          .withColumn("mtie", max($"size").over(wTie))
          .filter(($"mlt".isNull || $"mlt" < $"size") && $"mtie" <= $"size")
          .select($"p_partkey", $"pc", $"size")
          .orderBy($"pc", $"p_partkey")
      },
      Some("""WITH p AS (SELECT p_partkey, CAST(p_size AS BIGINT) AS size,
             |    CAST(round(p_retailprice * 100) AS BIGINT) AS pc FROM part)
             |SELECT p_partkey, pc, size FROM p a
             |WHERE NOT EXISTS (SELECT 1 FROM p b
             |  WHERE b.pc <= a.pc AND b.size >= a.size
             |    AND (b.pc < a.pc OR b.size > a.size))
             |ORDER BY pc, p_partkey""".stripMargin)),

    // Pearson correlation matrix over lineitem's numeric columns in ONE
    // map-side-combined moment pass: values go through integer scaling
    // (units / cents / discount-percent BIGINTs), all moment sums
    // (Σx, Σx², Σxy) accumulate as DECIMAL(38,0) — EXACT at any row
    // count and partitioning, no float summation order exists — and the
    // correlation formula runs once per pair on the one-row moment
    // frame in a pinned IEEE chain. At 100 TB this is one scan + one
    // 9-sum aggregate; no shuffle of data rows at all.
    "q_corr_pearson" -> Entry(
      (s, d) => {
        import s.implicits._
        val li = rd(s, d, "lineitem").select(
          expr("CAST(round(l_quantity) AS BIGINT)").as("q"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("p"),
          expr("CAST(round(l_discount * 100) AS BIGINT)").as("dc"))
        def dsum(c: Column, n: String) =
          sum(c.cast("decimal(38,0)")).as(n)
        val m = li.agg(
          count(lit(1)).as("n"),
          dsum($"q", "sq"), dsum($"p", "sp"), dsum($"dc", "sd"),
          dsum($"q" * $"q", "sqq"), dsum($"p" * $"p", "spp"),
          dsum($"dc" * $"dc", "sdd"),
          dsum($"q" * $"p", "sqp"), dsum($"q" * $"dc", "sqd"),
          dsum($"p" * $"dc", "spd"))
        def corr(sxy: String, sx: String, sy: String,
            sxx: String, syy: String) =
          s"""round((CAST(n AS DOUBLE) * CAST($sxy AS DOUBLE)
             | - CAST($sx AS DOUBLE) * CAST($sy AS DOUBLE))
             | / (sqrt(CAST(n AS DOUBLE) * CAST($sxx AS DOUBLE)
             |        - CAST($sx AS DOUBLE) * CAST($sx AS DOUBLE))
             |  * sqrt(CAST(n AS DOUBLE) * CAST($syy AS DOUBLE)
             |        - CAST($sy AS DOUBLE) * CAST($sy AS DOUBLE))), 6)"""
            .stripMargin.replace("\n", " ")
        m.selectExpr("n",
          corr("sqp", "sq", "sp", "sqq", "spp") + " AS corr_qty_price",
          corr("sqd", "sq", "sd", "sqq", "sdd") + " AS corr_qty_disc",
          corr("spd", "sp", "sd", "spp", "sdd") + " AS corr_price_disc")
      },
      Some("""WITH v AS (SELECT CAST(round(l_quantity) AS BIGINT) AS q,
             |    CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
             |    CAST(round(l_discount * 100) AS BIGINT) AS dc
             |  FROM lineitem),
             |m AS (SELECT count(*) AS n,
             |    sum(q) AS sq, sum(p) AS sp, sum(dc) AS sd,
             |    sum(q * q) AS sqq, sum(p * p) AS spp, sum(dc * dc) AS sdd,
             |    sum(q * p) AS sqp, sum(q * dc) AS sqd, sum(p * dc) AS spd
             |  FROM v)
             |SELECT n,
             |  round((CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE)) / (sqrt(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)) * sqrt(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))), 6) AS corr_qty_price,
             |  round((CAST(n AS DOUBLE) * CAST(sqd AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sd AS DOUBLE)) / (sqrt(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)) * sqrt(CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))), 6) AS corr_qty_disc,
             |  round((CAST(n AS DOUBLE) * CAST(spd AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sd AS DOUBLE)) / (sqrt(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)) * sqrt(CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))), 6) AS corr_price_disc
             |FROM m""".stripMargin)),

    // Chi-square independence test source × lang over documents — the
    // categorical-drift / association screen a corpus QA dashboard
    // runs. Contingency table = one bounded (sources × langs) agg with
    // map-side combining; marginals broadcast back onto the tiny
    // summary; the statistic accumulates in the repo's micro-integer
    // idiom: each cell's (o-e)²/e term is rounded to an exact BIGINT
    // micro-unit BEFORE summation, so no float accumulation order
    // exists and both engines agree bit-for-bit.
    "ta_chi2_independence" -> Entry(
      (s, d) => {
        import s.implicits._
        val cells = rd(s, d, "documents")
          .groupBy($"source", $"lang").agg(count(lit(1)).as("o"))
        val rows = cells.groupBy($"source").agg(sum($"o").as("rt"))
        val cols = cells.groupBy($"lang").agg(sum($"o").as("ct"))
        val tot = cells.agg(sum($"o").as("n"))
        cells.join(broadcast(rows), "source").join(broadcast(cols), "lang")
          .crossJoin(broadcast(tot))
          .withColumn("e",
            $"rt".cast("double") * $"ct".cast("double") / $"n".cast("double"))
          .withColumn("term_micro", expr(
            "CAST(round(1e6 * (CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e) AS BIGINT)"))
          .agg(count(lit(1)).as("n_cells"),
            sum($"term_micro").as("chi2_micro"))
        // dof = (R-1)(C-1) derivable from the marginals; n_cells pins
        // the contingency shape the statistic was computed over
      },
      Some("""WITH cells AS (SELECT source, lang, count(*) AS o
             |  FROM documents GROUP BY source, lang),
             |rt AS (SELECT source, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY source),
             |ct AS (SELECT lang, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY lang),
             |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
             |t AS (SELECT o,
             |    CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n.n AS DOUBLE) AS e
             |  FROM cells JOIN rt USING (source) JOIN ct USING (lang), n)
             |SELECT count(*) AS n_cells,
             |  CAST(sum(CAST(round(1e6 * (CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e) AS BIGINT)) AS BIGINT) AS chi2_micro
             |FROM t""".stripMargin)),

    // Population Stability Index between two corpus halves (the drift
    // metric between a reference and a current snapshot — here the
    // deterministic doc_id parity split): per-bucket shares over the
    // power-of-two length buckets with +1 Laplace smoothing, PSI term
    // (p-q)·ln(p/q) rounded to BIGINT micro-units per bucket before the
    // exact sum. One bounded (bucket × half) agg over the scan; the
    // 5-row summary does all the float work in a pinned order.
    "ta_psi_drift" -> Entry(
      (s, d) => {
        import s.implicits._
        val bucket = when($"n_chars" < 64, "0-63")
          .when($"n_chars" < 128, "64-127")
          .when($"n_chars" < 256, "128-255")
          .when($"n_chars" < 512, "256-511")
          .otherwise("512+")
        val byHalf = rd(s, d, "documents")
          .groupBy(bucket.as("len_bucket"))
          .agg(count(when(pmod($"doc_id", lit(2)) === 0, 1)).as("ca"),
            count(when(pmod($"doc_id", lit(2)) === 1, 1)).as("cb"))
        val tots = byHalf.agg(sum($"ca").as("na"), sum($"cb").as("nb"),
          count(lit(1)).as("nbk"))
        byHalf.crossJoin(broadcast(tots))
          .withColumn("p", expr(
            "(CAST(ca AS DOUBLE) + 1.0) / (CAST(na AS DOUBLE) + CAST(nbk AS DOUBLE))"))
          .withColumn("q", expr(
            "(CAST(cb AS DOUBLE) + 1.0) / (CAST(nb AS DOUBLE) + CAST(nbk AS DOUBLE))"))
          .withColumn("term_micro",
            expr("CAST(round(1e6 * (p - q) * ln(p / q)) AS BIGINT)"))
          .agg(count(lit(1)).as("n_buckets"),
            sum($"term_micro").as("psi_micro"))
      },
      Some("""WITH b AS (SELECT CASE
             |      WHEN n_chars < 64 THEN '0-63'
             |      WHEN n_chars < 128 THEN '64-127'
             |      WHEN n_chars < 256 THEN '128-255'
             |      WHEN n_chars < 512 THEN '256-511'
             |      ELSE '512+' END AS len_bucket,
             |    count(CASE WHEN doc_id % 2 = 0 THEN 1 END) AS ca,
             |    count(CASE WHEN doc_id % 2 = 1 THEN 1 END) AS cb
             |  FROM documents GROUP BY 1),
             |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
             |    CAST(sum(cb) AS BIGINT) AS nb, count(*) AS nbk FROM b),
             |s AS (SELECT
             |    (CAST(ca AS DOUBLE) + 1.0) / (CAST(na AS DOUBLE) + CAST(nbk AS DOUBLE)) AS p,
             |    (CAST(cb AS DOUBLE) + 1.0) / (CAST(nb AS DOUBLE) + CAST(nbk AS DOUBLE)) AS q
             |  FROM b, t)
             |SELECT count(*) AS n_buckets,
             |  CAST(sum(CAST(round(1e6 * (p - q) * ln(p / q)) AS BIGINT)) AS BIGINT) AS psi_micro
             |FROM s""".stripMargin)),

    // OLS trend over the daily event-value series: slope / intercept /
    // r² of total daily value (integer cents) against the day index.
    // The corpus collapses into ONE bounded daily rollup (30 rows — one
    // map-side-combined agg at any event count); the regression moments
    // accumulate as DECIMAL(38,0) over that summary (exact, order-free)
    // and the closed-form OLS runs once in a pinned IEEE chain. The
    // drift/trend screen a corpus-health dashboard fits to its daily
    // intake series.
    "q_ols_trend" -> Entry(
      (s, d) => {
        import s.implicits._
        val daily = rd(s, d, "events")
          .groupBy(dayofmonth($"ts").cast("long").as("x"))
          .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("y"))
        def dsum(c: Column, n: String) = sum(c.cast("decimal(38,0)")).as(n)
        daily.agg(count(lit(1)).as("n"),
            dsum($"x", "sx"), dsum($"y", "sy"),
            dsum($"x" * $"x", "sxx"), dsum($"y" * $"y", "syy"),
            dsum($"x" * $"y", "sxy"))
          .selectExpr("n",
            """round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope""".replace("\n", " "),
            """round((CAST(sy AS DOUBLE) - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept""".replace("\n", " "),
            """round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
               / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2""".replace("\n", " "))
      },
      Some("""WITH daily AS (SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS x,
             |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
             |  FROM events GROUP BY 1),
             |m AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             |    sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
             |  FROM daily)
             |SELECT n,
             |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
             |  round((CAST(sy AS DOUBLE) - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept,
             |  round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))) / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
             |FROM m""".stripMargin)),

    // Time-window rate-limit dedup: at most one event per
    // (user, event_type, 5-minute tumbling bucket) — the
    // alert/notification suppression every event pipeline runs. The
    // keep-set is a pure groupBy on the fine (type, user, bucket) key
    // (map-side combined; groups are bounded by one user's events in 5
    // minutes — never a per-user or global order), rolled up to the
    // per-type suppression audit.
    "q_rate_limit_dedup" -> Entry(
      (s, d) => {
        import s.implicits._
        val bucketed = rd(s, d, "events")
          .select($"event_type", $"user_id",
            expr("CAST(unix_timestamp(ts) AS BIGINT) div 300").as("b"))
        bucketed.groupBy($"event_type", $"user_id", $"b")
          .agg(count(lit(1)).as("n"))
          .groupBy($"event_type")
          .agg(sum($"n").as("n_total"), count(lit(1)).as("n_kept"))
          .withColumn("suppressed", $"n_total" - $"n_kept")
          .orderBy($"event_type")
      },
      Some("""WITH g AS (SELECT event_type, user_id,
             |    CAST(floor(epoch(ts)) AS BIGINT) // 300 AS b, count(*) AS n
             |  FROM events GROUP BY 1, 2, 3)
             |SELECT event_type, CAST(sum(n) AS BIGINT) AS n_total,
             |  count(*) AS n_kept,
             |  CAST(sum(n) - count(*) AS BIGINT) AS suppressed
             |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Calendar gap-fill with forward-fill: project the daily 'error'
    // series onto a generated full calendar (sequence() — no gaps), so
    // missing days appear, then carry the last observed value forward
    // (last_value IGNORE NULLS over day order). A sparse observation
    // set is constructed deterministically (every 3rd day dropped) so
    // the fill genuinely fires. ALL windows range over the bounded
    // daily summary (31 rows at any event count) — the corpus pays one
    // map-side-combined rollup and nothing else.
    "q_gap_fill" -> Entry(
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val daily = rd(s, d, "events")
          .filter($"event_type" === "error")
          .groupBy(dayofmonth($"ts").cast("long").as("day"))
          .agg(count(lit(1)).as("n"))
          .filter(pmod($"day", lit(3)) =!= 0)
        val cal = rd(s, d, "events")
          .agg(min(dayofmonth($"ts").cast("long")).as("d0"),
            max(dayofmonth($"ts").cast("long")).as("d1"))
          .select(explode(sequence($"d0", $"d1")).as("day"))
        val w = Window.orderBy($"day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cal.join(daily, Seq("day"), "left")
          .withColumn("observed", $"n".isNotNull)
          .withColumn("filled",
            coalesce($"n", last($"n", ignoreNulls = true).over(w), lit(0L)))
          .select($"day", $"observed", $"filled")
          .orderBy($"day")
      },
      Some("""WITH daily0 AS (SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS day,
             |    count(*) AS n
             |  FROM events WHERE event_type = 'error' GROUP BY 1),
             |daily AS (SELECT * FROM daily0 WHERE day % 3 != 0),
             |r AS (SELECT CAST(min(EXTRACT(day FROM ts)) AS BIGINT) AS d0,
             |    CAST(max(EXTRACT(day FROM ts)) AS BIGINT) AS d1 FROM events),
             |cal AS (SELECT unnest(generate_series(d0, d1)) AS day FROM r),
             |j AS (SELECT cal.day, daily.n FROM cal LEFT JOIN daily USING (day))
             |SELECT day, n IS NOT NULL AS observed,
             |  CAST(coalesce(n,
             |    last_value(n IGNORE NULLS) OVER (ORDER BY day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |    0) AS BIGINT) AS filled
             |FROM j ORDER BY day""".stripMargin))
  )
}
