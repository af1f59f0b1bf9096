package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Relational operator battery over the synthetic star schema.
  *
  * One named query per operator class from SURVEY.md §2 (scans, filters,
  * joins incl. semi/anti/theta-argmax, aggregations incl. h-index/median/
  * mode, windows, top-k, set ops, scalar functions, JSON access, graph-ish
  * self-joins). Each query has a DuckDB oracle in [[Relational.oracle]] with
  * IDENTICAL output column names and a total ORDER BY so the driver's
  * sort+hash compare is deterministic.
  *
  * Scale notes (100 TB discipline):
  *  - dimension joins (region/nation/supplier/part at <=20k rows even at
  *    sf0.1) are explicitly `broadcast()` — no shuffle of the fact table;
  *  - fact-fact joins (orders x lineitem, customer x orders) shuffle on the
  *    join key once and reuse it for the downstream groupBy where possible;
  *  - aggregations are plain groupBy → Catalyst does partial (map-side)
  *    aggregation automatically;
  *  - global windows/sorts appear only where semantics require a total
  *    ranking (q11, q15); q15 uses driver-side count + limit (Spark plans
  *    TakeOrderedAndProject — a distributed top-k, not a single-partition
  *    sort).
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  private val TS = "yyyy-MM-dd HH:mm:ss"

  /** TPC-H Q1-style pricing summary: scan + filter + groupBy agg (A1-A3).
    * Filter + 7-column projection reach the parquet scan via pushdown. */
  def q01PricingSummary(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 3).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Projection + conjunctive predicates (P1, F1-F4): pushed filters. */
  def q02FilterProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "A" && col("l_discount") > 0.05 &&
        col("l_shipdate").isNotNull && col("l_linestatus") =!= "X")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** Inner equi-join chain fact→dim (J1): orders ⋈ customer ⋈ nation.
    * nation (25·sf rows) broadcast; customer side shuffles once on custkey. */
  def q03JoinAgg(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total_price"))
      .orderBy("n_name")
  }

  /** Left outer join preserving unmatched left rows (J2): count(o_orderkey)
    * skips nulls, so order-less customers show 0. */
  def q04LeftJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count("o_orderkey").as("n_orders"))
      .orderBy("c_custkey")
  }

  /** Left-semi join = EXISTS (F5): customers having at least one finished
    * order. Semi join shuffles only the key column of the right side. */
  def q05SemiJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("c_custkey"))
    c.join(o, Seq("c_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")
  }

  /** Left-anti join = NOT EXISTS (F6): customers with no orders at all. */
  def q06AntiJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).select(col("o_custkey").as("c_custkey"))
    c.join(o, Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** TPC-H Q5-style multi-way join (J4): region ⋈ nation ⋈ customer ⋈
    * orders ⋈ lineitem, revenue per region. All dims broadcast; the only
    * shuffles are lineitem⋈orders on orderkey and the final small agg. */
  def q07MultiJoin(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d)
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("r_name")
  }

  /** Distinct projection (R2/F7): dropDuplicates == SELECT DISTINCT. */
  def q08Distinct(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select("c_mktsegment", "c_nationkey")
      .distinct()
      .orderBy("c_mktsegment", "c_nationkey")

  /** Deterministic dedup (F7): keep the smallest orderkey per (part,supp)
    * pair — groupBy-min instead of pandas' order-dependent keep-first. */
  def q09Dedup(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_partkey", "l_suppkey")
      .agg(min("l_orderkey").as("first_orderkey"), count(lit(1)).as("n_lines"))
      .orderBy("l_partkey", "l_suppkey")

  /** Per-group argmax via window rank (J5 rewrite): each customer's
    * highest-value order(s), ties kept — exactly the reference's
    * theta-self-join + IS NULL idiom, as a single shuffle + window. */
  def q10ArgmaxWindow(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc)
    o.withColumn("rk", rank().over(w))
      .filter(col("rk") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Global ranking with pandas-parity average-rank (A7):
    * rank_avg = trunc(min_rank + (ties-1)/2), the semantics of
    * pandas .rank(method='average').astype(int) used by the reference.
    *
    * Re-shaped round 14 (VERDICT r13 #1 — the single-partition-window
    * class): the old form ran `rank() OVER (ORDER BY c_acctbal DESC)`
    * over the FULL table — every row through one task. This form is the
    * two-pass distinct-value rank ([[graft.functions.GroupOps
    * .pandasAvgRankDesc]]'s shape, the round-2 fix finally applied to
    * its own query): aggregate tie counts per distinct balance (one
    * map-side-combinable shuffle of (value, count) pairs), prefix-sum
    * them in value order, and broadcast-join the rank table back. The
    * fact table is never globally sorted, windowed, or even shuffled.
    * The remaining partition-less window runs on the DISTINCT-BALANCE
    * frame, which is domain-bounded, not corpus-bounded: c_acctbal is a
    * 2-decimal value in [-999.99, 9999.99] — at most ~1.1M rows at ANY
    * corpus size (~17 MB, broadcastable). rank()'s min-rank semantics =
    * 1 + count of strictly-greater rows = 1 + prefix sum of greater
    * groups' tie counts; ties never span groups, so the two forms are
    * value-identical (oracle re-verified, rank types pinned to int). */
  def q11RankGlobal(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val byBal = c.groupBy("c_acctbal").agg(count(lit(1)).as("ties"))
    val w = Window.orderBy(col("c_acctbal").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranks = byBal
      .withColumn("rank_min",
        (coalesce(sum("ties").over(w), lit(0L)) + lit(1L)).cast("int"))
      .withColumn("rank_avg",
        floor(col("rank_min") + (col("ties") - lit(1L)) / lit(2.0)).cast("int"))
      .select(col("c_acctbal").as("bal"), col("rank_min"), col("rank_avg"))
    c.select(col("c_custkey"), col("c_acctbal"))
      // null-safe equality: a NULL balance group must keep its rank row
      // (none exist in the fixtures, but the join must not silently drop
      // what the old window form ranked)
      .join(broadcast(ranks), col("c_acctbal") <=> col("bal"))
      .select(col("c_custkey"), col("c_acctbal"), col("rank_min"), col("rank_avg"))
      .orderBy("c_custkey")
  }

  /** Exact interpolating median (A4) — numpy/np.median parity needs exact
    * percentile (mean of middle two), not percentile_approx. */
  def q12Median(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 3).as("median_qty"),
        round(expr("percentile(l_extendedprice, 0.5)"), 3).as("median_price"))
      .orderBy("l_returnflag")

  /** h-index (A6) as a pure-builtin window formulation:
    * h = max(least(citations_desc_rank_value, rank)). Here "citations" of an
    * order = its lineitem count; h-index per customer. Exactly the
    * reference's binary-search-over-sorted-desc semantics. */
  def q13HIndex(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(s, d).select("l_orderkey")
    val cites = li.groupBy("l_orderkey").agg(count(lit(1)).as("n_cites"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("n_cites").desc, col("o_orderkey"))
    cites.withColumn("rn", row_number().over(w))
      .groupBy("o_custkey")
      .agg(max(least(col("n_cites"), col("rn"))).cast("int").as("hindex"))
      .withColumnRenamed("o_custkey", "c_custkey")
      .orderBy("c_custkey")
  }

  /** Mode with Postgres-parity deterministic tie-break (A8): most frequent
    * mktsegment per nation, ties broken by segment name ascending —
    * count-groupBy + argmax window, NOT Spark's arbitrary-tie mode(). */
  def q14Mode(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val counts = c.groupBy("c_nationkey", "c_mktsegment").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("cnt").desc, col("c_mktsegment"))
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("c_nationkey"), col("c_mktsegment").as("mode_segment"), col("cnt").as("mode_count"))
      .orderBy("c_nationkey")
  }

  /** Computed-percent LIMIT top-k (A9/O3): top 1% customers by balance.
    * k is computed driver-side (one cheap count) and fed to limit() so the
    * plan is TakeOrderedAndProject — per-partition top-k then merge, no
    * global sort, no single-partition window. */
  def q15TopPercent(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val k = math.round(0.01 * c.count()).toInt
    c.select("c_custkey", "c_acctbal")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
      .limit(k)
  }

  /** Explode (R1): word frequency over part names. */
  def q16Explode(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(explode(split(col("p_name"), " ")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("n"))
      .orderBy("word")

  /** Scalar-function projection (C2-C10): regexp_replace, trim, case,
    * substring, concat, length, cast — all codegen'd builtins — plus the
    * custom transliterate Expression (C1) on a diacritic-bearing sample
    * (DuckDB strip_accents agrees on NFD-decomposable characters). */
  def q17ScalarFuncs(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("name_upper"),
        length(col("c_name")).as("name_len"),
        concat(substring(col("c_name"), 1, 3), lit("_"), col("c_custkey").cast("string")).as("name_code"),
        trim(regexp_replace(col("c_name"), "[0-9]", "")).as("name_clean"),
        graft.functions.TransliterateFn.transliterate(
          concat(col("c_name"), lit(" Šrámek-čá"))).as("name_ascii"),
        round(col("c_acctbal"), 0).cast("long").as("bal_rounded"))
      .orderBy("c_custkey")

  /** Date-part extraction + agg (C12), exact distinct count (A5). */
  def q18YearAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("order_year"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct("o_custkey").as("n_customers"),
        round(sum("o_totalprice"), 2).as("total_price"))
      .orderBy("order_year")

  /** Running total window frame (§2.5 extension): cumulative spend per
    * customer over order history; deterministic total order within groups. */
  def q19RunningSum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum("o_totalprice").over(w), 2).as("running_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** JSON field access (C13): extract props.k from the events JSON blob. */
  def q20Json(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), count(lit(1)).as("n"), max("k").as("max_k"))
      .orderBy("event_type")

  /** Graph 2-hop self-join (J7/G3): supplier pairs co-supplying a part,
    * via [[graft.operators.CoOccur]] — distinct (part,supplier) input,
    * s1<s2 halves the pair space, and parts with more than 64 suppliers
    * are dropped before the join (hot-key bound; the synthetic data maxes
    * at 52 suppliers/part at sf0.1, so the cap is inert here, but a
    * skewed part at 100× data would otherwise fan out quadratically).
    * The DuckDB oracle applies the same cap, so semantics match at every
    * scale factor by construction. */
  def q21CoSupply(s: SparkSession, d: String): DataFrame =
    graft.operators.CoOccur.pairs(
      Tables.lineitem(s, d).select("l_partkey", "l_suppkey"),
      keyCol = "l_partkey", itemCol = "l_suppkey",
      minShared = 2L, maxItemsPerKey = 64L)
      .select(col("item_a").as("s1"), col("item_b").as("s2"),
        col("shared_keys").as("shared_parts"))
      .orderBy("s1", "s2")

  /** Sorted collect_list (A11) rendered as a deterministic string. */
  def q22Collect(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(
        concat_ws(",", sort_array(collect_list(col("o_orderstatus")))).as("statuses"),
        count(lit(1)).as("n_orders"))
      .withColumnRenamed("o_custkey", "c_custkey")
      .orderBy("c_custkey")

  /** Set op (R-ext): UNION (dedup) of two key projections. */
  def q23Union(s: SparkSession, d: String): DataFrame = {
    val a = Tables.customer(s, d).filter(col("c_acctbal") < 0).select(col("c_custkey").as("k"))
    val b = Tables.orders(s, d).select(col("o_custkey").as("k"))
    a.union(b).distinct().orderBy("k")
  }

  /** Integer-division + percent formatting (A2/C11 hard parts): share of
    * negative-balance customers per nation as 'NN%' with truncating
    * integer division, the reference's TO_CHAR(x*100/y,'fm99%') semantics. */
  def q24IntDiv(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy("c_nationkey")
      .agg(
        sum(when(col("c_acctbal") < 0, 1).otherwise(0)).as("n_neg"),
        count(lit(1)).as("n_total"))
      .select(
        col("c_nationkey"),
        col("n_neg").cast("long").as("n_neg"),
        col("n_total"),
        concat(floor(col("n_neg") * lit(100.0) / col("n_total")).cast("int").cast("string"),
          lit("%")).as("neg_pct"))
      .orderBy("c_nationkey")

  /** Tumbling time window (§2.10 batch analog): hourly event rollup via
    * window() — the same operator Structured Streaming uses. */
  def q25Tumbling(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(date_format(col("w.start"), TS).as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("hour_start", "event_type")

  /** Sliding time window: 2h windows sliding by 1h — each event lands in 2
    * windows; window() handles the fan-out natively. */
  def q26Sliding(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
      .agg(count(lit(1)).as("n"), round(avg("value"), 3).as("avg_value"))
      .select(date_format(col("w.start"), TS).as("window_start"), col("n"), col("avg_value"))
      .orderBy("window_start")

  /** Sessionization (§2.10 / mapGroupsWithState batch analog): 30-minute
    * inactivity gap splits sessions; lag + cumulative-flag windows. The
    * streaming twin lives in graft.streaming.EventSessions. */
  def q27Sessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = 30L * 60 * 1000000
    Tables.events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > gapUs, 1)
          .otherwise(0))
      .withColumn("session_id", sum("new_session")
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        date_format(min("ts"), TS).as("session_start"),
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("session_value"))
      .orderBy("user_id", "session_id")
  }

  /** Pivot / reshape (R-ext): order counts and revenue per year × status
    * matrix; explicit value list keeps the plan a single pass, coalesce
    * aligns empty cells with the oracle's CASE-sum zeros. */
  def q28Pivot(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("order_year"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("order_year"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy("order_year")

  /** Rollup (grouping-sets ext): subtotals per (year, status), per year,
    * and grand total in one pass. */
  def q29Rollup(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .rollup(year(col("o_orderdate")).as("order_year"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total_price"))
      .orderBy(col("order_year").asc_nulls_first, col("o_orderstatus").asc_nulls_first)

  /** Approximate aggregates (the sketches a 100 TB user reaches for when
    * exact distinct/percentile are too expensive): HyperLogLog++ distinct
    * and approx_percentile per order-priority, each SELF-CHECKED against
    * the exact value computed in the same pass. Sketch values are
    * engine-specific, so — like q37's fingerprint algebra — the oracle
    * checks the error-bound BOOLEANS (DuckDB predicts `true`) while the
    * exact columns stay hash-compared. HLL++ at rsd=0.02 and the exact
    * true quantile bracket make the bounds deterministic on fixed data,
    * not probabilistic assertions. */
  def q57ApproxAggs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        countDistinct(col("o_custkey")).as("exact_distinct"),
        approx_count_distinct(col("o_custkey"), rsd = 0.02).as("approx_d"),
        expr("percentile(o_totalprice, 0.5)").as("exact_p50"),
        expr("approx_percentile(o_totalprice, 0.5, 10000)").as("approx_p50"),
        min("o_totalprice").as("min_price"), max("o_totalprice").as("max_price"))
      .select(col("o_orderpriority"), col("exact_distinct"),
        (abs(col("approx_d") - col("exact_distinct")) <=
          greatest(col("exact_distinct") * 0.05, lit(8.0))).as("distinct_ok"),
        round(col("exact_p50"), 2).as("exact_p50"),
        (col("approx_p50") >= col("min_price") &&
          col("approx_p50") <= col("max_price") &&
          abs(col("approx_p50") - col("exact_p50")) <=
            (col("max_price") - col("min_price")) * 0.05).as("p50_ok"))
      .orderBy("o_orderpriority")

  /** As-of join (custom operator, composed — see operators.AsOfJoin): each
    * purchase event paired with the user's most recent click at or before
    * it. DuckDB's native ASOF LEFT JOIN is the oracle. */
  def q42AsOf(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts", "value")
    graft.operators.AsOfJoin.backward(
      purchases, clicks, on = Seq("user_id"), leftTs = "ts", rightTs = "ts",
      rightCols = Map("ts" -> "click_ts", "value" -> "click_value"))
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), TS).as("purchase_ts"),
        date_format(col("click_ts"), TS).as("click_ts"),
        round(col("click_value"), 2).as("click_value"))
      .orderBy("event_id")
  }

  /** Native session windows (Spark's session_window operator): same
    * 30-minute-gap sessions as q27, via the built-in merging-window agg
    * instead of lag+cumsum. Boundary note: session_window closes at
    * gap >= 30 min where q27's lag formulation closes at > 30 min —
    * indistinguishable on micro-precision timestamps. */
  def q43SessionWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("session_value"))
      .select(col("user_id"), date_format(col("w.start"), TS).as("session_start"),
        col("n_events"), col("session_value"))
      .orderBy("user_id", "session_start")

  /** Range join (custom operator — see operators.RangeJoin): low-priority
    * orders placed inside any urgent order's 7-day window, with the count
    * of covering windows. The bucketed equi-join formulation replaces the
    * O(n·m) BroadcastNestedLoop Spark would plan for the raw BETWEEN
    * predicate; the DuckDB oracle runs the literal inequality join
    * (its IEJoin handles that natively at oracle scale). */
  def q45RangeJoin(s: SparkSession, d: String): DataFrame = {
    val epoch = lit("1970-01-01").cast("date")
    val orders = Tables.orders(s, d)
    val points = orders.filter(col("o_orderpriority") === "5-LOW")
      .select(col("o_orderkey").as("point_key"),
        col("o_orderdate").as("point_date"),
        datediff(col("o_orderdate"), epoch).as("p_day"))
    val windows = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(datediff(col("o_orderdate"), epoch).as("w_start"),
        (datediff(col("o_orderdate"), epoch) + lit(6)).as("w_end"))
    graft.operators.RangeJoin.pointInInterval(
      points, windows, "p_day", "w_start", "w_end", width = 7L)
      .groupBy("point_key", "point_date")
      .agg(count(lit(1)).as("n_windows"))
      .select(col("point_key"), date_format(col("point_date"), "yyyy-MM-dd").as("order_date"),
        col("n_windows"))
      .orderBy("point_key")
  }

  /** q42 through the dedicated physical operator
    * ([[graft.plans.AsOfJoinExec]]: custom LogicalPlan + Strategy +
    * per-partition merge exec) instead of the composed window — same
    * DuckDB ASOF oracle, so the custom-Catalyst path sits under the same
    * correctness gate as everything else. */
  def q46AsOfExec(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts", "value")
    graft.operators.AsOfJoin.backwardExec(
      purchases, clicks, on = Seq("user_id"), leftTs = "ts", rightTs = "ts",
      rightCols = Map("ts" -> "click_ts", "value" -> "click_value"))
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), TS).as("purchase_ts"),
        date_format(col("click_ts"), TS).as("click_ts"),
        round(col("click_value"), 2).as("click_value"))
      .orderBy("event_id")
  }

  /** Bloom-pruned semi-join (custom operator — see operators.BloomPrune):
    * revenue of lineitems belonging to 1-URGENT orders, by return flag.
    * The urgent orderkeys' bloom filter (BloomFilterAggregate, the
    * primitive behind Spark's AQE runtime filter) prunes the lineitem
    * scan before the join shuffle; the exact semi-join then removes the
    * false positives, so the oracle is the plain semi-join. */
  def q60BloomSemiJoin(s: SparkSession, d: String): DataFrame = {
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    graft.operators.BloomPrune.semiJoin(
      Tables.lineitem(s, d), urgent, "l_orderkey", "o_orderkey",
      expectedItems = 1000000L)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy("l_returnflag")
  }

  /** Z-order cell occupancy (custom operator — see operators.ZOrder):
    * Morton key of (customer, order-day), aggregated per coarse z-cell.
    * The key is pure shift/mask arithmetic, so the DuckDB twin
    * reproduces every bit — the determinism proof for the layout
    * operator ZOrder.layoutByZOrder clusters files by. */
  def q63ZOrderCells(s: SparkSession, d: String): DataFrame = {
    val epoch = lit("1970-01-01").cast("date")
    val keyed = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate"), epoch).as("day"))
      .withColumn("z", graft.operators.ZOrder.zKey(
        Seq(col("o_custkey"), col("day")), bits = 16))
    keyed.groupBy(shiftright(col("z"), 20).as("z_cell"))
      .agg(count(lit(1)).as("n_orders"),
        min("day").as("min_day"), max("day").as("max_day"))
      .orderBy("z_cell")
  }

  /** Salted skew join, DECLARED ([[graft.operators.SkewJoin]]): the
    * engine's bounded-replication answer to hot join keys, previously
    * proved only by ScaleBench's timed A/B/C (salted 2.03 s < plain
    * 3.73 s at 18M rows, BENCH_SCALE_r05) — this query makes its
    * CORRECTNESS contract a hash-checked battery member: saltedInner's
    * result equals the plain join exactly (salting changes partitioning,
    * never the result set), so the oracle is the PLAIN SQL join. The
    * fact key is deliberately skewed — every 4th order's lineitems
    * collapse onto supplier 1, giving that key ~25% of the fact side —
    * so the salted path (per-row salt on the big side, 16× replication
    * of the supplier dim) is genuinely exercised, not just planned. */
  def q118SkewJoinSalted(s: SparkSession, d: String): DataFrame = {
    val fact = Tables.lineitem(s, d).select(
      when(pmod(col("l_orderkey"), lit(4)) === 0, lit(1L))
        .otherwise(col("l_suppkey")).as("s_suppkey"),
      col("l_quantity"), col("l_extendedprice"))
    val dim = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
    graft.operators.SkewJoin.saltedInner(fact, dim, Seq("s_suppkey"))
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy("s_nationkey")
  }

  val all: Map[String, Q] = Map(
    "q118_skew_join_salted" -> (q118SkewJoinSalted _),
    "q63_zorder_cells" -> (q63ZOrderCells _),
    "q60_bloom_semi_join" -> (q60BloomSemiJoin _),
    "q28_pivot" -> (q28Pivot _),
    "q29_rollup" -> (q29Rollup _),
    "q42_asof_join" -> (q42AsOf _),
    "q43_session_window" -> (q43SessionWindow _),
    "q57_approx_aggs" -> (q57ApproxAggs _),
    "q45_range_join" -> (q45RangeJoin _),
    "q46_asof_exec" -> (q46AsOfExec _),
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_filter_project" -> (q02FilterProject _),
    "q03_join_agg" -> (q03JoinAgg _),
    "q04_left_join" -> (q04LeftJoin _),
    "q05_semi_join" -> (q05SemiJoin _),
    "q06_anti_join" -> (q06AntiJoin _),
    "q07_multi_join" -> (q07MultiJoin _),
    "q08_distinct" -> (q08Distinct _),
    "q09_dedup_keys" -> (q09Dedup _),
    "q10_argmax_window" -> (q10ArgmaxWindow _),
    "q11_rank_global" -> (q11RankGlobal _),
    "q12_median" -> (q12Median _),
    "q13_hindex" -> (q13HIndex _),
    "q14_mode" -> (q14Mode _),
    "q15_top_percent" -> (q15TopPercent _),
    "q16_explode_words" -> (q16Explode _),
    "q17_scalar_funcs" -> (q17ScalarFuncs _),
    "q18_year_agg" -> (q18YearAgg _),
    "q19_running_sum" -> (q19RunningSum _),
    "q20_json_extract" -> (q20Json _),
    "q21_cosupply_pairs" -> (q21CoSupply _),
    "q22_collect_sorted" -> (q22Collect _),
    "q23_union_distinct" -> (q23Union _),
    "q24_intdiv_pct" -> (q24IntDiv _),
    "q25_tumbling_window" -> (q25Tumbling _),
    "q26_sliding_window" -> (q26Sliding _),
    "q27_sessionize" -> (q27Sessionize _),
  )

  /** DuckDB twins. Same column names, same ORDER BY, same rounding. */
  val oracle: Map[String, String] = Map(
    // the PLAIN join — saltedInner's contract is result-set equality
    "q118_skew_join_salted" ->
      """WITH fact AS (SELECT
        |  CASE WHEN l_orderkey % 4 = 0 THEN 1 ELSE l_suppkey END AS s_suppkey,
        |  l_quantity, l_extendedprice FROM lineitem)
        |SELECT s_nationkey, count(*) AS n_items,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS revenue
        |FROM fact JOIN supplier USING (s_suppkey)
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q63_zorder_cells" -> {
      val z = graft.operators.ZOrder.zKeySql(
        Seq("o_custkey", "datediff('day', DATE '1970-01-01', o_orderdate)"), 16)
      s"""WITH k AS (SELECT o_orderkey,
         |  datediff('day', DATE '1970-01-01', o_orderdate) AS day,
         |  $z AS z FROM orders)
         |SELECT z >> 20 AS z_cell, count(*) AS n_orders,
         |  min(day) AS min_day, max(day) AS max_day
         |FROM k GROUP BY z_cell ORDER BY z_cell""".stripMargin
    },
    "q60_bloom_semi_join" ->
      """SELECT l_returnflag, count(*) AS n_items,
        |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q42_asof_join" -> asofOracleSql,
    // q46 runs the same semantics through the custom physical operator;
    // the oracle is identical by design
    "q46_asof_exec" -> asofOracleSql,
    "q43_session_window" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  count(*) AS n_events, round(sum(value),2) AS session_value
        |FROM sessions GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,
    "q45_range_join" ->
      """SELECT p.o_orderkey AS point_key,
        |strftime(p.o_orderdate, '%Y-%m-%d') AS order_date,
        |count(*) AS n_windows
        |FROM (SELECT * FROM orders WHERE o_orderpriority = '5-LOW') p
        |JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') w
        |  ON p.o_orderdate >= w.o_orderdate
        | AND p.o_orderdate <= w.o_orderdate + INTERVAL 6 DAY
        |GROUP BY point_key, order_date
        |ORDER BY point_key""".stripMargin,
    "q28_pivot" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS order_year,
        |count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY order_year ORDER BY order_year""".stripMargin,
    "q29_rollup" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS order_year, o_orderstatus,
        |count(*) AS n, round(sum(o_totalprice),2) AS total_price
        |FROM orders GROUP BY ROLLUP(order_year, o_orderstatus)
        |ORDER BY order_year ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin,
    // sketch VALUES are engine-specific; the oracle checks the exact
    // columns plus the error-bound booleans (predicted true), q37-style
    "q57_approx_aggs" ->
      """SELECT o_orderpriority,
        |count(DISTINCT o_custkey) AS exact_distinct,
        |true AS distinct_ok,
        |round(median(o_totalprice), 2) AS exact_p50,
        |true AS p50_ok
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |round(sum(l_quantity),2) AS sum_qty,
        |round(sum(l_extendedprice),2) AS sum_base_price,
        |round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        |round(avg(l_quantity),3) AS avg_qty,
        |round(avg(l_discount),4) AS avg_disc,
        |count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_returnflag = 'A' AND l_discount > 0.05
        |  AND l_shipdate IS NOT NULL AND l_linestatus <> 'X'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_join_agg" ->
      """SELECT n_name, count(*) AS n_orders, round(sum(o_totalprice),2) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q04_left_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q05_semi_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q06_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q07_multi_join" ->
      """SELECT r_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        |count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q08_distinct" ->
      """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,
    "q09_dedup_keys" ->
      """SELECT l_partkey, l_suppkey, min(l_orderkey) AS first_orderkey,
        |count(*) AS n_lines
        |FROM lineitem GROUP BY l_partkey, l_suppkey ORDER BY l_partkey, l_suppkey""".stripMargin,
    "q10_argmax_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rk
        |  FROM orders) t
        |WHERE rk = 1 ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q11_rank_global" ->
      """SELECT c_custkey, c_acctbal,
        |  rank() OVER (ORDER BY c_acctbal DESC) AS rank_min,
        |  CAST(floor((rank() OVER (ORDER BY c_acctbal DESC))
        |       + (count(*) OVER (PARTITION BY c_acctbal) - 1)/2.0) AS INT) AS rank_avg
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q12_median" ->
      """SELECT l_returnflag,
        |round(quantile_cont(l_quantity, 0.5),3) AS median_qty,
        |round(quantile_cont(l_extendedprice, 0.5),3) AS median_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q13_hindex" ->
      """WITH cites AS (
        |  SELECT o_custkey, l_orderkey, count(*) AS n_cites
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY o_custkey, l_orderkey),
        |ranked AS (
        |  SELECT o_custkey, n_cites,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY n_cites DESC, l_orderkey) AS rn
        |  FROM cites)
        |SELECT o_custkey AS c_custkey,
        |       CAST(max(least(n_cites, rn)) AS INT) AS hindex
        |FROM ranked GROUP BY o_custkey ORDER BY c_custkey""".stripMargin,
    "q14_mode" ->
      """SELECT c_nationkey, c_mktsegment AS mode_segment, cnt AS mode_count FROM (
        |  SELECT c_nationkey, c_mktsegment, count(*) AS cnt,
        |         row_number() OVER (PARTITION BY c_nationkey
        |                            ORDER BY count(*) DESC, c_mktsegment) AS rk
        |  FROM customer GROUP BY c_nationkey, c_mktsegment) t
        |WHERE rk = 1 ORDER BY c_nationkey""".stripMargin,
    "q15_top_percent" ->
      """SELECT c_custkey, c_acctbal FROM (
        |  SELECT c_custkey, c_acctbal,
        |         row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rn,
        |         count(*) OVER () AS n
        |  FROM customer) t
        |WHERE rn <= round(0.01 * n) ORDER BY c_acctbal DESC, c_custkey""".stripMargin,
    "q16_explode_words" ->
      """SELECT word, count(*) AS n
        |FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part) t
        |GROUP BY word ORDER BY word""".stripMargin,
    "q17_scalar_funcs" ->
      """SELECT c_custkey,
        |upper(c_name) AS name_upper,
        |length(c_name) AS name_len,
        |concat(substring(c_name, 1, 3), '_', CAST(c_custkey AS VARCHAR)) AS name_code,
        |trim(regexp_replace(c_name, '[0-9]', '', 'g')) AS name_clean,
        |strip_accents(c_name || ' Šrámek-čá') AS name_ascii,
        |CAST(round(c_acctbal, 0) AS BIGINT) AS bal_rounded
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q18_year_agg" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS order_year, count(*) AS n_orders,
        |count(DISTINCT o_custkey) AS n_customers,
        |round(sum(o_totalprice),2) AS total_price
        |FROM orders GROUP BY order_year ORDER BY order_year""".stripMargin,
    "q19_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q20_json_extract" ->
      """SELECT event_type,
        |CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |count(*) AS n,
        |CAST(max(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q21_cosupply_pairs" ->
      """WITH ps0 AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |ps AS (SELECT * FROM ps0 WHERE l_partkey IN (
        |  SELECT l_partkey FROM ps0 GROUP BY l_partkey HAVING count(*) <= 64))
        |SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, count(*) AS shared_parts
        |FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
        |GROUP BY s1, s2 HAVING count(*) >= 2 ORDER BY s1, s2""".stripMargin,
    "q22_collect_sorted" ->
      """SELECT o_custkey AS c_custkey,
        |string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
        |count(*) AS n_orders
        |FROM orders GROUP BY o_custkey ORDER BY c_custkey""".stripMargin,
    "q23_union_distinct" ->
      """SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0
        |UNION SELECT o_custkey AS k FROM orders ORDER BY k""".stripMargin,
    "q24_intdiv_pct" ->
      """SELECT c_nationkey,
        |CAST(sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
        |count(*) AS n_total,
        |concat(CAST(CAST(floor(sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) * 100.0
        |  / count(*)) AS INT) AS VARCHAR), '%') AS neg_pct
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q25_tumbling_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |event_type, count(*) AS n, round(sum(value),2) AS sum_value
        |FROM events GROUP BY hour_start, event_type ORDER BY hour_start, event_type""".stripMargin,
    "q26_sliding_window" ->
      """SELECT strftime(date_trunc('hour', ts) - off * INTERVAL 1 HOUR,
        |  '%Y-%m-%d %H:%M:%S') AS window_start,
        |count(*) AS n, round(avg(value),3) AS avg_value
        |FROM events CROSS JOIN (VALUES (0),(1)) AS t(off)
        |GROUP BY window_start ORDER BY window_start""".stripMargin,
    "q27_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  count(*) AS n_events, round(sum(value),2) AS session_value
        |FROM sessions GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
  )

  /** Shared by q42 (composed form) and q46 (custom physical operator). */
  private lazy val asofOracleSql: String =
    """SELECT p.event_id, p.user_id,
      |strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
      |strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
      |round(c.value, 2) AS click_value
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin
}
