package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{TextFunctions => T}
import graft.operators.{CoOccur, DataQuality, PageRank, Triangles}

/** OLAP + event-analytics + graph-centrality queries: multi-level
  * aggregation (ROLLUP / pivot), ordered-sequence funnel, cohort
  * retention, and fixed-iteration PageRank. These round out the
  * warehouse surface a training-data platform shares with classic BI:
  * the same engine that dedups the corpus also answers "how do users
  * move through the product" and "which nodes anchor the graph".
  *
  * Every query has an exact DuckDB twin. PageRank is bit-exact across
  * engines because all rank arithmetic is integral ([[PageRank]]).
  */
object AnalyticsQueries {

  type Q = (SparkSession, String) => DataFrame

  /** ROLLUP over (returnflag, linestatus) with grouping_id: detail rows,
    * per-flag subtotals, and the grand total in one pass. Spark plans a
    * single Expand + hash aggregate — each input row is replicated once
    * per grouping set map-side, so the shuffle carries pre-combined
    * partials and no second pass over the fact table is needed. At
    * 100 TB that beats UNIONing three separate aggregations 3x on scan
    * cost alone. grouping_id cast to INT on both sides (Spark's default
    * is LongType; DuckDB GROUPING returns INTEGER). */
  def q64Rollup(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        count(lit(1)).as("n"),
        grouping_id().cast("int").as("gid"))
      .orderBy(col("gid"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Pivot: one row per linestatus, one quantity-sum column per
    * returnflag. The pivot values are LISTED explicitly — Spark then
    * plans a single aggregation with conditional partials (no extra
    * pass to discover values, no driver-side distinct collect), exactly
    * the FILTERed-aggregate form of the DuckDB twin. */
  def q65Pivot(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(round(sum("l_quantity"), 2))
      .select(col("l_linestatus"), col("A").as("qty_a"),
        col("N").as("qty_n"), col("R").as("qty_r"))
      .orderBy("l_linestatus")

  /** Ordered-sequence funnel over events: per user, the earliest view,
    * the earliest click STRICTLY AFTER that view, and the earliest
    * purchase strictly after that click; `stage` = how deep the user
    * got (0-3). Each stage is a min-aggregation on user_id — map-side
    * combinable, and all four frames shuffle on the SAME key so AQE
    * coalesces them onto one exchange layout. No window over the full
    * event history and no per-user collect: state per user is one
    * timestamp per stage regardless of event volume. */
  def q66Funnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
    val users = ev.select("user_id").distinct()
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("view_ts"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") > col("view_ts"))
      .groupBy("user_id").agg(min("ts").as("click_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") > col("click_ts"))
      .groupBy("user_id").agg(min("ts").as("purchase_ts"))
    users
      .join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .withColumn("stage",
        when(col("purchase_ts").isNotNull, 3)
          .when(col("click_ts").isNotNull, 2)
          .when(col("view_ts").isNotNull, 1)
          .otherwise(0).cast("int"))
      .orderBy("user_id")
  }

  /** Weekly cohort retention: users grouped by the ISO week of their
    * first event; for each (cohort_week, week_offset) the count of
    * cohort members active that week. Two aggregations on user_id /
    * (user_id, week) then one count-distinct — the distinct happens on
    * the already-deduped (user, week) pairs so the heavy input shuffles
    * once. Weeks emitted as ISO `yyyy-MM-dd` STRINGS on both sides:
    * engines and dataframe bridges disagree on DATE vs TIMESTAMP
    * rendering (DuckDB date_trunc returns TIMESTAMP, pandas widens
    * DATE to datetime64), and a string column has exactly one
    * canonical form. */
  def q67CohortRetention(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select("user_id", "ts")
    val cohort = ev.groupBy("user_id")
      .agg(to_date(date_trunc("week", min("ts"))).as("cohort_week"))
    val active = ev
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("week"))
      .distinct()
    active.join(cohort, "user_id")
      .withColumn("week_offset",
        floor(datediff(col("week"), col("cohort_week")) / 7).cast("int"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("user_id").as("n_users"))
      .select(date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** PageRank iterations (kept small: the plan unrolls per iteration). */
  val PrIters = 5

  /** PageRank over the supplier↔part bipartite graph (edge = "supplier
    * ships part", both directions, node ids disjoint via 2k / 2k+1).
    * Integer-arithmetic ranks ([[PageRank.ranks]]) so the DuckDB twin
    * reproduces every rank bit-for-bit — no FP summation order
    * dependence. Output ordered by node (rank ties are common in a
    * regular bipartite graph, so rank alone is not a total order). */
  def q68PageRank(s: SparkSession, d: String): DataFrame = {
    val sp = Tables.lineitem(s, d)
      .select((col("l_suppkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))
      .distinct()
    val edges = sp.union(sp.select(col("dst").as("src"), col("src").as("dst")))
    PageRank.ranks(s, edges, PrIters).orderBy("node")
  }

  /** Tokens of the encoded prefix in [[q70Encode]]. */
  val EncodePrefix = 16

  /** Frequency-ranked vocabulary over the document corpus: token ->
    * (freq, id), id dense from 1 in (freq desc, token) order — the
    * "build the tokenizer vocab" step. The corpus-scale work is one
    * explode + count aggregation (map-side combinable); the global
    * row_number window then ranks only |vocab| rows, which Heaps' law
    * keeps orders of magnitude below corpus size (Web-scale corpora:
    * ~10^6-10^7 types vs 10^12 tokens), so the single-partition window
    * is dictionary-scale, same as q11's documented rank. */
  def q69Vocab(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(T.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .withColumn("id",
        row_number().over(Window.orderBy(col("freq").desc, col("token"))))
      .orderBy("id")

  /** Token-id encoding: each document's first [[EncodePrefix]] tokens
    * mapped through the [[q69Vocab]] dictionary, emitted as a
    * comma-joined id string (a string is canonical across engines;
    * array renderings differ). The vocab is broadcast — corpus rows
    * never shuffle for the lookup; per-doc order is restored by sorting
    * the collected (pos, id) structs, not by assuming shuffle order. */
  def q70Encode(s: SparkSession, d: String): DataFrame = {
    val vocab = q69Vocab(s, d).select("token", "id")
    val toks = Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(slice(T.tokens(col("text")), 1, EncodePrefix)))
      .toDF("doc_id", "pos", "token")
    toks.join(broadcast(vocab), "token")
      .groupBy("doc_id")
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("id")))),
            (x: Column) => x.getField("id").cast("string")), ",").as("ids"),
        count(lit(1)).as("n_prefix_tokens"))
      .orderBy("doc_id")
  }

  /** Length deciles via ntile(10): balanced buckets over a TOTAL integer
    * order (n_chars desc, doc_id) — integer keys so no FP boundary can
    * flip a bucket between engines.
    *
    * Re-shaped round 14 (VERDICT r13 #1): the old form was a literal
    * `ntile(10) OVER (ORDER BY …)` — the whole corpus through ONE window
    * task. This form derives the identical bucket ids in two passes:
    * (1) per-distinct-length tie counts (map-side-combinable aggregate),
    * prefix-summed in length order — the only partition-less window left
    * runs on the DISTINCT-LENGTH frame, bounded by the document-length
    * domain (≤ max chars/doc rows at any corpus size), not the corpus;
    * (2) the global row number of each doc = its length group's offset +
    * its row_number within the group (ties share a length, so the
    * per-length window partitions cleanly; worst-case skew is the most
    * common length's population, orders of magnitude below "all rows in
    * one task"). The decile is then NTile's exact arithmetic on (rn,
    * total): the first total%10 buckets take total div 10 + 1 rows, the
    * rest total div 10 — bit-identical to the window function (oracle
    * re-verified; the div-by-zero branch is unreachable when total < 10
    * because every row then satisfies the padded-bucket predicate). */
  def q71LengthDeciles(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
    val byLen = docs.groupBy("n_chars").agg(count(lit(1)).as("cnt"))
    val wPrev = Window.orderBy(col("n_chars").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("n_chars").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offs = byLen.select(col("n_chars").as("nc"),
      coalesce(sum("cnt").over(wPrev), lit(0L)).as("offset"),
      sum("cnt").over(wAll).as("total"))
    val wDoc = Window.partitionBy("n_chars").orderBy("doc_id")
    docs.withColumn("lrn", row_number().over(wDoc))
      .join(broadcast(offs), col("n_chars") === col("nc"))
      .withColumn("rn", col("offset") + col("lrn"))
      .withColumn("decile", expr(
        """CAST(CASE WHEN rn <= (total % 10) * ((total div 10) + 1)
          |  THEN (rn - 1) div ((total div 10) + 1) + 1
          |  ELSE (total % 10) + (rn - (total % 10) * ((total div 10) + 1) - 1)
          |       div (total div 10) + 1 END AS INT)""".stripMargin))
      .select(col("doc_id"), col("n_chars"), col("decile"))
      .orderBy("doc_id")
  }

  /** Reconciliation via FULL OUTER join: per-customer order counts in
    * the two halves of the date range, customers present in either
    * half, labeled both/first_only/second_only. Both aggregates and the
    * join share the o_custkey key — one shuffle layout end to end. */
  def q72Reconcile(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val cut = lit("1998-01-01").cast("timestamp")
    val h1 = o.filter(col("o_orderdate") < cut)
      .groupBy("o_custkey").agg(count(lit(1)).as("n_h1"))
    val h2 = o.filter(col("o_orderdate") >= cut)
      .groupBy("o_custkey").agg(count(lit(1)).as("n_h2"))
    h1.join(h2, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        coalesce(col("n_h1"), lit(0L)).as("n_h1"),
        coalesce(col("n_h2"), lit(0L)).as("n_h2"),
        when(col("n_h1").isNotNull && col("n_h2").isNotNull, "both")
          .when(col("n_h1").isNotNull, "first_only")
          .otherwise("second_only").as("status"))
      .orderBy("o_custkey")
  }

  /** Set operations INTERSECT / EXCEPT: part keys shipped under
    * returnflag A vs R, labeled by membership. Spark plans set ops as
    * aggregations/anti-joins on the compared columns — no row-by-row
    * driver logic. Note the three branches re-evaluate the pushdown-
    * filtered key scans (6 narrow scans total — Catalyst does not share
    * subplans across branches); at real scale persist the two key sets
    * first, or use the single-pass groupBy-membership form
    * (`max(flag='A'), max(flag='R')` + CASE) which labels all three
    * classes in one scan and one shuffle. This query keeps the literal
    * INTERSECT/EXCEPT operators — that operator surface is the thing
    * under test. */
  def q73SetOps(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    def keys(flag: String) =
      li.filter(col("l_returnflag") === flag).select("l_partkey").distinct()
    val a = keys("A"); val r = keys("R")
    a.intersect(r).withColumn("status", lit("both"))
      .union(a.except(r).withColumn("status", lit("a_only")))
      .union(r.except(a).withColumn("status", lit("r_only")))
      .orderBy("l_partkey")
  }

  /** Edge budget for [[q74Triangles]] — the top-k bound that keeps the
    * triangle join constant-size at any corpus scale. */
  val TriEdges = 2000

  /** Per-supplier triangle counts among the [[TriEdges]] strongest
    * co-supply relationships (q21's capped pair graph ranked by
    * shared_parts desc, ties on (s1,s2)). The top-k bound is the scale
    * control: the co-supply graph of a uniform catalog approaches
    * completeness (C(n,2) edges) where full triangle enumeration is
    * cubic — ranking edges first turns "triangles in a 100 TB-derived
    * graph" into a constant-size broadcast-joinable problem, and the
    * deterministic total order keeps the DuckDB twin exact. */
  def q74Triangles(s: SparkSession, d: String): DataFrame =
    q74WithPin(s, d, pinTop = PinTriTop)

  /** [[q74Triangles]] with an explicit top-edge materialization dial —
    * the round-13 A/B (TimeQuery q74_pin / q74_rescan). The wedge-close
    * enumeration reads its edge input THREE times (ab/ac/bc), and
    * without pinning each read re-derives the ENTIRE CoOccur pipeline
    * (lineitem scan + distinct + hot-key bound + self-join + aggregate
    * + TakeOrdered): the round-13 plan audit counted 12 parquet scans /
    * 21 exchanges in the declared plan. `top` is ≤ [[TriEdges]] = 100
    * rows by construction (deterministic total order, so the limit is
    * stable), so one eager localCheckpoint collapses the three
    * derivations into one and the joins read a 100-row leaf. Output
    * identical by construction (the checkpoint is a plan cut, not a
    * value change); the q74 oracle re-verified post-flip. Checkpoint
    * blocks are swept by the bench/TimeQuery per-run persistent-RDD
    * sweep (the CC-internal-checkpoint precedent). */
  private[graft] def q74WithPin(s: SparkSession, d: String,
      pinTop: Boolean): DataFrame = {
    val top0 = CoOccur.pairs(Tables.lineitem(s, d), "l_partkey", "l_suppkey",
        minShared = 2L, maxItemsPerKey = 64L)
      .orderBy(col("shared_keys").desc, col("item_a"), col("item_b"))
      .limit(TriEdges)
      .select(col("item_a").as("a"), col("item_b").as("b"))
    val top = if (pinTop) top0.localCheckpoint(true) else top0
    Triangles.perVertex(broadcast(top))
      .withColumnRenamed("node", "l_suppkey")
      .orderBy("l_suppkey")
  }

  /** Materialize q74's 100-row top-edge frame before the triple-read
    * wedge join (see [[q74WithPin]]). Flipped ON by round-13
    * measurement: two interleaved TimeQuery sessions at sf0.1 (order
    * swapped), pin faster in 7 of 8 same-weather pairs, floors 2.34 vs
    * 2.52 and 1.92 vs 2.15 s (~8-10%). The delta is smaller than the
    * plan-audit scan count suggested (12 scans) because physical-plan
    * exchange reuse already collapses the identical broadcast subtrees
    * at execution; what the pin removes is the residual re-derivation
    * plus the 3x analysis/planning of the full pipeline subtree. */
  private[graft] val PinTriTop = true

  /** Incremental aggregate maintenance: per-priority order counts and
    * revenue from MERGED partial aggregates (base half + delta half)
    * cross-checked in-pass against a full recompute. Money sums run in
    * DECIMAL(18,2) — decimal addition is exact and associative, so
    * merge ≡ recompute bit-for-bit and the `matches_full` booleans are
    * deterministic in both engines. This is the 100 TB maintenance
    * pattern: a day's delta re-aggregates alone and merges into
    * yesterday's partials — the historical table is never rescanned. */
  def q75IncrementalAgg(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_orderpriority").as("priority"),
      col("o_orderdate"), col("o_totalprice").cast("decimal(18,2)").as("price"))
    val cut = lit("1998-01-01").cast("timestamp")
    def agg(df: DataFrame) = df.groupBy("priority")
      .agg(count(lit(1)).as("n"), sum("price").as("total"))
    val merged = agg(o.filter(col("o_orderdate") < cut))
      .union(agg(o.filter(col("o_orderdate") >= cut)))
      .groupBy("priority")
      .agg(sum("n").as("n_merged"), sum("total").cast("decimal(18,2)").as("total_merged"))
    val full = agg(o).select(col("priority"),
      col("n").as("n_full"), col("total").cast("decimal(18,2)").as("total_full"))
    merged.join(full, "priority")
      .select(col("priority"), col("n_merged"),
        // compare in DECIMAL (exact); EMIT as double — decimal columns
        // render differently across the pandas bridges (Decimal vs f64)
        col("total_merged").cast("double").as("total_merged"),
        (col("n_merged") === col("n_full") &&
          col("total_merged") === col("total_full")).as("matches_full"))
      .orderBy("priority")
  }

  /** Dispersion statistics per group: sample stddev/variance,
    * correlation and covariance of quantity vs extended price — the
    * single-pass moment aggregates (Welford-style partials merge
    * map-side like any agg). Rounded to absorb FP partial-order
    * differences between engines, same as q01's sums. */
  def q76Dispersion(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_qty_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** Edit-distance threshold for [[q77EditDist]]. */
  val EditMax = 4

  /** Fuzzy name matching: pairs of DISTINCT part names sharing the same
    * final word (the blocking key), within levenshtein <= [[EditMax]].
    * The classic record-linkage shape — block first, compare within
    * blocks — with the scale control that comparisons run over the
    * NAME VOCABULARY, not rows: part names repeat heavily, so distinct
    * names are catalog-vocabulary-bounded while the part table grows
    * with the corpus. levenshtein is integer-valued — bit-exact across
    * engines, no FP rounding in the compare. */
  def q77EditDist(s: SparkSession, d: String): DataFrame = {
    val names = Tables.part(s, d)
      .select(col("p_name").as("name"),
        element_at(split(col("p_name"), " "), -1).as("block"))
      .distinct()
    val a = names.select(col("block"), col("name").as("name_a"))
    val b = names.select(col("block"), col("name").as("name_b"))
    a.join(b, Seq("block"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= EditMax)
      .select("name_a", "name_b", "dist")
      .orderBy("name_a", "name_b")
  }

  /** Time-series gap filling: hourly event counts per type on a dense
    * hour spine — missing (hour, type) cells become explicit zero rows
    * (resampling for downstream models that need regular series). The
    * spine is generated from the 1-row min/max aggregate (sequence +
    * explode — no driver loop) and cross-joined with the distinct type
    * set: both sides are tiny, the corpus-scale work is the one hourly
    * aggregation. */
  def q78GapFill(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
    val spine = ev.agg(min("hour").as("lo"), max("hour").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 HOUR"))).as("hour"))
    val counts = ev.groupBy("hour", "event_type").agg(count(lit(1)).as("n"))
    spine.crossJoin(ev.select("event_type").distinct())
      .join(counts, Seq("hour", "event_type"), "left")
      .select(date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("hour", "event_type")
  }

  /** Changelog compaction / latest-per-key snapshot: each user's most
    * recent event, tie-broken by the unique event_id so the answer is a
    * total-order argmax. Implemented as `max(struct(ts, event_id,
    * payload))` — a MAP-SIDE-COMBINABLE aggregation, not a window: the
    * window form sorts every partition of the full history, while the
    * struct-max carries ONE candidate row per key per partition into the
    * shuffle. At 100 TB of changelog this is the difference between
    * compaction being an aggregation (cheap, AQE-friendly) and a sort.
    * The DuckDB twin uses the row_number formulation — same semantics,
    * independently expressed. */
  def q81LatestSnapshot(s: SparkSession, d: String): DataFrame =
    // single source of truth with the streaming twin: the same combinable
    // max(struct) aggregation, batch and streaming (EventStreamsSpec pins
    // their equivalence)
    graft.streaming.EventStreams.latestSnapshot(Tables.events(s, d))
      .orderBy("user_id")

  /** CUBE over (order priority, order year): all four grouping sets in
    * one pass — detail, per-priority, per-year, grand total. Like q64's
    * ROLLUP this plans a single Expand + one hash aggregate, so the fact
    * table is scanned once for all 2^k summary levels; the alternative
    * (4 UNIONed aggregations) scans it 2^k times. gid cast to INT on
    * both sides. */
  def q82Cube(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("order_year", year(col("o_orderdate")))
      .cube("o_orderpriority", "order_year")
      .agg(count(lit(1)).as("n"),
        round(sum("o_totalprice"), 2).as("total_price"),
        grouping_id().cast("int").as("gid"))
      .orderBy(col("gid"),
        col("o_orderpriority").asc_nulls_first, col("order_year").asc_nulls_first)

  /** Inter-event time gaps per user: count, mean and max of the deltas
    * between consecutive events (lag window on (ts, event_id)). All gap
    * arithmetic stays in INTEGER microseconds until one final division,
    * so the mean is a single IEEE op on exact integers — bit-equal across
    * engines with no FP-summation-order dependence (the q68/q54 integer
    * discipline applied to time math). Equal-ts ties: the delta multiset
    * of a sorted list doesn't depend on the tiebreak among equal keys, so
    * the aggregates are deterministic regardless. Single-event users
    * report NULL gaps. */
  def q83EventGaps(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap_us", unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w)))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        round(sum("gap_us") / (count(lit(1)) - 1) / lit(1000000.0), 3).as("avg_gap_s"),
        (max("gap_us") / lit(1000000.0)).as("max_gap_s"))
      .orderBy("user_id")
  }

  /** Bucket count for [[q84Histogram]]. */
  val HistBuckets = 10

  /** The all-integer equi-width bucket rule shared by q84 and q110,
    * with its DuckDB twin defined HERE (the hashBucketSql convention) so
    * engine and oracle can never drift. Expects `lo`/`hi` bound columns
    * in scope; `*buckets div range` stays in integers, so no FP boundary
    * can move a row between engines. */
  def equiWidthBucket(v: String, buckets: Int): Column =
    least(lit(buckets - 1L), expr(s"($v - lo) * $buckets div greatest(hi - lo, 1)"))
      .cast("int")
  def equiWidthBucketSql(v: String, buckets: Int): String =
    s"least(${buckets - 1}, ($v - lo) * $buckets // greatest(hi - lo, 1))"

  /** Equi-width histogram of document lengths: [[HistBuckets]] buckets
    * between the global min/max, bucket id computed with INTEGER
    * arithmetic only (`*10 div range`, clamped) so no FP boundary can
    * move a row between engines. The bounds row is a 1-row aggregate
    * broadcast into a narrow per-row map — the corpus scans once and
    * nothing shuffles but the final per-bucket partials. Observed-only
    * buckets (no dense spine): a histogram, not a gap-fill. */
  def q84Histogram(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
    val bounds = docs.agg(min("n_chars").as("lo"), max("n_chars").as("hi"))
    docs.crossJoin(broadcast(bounds))
      .withColumn("bucket", equiWidthBucket("n_chars", HistBuckets))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
      .orderBy("bucket")
  }

  /** Columns profiled by [[q85Profile]]. `value` is pre-cast to
    * DECIMAL(18,6) because the profile renders min/max as strings and
    * decimal-to-string is format-stable across engines (double-to-string
    * shortest-round-trip rules are not). */
  val ProfileCols: Seq[String] = Seq("event_id", "user_id", "event_type", "value")

  /** One-pass column profiling ([[DataQuality.profile]]): per column the
    * row/null/exact-distinct counts and min/max — the "what is in this
    * table" first query of any ingest. One aggregation over the table
    * regardless of column count. */
  def q85Profile(s: SparkSession, d: String): DataFrame =
    DataQuality.profile(
      Tables.events(s, d).select(col("event_id"), col("user_id"), col("event_type"),
        col("value").cast("decimal(18,6)").as("value")),
      ProfileCols)
      .orderBy("col_name")

  /** [[q85Profile]]'s at-scale sibling over the documents table:
    * [[DataQuality.profileApprox]] (HLL++ distinct sketches — map-side
    * mergeable, no Expand multiplication) joined against the exact
    * profile, reporting the EXACT columns plus one boolean per column
    * asserting the sketch landed within 3x the default 5% rsd (with an
    * absolute slack of 1 for tiny cardinalities). The q57 oracle
    * pattern: sketch VALUES are engine-specific and never reach the
    * output; DuckDB recomputes the exact columns and predicts `true`
    * for the bound — a hash-verified accuracy contract. */
  def q112ProfileApprox(s: SparkSession, d: String): DataFrame = {
    val cols = Seq("doc_id", "lang", "source", "n_chars")
    val docs = Tables.documents(s, d).select(cols.map(col): _*)
    val exact = DataQuality.profile(docs, cols)
    val approx = DataQuality.profileApprox(docs, cols)
      .select(col("col_name"), col("n_distinct").as("nd_approx"))
    exact.join(approx, "col_name")
      .select(col("col_name"), col("n_rows"), col("n_null"), col("n_distinct"),
        col("min_val"), col("max_val"),
        (abs(col("nd_approx") - col("n_distinct")) <=
          greatest(lit(1L), (col("n_distinct") * 0.15).cast("long"))).as("approx_ok"))
      .orderBy("col_name")
  }

  /** Declarative quality gate ([[DataQuality.checks]] + orphan counts):
    * primary-key uniqueness, completeness, value-range and
    * referential-integrity checks, each reduced to ONE violation count —
    * the engine-side form of the reference's load-time invariants
    * (uniqueness constraints, non-null count checks). Single-table checks
    * share one aggregation pass per table; FK checks are anti-join
    * counts. */
  def q86QualityGate(s: SparkSession, d: String): DataFrame = {
    import DataQuality.Check
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val li = Tables.lineitem(s, d)
    val single = DataQuality.checks(o, Seq(
      Check("orders_pk_unique",
        count(lit(1)) - count_distinct(col("o_orderkey")), _ === 0),
      Check("orders_totalprice_positive",
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)), _ === 0),
      Check("orders_priority_complete",
        count(lit(1)) - count(col("o_orderpriority")), _ === 0)))
    val fk1 = DataQuality.orphanCount(li, "l_orderkey", o, "o_orderkey")
      .select(lit("lineitem_orders_fk").as("check_name"),
        col("orphans").as("observed"), (col("orphans") === 0).as("passed"))
    val fk2 = DataQuality.orphanCount(o, "o_custkey", c, "c_custkey")
      .select(lit("orders_customer_fk").as("check_name"),
        col("orphans").as("observed"), (col("orphans") === 0).as("passed"))
    single.union(fk1).union(fk2).orderBy("check_name")
  }

  /** SCD Type-2 dimension build from the event changelog: each event
    * becomes a version row with [valid_from, valid_to) from consecutive
    * event times (lead window) and an is_current flag — the
    * temporal-dimension complement of q81's latest-snapshot compaction.
    * Per-user window: the partition key is the entity, so state per task
    * is one entity's history, never the full table. Tie-broken by the
    * unique event_id (and the fixture's timestamps are
    * microsecond-aligned, so both engines sort the same instants). */
  def q87Scd2(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d).select("user_id", "event_id", "event_type", "ts")
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to", lead("ts", 1).over(w))
      .select(col("user_id"), col("version"), col("event_id"), col("event_type"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy("user_id", "version")
  }

  /** Skyline / Pareto frontier of `part` on (minimize retail price,
    * maximize size): rows no other part dominates. NOT the quadratic
    * self-join: group to one max-size row per distinct price (prices are
    * catalog-vocabulary-scale), take the strictly-increasing running max
    * of size over price order on that dictionary-sized frame, and join
    * back — O(n) scans + a dictionary-scale window vs O(n²) dominance
    * tests. Semantics: dominated iff another row has (price <, size >=)
    * or (price <=, size >); duplicate (price, size) frontier rows all
    * survive. */
  def q88Skyline(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"), col("p_size"))
    val perPrice = p.groupBy("p_retailprice").agg(max("p_size").as("gmax"))
    val w = Window.orderBy("p_retailprice")
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontierPrices = perPrice
      .withColumn("prev_max", max("gmax").over(w))
      .filter(col("prev_max").isNull || col("gmax") > col("prev_max"))
      .select("p_retailprice", "gmax")
    p.join(broadcast(frontierPrices), Seq("p_retailprice"))
      .filter(col("p_size") === col("gmax"))
      .select("p_partkey", "p_name", "p_retailprice", "p_size")
      .orderBy("p_partkey")
  }

  /** Percentile bands per group: exact interpolating p25/p50/p75/p95 of
    * extended price per return flag (numpy-style linear interpolation —
    * the A4 median generalized to a band). Exact `percentile` needs the
    * group's values collected per partition-key — fine for
    * low-cardinality banding dimensions; for high-cardinality keys use
    * approx_percentile (q57's documented trade). Rounded to 2 (values
    * ~1e4, double noise ~1e-11). */
  def q89PercentileBands(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_extendedprice, 0.25)"), 2).as("p25"),
        round(expr("percentile(l_extendedprice, 0.50)"), 2).as("p50"),
        round(expr("percentile(l_extendedprice, 0.75)"), 2).as("p75"),
        round(expr("percentile(l_extendedprice, 0.95)"), 2).as("p95"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** Synthetic-entity modulus / delete-rate bucket for [[q90CdcApply]]. */
  val CdcEntities = 1000

  /** CDC changelog compaction (lakehouse MERGE semantics at query level):
    * orders become a change log over [[CdcEntities]] synthetic entities
    * (key = orderkey mod 1000, several changes per entity ordered by
    * order date; op = U except a deterministic ~20% D tail via the md5
    * bucket). Latest-op-wins per key, a delete tombstone suppresses the
    * entity. NOT a window: the latest version is max(struct(ts, key,
    * payload)) inside ONE hash aggregate — map-side partial max means
    * only one pre-combined row per entity per partition reaches the
    * shuffle, the shape you want when replaying a 100 TB changelog
    * (vs row_number, which shuffles every change row). The file-level
    * twin of this query is `PartitionedWrite.upsertByKey`. */
  def q90CdcApply(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        (col("o_orderkey") % CdcEntities).as("entity_id"),
        col("o_orderkey"), col("o_orderdate"), col("o_totalprice"), col("o_orderstatus"),
        when(T.hashBucket(col("o_orderkey"), 10) >= 8, "D").otherwise("U").as("op"))
      .groupBy("entity_id")
      .agg(
        count(lit(1)).as("n_changes"),
        sum(when(col("op") === "D", 1L).otherwise(0L)).as("n_deletes"),
        max(struct(col("o_orderdate"), col("o_orderkey"), col("op"),
          col("o_totalprice"), col("o_orderstatus"))).as("m"))
      .filter(col("m.op") =!= "D")
      .select(col("entity_id"), col("n_changes"), col("n_deletes"),
        col("m.o_orderkey").as("last_orderkey"),
        col("m.o_totalprice").as("last_price"),
        col("m.o_orderstatus").as("last_status"))
      .orderBy("entity_id")

  /** EWMA window depth and the exact dyadic weights alpha*(1-alpha)^k for
    * alpha=1/4: 3^k/4^(k+1) is exactly representable as a double AND as a
    * finite decimal, so both engines parse the identical weight. One
    * source of truth — the Spark literals and the SQL text both render
    * from these strings. */
  val EwmaWeights: Seq[String] = Seq(
    "0.25", "0.1875", "0.140625", "0.10546875", "0.0791015625",
    "0.059326171875", "0.04449462890625", "0.0333709716796875")

  /** Truncated exponentially-weighted moving average of event value per
    * user (time-series smoothing): an 8-term lag composition with weights
    * renormalized over the lags that exist, so early rows average their
    * available history. A pure per-user window — one shuffle on the
    * entity key, state per task bounded by one user's frame — and because
    * the weights are literal dyadic rationals summed in fixed order, the
    * result is bit-identical across engines before the final round. */
  def q95Ewma(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val lags = col("value") +:
      (1 until EwmaWeights.size).map(k => lag(col("value"), k).over(w))
    val num = EwmaWeights.indices.map { k =>
      coalesce(lags(k) * lit(EwmaWeights(k).toDouble), lit(0.0))
    }.reduce(_ + _)
    val den = EwmaWeights.indices.map { k =>
      when(lags(k).isNotNull, lit(EwmaWeights(k).toDouble)).otherwise(lit(0.0))
    }.reduce(_ + _)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("ewma", round(num / den, 4))
      .orderBy("user_id", "ts", "event_id")
  }

  /** Event-type transition matrix (first-order Markov model of user
    * behavior): counts and row-normalized probabilities of consecutive
    * (prev -> next) event-type pairs per user timeline. The lag window
    * shuffles once on the entity key; the transition matrix itself is
    * event-type-vocabulary-sized, so the second aggregate and the
    * normalizing window run on a dictionary-scale frame. p is one
    * division of exact integer counts — bit-equal across engines. */
  def q96Transitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        round(col("n") / sum("n").over(Window.partitionBy("prev_type")).cast("double"), 4))
      .orderBy("prev_type", "next_type")
  }

  /** The measure columns melted by [[q101Unpivot]]. */
  val UnpivotMeasures: Seq[String] =
    Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")

  /** Unpivot / melt (wide → long reshape): the four lineitem measures
    * become (measure, value) rows via Spark's native `unpivot`, then one
    * aggregate per measure. Expand-based like ROLLUP: one scan emits all
    * measure rows map-side, so melting a 100 TB fact table costs one
    * pass regardless of measure count — never k self-UNIONs (the oracle
    * spells it as UNION ALL because DuckDB scans are free at fixture
    * scale; the ENGINE plan is the one-scan Expand). */
  def q101Unpivot(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        UnpivotMeasures.map(col).toArray,
        "measure", "value")
      .groupBy("measure")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .orderBy("measure")

  /** The full ranking/navigation window surface in one query: rank,
    * dense_rank, percent_rank, cume_dist, lag/lead, first/last/nth value
    * per customer over order history. percent_rank and cume_dist are
    * single divisions of exact small integers — bit-equal across
    * engines; the order key (date, orderkey) is total, so RANGE-frame
    * peer groups are singletons and every function is deterministic.
    * last/nth use an explicit full-partition frame (the default frame
    * stops at the current row, which makes last_value a no-op — the
    * classic window pitfall, pinned here on both sides). */
  def q102WindowZoo(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .select(col("o_custkey"), col("o_orderkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        round(percent_rank().over(w), 6).as("prnk"),
        round(cume_dist().over(w), 6).as("cdist"),
        lag("o_totalprice", 1).over(w).as("prev_price"),
        lead("o_totalprice", 1).over(w).as("next_price"),
        first("o_totalprice").over(wFull).as("first_price"),
        last("o_totalprice").over(wFull).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(wFull).as("second_price"))
      .orderBy("o_custkey", "rnk")
  }

  /** Calendar-dimension build (the warehouse date spine): one row per
    * day in the orders date range with year/quarter/month/day, a
    * PORTABLE ISO day-of-week computed from epoch-day arithmetic
    * (pmod(days + 3, 7) + 1 — engine dow() conventions disagree, integer
    * math doesn't; NON-NEGATIVE mod on both sides, since %'s
    * sign-of-dividend would go wrong for pre-1970 dates), and
    * month-start/end flags. Dates travel as ISO
    * strings (q67's lesson: DATE rendering differs across the
    * pandas/parquet bridges). The 1-row min/max aggregate broadcasts
    * into a driver-free sequence explode — no shuffle but the output
    * sort, and the spine is bounded by calendar days, not data size. */
  def q103DateDim(s: SparkSession, d: String): DataFrame = {
    val bounds = Tables.orders(s, d)
      .agg(to_date(min("o_orderdate")).as("lo"), to_date(max("o_orderdate")).as("hi"))
    bounds
      .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("date_iso"),
        year(col("day")).as("year"),
        quarter(col("day")).as("quarter"),
        month(col("day")).as("month"),
        dayofmonth(col("day")).as("day_of_month"),
        (pmod(datediff(col("day"), to_date(lit("1970-01-01"))) + 3, lit(7)) + 1)
          .as("iso_dow"),
        (dayofmonth(col("day")) === 1).as("is_month_start"),
        (col("day") === last_day(col("day"))).as("is_month_end"))
      .orderBy("date_iso")
  }

  /** Trailing-window seconds for [[q104TrailingWindow]] (30 days). */
  val TrailingSecs = 30L * 86400

  /** Trailing 30-day aggregate per order — a RANGE frame over event TIME,
    * not rows: for every order, the count and price sum of the same
    * customer's orders in [t - 30d, t]. The row-frame forms (q19's
    * running sum) can't express "last 30 days"; the range frame slides by
    * VALUE, so gaps and bursts are handled correctly. One entity-key
    * exchange; frame bounds are integer seconds, counts/sums of exact
    * values — deterministic regardless of how many orders share a
    * timestamp (value frames include all peers). */
  def q104TrailingWindow(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("ts_s"))
      .rangeBetween(-TrailingSecs, 0)
    Tables.orders(s, d)
      .withColumn("ts_s",
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 1000000"))
      .select(col("o_custkey"), col("o_orderkey"), col("ts_s"), col("o_totalprice"))
      .withColumn("n_trailing", count(lit(1)).over(w))
      .withColumn("sum_trailing", round(sum("o_totalprice").over(w), 2))
      .select("o_custkey", "o_orderkey", "n_trailing", "sum_trailing")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Order-independent table checksum (cross-system reconciliation, the
    * aggregate complement of q72's row-level diff): each row renders to a
    * canonical string, hashes to a portable 32-bit integer
    * ([[T.hashInt32]]), and the per-year SUM of those hashes is the
    * checksum — sum is commutative, so the result is independent of row
    * order, partitioning, and engine, and 2^32-bounded terms keep the
    * BIGINT sum overflow-free to 2^31 rows per group (a 48-bit hash
    * would overflow — ANSI Spark throws, DuckDB widens to HUGEINT — at
    * only ~65k rows/group). Two tables agree on a year iff (n, checksum)
    * match; no sort, no collect, one aggregate pass. Only integer/string
    * columns render (float formatting is not portable across engines —
    * the q85 lesson). Every column is coalesced to a sentinel BEFORE
    * concatenation: Spark's concat_ws silently skips NULL args while a
    * SQL '||' chain nulls the whole row, so without the coalesce the two
    * engines diverge on any NULL — and two rows differing only in which
    * column is NULL would collide to one canonical string (ADVICE r3). */
  def q105TableChecksum(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("rh", T.hashInt32(concat_ws("|",
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
          .map(c => coalesce(col(c).cast("string"), lit("<NULL>"))): _*)))
      .groupBy(year(col("o_orderdate")).as("year"))
      .agg(count(lit(1)).as("n_rows"), sum("rh").as("checksum"))
      .orderBy("year")

  /** Climb rounds for [[q106Hierarchy]], derived from the actual key
    * range: each climb strips one decimal digit, so digits(max key)
    * rounds always reach the root — at ANY scale factor (a fixed
    * constant would silently under-climb once keys outgrow it). The
    * 1-row bounds aggregate is the documented bounded collect. */
  private def hierRounds(s: SparkSession, d: String): Int = {
    // max() over an empty table is NULL — surface that as a clear error
    // rather than an NPE; non-positive keys would break the digit-count
    // climb bound (parent = key div 10 assumes positive keys). (ADVICE r3)
    val maxKey = Option(Tables.part(s, d).agg(max("p_partkey")).head()
      .getAs[java.lang.Long](0))
    require(maxKey.isDefined, s"q106_hierarchy: part table at $d is empty")
    require(maxKey.get > 0L,
      s"q106_hierarchy: non-positive max p_partkey ${maxKey.get}")
    maxKey.get.toString.length
  }

  /** Hierarchy / path-to-root traversal (the BOM / org-chart op family —
    * distinct from CC and PageRank: per-node ROOT and DEPTH, not
    * components or centrality). A synthetic but deterministic forest over
    * `part`: a node's parent is p_partkey div 10 when that key exists in
    * the table. The climb is an iterative self-join with a FIXED bound
    * ([[hierRounds]] — one decimal digit per level, derived from the
    * real key range), so unlike a
    * recursive CTE the distributed plan has a bounded depth: at 100 TB
    * each round is one hash join on the ancestor key, and rows that
    * reached their root pass through unchanged. */
  def q106Hierarchy(s: SparkSession, d: String): DataFrame = {
    val keys = Tables.part(s, d).select(col("p_partkey").as("k"))
    val parents = Tables.part(s, d)
      .select(col("p_partkey").as("node"), expr("p_partkey div 10").as("cand"))
      .join(keys, col("cand") === col("k"), "left")
      .select(col("node"),
        when(col("k").isNotNull && col("cand") < col("node"), col("cand")).as("parent"))
    var cur = parents.select(col("node"), col("node").as("anc"), lit(0).as("depth"))
    for (_ <- 1 to hierRounds(s, d)) {
      cur = cur
        .join(parents.select(col("node").as("anc"), col("parent").as("up")), Seq("anc"), "left")
        .select(col("node"),
          coalesce(col("up"), col("anc")).as("anc"),
          (col("depth") + when(col("up").isNotNull, 1).otherwise(0)).as("depth"))
    }
    cur.select(col("node"), col("anc").as("root"), col("depth"))
      .orderBy("node")
  }

  /** Period-over-period growth (the BI staple): yearly revenue, the prior
    * year's via lag, and the percent change. The totals are rounded
    * BEFORE the ratio, so both engines divide identical doubles and the
    * growth figure is deterministic; the aggregate is year-cardinality —
    * dictionary-scale after one map-side-combined pass. */
  def q107YoyGrowth(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy("year")
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("year"))
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue"))
      .withColumn("prev_revenue", lag("revenue", 1).over(w))
      .withColumn("yoy_pct",
        round((col("revenue") / col("prev_revenue") - 1) * 100, 2))
      .orderBy("year")
  }

  /** Per-key frequency skew of one join-key column: key cardinality, max
    * and mean frequency, their ratio, and the hottest key. */
  private def skewOf(df: DataFrame, keyCol: String, label: String): DataFrame = {
    val freq = df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("c"))
    // top-1 of the key-cardinality frame. Round 14 (VERDICT r13 #1): was
    // row_number() over a partition-less window — at 100 TB the "key
    // cardinality frame" of a fact-table join key is billions of rows
    // (NOT dictionary-scale), all through one task. orderBy+limit(1)
    // plans TakeOrderedAndProject: per-partition top-1 + driver merge,
    // no global sort, no single-partition stage; the deterministic
    // total order (c desc, k) keeps the result identical.
    val top = freq
      .orderBy(col("c").desc, col("k"))
      .limit(1)
      .select(col("k").as("top_key"))
    freq.agg(count(lit(1)).as("n_keys"), sum("c").as("n_rows"), max("c").as("max_freq"))
      .crossJoin(top)
      .select(lit(label).as("key_col"), col("n_keys"), col("n_rows"), col("max_freq"),
        round(col("max_freq") / (col("n_rows") / col("n_keys").cast("double")), 2)
          .as("skew_ratio"),
        col("top_key"))
  }

  /** Join-key skew diagnostics — the query you run BEFORE a big join to
    * decide between plain shuffle, AQE skew split, and salting
    * (operators.SkewJoin): per candidate key column, the cardinality,
    * hottest-key frequency, and skew ratio (max/mean). Each column costs
    * one map-side-combined frequency aggregate; the ranking runs on the
    * key-cardinality frame, never the fact table. */
  def q108SkewStats(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    skewOf(li, "l_partkey", "l_partkey")
      .union(skewOf(li, "l_suppkey", "l_suppkey"))
      .union(skewOf(Tables.orders(s, d), "o_custkey", "o_custkey"))
      .orderBy("key_col")
  }

  /** Per-group 3-sigma outlier detection: group statistics (mean, sample
    * stddev) are ROUNDED to 2 decimals before the flag comparison —
    * unrounded aggregates differ in their last ulps across partitionings
    * and engines, which would flip rows sitting exactly at the 3σ line;
    * rounding makes a flip possible only when the true aggregate lies
    * within an ulp of a .005 boundary (the repo-wide round-before-compare
    * convention: probabilistic, unlike the genuinely exact integer paths).
    * The stats frame is group-cardinality and broadcasts back over ONE
    * fact scan; mu/sigma are constant within each group, so they ride
    * through the final aggregate as max() instead of re-joining (which
    * would cost a second scan of the fact table). */
  def q109Outliers(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_returnflag"), col("l_extendedprice"))
    val stats = li.groupBy("l_returnflag")
      .agg(round(avg("l_extendedprice"), 2).as("mu"),
        round(stddev_samp("l_extendedprice"), 2).as("sigma"))
    li.join(broadcast(stats), Seq("l_returnflag"))
      .withColumn("is_outlier",
        abs(col("l_extendedprice") - col("mu")) > lit(3) * col("sigma"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("is_outlier"), 1L).otherwise(0L)).as("n_outliers"),
        max(when(col("is_outlier"), col("l_extendedprice"))).as("max_outlier"),
        max("mu").as("mu"), max("sigma").as("sigma"))
      .orderBy("l_returnflag")
  }

  /** PSI buckets / Laplace smoothing for [[q110DriftPsi]]. */
  val PsiBuckets = 10

  /** Population-stability-index drift detection between the train and
    * test splits (the ML-ops "did my data shift" check): document lengths
    * bucket with q84's all-integer equi-width rule over the GLOBAL
    * min/max, per-split proportions are Laplace-smoothed exact rationals
    * (cnt+1)/(n+buckets) — no empty-bucket division, every input to the
    * ln() deterministic — and each bucket's PSI contribution
    * (p-q)·ln(p/q) is reported rounded. Integer bucket counts are the
    * only corpus-scale aggregate; everything after is bucket-cardinality. */
  def q110DriftPsi(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"), T.splitLabel(col("doc_id")).as("split"))
      .filter(col("split") =!= "val")
    val bounds = docs.agg(min("n_chars").as("lo"), max("n_chars").as("hi"))
    val counts = docs.crossJoin(broadcast(bounds))
      .withColumn("bucket", equiWidthBucket("n_chars", PsiBuckets))
      .groupBy("bucket")
      .agg(sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
    // dense 0..B-1 spine: a bucket empty in BOTH splits still contributes
    // its smoothed (p-q)ln(p/q) mass — PSI is defined over fixed buckets,
    // and observed-only rows would make the proportions sum below 1
    val spine = s.range(0, PsiBuckets).select(col("id").cast("int").as("bucket"))
    val bucketed = spine.join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n_train"), lit(0L)).as("n_train"),
        coalesce(col("n_test"), lit(0L)).as("n_test"))
    val totals = bucketed.agg(sum("n_train").as("tot_train"), sum("n_test").as("tot_test"))
    bucketed.crossJoin(broadcast(totals))
      .withColumn("p_train",
        (col("n_train") + 1).cast("double") / (col("tot_train") + PsiBuckets))
      .withColumn("p_test",
        (col("n_test") + 1).cast("double") / (col("tot_test") + PsiBuckets))
      .select(col("bucket"), col("n_train"), col("n_test"),
        round(col("p_train"), 6).as("p_train"),
        round(col("p_test"), 6).as("p_test"),
        round((col("p_train") - col("p_test")) * log(col("p_train") / col("p_test")), 6)
          .as("psi_contrib"))
      .orderBy("bucket")
  }

  val all: Map[String, Q] = Map(
    "q109_outliers" -> (q109Outliers _),
    "q110_drift_psi" -> (q110DriftPsi _),
    "q108_skew_stats" -> (q108SkewStats _),
    "q106_hierarchy" -> (q106Hierarchy _),
    "q107_yoy_growth" -> (q107YoyGrowth _),
    "q104_trailing_window" -> (q104TrailingWindow _),
    "q105_table_checksum" -> (q105TableChecksum _),
    "q101_unpivot" -> (q101Unpivot _),
    "q102_window_zoo" -> (q102WindowZoo _),
    "q103_date_dim" -> (q103DateDim _),
    "q90_cdc_apply" -> (q90CdcApply _),
    "q95_ewma" -> (q95Ewma _),
    "q96_transitions" -> (q96Transitions _),
    "q85_profile" -> (q85Profile _),
    "q112_profile_approx" -> (q112ProfileApprox _),
    "q86_quality_gate" -> (q86QualityGate _),
    "q87_scd2" -> (q87Scd2 _),
    "q88_skyline" -> (q88Skyline _),
    "q89_percentile_bands" -> (q89PercentileBands _),
    "q81_latest_snapshot" -> (q81LatestSnapshot _),
    "q82_cube" -> (q82Cube _),
    "q83_event_gaps" -> (q83EventGaps _),
    "q84_histogram" -> (q84Histogram _),
    "q76_dispersion" -> (q76Dispersion _),
    "q77_editdist" -> (q77EditDist _),
    "q78_gapfill" -> (q78GapFill _),
    "q74_triangles" -> (q74Triangles _),
    "q75_incremental_agg" -> (q75IncrementalAgg _),
    "q64_rollup" -> (q64Rollup _),
    "q65_pivot" -> (q65Pivot _),
    "q66_funnel" -> (q66Funnel _),
    "q67_cohort_retention" -> (q67CohortRetention _),
    "q68_pagerank" -> (q68PageRank _),
    "q69_vocab" -> (q69Vocab _),
    "q70_encode" -> (q70Encode _),
    "q71_length_deciles" -> (q71LengthDeciles _),
    "q72_reconcile" -> (q72Reconcile _),
    "q73_setops" -> (q73SetOps _))

  private val prEdgesSql =
    """SELECT src, dst FROM (
      |  SELECT DISTINCT l_suppkey*2 AS src, l_partkey*2+1 AS dst FROM lineitem) b
      |UNION ALL
      |SELECT dst, src FROM (
      |  SELECT DISTINCT l_suppkey*2 AS src, l_partkey*2+1 AS dst FROM lineitem) b""".stripMargin

  /** q85 twin generated from the same [[ProfileCols]] list — one UNION ALL
    * branch per profiled column. */
  private val profileOracleSql: String = {
    val per = ProfileCols.map { c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |count(*) - count($c) AS n_null,
         |count(DISTINCT $c) AS n_distinct,
         |CAST(min($c) AS VARCHAR) AS min_val, CAST(max($c) AS VARCHAR) AS max_val
         |FROM e""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT event_id, user_id, event_type,
       |  CAST(value AS DECIMAL(18,6)) AS value FROM events)
       |$per
       |ORDER BY col_name""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q109_outliers" ->
      """WITH st AS (SELECT l_returnflag,
        |  round(avg(l_extendedprice), 2) AS mu,
        |  round(stddev_samp(l_extendedprice), 2) AS sigma
        |  FROM lineitem GROUP BY l_returnflag),
        |f AS (SELECT li.l_returnflag, li.l_extendedprice, st.mu, st.sigma,
        |  abs(li.l_extendedprice - st.mu) > 3 * st.sigma AS is_outlier
        |  FROM lineitem li JOIN st USING (l_returnflag))
        |SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(sum(CASE WHEN is_outlier THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  max(CASE WHEN is_outlier THEN l_extendedprice END) AS max_outlier,
        |  any_value(mu) AS mu, any_value(sigma) AS sigma
        |FROM f GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q110_drift_psi" -> {
      val b = PsiBuckets
      s"""WITH hb AS (SELECT doc_id, n_chars,
         |  ${T.hashBucketSql("doc_id", 100)} AS hbk FROM documents),
         |d AS (SELECT doc_id, n_chars, ${T.splitLabelSql("hbk")} AS split FROM hb),
         |dd AS (SELECT * FROM d WHERE split <> 'val'),
         |bo AS (SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM dd),
         |bk AS (SELECT ${equiWidthBucketSql("n_chars", b)} AS bucket,
         |  split FROM dd CROSS JOIN bo),
         |c0 AS (SELECT CAST(bucket AS INT) AS bucket,
         |  CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
         |  CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
         |  FROM bk GROUP BY 1),
         |sp AS (SELECT CAST(unnest(range(0, $b)) AS INT) AS bucket),
         |c AS (SELECT sp.bucket, coalesce(n_train, 0) AS n_train,
         |  coalesce(n_test, 0) AS n_test FROM sp LEFT JOIN c0 ON sp.bucket = c0.bucket),
         |t AS (SELECT CAST(sum(n_train) AS BIGINT) AS tot_train,
         |  CAST(sum(n_test) AS BIGINT) AS tot_test FROM c)
         |SELECT bucket, n_train, n_test,
         |  round((n_train + 1) / CAST(tot_train + $b AS DOUBLE), 6) AS p_train,
         |  round((n_test + 1) / CAST(tot_test + $b AS DOUBLE), 6) AS p_test,
         |  round(((n_train + 1) / CAST(tot_train + $b AS DOUBLE)
         |       - (n_test + 1) / CAST(tot_test + $b AS DOUBLE))
         |    * ln((n_train + 1) / CAST(tot_train + $b AS DOUBLE)
         |       / ((n_test + 1) / CAST(tot_test + $b AS DOUBLE))), 6) AS psi_contrib
         |FROM c CROSS JOIN t ORDER BY bucket""".stripMargin
    },
    "q108_skew_stats" -> {
      def arm(table: String, key: String) =
        s"""SELECT '$key' AS key_col, n_keys, n_rows, max_freq,
           |  round(max_freq / (n_rows / CAST(n_keys AS DOUBLE)), 2) AS skew_ratio,
           |  top_key
           |FROM (SELECT count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
           |    CAST(max(c) AS BIGINT) AS max_freq FROM
           |    (SELECT $key AS k, count(*) AS c FROM $table GROUP BY 1)) s
           |CROSS JOIN (SELECT k AS top_key FROM
           |    (SELECT $key AS k, count(*) AS c FROM $table GROUP BY 1)
           |    ORDER BY c DESC, k LIMIT 1) t""".stripMargin
      s"""${arm("lineitem", "l_partkey")}
         |UNION ALL
         |${arm("lineitem", "l_suppkey")}
         |UNION ALL
         |${arm("orders", "o_custkey")}
         |ORDER BY key_col""".stripMargin
    },
    "q106_hierarchy" ->
      """WITH RECURSIVE k AS (SELECT p_partkey AS node FROM part),
        |par AS (SELECT a.node,
        |  CASE WHEN b.node IS NOT NULL AND a.node // 10 < a.node THEN a.node // 10 END AS parent
        |  FROM k a LEFT JOIN k b ON b.node = a.node // 10),
        |climb AS (
        |  SELECT node, node AS anc, 0 AS depth FROM k
        |  UNION ALL
        |  SELECT c.node, p.parent AS anc, c.depth + 1 FROM climb c
        |  JOIN par p ON p.node = c.anc WHERE p.parent IS NOT NULL)
        |SELECT node, anc AS root, CAST(depth AS INT) AS depth FROM (
        |  SELECT *, row_number() OVER (PARTITION BY node ORDER BY depth DESC) AS rn
        |  FROM climb) WHERE rn = 1 ORDER BY node""".stripMargin,
    "q107_yoy_growth" ->
      """WITH y AS (SELECT CAST(year(o_orderdate) AS INT) AS year,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
        |  FROM orders GROUP BY 1)
        |SELECT year, n_orders, revenue,
        |  lag(revenue, 1) OVER (ORDER BY year) AS prev_revenue,
        |  round((revenue / lag(revenue, 1) OVER (ORDER BY year) - 1) * 100, 2) AS yoy_pct
        |FROM y ORDER BY year""".stripMargin,
    "q104_trailing_window" ->
      s"""WITH o AS (SELECT o_custkey, o_orderkey, o_totalprice,
         |  epoch(CAST(o_orderdate AS TIMESTAMP)) AS ts_s FROM orders)
         |SELECT o_custkey, o_orderkey,
         |  count(*) OVER w AS n_trailing,
         |  round(sum(o_totalprice) OVER w, 2) AS sum_trailing
         |FROM o
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY ts_s
         |  RANGE BETWEEN $TrailingSecs PRECEDING AND CURRENT ROW)
         |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q105_table_checksum" -> {
      // coalesce each column to the same sentinel as the engine side:
      // '||' nulls the whole chain while concat_ws skips NULLs (ADVICE r3)
      val row = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
        .map(c => s"coalesce(CAST($c AS VARCHAR), '<NULL>')")
        .mkString(" || '|' || ")
      s"""SELECT CAST(year(o_orderdate) AS INT) AS year, count(*) AS n_rows,
         |  CAST(sum(${T.hashInt32Sql(row)}) AS BIGINT) AS checksum
         |FROM orders GROUP BY year ORDER BY year""".stripMargin
    },
    "q101_unpivot" -> {
      val arms = UnpivotMeasures.map(m =>
        s"SELECT l_orderkey, l_linenumber, '$m' AS measure, $m AS value FROM lineitem")
      s"""WITH long AS (${arms.mkString("\n", "\nUNION ALL\n", "")})
         |SELECT measure, count(*) AS n, round(sum(value), 2) AS total
         |FROM long GROUP BY measure ORDER BY measure""".stripMargin
    },
    "q102_window_zoo" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(rank() OVER w AS INT) AS rnk,
        |  CAST(dense_rank() OVER w AS INT) AS drnk,
        |  round(percent_rank() OVER w, 6) AS prnk,
        |  round(cume_dist() OVER w, 6) AS cdist,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  first_value(o_totalprice) OVER wf AS first_price,
        |  last_value(o_totalprice) OVER wf AS last_price,
        |  nth_value(o_totalprice, 2) OVER wf AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, rnk""".stripMargin,
    "q103_date_dim" ->
      """WITH b AS (SELECT CAST(min(o_orderdate) AS DATE) AS lo,
        |  CAST(max(o_orderdate) AS DATE) AS hi FROM orders),
        |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM b),
        |s AS (SELECT CAST(day AS DATE) AS day FROM spine)
        |SELECT strftime(day, '%Y-%m-%d') AS date_iso,
        |  CAST(year(day) AS INT) AS year,
        |  CAST(quarter(day) AS INT) AS quarter,
        |  CAST(month(day) AS INT) AS month,
        |  CAST(day(day) AS INT) AS day_of_month,
        |  CAST(((date_diff('day', DATE '1970-01-01', day) + 3) % 7 + 7) % 7 + 1 AS INT) AS iso_dow,
        |  day(day) = 1 AS is_month_start,
        |  day = last_day(day) AS is_month_end
        |FROM s ORDER BY date_iso""".stripMargin,
    "q90_cdc_apply" ->
      s"""WITH log AS (SELECT o_orderkey % $CdcEntities AS entity_id,
         |  o_orderkey, o_orderdate, o_totalprice, o_orderstatus,
         |  CASE WHEN ${T.hashBucketSql("o_orderkey", 10)} >= 8 THEN 'D' ELSE 'U' END AS op
         |  FROM orders),
         |latest AS (SELECT *, row_number() OVER
         |  (PARTITION BY entity_id ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM log),
         |agg AS (SELECT entity_id, count(*) AS n_changes,
         |  CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes
         |  FROM log GROUP BY entity_id)
         |SELECT a.entity_id, a.n_changes, a.n_deletes,
         |  l.o_orderkey AS last_orderkey, l.o_totalprice AS last_price,
         |  l.o_orderstatus AS last_status
         |FROM agg a JOIN latest l ON a.entity_id = l.entity_id AND l.rn = 1
         |WHERE l.op <> 'D' ORDER BY a.entity_id""".stripMargin,
    "q95_ewma" -> {
      val lagSql = (k: Int) => if (k == 0) "value" else s"lag(value, $k) OVER w"
      val num = EwmaWeights.indices
        .map(k => s"coalesce(${lagSql(k)} * ${EwmaWeights(k)}, 0.0)").mkString(" + ")
      val den = EwmaWeights.indices
        .map(k => s"(CASE WHEN ${lagSql(k)} IS NOT NULL THEN ${EwmaWeights(k)} ELSE 0.0 END)")
        .mkString(" + ")
      s"""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
         |SELECT user_id, event_id, ts, value,
         |  round(($num) / ($den), 4) AS ewma
         |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |ORDER BY user_id, ts, event_id""".stripMargin
    },
    "q96_transitions" ->
      """WITH t AS (SELECT user_id, event_type AS next_type,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |SELECT prev_type, next_type, count(*) AS n,
        |  round(count(*) / CAST(sum(count(*)) OVER (PARTITION BY prev_type) AS DOUBLE), 4) AS p
        |FROM t WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, next_type ORDER BY prev_type, next_type""".stripMargin,
    "q85_profile" -> profileOracleSql,
    "q112_profile_approx" -> {
      // exact columns recomputed; the rsd-bound boolean is predicted true
      // (q57 pattern — sketch values never reach the output)
      def arm(c: String): String =
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count(*) - count($c) AS n_null, count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_val, CAST(max($c) AS VARCHAR) AS max_val,
           |  true AS approx_ok FROM documents""".stripMargin
      Seq("doc_id", "lang", "source", "n_chars").map(arm)
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    "q86_quality_gate" ->
      """WITH s1 AS (SELECT
        |  count(*) - count(DISTINCT o_orderkey) AS pk,
        |  CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpos,
        |  count(*) - count(o_orderpriority) AS np FROM orders),
        |fk1 AS (SELECT count(*) AS v FROM lineitem l WHERE NOT EXISTS
        |  (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
        |fk2 AS (SELECT count(*) AS v FROM orders o WHERE NOT EXISTS
        |  (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |SELECT 'orders_pk_unique' AS check_name, pk AS observed, pk = 0 AS passed FROM s1
        |UNION ALL SELECT 'orders_totalprice_positive', nonpos, nonpos = 0 FROM s1
        |UNION ALL SELECT 'orders_priority_complete', np, np = 0 FROM s1
        |UNION ALL SELECT 'lineitem_orders_fk', v, v = 0 FROM fk1
        |UNION ALL SELECT 'orders_customer_fk', v, v = 0 FROM fk2
        |ORDER BY check_name""".stripMargin,
    "q87_scd2" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |  CAST(ts AS TIMESTAMP) AS ts FROM events),
        |v AS (SELECT user_id, event_id, event_type, ts,
        |  CAST(row_number() OVER w AS INT) AS version,
        |  lead(ts) OVER w AS valid_to
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, version, event_id, event_type, ts AS valid_from,
        |valid_to, valid_to IS NULL AS is_current
        |FROM v ORDER BY user_id, version""".stripMargin,
    "q88_skyline" ->
      """SELECT p.p_partkey, p.p_name, p.p_retailprice, p.p_size
        |FROM part p
        |WHERE NOT EXISTS (SELECT 1 FROM part q
        |  WHERE (q.p_retailprice < p.p_retailprice AND q.p_size >= p.p_size)
        |     OR (q.p_retailprice <= p.p_retailprice AND q.p_size > p.p_size))
        |ORDER BY p_partkey""".stripMargin,
    "q89_percentile_bands" ->
      """SELECT l_returnflag,
        |round(quantile_cont(l_extendedprice, 0.25), 2) AS p25,
        |round(quantile_cont(l_extendedprice, 0.50), 2) AS p50,
        |round(quantile_cont(l_extendedprice, 0.75), 2) AS p75,
        |round(quantile_cont(l_extendedprice, 0.95), 2) AS p95,
        |count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q81_latest_snapshot" ->
      """WITH r AS (SELECT user_id, ts, event_id, event_type, value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, ts AS last_ts, event_id AS last_event_id,
        |event_type AS last_type, value AS last_value
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q82_cube" ->
      """WITH o AS (SELECT o_orderpriority,
        |  CAST(year(o_orderdate) AS INT) AS order_year, o_totalprice FROM orders)
        |SELECT o_orderpriority, order_year, count(*) AS n,
        |round(sum(o_totalprice), 2) AS total_price,
        |CAST(GROUPING(o_orderpriority)*2 + GROUPING(order_year) AS INT) AS gid
        |FROM o GROUP BY CUBE (o_orderpriority, order_year)
        |ORDER BY gid, o_orderpriority NULLS FIRST, order_year NULLS FIRST""".stripMargin,
    "q83_event_gaps" ->
      """WITH g AS (SELECT user_id, event_id,
        |  date_diff('microsecond',
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap_us
        |  FROM events)
        |SELECT user_id, count(*) AS n_events,
        |round(sum(gap_us) / (count(*) - 1) / 1000000.0, 3) AS avg_gap_s,
        |max(gap_us) / 1000000.0 AS max_gap_s
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q84_histogram" ->
      s"""WITH b AS (SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM documents),
         |d AS (SELECT doc_id, n_chars,
         |  CAST(${equiWidthBucketSql("n_chars", HistBuckets)} AS INT) AS bucket
         |  FROM documents CROSS JOIN b)
         |SELECT bucket, count(*) AS n_docs,
         |min(n_chars) AS min_chars, max(n_chars) AS max_chars
         |FROM d GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q76_dispersion" ->
      """SELECT l_returnflag,
        |round(stddev_samp(l_quantity),4) AS sd_qty,
        |round(var_samp(l_quantity),4) AS var_qty,
        |round(corr(l_quantity, l_extendedprice),4) AS corr_qty_price,
        |round(covar_samp(l_quantity, l_extendedprice),2) AS covar_qty_price,
        |count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q77_editdist" ->
      s"""WITH names AS (SELECT DISTINCT p_name AS name,
        |  string_split(p_name, ' ')[-1] AS block FROM part)
        |SELECT a.name AS name_a, b.name AS name_b,
        |CAST(levenshtein(a.name, b.name) AS INT) AS dist
        |FROM names a JOIN names b ON a.block = b.block AND a.name < b.name
        |WHERE levenshtein(a.name, b.name) <= $EditMax
        |ORDER BY name_a, name_b""".stripMargin,
    "q78_gapfill" ->
      """WITH ev AS (SELECT date_trunc('hour', ts) AS hour, event_type FROM events),
        |bounds AS (SELECT min(hour) AS lo, max(hour) AS hi FROM ev),
        |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
        |          FROM bounds),
        |types AS (SELECT DISTINCT event_type FROM ev),
        |counts AS (SELECT hour, event_type, count(*) AS n FROM ev GROUP BY 1, 2)
        |SELECT strftime(s.hour, '%Y-%m-%d %H:%M:%S') AS hour, t.event_type,
        |coalesce(c.n, 0) AS n
        |FROM spine s CROSS JOIN types t
        |LEFT JOIN counts c ON c.hour = s.hour AND c.event_type = t.event_type
        |ORDER BY hour, t.event_type""".stripMargin,
    "q74_triangles" ->
      s"""WITH ps0 AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |ps AS (SELECT * FROM ps0 WHERE l_partkey IN (
        |  SELECT l_partkey FROM ps0 GROUP BY l_partkey HAVING count(*) <= 64)),
        |pairs AS (SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, count(*) AS shared_parts
        |  FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
        |  GROUP BY s1, s2 HAVING count(*) >= 2),
        |top AS (SELECT s1 AS a, s2 AS b FROM pairs
        |        ORDER BY shared_parts DESC, s1, s2 LIMIT $TriEdges),
        |tri AS (SELECT ab.a AS x, ab.b AS y, ac.b AS z
        |  FROM top ab JOIN top ac ON ab.a = ac.a AND ab.b < ac.b
        |  JOIN top bc ON bc.a = ab.b AND bc.b = ac.b),
        |nodes AS (SELECT x AS node FROM tri UNION ALL
        |          SELECT y FROM tri UNION ALL SELECT z FROM tri)
        |SELECT node AS l_suppkey, count(*) AS n_triangles
        |FROM nodes GROUP BY node ORDER BY l_suppkey""".stripMargin,
    "q75_incremental_agg" ->
      """WITH o AS (SELECT o_orderpriority AS priority, o_orderdate,
        |           CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders),
        |base AS (SELECT priority, count(*) AS n, sum(price) AS total FROM o
        |         WHERE o_orderdate < TIMESTAMP '1998-01-01' GROUP BY priority),
        |delta AS (SELECT priority, count(*) AS n, sum(price) AS total FROM o
        |          WHERE o_orderdate >= TIMESTAMP '1998-01-01' GROUP BY priority),
        |merged AS (SELECT priority, CAST(sum(n) AS BIGINT) AS n_merged,
        |           CAST(sum(total) AS DECIMAL(18,2)) AS total_merged
        |           FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
        |           GROUP BY priority),
        |filled AS (SELECT priority, count(*) AS n_full,
        |           CAST(sum(price) AS DECIMAL(18,2)) AS total_full FROM o GROUP BY priority)
        |SELECT m.priority, m.n_merged,
        |CAST(m.total_merged AS DOUBLE) AS total_merged,
        |(m.n_merged = f.n_full AND m.total_merged = f.total_full) AS matches_full
        |FROM merged m JOIN filled f ON m.priority = f.priority
        |ORDER BY m.priority""".stripMargin,
    "q64_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |round(sum(l_quantity),2) AS sum_qty,
        |round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        |count(*) AS n,
        |CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS INT) AS gid
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q65_pivot" ->
      """SELECT l_linestatus,
        |round(sum(l_quantity) FILTER (WHERE l_returnflag='A'),2) AS qty_a,
        |round(sum(l_quantity) FILTER (WHERE l_returnflag='N'),2) AS qty_n,
        |round(sum(l_quantity) FILTER (WHERE l_returnflag='R'),2) AS qty_r
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q66_funnel" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |v AS (SELECT user_id, min(ts) AS view_ts FROM events
        |      WHERE event_type='view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS click_ts FROM events e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type='click' AND e.ts > v.view_ts GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS purchase_ts FROM events e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type='purchase' AND e.ts > c.click_ts GROUP BY e.user_id)
        |SELECT u.user_id, v.view_ts, c.click_ts, p.purchase_ts,
        |CAST(CASE WHEN p.purchase_ts IS NOT NULL THEN 3
        |          WHEN c.click_ts IS NOT NULL THEN 2
        |          WHEN v.view_ts IS NOT NULL THEN 1 ELSE 0 END AS INT) AS stage
        |FROM u LEFT JOIN v ON u.user_id = v.user_id
        |LEFT JOIN c ON u.user_id = c.user_id
        |LEFT JOIN p ON u.user_id = p.user_id
        |ORDER BY u.user_id""".stripMargin,
    "q67_cohort_retention" ->
      """WITH cohort AS (SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        |                FROM events GROUP BY user_id),
        |active AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events)
        |SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
        |CAST(date_diff('day', c.cohort_week, a.week)//7 AS INT) AS week_offset,
        |count(DISTINCT a.user_id) AS n_users
        |FROM active a JOIN cohort c ON a.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q68_pagerank" ->
      (PageRank.ranksSql(prEdgesSql, PrIters) + "\nORDER BY node"),
    "q69_vocab" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT token, count(*) AS freq FROM tok GROUP BY token)
        |SELECT token, freq,
        |CAST(row_number() OVER (ORDER BY freq DESC, token) AS INT) AS id
        |FROM tf ORDER BY id""".stripMargin,
    "q70_encode" ->
      s"""WITH tok AS (
        |  SELECT doc_id, t.tok AS token, t.pos FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        |           generate_subscripts(string_split(text, ' '), 1) AS pos
        |    FROM documents) t
        |  WHERE t.pos <= $EncodePrefix),
        |tf AS (SELECT token, count(*) AS freq FROM
        |       (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |       GROUP BY token),
        |vocab AS (SELECT token,
        |  CAST(row_number() OVER (ORDER BY freq DESC, token) AS INT) AS id FROM tf)
        |SELECT tok.doc_id,
        |string_agg(CAST(v.id AS VARCHAR), ',' ORDER BY tok.pos) AS ids,
        |count(*) AS n_prefix_tokens
        |FROM tok JOIN vocab v ON tok.token = v.token
        |GROUP BY tok.doc_id ORDER BY tok.doc_id""".stripMargin,
    "q71_length_deciles" ->
      """SELECT doc_id, n_chars,
        |CAST(ntile(10) OVER (ORDER BY n_chars DESC, doc_id) AS INT) AS decile
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q72_reconcile" ->
      """WITH h1 AS (SELECT o_custkey, count(*) AS n_h1 FROM orders
        |            WHERE o_orderdate < TIMESTAMP '1998-01-01' GROUP BY o_custkey),
        |h2 AS (SELECT o_custkey, count(*) AS n_h2 FROM orders
        |       WHERE o_orderdate >= TIMESTAMP '1998-01-01' GROUP BY o_custkey)
        |SELECT coalesce(h1.o_custkey, h2.o_custkey) AS o_custkey,
        |coalesce(h1.n_h1, 0) AS n_h1, coalesce(h2.n_h2, 0) AS n_h2,
        |CASE WHEN h1.o_custkey IS NOT NULL AND h2.o_custkey IS NOT NULL THEN 'both'
        |     WHEN h1.o_custkey IS NOT NULL THEN 'first_only'
        |     ELSE 'second_only' END AS status
        |FROM h1 FULL OUTER JOIN h2 ON h1.o_custkey = h2.o_custkey
        |ORDER BY o_custkey""".stripMargin,
    "q73_setops" ->
      """WITH a AS (SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag='A'),
        |r AS (SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag='R')
        |SELECT l_partkey, 'both' AS status FROM (SELECT * FROM a INTERSECT SELECT * FROM r)
        |UNION ALL
        |SELECT l_partkey, 'a_only' AS status FROM (SELECT * FROM a EXCEPT SELECT * FROM r)
        |UNION ALL
        |SELECT l_partkey, 'r_only' AS status FROM (SELECT * FROM r EXCEPT SELECT * FROM a)
        |ORDER BY l_partkey""".stripMargin)
}
