package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Semantic checks of the OLAP/event/graph analytics queries on the
  * sf0.001 fixtures — properties the DuckDB hash-match can't express
  * (internal consistency between grouping levels, funnel ordering,
  * exact agreement with an independent in-memory PageRank). */
class AnalyticsQueriesSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("q64 rollup levels are mutually consistent") {
    val rows = AnalyticsQueries.q64Rollup(spark, d)
      .select("l_returnflag", "l_linestatus", "n", "gid")
      .as[(Option[String], Option[String], Long, Int)].collect()
    val detail = rows.filter(_._4 == 0)
    val subtot = rows.filter(_._4 == 1)
    val grand = rows.filter(_._4 == 3)
    assert(grand.length == 1 && grand.head._1.isEmpty && grand.head._2.isEmpty)
    assert(grand.head._3 == detail.map(_._3).sum, "grand total = sum of detail")
    subtot.foreach { case (flag, ls, n, _) =>
      assert(ls.isEmpty)
      assert(n == detail.filter(_._1 == flag).map(_._3).sum, s"subtotal $flag")
    }
    // rollup (not cube): no linestatus-only subtotals
    assert(rows.forall(r => !(r._1.isEmpty && r._4 == 2)))
  }

  test("q65 pivot cells equal independently filtered sums") {
    val pv = AnalyticsQueries.q65Pivot(spark, d)
      .as[(String, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val li = graft.core.Tables.lineitem(spark, d)
    for (flag <- Seq("A", "N", "R"); ls <- pv.keys) {
      val want = li.filter(col("l_returnflag") === flag && col("l_linestatus") === ls)
        .agg(round(sum("l_quantity"), 2)).as[Option[Double]].head()
      val got = flag match {
        case "A" => pv(ls)._2; case "N" => pv(ls)._3; case "R" => pv(ls)._4
      }
      assert(got == want, s"cell ($ls, $flag)")
    }
  }

  test("q66 funnel stages are strictly ordered and stage counts are monotone") {
    val rows = AnalyticsQueries.q66Funnel(spark, d)
      .select(col("user_id"), col("view_ts").cast("long"),
        col("click_ts").cast("long"), col("purchase_ts").cast("long"), col("stage"))
      .as[(Long, Option[Long], Option[Long], Option[Long], Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (u, v, c, p, stage) =>
      // a later stage implies every earlier one, strictly increasing in time
      assert(c.isEmpty || (v.nonEmpty && c.get > v.get), s"user $u click<=view")
      assert(p.isEmpty || (c.nonEmpty && p.get > c.get), s"user $u purchase<=click")
      val want = if (p.nonEmpty) 3 else if (c.nonEmpty) 2 else if (v.nonEmpty) 1 else 0
      assert(stage == want, s"user $u stage")
    }
    val byStage = (0 to 3).map(k => rows.count(_._5 >= k))
    assert(byStage == byStage.sorted.reverse, "funnel must narrow monotonically")
    assert(rows.exists(_._5 == 3), "fixture must contain full conversions")
  }

  test("q67 cohort offset-0 cell counts the whole cohort exactly once") {
    val rows = AnalyticsQueries.q67CohortRetention(spark, d)
      .as[(String, Int, Long)].collect()
    assert(rows.nonEmpty && rows.forall(_._2 >= 0))
    val cohortSizes = graft.core.Tables.events(spark, d)
      .groupBy("user_id").agg(min("ts").as("first"))
      .select(date_format(to_date(date_trunc("week", col("first"))), "yyyy-MM-dd").as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val offset0 = rows.filter(_._2 == 0).map(r => r._1 -> r._3).toMap
    assert(offset0 == cohortSizes, "every user is active in their own first week")
    rows.foreach { case (w, off, n) =>
      assert(n <= cohortSizes(w), s"cohort $w offset $off exceeds cohort size")
    }
  }

  test("q69 vocab ids are dense, frequency-ranked, and conserve token count") {
    val rows = AnalyticsQueries.q69Vocab(spark, d)
      .as[(String, Long, Int)].collect()
    assert(rows.map(_._3).toList == (1 to rows.length).toList, "ids dense from 1")
    val freqsInIdOrder = rows.sortBy(_._3).map(_._2)
    assert(freqsInIdOrder.zip(freqsInIdOrder.tail).forall { case (a, b) => a >= b },
      "freq non-increasing in id order")
    val totalTokens = graft.core.Tables.documents(spark, d)
      .select(sum(size(split(col("text"), " ")))).as[Long].head()
    assert(rows.map(_._2).sum == totalTokens, "vocab frequencies conserve the corpus")
  }

  test("q70 encoding round-trips to the original token prefix") {
    val vocab = AnalyticsQueries.q69Vocab(spark, d)
      .as[(String, Long, Int)].collect().map(r => r._3 -> r._1).toMap
    val enc = AnalyticsQueries.q70Encode(spark, d)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
    val docs = graft.core.Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    assert(enc.size == docs.length, "every document encodes")
    docs.foreach { case (id, text) =>
      val prefix = text.split(" ", -1).take(AnalyticsQueries.EncodePrefix).toSeq
      val (_, ids, n) = enc(id)
      assert(n == prefix.length, s"doc $id prefix length")
      val decoded = ids.split(",").toSeq.map(i => vocab(i.toInt))
      assert(decoded == prefix, s"doc $id decode mismatch")
    }
  }

  test("q71 deciles match a locally computed ntile over the same total order") {
    val rows = AnalyticsQueries.q71LengthDeciles(spark, d)
      .as[(Long, Long, Int)].collect()
    val n = rows.length
    val sorted = rows.sortBy(r => (-r._2, r._1))
    // ntile semantics: first (n % 10) buckets get one extra row
    val base = n / 10; val extra = n % 10
    val expected = sorted.zipWithIndex.map { case (r, i) =>
      val cut = (base + 1) * extra
      val bucket = if (i < cut) i / (base + 1) + 1 else (i - cut) / base + extra + 1
      r._1 -> bucket
    }.toMap
    rows.foreach { case (id, _, dec) => assert(dec == expected(id), s"doc $id") }
  }

  test("q72 full-outer reconciliation conserves orders and labels correctly") {
    val rows = AnalyticsQueries.q72Reconcile(spark, d)
      .as[(Long, Long, Long, String)].collect()
    val total = graft.core.Tables.orders(spark, d).count()
    assert(rows.map(r => r._2 + r._3).sum == total, "every order counted once")
    rows.foreach { case (k, h1, h2, st) =>
      val want = if (h1 > 0 && h2 > 0) "both" else if (h1 > 0) "first_only" else "second_only"
      assert(st == want, s"custkey $k")
      assert(h1 > 0 || h2 > 0, s"custkey $k present with no orders")
    }
    assert(rows.map(_._4).distinct.length >= 2, "fixture must exercise >1 label")
  }

  test("q73 set-op labels agree with Scala set algebra") {
    val li = graft.core.Tables.lineitem(spark, d)
    def keys(f: String) = li.filter(col("l_returnflag") === f)
      .select("l_partkey").as[Long].collect().toSet
    val a = keys("A"); val r = keys("R")
    val got = AnalyticsQueries.q73SetOps(spark, d)
      .as[(Long, String)].collect().groupBy(_._2).view
      .mapValues(_.map(_._1).toSet).toMap
    assert(got.getOrElse("both", Set.empty) == (a intersect r))
    assert(got.getOrElse("a_only", Set.empty) == (a diff r))
    assert(got.getOrElse("r_only", Set.empty) == (r diff a))
  }

  test("q74 per-node triangle counts match in-memory enumeration of the same edges") {
    val top = graft.operators.CoOccur.pairs(
        graft.core.Tables.lineitem(spark, d), "l_partkey", "l_suppkey",
        minShared = 2L, maxItemsPerKey = 64L)
      .orderBy(col("shared_keys").desc, col("item_a"), col("item_b"))
      .limit(AnalyticsQueries.TriEdges)
      .select("item_a", "item_b").as[(Long, Long)].collect()
    val edgeSet = top.toSet
    val perNode = mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      (a, b) <- top; (a2, c) <- top
      if a2 == a && b < c && edgeSet.contains((b, c))
    } { perNode(a) += 1; perNode(b) += 1; perNode(c) += 1 }
    val got = AnalyticsQueries.q74Triangles(spark, d)
      .as[(Long, Long)].collect().toMap
    assert(got == perNode.toMap, "triangle counts must match brute-force enumeration")
    assert(got.nonEmpty, "fixture graph must contain triangles")
  }

  test("q75 merged partials equal the full recompute, and booleans say so") {
    val rows = AnalyticsQueries.q75IncrementalAgg(spark, d)
      .as[(String, Long, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._4), "decimal merge must equal full recompute exactly")
    val full = graft.core.Tables.orders(spark, d)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("t"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    rows.foreach { case (p, n, t, _) =>
      assert((n, t) == full(p), s"priority $p")
    }
  }

  test("q76 dispersion stats match direct two-pass computation") {
    val rows = AnalyticsQueries.q76Dispersion(spark, d)
      .as[(String, Double, Double, Double, Double, Long)].collect()
    assert(rows.length == 3)
    val data = graft.core.Tables.lineitem(spark, d)
      .select("l_returnflag", "l_quantity", "l_extendedprice")
      .as[(String, Double, Double)].collect().groupBy(_._1)
    rows.foreach { case (flag, sd, vr, cr, cv, n) =>
      val xs = data(flag).map(_._2); val ys = data(flag).map(_._3)
      assert(n == xs.length)
      val mx = xs.sum / n; val my = ys.sum / n
      val varX = xs.map(x => (x - mx) * (x - mx)).sum / (n - 1)
      val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum / (n - 1)
      val varY = ys.map(y => (y - my) * (y - my)).sum / (n - 1)
      assert(math.abs(vr - varX) < 1e-2, s"$flag var")
      assert(math.abs(sd - math.sqrt(varX)) < 1e-3, s"$flag sd")
      assert(math.abs(cv - cov) < 1.0, s"$flag covar ($cv vs $cov)")
      assert(math.abs(cr - cov / math.sqrt(varX * varY)) < 1e-3, s"$flag corr")
    }
  }

  test("q77 fuzzy pairs match in-memory levenshtein over the same blocks") {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val names = graft.core.Tables.part(spark, d)
      .select("p_name").distinct().as[String].collect()
    val want = (for {
      a <- names; b <- names
      if a < b && a.split(" ").last == b.split(" ").last
      dst = lev(a, b) if dst <= AnalyticsQueries.EditMax
    } yield (a, b, dst)).toSet
    val got = AnalyticsQueries.q77EditDist(spark, d)
      .as[(String, String, Int)].collect().toSet
    assert(got == want, "blocked fuzzy pairs must match brute force")
    assert(got.nonEmpty, "fixture must contain near-matching names")
  }

  test("q78 spine is dense: every hour x type cell present, totals conserved") {
    val rows = AnalyticsQueries.q78GapFill(spark, d)
      .as[(String, String, Long)].collect()
    val hours = rows.map(_._1).distinct.sorted
    val types = rows.map(_._2).distinct.sorted
    assert(rows.length == hours.length * types.length, "dense grid")
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    val parsed = hours.map(h => java.time.LocalDateTime.parse(h, fmt))
    parsed.zip(parsed.tail).foreach { case (a, b) =>
      assert(java.time.Duration.between(a, b).toHours == 1, s"gap between $a and $b")
    }
    val total = graft.core.Tables.events(spark, d).count()
    assert(rows.map(_._3).sum == total, "zero-filled cells must not change totals")
    assert(rows.exists(_._3 == 0L), "fixture must contain empty cells to fill")
  }

  test("q81 struct-max snapshot equals the window row_number formulation") {
    val viaWindow = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      graft.core.Tables.events(spark, d)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("ts").cast("long"), col("event_id"),
          col("event_type"), col("value"))
        .as[(Long, Long, Long, String, Double)].collect().toSet
    }
    val got = AnalyticsQueries.q81LatestSnapshot(spark, d)
      .select(col("user_id"), col("last_ts").cast("long"), col("last_event_id"),
        col("last_type"), col("last_value"))
      .as[(Long, Long, Long, String, Double)].collect().toSet
    assert(got == viaWindow)
    assert(got.map(_._1).size == got.size, "one row per user")
  }

  test("q82 cube emits all four grouping levels, mutually consistent") {
    val rows = AnalyticsQueries.q82Cube(spark, d)
      .select("o_orderpriority", "order_year", "n", "gid")
      .as[(Option[String], Option[Int], Long, Int)].collect()
    val detail = rows.filter(_._4 == 0)
    val byPrio = rows.filter(_._4 == 1)  // year rolled away
    val byYear = rows.filter(_._4 == 2)  // priority rolled away
    val grand = rows.filter(_._4 == 3)
    assert(grand.length == 1 && grand.head._3 == detail.map(_._3).sum)
    byPrio.foreach { case (p, y, n, _) =>
      assert(y.isEmpty)
      assert(n == detail.filter(_._1 == p).map(_._3).sum, s"priority subtotal $p")
    }
    byYear.foreach { case (p, y, n, _) =>
      assert(p.isEmpty)
      assert(n == detail.filter(_._2 == y).map(_._3).sum, s"year subtotal $y")
    }
    assert(byYear.nonEmpty, "cube (not rollup) must emit year-only subtotals")
  }

  test("q83 gap aggregates match an in-memory recompute per user") {
    val events = graft.core.Tables.events(spark, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long)].collect()
    val want = events.groupBy(_._1).map { case (u, rows) =>
      val ts = rows.map(_._2).sorted
      val gaps = ts.zip(ts.tail).map { case (a, b) => b - a }
      val avg = if (gaps.isEmpty) None else Some(
        BigDecimal(gaps.sum.toDouble / gaps.length / 1e6)
          .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
      val mx = if (gaps.isEmpty) None else Some(gaps.max / 1e6)
      u -> ((ts.length.toLong, avg, mx))
    }
    val got = AnalyticsQueries.q83EventGaps(spark, d)
      .as[(Long, Long, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (u, (n, avg, mx)) =>
      assert(got(u)._1 == n, s"user $u n_events")
      assert(got(u)._3 == mx, s"user $u max gap")
      (got(u)._2, avg) match {
        case (Some(g), Some(w)) => assert(math.abs(g - w) < 2e-3, s"user $u avg gap")
        case (g, w) => assert(g == w, s"user $u avg gap nullability")
      }
    }
  }

  test("q84 histogram partitions the corpus: counts conserve, bounds nest") {
    val rows = AnalyticsQueries.q84Histogram(spark, d)
      .as[(Int, Long, Long, Long)].collect()
    val docs = graft.core.Tables.documents(spark, d)
      .select(col("n_chars")).as[Long].collect()
    assert(rows.map(_._2).sum == docs.length, "every doc lands in exactly one bucket")
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 9))
    assert(rows.forall(r => r._3 <= r._4), "per-bucket min <= max")
    // buckets are ordered and non-overlapping in n_chars
    rows.sortBy(_._1).sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._3, s"buckets ${a._1}/${b._1} overlap")
      case _ =>
    }
    val (lo, hi) = (docs.min, docs.max)
    rows.foreach { r =>
      val n = docs.count(c => math.min(9L, (c - lo) * 10 / math.max(hi - lo, 1L)) == r._1)
      assert(n.toLong == r._2, s"bucket ${r._1} count")
    }
  }

  test("q86 quality gate passes on the referentially-intact fixture") {
    val got = AnalyticsQueries.q86QualityGate(spark, d)
      .as[(String, Long, Boolean)].collect()
    assert(got.length == 5)
    got.foreach { case (name, observed, passed) =>
      assert(passed && observed == 0L, s"check $name should hold on testdata")
    }
  }

  test("q87 SCD2 intervals chain: versions dense, valid_to = next valid_from") {
    val rows = AnalyticsQueries.q87Scd2(spark, d)
      .select(col("user_id"), col("version"),
        col("valid_from").cast("long"), col("valid_to").cast("long"),
        col("is_current"))
      .as[(Long, Int, Long, Option[Long], Boolean)].collect()
    rows.groupBy(_._1).foreach { case (u, h0) =>
      val h = h0.sortBy(_._2)
      assert(h.map(_._2).toSeq == (1 to h.length), s"user $u versions dense")
      h.zip(h.tail).foreach { case (a, b) =>
        assert(a._4.contains(b._3), s"user $u v${a._2} valid_to chains")
        assert(!a._5, "only the last version is current")
      }
      assert(h.last._4.isEmpty && h.last._5, s"user $u last version open-ended")
    }
  }

  test("q88 skyline equals brute-force dominance over the full part table") {
    val parts = graft.core.Tables.part(spark, d)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .as[(Long, Double, Int)].collect()
    val want = parts.filter { case (_, p, s) =>
      !parts.exists { case (_, p2, s2) =>
        (p2 < p && s2 >= s) || (p2 <= p && s2 > s)
      }
    }.map(_._1).toSet
    val got = AnalyticsQueries.q88Skyline(spark, d)
      .select("p_partkey").as[Long].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q89 percentile bands are ordered and bracket the group extremes") {
    val rows = AnalyticsQueries.q89PercentileBands(spark, d)
      .as[(String, Double, Double, Double, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, p25, p50, p75, p95, n) =>
      assert(p25 <= p50 && p50 <= p75 && p75 <= p95, s"band order for $flag")
      val ext = graft.core.Tables.lineitem(spark, d)
        .filter(col("l_returnflag") === flag)
        .agg(min("l_extendedprice"), max("l_extendedprice"), count(lit(1)))
        .as[(Double, Double, Long)].head()
      assert(p25 >= ext._1 && p95 <= ext._2 && n == ext._3)
    }
  }

  test("q68 pagerank matches an independent in-memory integer PageRank exactly") {
    val sp = graft.core.Tables.lineitem(spark, d)
      .select((col("l_suppkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))
      .distinct().as[(Long, Long)].collect()
    val edges = (sp ++ sp.map { case (s, t) => (t, s) }).toSeq
    val want = graft.operators.PageRankReference.ranks(edges, AnalyticsQueries.PrIters)
    val got = AnalyticsQueries.q68PageRank(spark, d)
      .as[(Long, Long)].collect().toMap
    assert(got == want, "distributed and in-memory integer PageRank must agree bit-for-bit")
    // parts with more suppliers rank higher: spot the extremes make sense
    assert(got.values.max > got.values.min, "graph must not be rank-uniform")
  }

  test("q90 CDC compaction agrees with an in-memory latest-op-wins replay") {
    val log = graft.core.Tables.orders(spark, d)
      .select(col("o_orderkey"), unix_micros(col("o_orderdate").cast("timestamp")).as("odate"),
        col("o_totalprice"), col("o_orderstatus"))
      .as[(Long, Long, Double, String)].collect()
    def bucket(k: Long): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      Integer.parseInt(hex.take(4), 16) % 10
    }
    val byEntity = log.groupBy(_._1 % AnalyticsQueries.CdcEntities)
    val want = byEntity.flatMap { case (ent, rows) =>
      val latest = rows.maxBy(r => (r._2, r._1))
      if (bucket(latest._1) >= 8) None // tombstone wins: entity absent
      else Some(ent -> (rows.size.toLong, rows.count(r => bucket(r._1) >= 8).toLong,
        latest._1, latest._3, latest._4))
    }
    val got = AnalyticsQueries.q90CdcApply(spark, d)
      .as[(Long, Long, Long, Long, Double, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6)).toMap
    assert(got == want, "CDC compaction must equal the in-memory replay")
    assert(byEntity.size > got.size, "fixture must produce some tombstoned entities")
  }

  test("q95 EWMA: first event equals its value, constant series stays constant") {
    val got = AnalyticsQueries.q95Ewma(spark, d)
      .select("user_id", "event_id", "value", "ewma")
      .as[(Long, Long, Double, Double)].collect()
    assert(got.nonEmpty)
    // replay in arrival order per user: the first row's EWMA is its value
    val events = graft.core.Tables.events(spark, d)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)].collect()
      .sortBy(e => (e._1, e._2, e._3))
    val firstPerUser = events.groupBy(_._1).map { case (u, es) => (u, es.head._3, es.head._4) }
    val gotMap = got.map(r => (r._1, r._2) -> r._4).toMap
    firstPerUser.foreach { case (u, eid, v) =>
      val r = gotMap((u, eid))
      assert(math.abs(r - BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"user $u first EWMA must equal first value")
    }
    // weights renormalize: every EWMA lies within the running min/max of
    // the last 8 values — the defining envelope of a weighted average
    val win: Map[(Long, Long), (Double, Double)] =
      events.groupBy(_._1).iterator.flatMap { case (u, es) =>
        es.zipWithIndex.map { case (e, i) =>
          val lastK = es.slice(math.max(0, i - 7), i + 1).map(_._4)
          (u, e._3) -> (lastK.min, lastK.max)
        }
      }.toMap
    got.foreach { case (u, eid, _, ew) =>
      val (lo, hi) = win((u, eid))
      assert(ew >= lo - 5e-5 && ew <= hi + 5e-5, s"user $u event $eid EWMA outside envelope")
    }
  }

  test("q101 melted totals equal the per-column aggregates") {
    val got = AnalyticsQueries.q101Unpivot(spark, d)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == AnalyticsQueries.UnpivotMeasures.toSet)
    AnalyticsQueries.UnpivotMeasures.foreach { m =>
      val (n, tot) = graft.core.Tables.lineitem(spark, d)
        .agg(count(lit(1)), round(sum(m), 2)).as[(Long, Double)].head()
      assert(got(m) == ((n, tot)), s"measure $m")
    }
  }

  test("q102 window functions agree with an in-memory replay per customer") {
    val got = AnalyticsQueries.q102WindowZoo(spark, d).collect()
    assert(got.nonEmpty)
    val orders = graft.core.Tables.orders(spark, d)
      .select(col("o_custkey"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")), col("o_totalprice"))
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).map { case (c, os) => c -> os.sortBy(o => (o._3, o._2)) }
    got.foreach { r =>
      val os = orders(r.getAs[Long]("o_custkey"))
      val i = os.indexWhere(_._2 == r.getAs[Long]("o_orderkey"))
      val n = os.length
      assert(r.getAs[Int]("rnk") == i + 1 && r.getAs[Int]("drnk") == i + 1)
      val prnk = if (n == 1) 0.0 else i.toDouble / (n - 1)
      assert(math.abs(r.getAs[Double]("prnk") - prnk) < 1e-6)
      assert(math.abs(r.getAs[Double]("cdist") - (i + 1).toDouble / n) < 1e-6)
      assert(Option(r.getAs[java.lang.Double]("prev_price")).map(_.toDouble) ==
        (if (i > 0) Some(os(i - 1)._4) else None))
      assert(r.getAs[Double]("first_price") == os.head._4)
      assert(r.getAs[Double]("last_price") == os.last._4)
      assert(Option(r.getAs[java.lang.Double]("second_price")).map(_.toDouble) ==
        (if (n >= 2) Some(os(1)._4) else None))
    }
  }

  test("q103 date spine is dense and the portable ISO dow cycles correctly") {
    val got = AnalyticsQueries.q103DateDim(spark, d)
      .select("date_iso", "iso_dow", "is_month_start", "is_month_end")
      .as[(String, Int, Boolean, Boolean)].collect()
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    val days = got.map(r => java.time.LocalDate.parse(r._1, fmt))
    assert(days.zip(days.tail).forall { case (a, b) => b == a.plusDays(1) },
      "spine must be consecutive days with no gaps")
    got.zip(days).foreach { case ((_, dow, ms, me), day) =>
      assert(dow == day.getDayOfWeek.getValue, s"$day dow")
      assert(ms == (day.getDayOfMonth == 1))
      assert(me == (day.getDayOfMonth == day.lengthOfMonth))
    }
  }

  test("q109 outlier counts match an in-memory recompute with rounded stats") {
    val vals = graft.core.Tables.lineitem(spark, d)
      .select("l_returnflag", "l_extendedprice").as[(String, Double)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val got = AnalyticsQueries.q109Outliers(spark, d)
      .as[(String, Long, Long, Option[Double], Double, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (flag, nRows, nOut, maxOut, mu, sigma) =>
      val xs = vals(flag)
      assert(nRows == xs.length)
      val outliers = xs.filter(x => math.abs(x - mu) > 3 * sigma)
      assert(nOut == outliers.length, s"flag $flag")
      assert(maxOut == (if (outliers.isEmpty) None else Some(outliers.max)))
      // stats sanity: mu within the value range, sigma positive
      assert(mu > xs.min && mu < xs.max && sigma > 0)
    }
  }

  test("q110 PSI contributions sum near zero for an unbiased hash split") {
    val got = AnalyticsQueries.q110DriftPsi(spark, d)
      .as[(Int, Long, Long, Double, Double, Double)].collect()
    assert(got.length == AnalyticsQueries.PsiBuckets)
    // proportions are valid distributions (up to smoothing + rounding)
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-3)
    assert(math.abs(got.map(_._5).sum - 1.0) < 1e-3)
    // every contribution is non-negative ((p-q) and ln(p/q) share sign)
    got.foreach { case (b, _, _, _, _, c) => assert(c >= 0.0, s"bucket $b") }
    // the md5 split is unbiased, but PSI has a known small-sample bias:
    // under no drift E[PSI] ~ (B-1)(1/n_train + 1/n_test) (chi-square
    // approximation) — at sf0.001 the test split is ~56 docs, so the
    // industry 0.1 band only applies to large samples. Assert against 3x
    // the expectation instead.
    val (nTr, nTe) = (got.map(_._2).sum.toDouble, got.map(_._3).sum.toDouble)
    val expected = (AnalyticsQueries.PsiBuckets - 1) * (1.0 / nTr + 1.0 / nTe)
    val psi = got.map(_._6).sum
    assert(psi < 3 * expected,
      s"hash split should not drift: psi=$psi vs no-drift expectation $expected")
    // counts conserve: every non-val doc lands in exactly one bucket
    val nonVal = graft.core.Tables.documents(spark, d)
      .filter(graft.functions.TextFunctions.splitLabel(col("doc_id")) =!= "val").count()
    assert(got.map(r => r._2 + r._3).sum == nonVal)
  }

  test("q108 skew stats match per-column frequency recomputes") {
    val got = AnalyticsQueries.q108SkewStats(spark, d)
      .as[(String, Long, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set("l_partkey", "l_suppkey", "o_custkey"))
    Seq(("l_partkey", graft.core.Tables.lineitem(spark, d)),
      ("l_suppkey", graft.core.Tables.lineitem(spark, d)),
      ("o_custkey", graft.core.Tables.orders(spark, d))).foreach { case (k, df) =>
      val freqs = df.groupBy(k).count().as[(Long, Long)].collect()
      val (_, nKeys, nRows, maxF, skew, topKey) = got(k)
      assert(nKeys == freqs.length && nRows == freqs.map(_._2).sum)
      assert(maxF == freqs.map(_._2).max)
      assert(topKey == freqs.filter(_._2 == maxF).map(_._1).min, s"$k hottest key")
      val want = BigDecimal(maxF / (nRows / nKeys.toDouble))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(skew - want) < 1e-9 && skew >= 1.0)
    }
  }

  test("q106 hierarchy climb matches an in-memory path-to-root walk") {
    val keys = graft.core.Tables.part(spark, d)
      .select("p_partkey").as[Long].collect().toSet
    def parent(n: Long): Option[Long] = {
      val c = n / 10
      if (keys.contains(c) && c < n) Some(c) else None
    }
    def walk(n: Long): (Long, Int) = {
      var cur = n; var depth = 0
      while (parent(cur).isDefined) { cur = parent(cur).get; depth += 1 }
      (cur, depth)
    }
    val got = AnalyticsQueries.q106Hierarchy(spark, d)
      .as[(Long, Long, Int)].collect()
    assert(got.length == keys.size)
    got.foreach { case (node, root, depth) =>
      assert((root, depth) == walk(node), s"node $node")
      assert(parent(root).isEmpty, s"root $root must be a fixpoint")
    }
    assert(got.exists(_._3 >= 2), "fixture forest must be at least 3 levels deep")
  }

  test("q107 growth figures match independently filtered yearly totals") {
    val got = AnalyticsQueries.q107YoyGrowth(spark, d)
      .as[(Int, Long, Double, Option[Double], Option[Double])].collect()
    assert(got.length > 2 && got.head._4.isEmpty && got.head._5.isEmpty)
    got.sliding(2).foreach {
      case Array(prev, curr) =>
        assert(curr._4.contains(prev._3))
        val want = BigDecimal((curr._3 / prev._3 - 1) * 100)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(curr._5.get - want) < 1e-9, s"year ${curr._1}")
      case _ =>
    }
    got.foreach { case (y, n, rev, _, _) =>
      val (wn, wrev) = graft.core.Tables.orders(spark, d)
        .filter(year(col("o_orderdate")) === y)
        .agg(count(lit(1)), round(sum("o_totalprice"), 2)).as[(Long, Double)].head()
      assert(n == wn && rev == wrev, s"year $y")
    }
  }

  test("q104 trailing range-frame counts match an in-memory 30-day replay") {
    val orders = graft.core.Tables.orders(spark, d)
      .select(col("o_custkey"), col("o_orderkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 1000000"), col("o_totalprice"))
      .as[(Long, Long, Long, Double)].collect()
    val byCust = orders.groupBy(_._1)
    val got = AnalyticsQueries.q104TrailingWindow(spark, d)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length == orders.length)
    got.foreach { case (cust, key, n, _) =>
      val mine = byCust(cust)
      val t = mine.find(_._2 == key).get._3
      val want = mine.count(o => o._3 <= t && o._3 >= t - AnalyticsQueries.TrailingSecs)
      assert(n == want, s"customer $cust order $key")
    }
    assert(got.exists(_._3 > 1), "fixture must contain overlapping 30-day windows")
  }

  test("q105 checksum is order/partition independent and change-sensitive") {
    val base = AnalyticsQueries.q105TableChecksum(spark, d)
      .as[(Int, Long, Long)].collect().toSeq
    // independence: in-memory recompute from an unordered collect
    def h48(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    val rows = graft.core.Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderpriority"), year(col("o_orderdate")))
      .as[(Long, Long, String, String, Int)].collect()
    val want = rows.groupBy(_._5).map { case (y, rs) =>
      (y, rs.length.toLong, rs.map(r => h48(s"${r._1}|${r._2}|${r._3}|${r._4}")).sum)
    }.toSeq.sortBy(_._1)
    assert(base == want, "checksum must equal the order-free in-memory sum")
    // sensitivity: flipping one row's status changes exactly that year
    val y0 = rows.head._5
    val tampered = rows.map(r => r.copy(_5 = r._5)).map {
      case r if r == rows.head => r.copy(_3 = r._3 + "X")
      case r => r
    }
    val tw = tampered.groupBy(_._5).map { case (y, rs) =>
      (y, rs.map(r => h48(s"${r._1}|${r._2}|${r._3}|${r._4}")).sum)
    }
    val bw = base.map(r => r._1 -> r._3).toMap
    assert(tw(y0) != bw(y0), "a changed row must change its year's checksum")
    tw.filter(_._1 != y0).foreach { case (y, c) => assert(c == bw(y), s"year $y untouched") }
  }

  test("q96 transition matrix conserves counts and rows normalize to 1") {
    val got = AnalyticsQueries.q96Transitions(spark, d)
      .as[(String, String, Long, Double)].collect()
    assert(got.nonEmpty)
    val events = graft.core.Tables.events(spark, d)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    // every user with n events contributes exactly n-1 transitions
    val wantTotal = events.groupBy(_._1).values.map(_.length - 1L).sum
    assert(got.map(_._3).sum == wantTotal, "transition count conservation")
    // in-memory recompute of the full matrix
    val wantCounts = events.groupBy(_._1).values.flatMap { es =>
      es.sortBy(e => (e._2, e._3)).sliding(2).collect {
        case Array(a, b) => (a._4, b._4)
      }
    }.toSeq.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got.map(r => (r._1, r._2) -> r._3).toMap == wantCounts)
    // probabilities: each prev_type row sums to ~1 (4-decimal rounding)
    got.groupBy(_._1).foreach { case (prev, rows) =>
      val s = rows.map(_._4).sum
      assert(math.abs(s - 1.0) < 1e-3, s"row $prev sums to $s")
    }
  }
}
