package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(rows: (Long, String, String, Double)*) =
    rows.toDF("user_id", "tss", "event_type", "value")
      .select(col("user_id"), to_timestamp(col("tss")).as("ts"),
        col("event_type"), col("value"))

  test("retentionCohorts: offsets measured from each user's first week") {
    // user 1: active weeks 0, 1 and 3 of its cohort; user 2: week 0 only,
    // one week later (its own cohort)
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view", 1.0), // Mon wk0
      (1L, "2024-01-03 10:00:00", "view", 1.0), // same week
      (1L, "2024-01-10 10:00:00", "view", 1.0), // wk1
      (1L, "2024-01-24 10:00:00", "view", 1.0), // wk3
      (2L, "2024-01-08 10:00:00", "view", 1.0)) // Mon wk1 = own cohort 0
    val got = Analytics.retentionCohorts(events)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 1L, 1L), ("2024-01-01", 3L, 1L),
      ("2024-01-08", 0L, 1L)))
  }

  test("gapFillDaily: zero rows on gap days, LOCF carries the last total") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view", 5.0),
      (1L, "2024-01-04 10:00:00", "view", 7.0)) // days 2,3 missing
    val got = Analytics.gapFillDaily(events)
      .collect().map(r => r.getString(1) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet == Set("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"))
    assert(got("2024-01-02") == ((0L, 0.0, 5.0))) // zero-filled, carry 5.0
    assert(got("2024-01-03") == ((0L, 0.0, 5.0)))
    assert(got("2024-01-04") == ((1L, 7.0, 7.0)))
  }

  test("segmented gap fill equals the dense form on the fixture") {
    val events = Tables.events(spark, sf0001)
    assertSameRows(Analytics.gapFillDaily(events),
      Analytics.gapFillDailySegmented(events))
  }

  test("segmented gap fill handles a sparse 10-year key without a dense window") {
    // two observations a decade apart + a second type starting later: the
    // dense form would put ~3.7k spine rows of one key in ONE window
    // partition; the segmented form's window sees 3 observation rows total
    val events = ev(
      (1L, "2014-03-05 10:00:00", "view", 2.0),
      (1L, "2024-03-05 10:00:00", "view", 9.0),
      (2L, "2020-01-01 00:00:00", "click", 4.0))
    val got = Analytics.gapFillDailySegmented(events)
    val view = got.filter(org.apache.spark.sql.functions.col("event_type") === "view")
      .collect().map(r => r.getString(1) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // full decade spine: 2014-03-05 .. 2024-03-05 inclusive = 3654 days
    assert(view.size == 3654, s"got ${view.size}")
    assert(view("2014-03-05") == ((1L, 2.0, 2.0)))
    assert(view("2019-07-19") == ((0L, 0.0, 2.0))) // mid-gap: carried a decade
    assert(view("2024-03-04") == ((0L, 0.0, 2.0)))
    assert(view("2024-03-05") == ((1L, 9.0, 9.0)))
    // click starts mid-range: leading days zero-filled from the GLOBAL d0
    val click = got.filter(org.apache.spark.sql.functions.col("event_type") === "click")
      .collect().map(r => r.getString(1) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(click.size == 3654)
    assert(click("2014-03-05") == ((0L, 0.0, 0.0))) // before first obs
    assert(click("2019-12-31") == ((0L, 0.0, 0.0)))
    assert(click("2020-01-01") == ((1L, 4.0, 4.0)))
    assert(click("2024-03-05") == ((0L, 0.0, 4.0)))
    // dense/segmented parity on this pathological shape too
    assertSameRows(Analytics.gapFillDaily(events), got)
  }

  test("dailyAnomalies: an injected spike is flagged, steady days are not") {
    val steady = (1 to 13).map(i =>
      (1L, f"2024-01-$i%02d 10:00:00", "view", 100.0 + (i % 3)))
    val spike = Seq((1L, "2024-01-14 10:00:00", "view", 5000.0))
    val got = Analytics.dailyAnomalies(ev(steady ++ spike: _*))
      .collect().map(r => r.getString(1) -> r.getBoolean(4)).toMap
    assert(got("2024-01-14"), "spike day must be flagged")
    assert(!got.filterKeys(_ != "2024-01-14").values.exists(identity),
      "no steady day may be flagged")
  }

  test("equiWidthHistogram: bins partition the data, max lands in last bin") {
    val orders = Tables.orders(spark, sf0001)
    val h = Analytics.equiWidthHistogram(orders, col("o_totalprice"), 20).collect()
    assert(h.map(_.getLong(3)).sum == orders.count())
    val bins = h.map(_.getLong(0))
    assert(bins.forall(b => b >= 0 && b <= 19))
    assert(bins.contains(19L), "the max value must land in the last bin")
    // single-value edge: everything in bin 0, no division blow-up
    val one = Seq(5.0, 5.0).toDF("v")
    val hc = Analytics.equiWidthHistogram(one, col("v"), 20).collect()
    assert(hc.length == 1 && hc.head.getLong(0) == 0L && hc.head.getLong(3) == 2L)
  }

  test("numericProfile agrees with Spark's built-in corr/covar_samp") {
    val li = Tables.lineitem(spark, sf0001)
    val got = Analytics.numericProfile(li, col("l_returnflag"),
      col("l_quantity"), col("l_extendedprice"))
      .collect().map(r => r.getString(0) -> (r.getDouble(7), r.getDouble(6))).toMap
    val ref = li.groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        covar_samp(col("l_quantity"), col("l_extendedprice")).as("cv"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for ((flag, (c, cv)) <- ref) {
      assert(math.abs(got(flag)._1 - c) < 1e-4, s"corr($flag)")
      assert(math.abs(got(flag)._2 - cv) < math.abs(cv) * 1e-6 + 1e-4, s"covar($flag)")
    }
  }

  test("stratifiedCap: exact per-stratum cap, layout-independent membership") {
    val docs = Tables.documents(spark, sf0001)
    val k = 7
    val capped = Sampling.stratifiedCap(docs, "lang", "doc_id", k)
    val perLang = capped.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, n) <- totals)
      assert(perLang.getOrElse(lang, 0L) == math.min(n, k), s"lang=$lang")
    val ids = (df: org.apache.spark.sql.DataFrame) =>
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(capped) ==
      ids(Sampling.stratifiedCap(docs.repartition(7), "lang", "doc_id", k)))
  }

  test("bigramPmi: a glued pair scores far above an independent pair") {
    // "aa bb" always adjacent; "cc"/"dd" co-occur only by chance
    val glued = (1 to 30).map(i => (i.toLong, "aa bb xx yy zz"))
    val chance = (31 to 60).map(i => (i.toLong, s"cc ${"w" + i} dd xx yy"))
    val docs = (glued ++ chance).toDF("doc_id", "text")
    val pmi = TextAnalysis.bigramPmi(docs, minCount = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(pmi(("aa", "bb")) > 1.0)
    assert(!pmi.contains(("cc", "dd")), "non-adjacent tokens form no bigram")
  }

  test("pathTransitions: counts ordered steps, probabilities sum to 1 per source") {
    val events = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "view", 1.0),
      (2L, 1L, "2024-01-01 10:01:00", "click", 1.0),
      (3L, 1L, "2024-01-01 10:02:00", "purchase", 1.0),
      (4L, 2L, "2024-01-01 11:00:00", "view", 1.0),
      (5L, 2L, "2024-01-01 11:01:00", "view", 1.0))
      .toDF("event_id", "user_id", "tss", "event_type", "value")
      .select(col("event_id"), col("user_id"), to_timestamp(col("tss")).as("ts"),
        col("event_type"), col("value"))
    val got = Analytics.pathTransitions(events)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got(("view", "click")) == ((1L, 0.5)))
    assert(got(("view", "view")) == ((1L, 0.5)))
    assert(got(("click", "purchase")) == ((1L, 1.0)))
    assert(!got.contains(("purchase", "view")), "paths never cross users")
  }

  test("newUsersCurve: cumulative curve counts each user once, on first day") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view", 1.0),
      (2L, "2024-01-01 12:00:00", "view", 1.0),
      (1L, "2024-01-05 10:00:00", "view", 1.0), // not new again
      (3L, "2024-01-03 10:00:00", "view", 1.0))
    val got = Analytics.newUsersCurve(events)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("2024-01-01" -> ((2L, 2L)), "2024-01-03" -> ((1L, 3L))))
  }

  test("abTest: arms partition the users; degenerate experiment yields z = 0") {
    val events = Tables.events(spark, sf0001)
    val r = Analytics.abTest(events).collect().head
    val users = events.select("user_id").distinct().count()
    assert(r.getLong(0) + r.getLong(2) == users)
    assert(r.getLong(1) <= r.getLong(0) && r.getLong(3) <= r.getLong(2))
    // no purchases at all -> pooled rate 0 -> guarded z, not a crash
    val z0 = Analytics.abTest(ev((1L, "2024-01-01 10:00:00", "view", 1.0),
      (2L, "2024-01-01 10:00:00", "click", 1.0))).collect().head
    assert(z0.getDouble(6) == 0.0)
  }

  test("sequenceMatch: only gap-free consecutive runs match") {
    val events = Seq(
      // user 1: exact consecutive view->click->purchase
      (1L, 1L, "2024-01-01 10:00:00", "view"),
      (2L, 1L, "2024-01-01 10:01:00", "click"),
      (3L, 1L, "2024-01-01 10:02:00", "purchase"),
      // user 2: an error interrupts the run -> no match
      (4L, 2L, "2024-01-01 11:00:00", "view"),
      (5L, 2L, "2024-01-01 11:01:00", "error"),
      (6L, 2L, "2024-01-01 11:02:00", "click"),
      (7L, 2L, "2024-01-01 11:03:00", "purchase"))
      .toDF("event_id", "user_id", "tss", "event_type")
      .select(col("event_id"), col("user_id"),
        to_timestamp(col("tss")).as("ts"), col("event_type"))
    val got = Analytics.sequenceMatch(events, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 1L)))
  }

  test("equiDepthHistogram: buckets near-equal, ordered, partition the data") {
    val orders = Tables.orders(spark, sf0001)
    val h = Analytics.equiDepthHistogram(orders, col("o_totalprice"), 10)
      .collect().sortBy(_.getLong(0))
    val total = orders.count()
    assert(h.map(_.getLong(1)).sum == total)
    // each decile bucket within 2% of total/10 (ties can shift boundaries)
    for (r <- h)
      assert(math.abs(r.getLong(1) - total / 10.0) <= total * 0.02 + 1, r.toString)
    // buckets are ordered and non-overlapping
    for (Array(x, y) <- h.sliding(2))
      assert(x.getDouble(3) <= y.getDouble(2), s"$x vs $y")
  }

  test("rollingActiveUsers: trailing window unions users, caps at data end") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view", 1.0),
      (2L, "2024-01-03 10:00:00", "view", 1.0),
      (1L, "2024-01-09 10:00:00", "view", 1.0))
    val got = Analytics.rollingActiveUsers(events, days = 7)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("2024-01-01") == 1L)
    assert(got("2024-01-03") == 2L) // users 1 (Jan 1) + 2 (Jan 3)
    assert(got("2024-01-07") == 2L) // Jan 1 still inside the 7-day window
    assert(got("2024-01-08") == 1L) // Jan 1 aged out; Jan 3 remains
    assert(got("2024-01-09") == 2L) // user 1 returns
    assert(!got.contains("2024-01-10"), "windows past the data end are not emitted")
  }

  test("rollingActiveUsersApprox: same day set, within HLL tolerance of exact") {
    import org.apache.spark.sql.functions._
    val events = graft.Tables.events(spark, sf0001)
    val exact = Analytics.rollingActiveUsers(events)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Analytics.rollingActiveUsersApprox(events)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet, "day sets differ")
    exact.foreach { case (day, ex) =>
      assert(math.abs(approx(day) - ex).toDouble / ex <= 0.05,
        s"$day: approx ${approx(day)} vs exact $ex")
    }
  }

  test("cupedAbTest: perfect pre/post correlation gives theta = 1; no pre-signal gives raw = adj") {
    // each user repeats the same purchase in both halves -> y = x exactly,
    // so cov(x,y) = var(x) and theta rounds to exactly 1.0
    val mirrored = ev(
      (1L, "2024-01-01 10:00:00", "purchase", 10.0),
      (1L, "2024-01-09 10:00:00", "purchase", 10.0),
      (2L, "2024-01-01 10:00:00", "purchase", 50.0),
      (2L, "2024-01-09 10:00:00", "purchase", 50.0),
      (3L, "2024-01-01 10:00:00", "purchase", 200.0),
      (3L, "2024-01-09 10:00:00", "purchase", 200.0))
    val r1 = Analytics.cupedAbTest(mirrored).collect()(0)
    assert(r1.getDouble(2) == 1.0, s"theta ${r1.getDouble(2)}")
    // all revenue in the post period -> var(pre) = 0 -> theta 0 and the
    // adjustment is a no-op (adj falls back to 0 by the guard)
    val postOnly = ev(
      (1L, "2024-01-09 10:00:00", "purchase", 10.0),
      (2L, "2024-01-09 11:00:00", "purchase", 50.0),
      (3L, "2024-01-01 10:00:00", "view", 1.0)) // fixes t0 in the pre half
    val r2 = Analytics.cupedAbTest(postOnly).collect()(0)
    assert(r2.getDouble(2) == 0.0)
    assert(r2.getDouble(5) == 0.0 && r2.getDouble(6) == 0.0) // adj guarded off
  }

  test("dailyAnomaliesSeasonal: baseline is same-weekday only; calendar neighbors don't enter") {
    // Mondays at 100, one spiking Monday; the Tuesdays in between sit at
    // 5000 — a calendar-trailing baseline (anom1) would absorb them, the
    // seasonal baseline must not
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view", 100.0), // Mon
      (1L, "2024-01-02 10:00:00", "view", 5000.0), // Tue
      (1L, "2024-01-08 10:00:00", "view", 100.0), // Mon
      (1L, "2024-01-09 10:00:00", "view", 5000.0), // Tue
      (1L, "2024-01-15 10:00:00", "view", 160.0)) // Mon, mild spike
    val got = Analytics.dailyAnomaliesSeasonal(events)
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getDouble(4))).toMap
    // all three Mondays share one dow key; Tuesdays another
    assert(got("2024-01-01")._1 == got("2024-01-08")._1)
    assert(got("2024-01-01")._1 != got("2024-01-02")._1)
    // first obs of each weekday: n = 1 -> z = 0
    assert(got("2024-01-01")._2 == 0.0 && got("2024-01-02")._2 == 0.0)
    // the third Monday scores against {100, 100, 160}: clearly positive,
    // and the 5000-value Tuesdays never entered the baseline (if they
    // had, 160 would be far BELOW the mean and z would be negative)
    assert(got("2024-01-15")._2 > 0.0, got.toString)
  }

  test("cohortLtv: cumulative revenue accumulates across sparse offsets") {
    // user 1: cohort wk0, purchases wk0 (10.00) and wk2 (5.00) — offset 1
    // missing entirely; user 2 joins wk0 with views only -> no LTV rows
    val events = ev(
      (1L, "2024-01-01 10:00:00", "purchase", 10.0),
      (1L, "2024-01-17 10:00:00", "purchase", 5.0),
      (2L, "2024-01-03 10:00:00", "view", 999.0))
    val got = Analytics.cohortLtv(events)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))).toSeq.sortBy(t => (t._1, t._2))
    assert(got == Seq(
      ("2024-01-01", 0L, 10.0, 10.0, 1L),
      ("2024-01-01", 2L, 5.0, 15.0, 1L)))
  }

  test("robustDailyAnomalies: MAD fence flags the spike; constant series guarded") {
    // 6 quiet days at ~100 (slight jitter so MAD > 0) and one 100× spike:
    // median/MAD ignore the spike's own magnitude when setting the fence
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view", 100.0),
      (1L, "2024-01-02 10:00:00", "view", 102.0),
      (1L, "2024-01-03 10:00:00", "view", 98.0),
      (1L, "2024-01-04 10:00:00", "view", 101.0),
      (1L, "2024-01-05 10:00:00", "view", 99.0),
      (1L, "2024-01-06 10:00:00", "view", 100.0),
      (1L, "2024-01-07 10:00:00", "view", 10000.0),
      // a constant-valued type: MAD = 0 -> all scores guarded to 0
      (1L, "2024-01-01 11:00:00", "buy", 5.0),
      (1L, "2024-01-02 11:00:00", "buy", 5.0))
    val got = Analytics.robustDailyAnomalies(events)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(3), r.getBoolean(4))).toMap
    assert(got(("view", "2024-01-07"))._2, got.toString) // spike flagged
    assert(got(("view", "2024-01-07"))._1 > 1000.0)      // ~0.6745*9900/1
    // quiet days sit inside the fence
    assert((1 to 6).forall(i => !got(("view", f"2024-01-0$i"))._2))
    assert(got(("buy", "2024-01-01")) == (0.0, false))
  }

  test("timeToConvert: stage order enforced; non-converters counted in cvr") {
    val events = ev(
      // user 1: view Mon 10:00 -> purchase Tue 10:00 = 24h delay
      (1L, "2024-01-01 10:00:00", "view", 1.0),
      (1L, "2024-01-02 10:00:00", "purchase", 5.0),
      // user 2: purchase BEFORE first view -> not a conversion
      (2L, "2024-01-01 08:00:00", "purchase", 5.0),
      (2L, "2024-01-01 09:00:00", "view", 1.0),
      // user 3: view only, same Monday
      (3L, "2024-01-01 12:00:00", "view", 1.0))
    val got = Analytics.timeToConvert(events).collect()
    assert(got.length == 1) // all three started on the same weekday key
    val r = got(0)
    assert(r.getLong(1) == 3L && r.getLong(2) == 1L) // started, converted
    assert(r.getDouble(3) == 0.3333)                 // 1/3 rounded at 4dp
    assert(r.getDouble(4) == 24.0 && r.getDouble(5) == 24.0)
  }

  test("meanShiftChangepoint: finds the level shift, not the single outlier") {
    // level 10 for 4 days, then 50 for 4 days: best split is after day 4;
    // a per-day outlier on day 2 (value 11) must not win over the shift
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view", 10.0),
      (1L, "2024-01-02 10:00:00", "view", 11.0),
      (1L, "2024-01-03 10:00:00", "view", 10.0),
      (1L, "2024-01-04 10:00:00", "view", 10.0),
      (1L, "2024-01-05 10:00:00", "view", 50.0),
      (1L, "2024-01-06 10:00:00", "view", 50.0),
      (1L, "2024-01-07 10:00:00", "view", 50.0),
      (1L, "2024-01-08 10:00:00", "view", 50.0))
    val r = Analytics.meanShiftChangepoint(events).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getString(1) == "2024-01-04", row.toString) // last day of left
    assert(row.getDouble(3) == 10.25 && row.getDouble(4) == 50.0) // means
    assert(row.getLong(5) == 4L && row.getLong(6) == 4L)
    // constant series: every split has stat 0 — ties resolve to day 1
    val flat = ev(
      (1L, "2024-02-01 10:00:00", "buy", 5.0),
      (1L, "2024-02-02 10:00:00", "buy", 5.0),
      (1L, "2024-02-03 10:00:00", "buy", 5.0))
    val f = Analytics.meanShiftChangepoint(flat).collect()(0)
    assert(f.getString(1) == "2024-02-01" && f.getDouble(2) == 0.0)
  }

  test("welchTTest: known two-sample values; degenerate variants guarded") {
    // users 6,7,8,10 hash to A and 1,3,5 to B under the md5 bucket (checked
    // via Sampling.hashBucket below, so the fixture can't silently drift)
    val perUser = Seq(6L -> 10.0, 7L -> 12.0, 8L -> 14.0, 10L -> 16.0,
      1L -> 20.0, 3L -> 22.0, 5L -> 24.0)
    val events = ev(perUser.map { case (u, v) =>
      (u, "2024-01-01 10:00:00", "purchase", v) }: _*)
    val variants = events.select(col("user_id"),
      when(Sampling.hashBucket(col("user_id")) < 5000, "A").otherwise("B").as("v"))
      .distinct().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(Set(6L, 7L, 8L, 10L).forall(variants(_) == "A"), variants.toString)
    assert(Set(1L, 3L, 5L).forall(variants(_) == "B"), variants.toString)
    val r = Analytics.welchTTest(events).collect()(0)
    // A: {10,12,14,16} mean 13 var 20/3; B: {20,22,24} mean 22 var 4
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 13.0 && r.getDouble(3) == 22.0)
    val se2 = (20.0 / 3) / 4 + 4.0 / 3
    // cents cancel in t, so the hand formula works in dollars; 4dp rounding
    val expT = math.floor((13.0 - 22.0) / math.sqrt(se2) * 10000 + 0.5) / 10000
    assert(r.getDouble(4) == expT, r.toString)
    assert(r.getDouble(5) > 0) // Welch df defined
    // single-user variant: t/df guarded to 0
    val tiny = ev((8L, "2024-01-01 10:00:00", "purchase", 10.0),
      (1L, "2024-01-01 11:00:00", "purchase", 20.0))
    val g = Analytics.welchTTest(tiny).collect()(0)
    assert(g.getDouble(4) == 0.0 && g.getDouble(5) == 0.0)
  }

  test("marketBasketPairs: counts, support and lift on a known basket set") {
    // baskets: {1,2} {1,2} {3,4} {3,4} {1,3}; the duplicate (b10, item 1)
    // row must collapse — pair counts are over distinct basket membership
    val rows = Seq(
      (10L, 1L), (10L, 1L), (10L, 2L),
      (11L, 1L), (11L, 2L),
      (12L, 3L), (12L, 4L),
      (13L, 3L), (13L, 4L),
      (14L, 1L), (14L, 3L)).toDF("bkey", "item")
    val got = Analytics.marketBasketPairs(rows, col("bkey"), col("item"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // both pairs: 2 of 5 baskets, lift 2*5/(3*2) = 5/3 — an exact lift tie,
    // broken by (part_a, part_b); singleton pair (1,3) drops (min 2)
    assert(got.toSeq == Seq(
      (1L, 2L, 2L, 0.4, 10.0 / 6.0),
      (3L, 4L, 2L, 0.4, 10.0 / 6.0)))
  }

  test("marketBasketPairs: pair generation is basket-local (a < b, no self-pairs)") {
    val li = Tables.lineitem(spark, sf0001)
    val got = Analytics.marketBasketPairs(li, col("l_orderkey"), col("l_partkey"),
      minCount = 1, topK = 1000000)
    assert(got.filter(col("item_a") >= col("item_b")).count() == 0)
    val nPairsTotal = got.agg(sum(col("n_pair"))).head.getLong(0)
    // sum over pairs == sum over baskets of C(size,2), the map-side bound
    val expected = li.select(col("l_orderkey"), col("l_partkey")).distinct()
      .groupBy("l_orderkey").count()
      .agg(sum(col("count") * (col("count") - 1) / 2).cast("long")).head.getLong(0)
    assert(nPairsTotal == expected)
  }

  test("rfmSegments: scores stay in 1..4 and rank users consistently") {
    // heavy: recent, frequent, big spender; light: old, single small event
    val heavy = (0 until 8).map(i =>
      (1L, f"2024-01-${20 + i % 8}%02d 10:00:00", "purchase", 500.0))
    val light = Seq((2L, "2024-01-01 10:00:00", "view", 1.0))
    val mid = (3L to 6L).flatMap(u => Seq(
      (u, "2024-01-10 10:00:00", "view", 1.0),
      (u, "2024-01-15 10:00:00", "purchase", 50.0)))
    val got = Analytics.rfmSegments(ev(heavy ++ light ++ mid: _*))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7)))).toMap
    for ((_, (r, f, m, _)) <- got) {
      assert(r >= 1 && r <= 4 && f >= 1 && f <= 4 && m >= 1 && m <= 4)
    }
    val (r1, f1, m1, seg1) = got(1L)
    val (r2, f2, m2, seg2) = got(2L)
    assert(r1 > r2 && f1 > f2 && m1 > m2, s"$r1 $f1 $m1 vs $r2 $f2 $m2")
    assert(seg1 == "champion" && seg2 == "hibernating")
  }

  test("unigramSurprisal: rare-token documents score higher than common ones") {
    val common = (1 to 20).map(i => (i.toLong, "the the the the"))
    val rare = Seq((21L, "qqq zzz vvv www"))
    val scores = TextAnalysis.unigramSurprisal((common ++ rare).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(21L) > scores(1L) + 1.0)
    // every doc has 4 tokens
    val nt = TextAnalysis.unigramSurprisal((common ++ rare).toDF("doc_id", "text"))
      .collect().map(_.getLong(1)).toSet
    assert(nt == Set(4L))
  }

  test("olsTrend: exact slope/intercept/r2 on a perfect line, 0s on a flat singleton") {
    // type a: y = 10 + 2x dollars on days 0,1,2 → slope 2, intercept 10, r2 1
    val events = ev(
      (1L, "2024-01-01 10:00:00", "a", 10.0),
      (1L, "2024-01-02 10:00:00", "a", 12.0),
      (1L, "2024-01-03 10:00:00", "a", 14.0),
      (2L, "2024-01-01 10:00:00", "b", 5.0)) // single day → degenerate
    val got = Analytics.olsTrend(events).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got("a") == ((3L, 2.0, 10.0, 1.0)))
    assert(got("b") == ((1L, 0.0, 0.0, 0.0)))
  }

  test("autocorrelation: alternating series gives acf −1 at lag 1, +1 at lag 2") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "a", 1.0),
      (1L, "2024-01-02 10:00:00", "a", 2.0),
      (1L, "2024-01-03 10:00:00", "a", 1.0),
      (1L, "2024-01-04 10:00:00", "a", 2.0))
    val got = Analytics.autocorrelation(events, maxLag = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((3L, -1.0)))
    assert(got(2L) == ((2L, 1.0)))
  }

  test("ewmaDaily: day-distance weights, gaps age out by distance not row count") {
    // days 1,2 then a 20-day gap to day 22: the gap day sees ONLY itself
    // (both earlier days are outside the 10-day band), so its ewma is its
    // own value — a rows-frame would have blended the stale history in
    val events = ev(
      (1L, "2024-01-01 10:00:00", "a", 1.0),
      (1L, "2024-01-02 10:00:00", "a", 2.0),
      (1L, "2024-01-22 10:00:00", "a", 9.0))
    val got = Analytics.ewmaDaily(events).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got("2024-01-01") == ((1L, 1.0)))
    // (1.0·200 + 0.7·100) / 1.7 = 158.8235… cents → 1.5882
    assert(got("2024-01-02") == ((2L, 1.5882)))
    assert(got("2024-01-22") == ((1L, 9.0)))
  }

  test("weeklyOhlc: open/close follow (ts, event_id) order incl. ties") {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    // same epoch week (1970-01-01 is day 0 → week 0 spans Jan 1–7 1970);
    // two events share a ts — event_id must break the tie for open
    val e = Seq(
      (3L, "1970-01-02 12:00:00", 7L, "a", 5.0),
      (1L, "1970-01-02 12:00:00", 7L, "a", 2.0), // tie: id 1 < 3 → open
      (9L, "1970-01-03 12:00:00", 7L, "a", 11.0)) // latest → close
      .toDF("event_id", "tss", "user_id", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("tss")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val r = Analytics.weeklyOhlc(e).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getString(1) == "1970-01-01")
    assert(row.getLong(2) == 3L)
    assert(row.getDouble(3) == 2.0)  // open: the tie-broken earlier event
    assert(row.getDouble(4) == 11.0) // high
    assert(row.getDouble(5) == 2.0)  // low
    assert(row.getDouble(6) == 11.0) // close
    assert(row.getDouble(7) == 18.0) // total
  }

  test("survivalCurve: censored users stay at risk but never count as deaths") {
    // corpus end 01-20; u3/u4 active within 7 days of the end → censored
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view", 1.0),
      (1L, "2024-01-03 10:00:00", "view", 1.0), // t=2, died
      (2L, "2024-01-01 10:00:00", "view", 1.0),
      (2L, "2024-01-05 10:00:00", "view", 1.0), // t=4, died
      (3L, "2024-01-01 10:00:00", "view", 1.0),
      (3L, "2024-01-16 10:00:00", "view", 1.0), // t=15, censored
      (4L, "2024-01-01 10:00:00", "view", 1.0),
      (4L, "2024-01-20 10:00:00", "view", 1.0)) // t=19, censored
    val got = Analytics.survivalCurve(events).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // only death times surface; censoring shrinks n_risk but adds no step
    assert(got == Map(
      2L -> ((4L, 1L, 0.75)),  // 4 at risk, 1 death → S = 3/4
      4L -> ((3L, 1L, 0.5))))  // 3 at risk, 1 death → S = 3/4 · 2/3
  }

  test("benfordAudit: digits from exact cents, observed shares sum to 1") {
    val orders = Seq(
      (1L, 1.00, "x"), (2L, 1.50, "x"), (3L, 2.00, "x"), (4L, 9.99, "x"))
      .toDF("o_orderkey", "o_totalprice", "o_orderpriority")
    val rows = Analytics.benfordAudit(orders).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // cents 100, 150 → digit 1; 200 → 2; 999 → 9
    assert(rows.keySet == Set("1", "2", "9"))
    assert(rows("1") == ((2L, 0.5)))
    assert(rows("2")._1 == 1L && rows("9")._1 == 1L)
    val shares = Analytics.benfordAudit(orders).collect().map(_.getDouble(2)).sum
    assert(math.abs(shares - 1.0) < 1e-9)
  }

  test("woeBins: symmetric quartile separation gives symmetric WOE and exact IV") {
    // values 1..8, quartile fences 2.75/4.5/6.25; good = top half
    val orders = (1 to 8).map { i =>
      (i.toLong, i.toDouble, if (i >= 5) "1-URGENT" else "5-LOW")
    }.toDF("o_orderkey", "o_totalprice", "o_orderpriority")
    val got = Analytics.woeBins(orders).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(5))))
      .toMap
    // pg=1/8 vs pb=3/8 → woe = ±ln(3) = ±1.098612 at 6 decimals
    assert(got(0L) == ((0L, 2L, -1.098612, 1.0986)))
    assert(got(3L) == ((2L, 0L, 1.098612, 1.0986)))
    assert(got(1L)._3 == -1.098612 && got(2L)._3 == 1.098612)
  }

  test("targetEncodeLoo: excludes the row's own target; singletons get the global mean") {
    val orders = Seq(
      (1L, 10.0, "P"), (2L, 20.0, "P"), (3L, 30.0, "Q"))
      .toDF("o_orderkey", "o_totalprice", "o_orderpriority")
    val got = Analytics.targetEncodeLoo(orders).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) == 20.0) // P mean excluding 10 → 20
    assert(got(2L) == 10.0)
    assert(got(3L) == 20.0) // singleton Q → global mean (10+20+30)/3
  }

  test("logisticGd: loss decreases, trajectory is layout-stable") {
    val orders = graft.Tables.orders(spark, sf0001)
    val t = Analytics.logisticGd(orders, iters = 3, lr = 0.5)
      .orderBy("iter").collect()
    assert(t.length == 3)
    // iteration 1 evaluates beta = 0: logloss is exactly ln 2 (to the
    // micro-grid) because sigma(0) = 0.5 for every row
    assert(math.abs(t(0).getDouble(4) - math.log(2.0)) < 1e-4)
    // full-batch GD on a convex loss with a sane step must descend:
    // each reported pre-update loss is evaluated at the previous betas
    assert(t(2).getDouble(4) < t(1).getDouble(4))
    assert(t(1).getDouble(4) < t(0).getDouble(4) + 1e-9)
    // coefficients moved off zero and landed on the 1e-6 snap grid
    assert(t.exists(r => r.getDouble(1) != 0.0 || r.getDouble(2) != 0.0))
    t.foreach { r =>
      (1 to 3).foreach { i =>
        val b = r.getDouble(i)
        assert(b == math.floor(b * 1e6 + 0.5) / 1e6, s"off-grid beta $b")
      }
    }
    // bit-identical trajectory under a different input layout
    val t2 = Analytics.logisticGd(orders.repartition(7), iters = 3, lr = 0.5)
      .orderBy("iter").collect()
    assert(t.toSeq == t2.toSeq)
  }

  test("functionalDeps: key FDs hold with zero g3, broken FDs quantify") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", "x"), (2L, "a", "x"), (3L, "a", "y"), // a -> dep broken once
      (4L, "b", "z"), (5L, "b", "z"))
      .toDF("id", "det", "dep")
    val got = Analytics.functionalDeps(df, Seq(("id", "det"), ("det", "dep")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5)))).toMap
    // id is a key: FD holds exactly
    assert(got("id") == ((5L, 0L, 0.0, true)))
    // det=a maps to two dep values: one violating group, g3 = 1/5 (drop
    // the single 'y' row and the FD holds)
    assert(got("det") == ((2L, 1L, 0.2, false)))
    // fixture sanity: the registered candidates produce one held FD
    val fx = graft.Queries.all("fd1_functional_deps")(spark, sf0001).collect()
    assert(fx.length == 3)
    assert(fx.count(_.getBoolean(5)) == 1) // only orderkey -> custkey holds
  }

  test("crossValLogreg: folds partition the data, held-out metrics are sane") {
    val orders = graft.Tables.orders(spark, sf0001)
    val cv = Analytics.crossValLogreg(orders, folds = 3).orderBy("fold").collect()
    assert(cv.length == 3)
    assert(cv.map(_.getLong(1)).sum == orders.count()) // every row held out once
    cv.foreach { r =>
      // held-out log-loss near the ln-2 ballpark (3 GD steps on a weak
      // signal), never NaN or wildly off
      assert(r.getDouble(2) > 0.3 && r.getDouble(2) < 1.2,
        s"fold ${r.getLong(0)} logloss ${r.getDouble(2)}")
      // accuracy at least the majority class would suggest
      assert(r.getDouble(3) > 0.5 && r.getDouble(3) <= 1.0)
    }
  }

  test("calibrationBins: bins partition the data, rates are honest averages") {
    val orders = graft.Tables.orders(spark, sf0001)
    val c = Analytics.calibrationBins(orders).collect()
    assert(c.map(_.getLong(1)).sum == orders.count())
    // bin b holds predictions in [b/10, (b+1)/10): the bin's mean
    // prediction must lie inside its own bounds
    c.foreach { r =>
      val (bin, avg) = (r.getLong(0), r.getDouble(2))
      assert(avg >= bin / 10.0 - 1e-9 && avg < (bin + 1) / 10.0 + 1e-9,
        s"bin $bin avg_pred $avg out of range")
      val obs = r.getDouble(3)
      assert(obs >= 0.0 && obs <= 1.0)
    }
  }

  test("logisticAuc: one row; AUC beats coin flip; sanity vs a direct count") {
    val orders = graft.Tables.orders(spark, sf0001)
    val a = Analytics.logisticAuc(orders).collect()
    assert(a.length == 1)
    val r = a.head
    assert(r.getLong(0) == orders.count())
    // the model separates at least slightly (price/urgency carry signal);
    // exact-0.5 would mean the features are pure noise
    val auc = r.getDouble(2)
    assert(auc > 0.4 && auc < 1.0, s"auc=$auc")
    assert(auc != 0.5)
    val acc = r.getDouble(3)
    assert(acc > 0.5 && acc <= 1.0, s"accuracy=$acc") // majority class is ~2/3
  }

  test("logisticGdVector replays a hand-rolled micro-snapped GD exactly") {
    import spark.implicits._
    val rows = Seq(
      (1.0, 1.0, 0.2, 0.9), (0.0, 1.0, 0.7, 0.1), (1.0, 1.0, 0.4, 0.8),
      (0.0, 1.0, 0.9, 0.3), (1.0, 1.0, 0.1, 0.6), (0.0, 1.0, 0.8, 0.2))
    val d = rows.toDF("y", "x0", "x1", "x2")
    val got = Analytics.logisticGdVector(d, k = 3, iters = 4, lr = 1.0)
    // independent reimplementation of the micro-unit discipline
    var beta = Array(0.0, 0.0, 0.0)
    def micro(v: Double) = math.floor(v * 1e6 + 0.5).toLong
    for (_ <- 1 to 4) {
      val g = Array(0L, 0L, 0L)
      rows.foreach { case (y, x0, x1, x2) =>
        val z = beta(0) * x0 + beta(1) * x1 + beta(2) * x2
        val sg = 1.0 / (1.0 + math.exp(-z))
        g(0) += micro((sg - y) * x0)
        g(1) += micro((sg - y) * x1)
        g(2) += micro((sg - y) * x2)
      }
      beta = Array.tabulate(3)(j =>
        math.floor((beta(j) - 1.0 * (g(j).toDouble / 1e6 / rows.size))
          * 1e6 + 0.5) / 1e6)
    }
    assert(got.toSeq == beta.toSeq, s"${got.toSeq} vs ${beta.toSeq}")
    // the trained separator must point the right way: x1 anti-correlates
    // with y, x2 correlates
    assert(got(1) < 0 && got(2) > 0)
  }

  test("passAtK: estimator identities — pass@1 = c/n in the mean, monotone in k") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf0001)
    val got = Analytics.passAtK(docs).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (np, tp) = (r.getLong(1), r.getLong(2))
      val (p1, p5) = (r.getDouble(3), r.getDouble(4))
      // per-problem pass@1 is exactly c/n, so the source mean collapses
      // to total_passed / (n * n_problems) (both sides on the 1e-6 grid)
      val expect1 = math.floor(tp.toDouble / 10.0 / np.toDouble * 1e6 + 0.5) / 1e6
      assert(math.abs(p1 - expect1) <= 1e-6 + 1e-12, s"$p1 vs $expect1")
      // more attempts can only help
      assert(p5 >= p1 && p1 >= 0.0 && p5 <= 1.0)
    }
    // a problem set that never passes scores zero at every k
    import spark.implicits._
    val dead = Seq((0L, "x", "s"), (11L, "y", "s"), (22L, "z", "s"))
      .toDF("doc_id", "text", "source")
    val z = Analytics.passAtK(dead).collect()(0)
    assert(z.getLong(2) == 0L && z.getDouble(3) == 0.0 && z.getDouble(4) == 0.0)
    intercept[IllegalArgumentException] { Analytics.passAtK(docs, n = 4, ks = Seq(5)) }
  }

  test("bradleyTerry: tournament accounting holds and a planted favorite wins") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf0001)
    val got = Analytics.bradleyTerry(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(got.nonEmpty)
    // every comparison produced one win and touched two items
    assert(got.map(_._3).sum == 2 * got.map(_._2).sum)
    // normalization: strengths are non-negative with mean ~1
    assert(got.forall(_._4 >= 0.0))
    assert(math.abs(got.map(_._4).sum / got.length - 1.0) < 0.01)
    // ranks are a permutation of 1..m following strength order
    assert(got.map(_._5).sorted.toSeq == (1L to got.length).toSeq)
    // planted dominance: 'aa' docs are quality-rich, 'bb' docs are junk →
    // 'aa' must out-rank 'bb'
    import spark.implicits._
    val tiny = (0 until 40).map { i =>
      if (i % 2 == 0)
        (i.toLong, "aa", "the spark of a good and long document " * 3)
      else (i.toLong, "bb", "x")
    }.toDF("doc_id", "lang", "text")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
    val duel = Analytics.bradleyTerry(tiny).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getLong(4))).toMap
    assert(duel("aa")._1 > duel("bb")._1 && duel("aa")._2 == 1L, duel.toString)
  }

  test("holtLinearDaily: linear series tracked exactly, constant series " +
    "pins trend at zero, fold replays by hand") {
    // y = 10, 12, 14, 16 — exactly linear: l_t = y_t, b_t = 2, f_t = y_t
    val lin = ev((1 to 4).map(i =>
      (1L, f"2024-01-0$i 10:00:00", "view", 8.0 + 2 * i)): _*)
    val gotLin = Analytics.holtLinearDaily(lin).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    gotLin.foreach { case (_, y, l, b, _) =>
      assert(l == y && b == 2.0, gotLin.mkString(";")) }
    gotLin.drop(1).foreach { case (_, y, _, _, f) => assert(f == y) }
    // constant series: level stays, trend geometrically decays toward 0
    val const = ev((1 to 6).map(i =>
      (1L, f"2024-01-0$i 10:00:00", "view", 50.0)): _*)
    val gotC = Analytics.holtLinearDaily(const).collect()
      .map(r => (r.getDouble(3), r.getDouble(4)))
    assert(gotC.head._1 == 0.0) // b1 = y2 - y1 = 0
    gotC.foreach { case (b, _) => assert(b == 0.0) }
    // hand-replay the snapped fold on the sf0.001 fixture
    val events = Tables.events(spark, sf0001)
    val got = Analytics.holtLinearDaily(events).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    var l = r6(got(0)._2); var b = r6(got(1)._2 - got(0)._2)
    assert(got(0)._3 == l && got(0)._4 == b && got(0)._5 == 0.0)
    got.drop(1).foreach { case (day, y, gl, gb, gf) =>
      val f = r6(l + b)
      val lN = r6(0.5 * y + 0.5 * (l + b))
      val bN = r6(0.25 * (lN - l) + 0.75 * b)
      l = lN; b = bN
      assert(gl == l && gb == b && gf == f, s"day $day diverges")
    }
  }

  test("forecastAccuracy: hand-computed MAE/RMSE/sMAPE/MASE on a 4-day " +
    "series; exactly-linear series scores zero error; constant series " +
    "fails loudly") {
    // y = 10, 12, 11, 13: forecasts 12, 14, 14.125 (hand fold);
    // |e| = 0, 3, 1.125 -> mae 1.375; naive |dy| = 2, 1, 2 -> mase .825
    val s4 = ev((1L, "2024-01-01 10:00:00", "view", 10.0),
      (1L, "2024-01-02 10:00:00", "view", 12.0),
      (1L, "2024-01-03 10:00:00", "view", 11.0),
      (1L, "2024-01-04 10:00:00", "view", 13.0))
    val r = Analytics.forecastAccuracy(s4).collect().head
    assert((r.getLong(0), r.getLong(1)) == ((4L, 3L)), r.toString)
    assert(r.getDouble(2) == 1.375 && r.getDouble(3) == 1.849831 &&
      r.getDouble(4) == 0.10765 && r.getDouble(5) == 0.825, r.toString)
    // exactly linear: Holt tracks it exactly from day 2 -> zero error,
    // MASE exactly 0 (naive MAE = 2, model MAE = 0)
    val lin = ev((1 to 4).map(i =>
      (1L, f"2024-01-0$i 10:00:00", "view", 8.0 + 2 * i)): _*)
    val rl = Analytics.forecastAccuracy(lin).collect().head
    assert(rl.getDouble(2) == 0.0 && rl.getDouble(5) == 0.0, rl.toString)
    // constant series: naive MAE is zero, MASE undefined -> loud
    val const = ev((1 to 4).map(i =>
      (1L, f"2024-01-0$i 10:00:00", "view", 50.0)): _*)
    val e = intercept[IllegalArgumentException] {
      Analytics.forecastAccuracy(const).collect()
    }
    assert(e.getMessage.contains("naive MAE is zero"), e.getMessage)
  }

  test("ridgeNormalEq: lambda=0 recovers an exact linear model; " +
    "lambda>0 shrinks coefficients toward zero") {
    // price cents = 300 + 200*q + 500*d exactly (non-collinear design)
    val rows = Seq((1L, 0L), (2L, 1L), (3L, 3L), (5L, 2L), (7L, 8L))
      .map { case (q, d) =>
        (q.toDouble, d.toDouble / 100, (300 + 200 * q + 500 * d).toDouble / 100) }
    val df = rows.toDF("l_quantity", "l_discount", "l_extendedprice")
    val ols = Analytics.ridgeNormalEq(df, lambda = 0.0).collect()(0)
    assert(ols.getDouble(1) == 3.0, s"intercept ${ols.getDouble(1)}")
    assert(ols.getDouble(2) == 2.0, s"beta_qty ${ols.getDouble(2)}")
    assert(ols.getDouble(3) == 5.0, s"beta_disc ${ols.getDouble(3)}")
    // heavy regularization shrinks slopes strictly toward zero
    val hard = Analytics.ridgeNormalEq(df, lambda = 1e6).collect()(0)
    assert(math.abs(hard.getDouble(2)) < 2.0 && hard.getDouble(2) > 0)
    assert(math.abs(hard.getDouble(3)) < 5.0)
    // fixture: exact driver-side replay of the Gram fold + Cramer solve
    val li = Tables.lineitem(spark, sf0001)
    val fix = Analytics.ridgeNormalEq(li).collect()(0)
    val data = li.select($"l_quantity".cast("long"),
      ($"l_discount".cast("decimal(18,2)") * 100).cast("long"),
      ($"l_extendedprice".cast("decimal(18,2)") * 100).cast("long")).collect()
      .map(r => (BigInt(r.getLong(0)), BigInt(r.getLong(1)), BigInt(r.getLong(2))))
    val n = data.length
    def s(f: ((BigInt, BigInt, BigInt)) => BigInt) = data.map(f).sum
    val (a11, a12, a13) = (n.toDouble, s(_._1).toDouble, s(_._2).toDouble)
    val a22 = s(t => t._1 * t._1).toDouble + 1000.0
    val a23 = s(t => t._1 * t._2).toDouble
    val a33 = s(t => t._2 * t._2).toDouble + 1000.0
    val (b1, b2, b3) = (s(_._3).toDouble, s(t => t._1 * t._3).toDouble,
      s(t => t._2 * t._3).toDouble)
    val dA = a11 * (a22 * a33 - a23 * a23) - a12 * (a12 * a33 - a23 * a13) +
      a13 * (a12 * a23 - a22 * a13)
    val d1 = a11 * (b2 * a33 - a23 * b3) - b1 * (a12 * a33 - a23 * a13) +
      a13 * (a12 * b3 - b2 * a13)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(fix.getLong(0) == n)
    assert(fix.getDouble(2) == r6(d1 / dA / 100),
      s"beta_qty ${fix.getDouble(2)} vs ${r6(d1 / dA / 100)}")
  }

  test("ksTwoSample matches a naive sorted-CDF recompute on fixture data") {
    val events = Tables.events(spark, sf0001)
    val r = Analytics.ksTwoSample(events).collect()(0)
    val (nA, nB, atV, d) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    // naive recompute: collect both samples, walk the pooled sorted grid
    val rows = events.filter($"event_type" === "purchase")
      .select(($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        Sampling.hashBucket($"user_id").as("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1) < 5000))
    val a = rows.filter(_._2).map(_._1).sorted
    val b = rows.filterNot(_._2).map(_._1).sorted
    assert(nA == a.length && nB == b.length)
    val grid = (a ++ b).distinct.sorted
    val naive = grid.map { v =>
      val gap = math.abs(a.count(_ <= v).toLong * nB - b.count(_ <= v).toLong * nA)
      (gap, v)
    }
    val (bestGap, bestV) = naive.maxBy(t => (t._1, -t._2))
    assert(atV == bestV.toDouble / 100, s"location $atV vs ${bestV / 100.0}")
    val expect = math.floor(bestGap.toDouble / (nA.toDouble * nB.toDouble)
      * 1000000 + 0.5) / 1000000
    assert(d == expect, s"D $d vs $expect")
    assert(d >= 0.0 && d <= 1.0)
  }

  test("ksTwoSample: identical samples give D=0; disjoint samples give D=1") {
    // 10 users per arm, engineered so arms A/B see the same multiset
    val bucketOf = (id: Long) => // replicate hashBucket on the driver
      java.lang.Long.parseLong(org.apache.commons.codec.digest.DigestUtils
        .md5Hex(id.toString).substring(0, 8), 16) % 10000
    val ids = (1L to 200L)
    val (aIds, bIds) = (ids.filter(bucketOf(_) < 5000).take(10),
      ids.filter(bucketOf(_) >= 5000).take(10))
    def evFor(vals: Seq[Double], users: Seq[Long]) =
      users.zip(vals).map { case (u, v) =>
        (u, "2024-01-01 10:00:00", "purchase", v) }
    val same = ev(evFor((1 to 10).map(_.toDouble), aIds) ++
      evFor((1 to 10).map(_.toDouble), bIds): _*)
    assert(Analytics.ksTwoSample(same).collect()(0).getDouble(3) == 0.0)
    val disjoint = ev(evFor((1 to 10).map(_.toDouble), aIds) ++
      evFor((11 to 20).map(_.toDouble), bIds): _*)
    val r = Analytics.ksTwoSample(disjoint).collect()(0)
    assert(r.getDouble(3) == 1.0 && r.getDouble(2) == 10.0, r.toString)
  }

  private def ord(rows: (Double, String, String, String)*) =
    rows.toDF("o_totalprice", "o_orderpriority", "tss", "o_orderstatus")
      .select(col("o_totalprice"), col("o_orderpriority"),
        to_timestamp(col("tss")).as("o_orderdate"), col("o_orderstatus"))

  test("boostedStumps: perfectly-separating feature chosen every round, " +
    "leaf weights halve the residual, SSE replays exactly") {
    // label follows month exactly; price/priority are single-bin (no
    // candidate splits there), so every round must split month at 0
    val df = ord(
      (100.0, "1-URGENT", "1994-01-05 00:00:00", "F"),
      (100.0, "1-URGENT", "1994-01-20 00:00:00", "F"),
      (100.0, "1-URGENT", "1994-02-05 00:00:00", "O"),
      (100.0, "1-URGENT", "1994-02-20 00:00:00", "O"))
    val got = Analytics.boostedStumps(df, rounds = 2).collect()
    val r1 = got(0)
    assert(r1.getString(1) == "month" && r1.getLong(2) == 0L, r1.toString)
    // round 1: residual 1.0 on the two January rows, eta=1/2 -> wl 0.5
    assert(r1.getDouble(5) == 0.5 && r1.getDouble(6) == 0.0, r1.toString)
    assert(r1.getDouble(8) == 2.0, s"sse ${r1.getDouble(8)}") // 2 rows x 1.0^2
    val r2 = got(1)
    // round 2: residual halved -> wl 0.25, SSE 2 x 0.5^2
    assert(r2.getString(1) == "month" && r2.getDouble(5) == 0.25, r2.toString)
    assert(r2.getDouble(8) == 0.5, s"sse ${r2.getDouble(8)}")
  }

  test("boostedStumps: trajectory is partitioning-invariant and SSE is " +
    "non-increasing with positive gains on the fixture") {
    val orders = Tables.orders(spark, sf0001)
    val a = Analytics.boostedStumps(orders).collect()
    val b = Analytics.boostedStumps(orders.repartition(7)).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
      "integer trajectory must not depend on partitioning")
    val sses = a.map(_.getDouble(8)).toSeq
    assert(sses == sses.sorted.reverse, s"SSE not non-increasing: $sses")
    assert(a.forall(_.getDouble(7) >= 0), "negative split gain")
    assert(a.length == 5)
  }

  // independent BigInt replay of one alternatingLs half-step chain used
  // by the spec below: hash init -> user solve -> item solve -> item SSE
  private def alsReplay(ratings: Seq[(Long, Long, Long)])
      : Map[Long, (Long, Long, BigInt)] = {
    def snap(n: BigInt, dd: BigInt): Long = {
      val q = (2 * n.abs * 1000000 + dd) / (2 * dd)
      (if (n < 0) -q else q).toLong
    }
    def solve(rows: Seq[(BigInt, BigInt, BigInt)]): (Long, Long) = {
      val a11 = rows.map(t => t._1 * t._1).sum + 100000
      val a12 = rows.map(t => t._1 * t._2).sum
      val a22 = rows.map(t => t._2 * t._2).sum + 100000
      val b1 = rows.map(t => t._1 * t._3).sum
      val b2 = rows.map(t => t._2 * t._3).sum
      val dd = a11 * a22 - a12 * a12
      (snap(b1 * a22 - b2 * a12, dd), snap(a11 * b2 - a12 * b1, dd))
    }
    def q0(p: Long) = (BigInt(p) * BigInt(2654435761L) % 1000 - 500,
      BigInt(p) * 97003 % 1000 - 500)
    val users = ratings.groupBy(_._1).map { case (u, rs) =>
      u -> solve(rs.map { case (_, p, r) =>
        val (q1, q2) = q0(p); (q1, q2, BigInt(r)) })
    }
    ratings.groupBy(_._2).map { case (p, rs) =>
      val (nq1, nq2) = solve(rs.map { case (u, _, r) =>
        (BigInt(users(u)._1), BigInt(users(u)._2), BigInt(r)) })
      val sse = rs.map { case (u, _, r) =>
        val e = BigInt(r) * 1000000 -
          (BigInt(users(u)._1) * nq1 + BigInt(users(u)._2) * nq2)
        e * e
      }.sum
      p -> ((nq1, nq2, sse))
    }
  }

  test("alternatingLs: engine trajectory matches an independent BigInt " +
    "replay on a tiny matrix") {
    val ratings = Seq((1L, 10L, 5L), (1L, 11L, 3L), (2L, 10L, 2L))
    val orders = Seq((100L, 1L), (200L, 2L)).toDF("o_orderkey", "o_custkey")
    val li = Seq((100L, 10L, 5.0), (100L, 11L, 3.0), (200L, 10L, 2.0))
      .toDF("l_orderkey", "l_partkey", "l_quantity")
    val got = Analytics.alternatingLs(li, orders).collect()
      .map(r => r.getLong(0) -> ((math.round(r.getDouble(4) * 1000),
        math.round(r.getDouble(5) * 1000), r.getDouble(6)))).toMap
    val want = alsReplay(ratings)
    assert(got.keySet == Set(10L, 11L))
    for ((p, (q1, q2, sse)) <- want) {
      assert(got(p)._1 == q1 && got(p)._2 == q2,
        s"item $p factors ${got(p)} != ($q1, $q2)")
      assert(got(p)._3 == sse.toDouble / 1e12, s"item $p sse")
    }
  }

  test("alternatingLs: fixture-wide BigInt replay matches every item " +
    "and the trajectory is partitioning-invariant") {
    val li = Tables.lineitem(spark, sf0001)
    val ords = Tables.orders(spark, sf0001)
    val a = Analytics.alternatingLs(li, ords).collect()
    val b = Analytics.alternatingLs(li.repartition(5), ords.repartition(3))
      .collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
      "milli-grid trajectory must not depend on partitioning")
    val ratings = li.join(ords.select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey", $"l_partkey")
      .agg(sum($"l_quantity".cast("decimal(18,0)").cast("long")).as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = alsReplay(ratings)
    assert(a.length == want.size)
    for (r <- a) {
      val p = r.getLong(0)
      val (q1, q2, sse) = want(p)
      assert(math.round(r.getDouble(4) * 1000) == q1 &&
        math.round(r.getDouble(5) * 1000) == q2, s"item $p factors diverge")
      assert(r.getDouble(6) == sse.toDouble / 1e12, s"item $p sse diverges")
    }
    assert(a.length > 100, s"fixture should have >100 items, got ${a.length}")
  }

  test("pava: hand cases — already-monotone input unchanged, single " +
    "violation pools, cascading violation re-pools backwards") {
    // (leader, sum_y, n)
    val mono = Seq((0L, 1L, 10L), (1L, 5L, 10L), (2L, 9L, 10L))
    assert(Analytics.pava(mono) == mono)
    // middle bin too high: pools with its successor (3+1)/(10+10)=0.2
    val one = Seq((0L, 1L, 10L), (1L, 3L, 10L), (2L, 1L, 10L),
      (3L, 9L, 10L))
    assert(Analytics.pava(one) ==
      Seq((0L, 1L, 10L), (1L, 4L, 20L), (3L, 9L, 10L)))
    // pooling 2+3 (rate 0.2) then violates bin 1 (rate 0.3): cascades
    // into one pooled segment (0.3+2+1)/(30) ... backward re-check
    val cascade = Seq((0L, 3L, 10L), (1L, 2L, 10L), (2L, 1L, 10L))
    assert(Analytics.pava(cascade) == Seq((0L, 6L, 30L)))
    // exact-tie rates do NOT merge (strict violation only)
    val tie = Seq((0L, 2L, 10L), (1L, 2L, 10L))
    assert(Analytics.pava(tie) == tie)
  }

  test("isotonicCalibration: monotone pooled rates, mass conservation, " +
    "and segment consistency on the fixture") {
    val got = Analytics.isotonicCalibration(Tables.orders(spark, sf0001))
      .collect()
    assert(got.nonEmpty)
    val rates = got.map(_.getDouble(6)).toSeq
    assert(rates == rates.sorted, s"iso_rate not monotone: $rates")
    // every bin's raw mass is conserved inside its segment
    val bySeg = got.groupBy(r => (r.getLong(4), r.getLong(5)))
    for (((isoSy, isoN), rows) <- bySeg) {
      assert(rows.map(_.getLong(1)).sum == isoN,
        s"segment n mismatch at ($isoSy, $isoN)")
      assert(rows.map(_.getLong(2)).sum == isoSy,
        s"segment sy mismatch at ($isoSy, $isoN)")
    }
    // pooled rates never under-shoot the running average constraint:
    // total mass is preserved globally
    assert(got.map(_.getLong(2)).sum ==
      bySeg.keys.map(_._1).sum, "global y mass")
  }

  test("theilSenDaily: hand-checked median slope and intercept on three " +
    "days; all-rising fraction") {
    // revenues 10, 20, 40 dollars on consecutive days: pair slopes
    // 10, 20, 15 $/day -> median 15; intercepts 10, 5, 10 -> median 10
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view", 10.0),
      (1L, "2024-01-02 10:00:00", "view", 20.0),
      (1L, "2024-01-03 10:00:00", "view", 40.0))
    val r = Analytics.theilSenDaily(events).collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 3 && r.getLong(2) == 3)
    assert(r.getDouble(3) == 15.0, s"slope ${r.getDouble(3)}")
    assert(r.getDouble(4) == 10.0, s"intercept ${r.getDouble(4)}")
    assert(r.getDouble(5) == 1.0)
  }

  test("theilSenDaily: one wild day cannot move the median slope " +
    "(the robustness OLS lacks)") {
    val lin = (0 until 5).map(i =>
      (1L, f"2024-01-${i + 1}%02d 10:00:00", "view", 10.0 + i * 1.0))
    val wild = (1L, "2024-01-06 10:00:00", "view", 100000.0)
    val r = Analytics.theilSenDaily(ev(lin :+ wild: _*)).collect()(0)
    // 10 clean pairs at exactly 1 $/day, 5 contaminated: median stays 1
    assert(r.getDouble(3) == 1.0, s"slope ${r.getDouble(3)}")
  }

  test("theilSenDaily: even pair count takes the LOWER median, ties " +
    "included; <2 days fails loudly") {
    // cents 0, 100, 300, 600 -> sorted slopes [100,150,200,200,250,300],
    // position (6+1) div 2 = 3 -> 200 cents/day = 2 $/day
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view", 0.0),
      (1L, "2024-01-02 10:00:00", "view", 1.0),
      (1L, "2024-01-03 10:00:00", "view", 3.0),
      (1L, "2024-01-04 10:00:00", "view", 6.0))
    val r = Analytics.theilSenDaily(events).collect()(0)
    assert(r.getLong(1) == 6 && r.getDouble(3) == 2.0, r.toString)
    val e = intercept[IllegalArgumentException] {
      Analytics.theilSenDaily(ev((1L, "2024-01-01 10:00:00", "view", 1.0)))
    }
    assert(e.getMessage.contains("at least 2"), e.getMessage)
  }

  test("logrankTest: fixture-wide independent replay of the statistic, " +
    "and all-censored degenerates to exact zeros") {
    val events = Tables.events(spark, sf0001)
    val got = Analytics.logrankTest(events, censorDays = 1).collect()(0)
    // independent replay: collect per-user (t, e, arm) and fold the
    // Mantel-Haenszel terms with plain BigInt arithmetic
    val durs = events.groupBy($"user_id").agg(
        to_date(min($"ts")).as("fd"), to_date(max($"ts")).as("ld"))
      .crossJoin(broadcast(events.agg(to_date(max($"ts")).as("ed"))))
      .select($"user_id", datediff($"ld", $"fd").cast("long").as("t"),
        when(datediff($"ed", $"ld") < 1, 0L).otherwise(1L).as("e"),
        (Sampling.hashBucket($"user_id") < 5000).cast("long").as("a"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    def half(num: BigInt, den: BigInt): Long =
      ((2 * num * 1000000 + den) / (2 * den)).toLong
    val times = durs.map(_._1).distinct.sorted
    var (o1, dTot, e1m, vm) = (0L, 0L, BigInt(0), BigInt(0))
    for (tj <- times) {
      val atRisk = durs.filter(_._1 >= tj)
      val deaths = durs.filter(x => x._1 == tj && x._2 == 1)
      val (n, n1) = (BigInt(atRisk.length), BigInt(atRisk.count(_._3 == 1)))
      val d = BigInt(deaths.length)
      if (d > 0) {
        o1 += deaths.count(_._3 == 1)
        dTot += deaths.length
        e1m += half(d * n1, n)
        if (n > 1) vm += half(d * n1 * (n - n1) * (n - d), n * n * (n - 1))
      }
    }
    assert(got.getLong(3) == o1, s"o1 ${got.getLong(3)} != $o1")
    assert(got.getLong(2) == dTot)
    assert(got.getDouble(5) == e1m.toDouble / 1e6, "e1 diverges")
    assert(got.getDouble(7) == vm.toDouble / 1e6, "v diverges")
    val z = (o1 * 1000000L - e1m).toDouble / 1000000 /
      math.sqrt(vm.toDouble / 1e6)
    assert(got.getDouble(8) == z, "z diverges")
    // all-censored: censorDays beyond the corpus span -> exact zeros
    val zero = Analytics.logrankTest(events, censorDays = 10000).collect()(0)
    assert(zero.getLong(2) == 0 && zero.getLong(3) == 0 &&
      zero.getDouble(8) == 0.0 && zero.getDouble(9) == 0.0, zero.toString)
  }

  private def evp(rows: (Long, Long, String, String, Double, Long)*) =
    rows.toDF("event_id", "user_id", "tss", "event_type", "value", "k")
      .select(col("event_id"), col("user_id"),
        to_timestamp(col("tss")).as("ts"), col("event_type"), col("value"),
        concat(lit("{\"k\": "), col("k"), lit("}")).as("props"))

  test("positionAttribution: U-shape 40/20/40, single-touch full credit, " +
    "post-purchase touches drop") {
    val events = evp(
      (1L, 1L, "2024-01-01 10:00:00", "click", 1.0, 0L),
      (2L, 1L, "2024-01-01 10:05:00", "view", 1.0, 1L),
      (3L, 1L, "2024-01-01 10:10:00", "click", 1.0, 2L),
      (4L, 1L, "2024-01-01 10:15:00", "purchase", 10.0, 0L),
      (5L, 2L, "2024-01-01 09:00:00", "view", 1.0, 3L),
      (6L, 2L, "2024-01-01 09:30:00", "purchase", 5.0, 0L),
      (7L, 3L, "2024-01-01 11:00:00", "click", 1.0, 0L)) // no purchase
    val got = Analytics.positionAttribution(events).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      "click_0" -> ((1L, 1L, 4.0)), // first of three: 40% of 10
      "view_1" -> ((1L, 1L, 2.0)),  // middle: 20%
      "click_2" -> ((1L, 1L, 4.0)), // last: 40%
      "view_3" -> ((1L, 1L, 5.0))), // single touch: 100% of 5
      got.toString)
  }

  test("positionAttribution: fixture-wide independent replay matches " +
    "every channel exactly") {
    val events = Tables.events(spark, sf0001)
    val got = Analytics.positionAttribution(events).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // plain-Scala replay: walk each user's stream backwards carrying the
    // nearest following purchase, then U-shape credit per conversion
    val rows = events
      .filter(col("event_type").isin("click", "view", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2),
        r.getString(3), r.getLong(4), r.getLong(5)))
    case class Touch(channel: String, pid: Long, cents: Long, rn: Int,
                     n: Int)
    val touches = rows.groupBy(_._1).values.flatMap { us =>
      val sorted = us.sortBy(t => (t._2, t._3))
      var carry: Option[(Long, Long)] = None // (pid, cents), from the right
      val assigned = sorted.reverse.flatMap { t =>
        if (t._4 == "purchase") { carry = Some((t._3, t._5)); None }
        else carry.map { case (pid, cents) =>
          (s"${t._4}_${t._6 % 4}", pid, cents, t._2, t._3) }
      }.reverse
      assigned.groupBy(_._2).values.flatMap { grp =>
        val ordered = grp.sortBy(g => (g._4, g._5))
        val n = ordered.length
        ordered.zipWithIndex.map { case ((ch, pid, cents, _, _), i) =>
          Touch(ch, pid, cents, i + 1, n) }
      }
    }.toSeq
    def credit(t: Touch): Long = {
      val (num, den) =
        if (t.n == 1) (1L, 1L)
        else if (t.n == 2) (1L, 2L)
        else if (t.rn == 1 || t.rn == t.n) (2L, 5L)
        else (1L, 5L * (t.n - 2))
      (2 * t.cents * 1000000 * num + den) / (2 * den)
    }
    val want = touches.groupBy(_.channel).map { case (ch, ts) =>
      ch -> ((ts.length.toLong, ts.map(_.pid).distinct.length.toLong,
        ts.map(credit).sum.toDouble / 1e8))
    }
    assert(got == want,
      s"engine ${got.toSeq.sorted} != replay ${want.toSeq.sorted}")
  }

  test("dtwDaily: identical series align on the pure diagonal at zero " +
    "cost; a 1-day lag warps to zero via an insertion") {
    def series(tpe: String, vals: Seq[Double], u: Long) =
      vals.zipWithIndex.map { case (v, i) =>
        (u, f"2024-01-${i + 1}%02d 10:00:00", tpe, v) }
    val same = ev(series("purchase", Seq(1.0, 2.0, 3.0), 1L) ++
      series("click", Seq(1.0, 2.0, 3.0), 2L): _*)
    val d1 = Analytics.dtwDaily(same).collect()
    assert(d1.length == 3)
    assert(d1.forall(_.getDouble(3) == 0.0), "diagonal should cost zero")
    assert(d1.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 1L), (2L, 2L), (3L, 3L)))
    // clicks = purchases delayed one day with a leading repeat: the
    // warp absorbs the lag at zero total cost
    val lag = ev(series("purchase", Seq(1.0, 2.0, 3.0), 1L) ++
      series("click", Seq(1.0, 1.0, 2.0, 3.0), 2L): _*)
    val d2 = Analytics.dtwDaily(lag).collect()
    assert(d2.last.getDouble(4) == 0.0,
      s"lagged series should align free: ${d2.last}")
    assert(d2.length == 4)
  }

  test("dtwDaily: trailing-maxDays contract trims the head; missing " +
    "series fails loudly") {
    def series(tpe: String, vals: Seq[Double], u: Long) =
      vals.zipWithIndex.map { case (v, i) =>
        (u, f"2024-01-${i + 1}%02d 10:00:00", tpe, v) }
    // head values 90, 80 would dominate cost if not trimmed
    val events = ev(series("purchase", Seq(90.0, 80.0, 1.0, 2.0), 1L) ++
      series("click", Seq(1.0, 2.0), 2L): _*)
    val got = Analytics.dtwDaily(events, maxDays = 2).collect()
    assert(got.length == 2 && got.last.getDouble(4) == 0.0, got.toSeq)
    val e = intercept[IllegalArgumentException] {
      Analytics.dtwDaily(ev(series("purchase", Seq(1.0), 1L): _*))
    }
    assert(e.getMessage.contains("both purchase and click"), e.getMessage)
  }

  test("boostedStumps: single-cell corpus fails loudly") {
    val df = ord((100.0, "1-URGENT", "1994-01-05 00:00:00", "F"))
    val e = intercept[IllegalArgumentException] {
      Analytics.boostedStumps(df)
    }
    assert(e.getMessage.contains("no valid split"), e.getMessage)
  }

  test("lorenzCurve: known book gives exact decile shares; uniform ties " +
    "split evenly; boundary groups split exactly") {
    def orders(rows: (Long, Double)*) =
      rows.toDF("o_custkey", "o_totalprice")
    // 10 customers spending 1..10 dollars: decile d = customer d
    val tenfold = orders((1L to 10L).map(i => (i, i.toDouble)): _*)
    val r = Analytics.lorenzCurve(tenfold).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3),
        x.getDouble(4)))
    assert(r.length == 10)
    (1 to 10).foreach { d =>
      val (dec, cust, cents, share, cum) = r(d - 1)
      assert(dec == d && cust == 1L && cents == d * 100L)
      assert(share == math.floor(d / 55.0 * 1e6 + 0.5) / 1e6)
      assert(cum == math.floor(d * (d + 1) / 2.0 / 55.0 * 1e6 + 0.5) / 1e6)
    }
    // 20 identical customers: ONE RLE group spanning all ten deciles —
    // the boundary split must hand each decile exactly 2 members, 10%
    val flat = orders((1L to 20L).map(i => (i, 7.0)): _*)
    val f = Analytics.lorenzCurve(flat).collect()
    assert(f.length == 10)
    assert(f.forall(x => x.getLong(1) == 2L && x.getDouble(3) == 0.1))
    assert(f.last.getDouble(4) == 1.0)
  }

  test("lorenzCurve: n not divisible by 10 keeps every member — ceiling " +
    "decile assignment agrees with the boundary overlap (r11 advice)") {
    def orders(rows: (Long, Double)*) =
      rows.toDF("o_custkey", "o_totalprice")
    // floor-division decile assignment dropped boundary ranks whenever
    // n % 10 != 0 (n=11 distinct: only 2 of 11 customers survived); the
    // fixture masked it because customers-with-orders counts divide by 10
    for (n <- Seq(7, 11, 23, 95, 101)) {
      // distinct values AND a tie block straddling a boundary
      val rows = (1 to n).map(i => (i.toLong, if (i <= 3) 5.0 else i * 1.0))
      val r = Analytics.lorenzCurve(orders(rows: _*)).collect()
        .map(x => (x.getLong(0), x.getLong(1), BigInt(x.getLong(2))))
      assert(r.map(_._2).sum == n.toLong, s"n=$n lost members: ${r.toSeq}")
      // decile d must hold exactly d*n div 10 - (d-1)*n div 10 members
      r.foreach { case (d, cust, _) =>
        val want = d * n / 10 - (d - 1) * n / 10
        assert(cust == want, s"n=$n decile $d: $cust members, want $want")
      }
      // revenue replay: sort ascending, positional cut, exact sums
      val cents = rows.map(t => math.round(t._2 * 100)).sorted
      val byD = r.map(x => x._1 -> x._3).toMap
      (1 to 10).foreach { d =>
        val lo = (d - 1) * n / 10; val hi = d * n / 10
        if (hi > lo)
          assert(byD(d.toLong) ==
            cents.slice(lo, hi).map(BigInt(_)).sum, s"n=$n decile $d rev")
      }
    }
  }

  test("lorenzCurve: fixture replay via a driver-side full sort matches " +
    "the distributed two-phase rank digit for digit") {
    val orders = graft.Tables.orders(spark, sf0001)
    val got = Analytics.lorenzCurve(orders).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3),
        x.getDouble(4)))
    // independent replay: collect per-customer cents, sort ascending,
    // positional decile cut, exact integer sums
    val cents = orders.groupBy(col("o_custkey"))
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long").as("c"))
      .collect().map(_.getLong(1)).sorted
    val n = cents.length; val tot = cents.map(BigInt(_)).sum
    val expect = (1 to 10).flatMap { d =>
      val lo = (d - 1).toLong * n / 10; val hi = d.toLong * n / 10
      if (hi == lo) None else {
        val slice = cents.slice(lo.toInt, hi.toInt)
        Some((d.toLong, (hi - lo), slice.map(BigInt(_)).sum,
          cents.take(hi.toInt).map(BigInt(_)).sum))
      }
    }
    assert(got.length == expect.length)
    got.zip(expect).foreach { case ((d, cust, rev, share, cum),
                                    (ed, ecust, erev, ecum)) =>
      assert(d == ed && cust == ecust && rev == erev.toLong)
      assert(share ==
        math.floor(erev.toDouble / tot.toDouble * 1e6 + 0.5) / 1e6)
      assert(cum ==
        math.floor(ecum.toDouble / tot.toDouble * 1e6 + 0.5) / 1e6)
    }
    // bucket count must not change results (pure repartitioning of ranks)
    val one = Analytics.lorenzCurve(orders, buckets = 7).collect()
      .map(_.toString)
    assert(one.toSeq == Analytics.lorenzCurve(orders).collect()
      .map(_.toString).toSeq)
  }

  test("skyline: dominance, per-price maxima, exact-tie co-existence") {
    def parts(rows: (Long, Double, Int)*) =
      rows.toDF("p_partkey", "p_retailprice", "p_size")
    val d = parts(
      (1L, 0.50, 5),   // cheapest: survives unconditionally
      (2L, 0.60, 5),   // same size, strictly pricier than 1 → dominated
      (3L, 1.00, 10),  // beaten at its own price by 4
      (4L, 1.00, 12),  // per-price max, bigger than all cheaper → survives
      (5L, 1.00, 12),  // exact tie with 4 on BOTH dims → co-exists
      (6L, 2.00, 12))  // equal size, pricier than 4 → dominated
    val got = Analytics.skyline(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 50L, 5L), (4L, 100L, 12L), (5L, 100L, 12L)),
      got.mkString(", "))
  }

  test("skyline: fixture replay against the quadratic dominance " +
    "definition; bucket count is pure repartitioning") {
    val part = graft.Tables.part(spark, sf0001)
    val got = Analytics.skyline(part).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val all = part.select(col("p_partkey"),
      (col("p_retailprice").cast("decimal(18,2)") * 100).cast("long"),
      col("p_size").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = all.filter { p =>
      !all.exists(q => q._2 <= p._2 && q._3 >= p._3 &&
        (q._2 < p._2 || q._3 > p._3))
    }.sortBy(p => (p._2, p._1))
    assert(got.toSeq == expect.toSeq,
      s"got ${got.length}, want ${expect.length}")
    assert(got.nonEmpty) // the cheapest price's max size always survives
    val coarse = Analytics.skyline(part, buckets = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(coarse.toSeq == got.toSeq)
  }

  test("conformalInterval: a perfectly linear book gives a (near-)zero " +
    "interval with full coverage; k > m reports the infinite interval") {
    def li(rows: (Long, Long, Double, Double, Double)*) =
      rows.toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_extendedprice")
    // y = 200 + 3*q cents exactly, enough rows that every split is hit;
    // lambda=0 so the normal equations recover the plane exactly
    val perfect = li((1L to 200L).map(i =>
      (i, 1L, (i % 7 + 1).toDouble, 0.01 * (i % 3),
        (2.0 + 0.03 * (i % 7 + 1)) + 0.0)): _*)
    val r = Analytics.conformalInterval(perfect, lambda = 0.0).collect()(0)
    assert(r.getLong(0) + r.getLong(1) + r.getLong(2) == 200L)
    // grid-rounded micro-cent betas leave at most a few micro-cents of
    // residual: the 90% interval is under a thousandth of a dollar wide
    assert(r.getDouble(3) < 0.001, r.toString)
    assert(r.getDouble(4) == 1.0)
    // alpha so extreme that k = ceil((m+1)*0.999) > m: infinite interval
    val tiny = li((1L to 30L).map(i =>
      (i, 1L, 1.0, 0.0, i.toDouble)): _*)
    val inf = Analytics.conformalInterval(tiny, alpha = 0.001).collect()(0)
    assert(inf.isNullAt(3) && inf.getDouble(4) == 1.0, inf.toString)
    intercept[IllegalArgumentException] {
      Analytics.conformalInterval(tiny, alpha = 0.0)
    }
  }

  test("conformalInterval: fixture replay (exact moments, same double " +
    "formula, driver-side sort) matches every output field") {
    val li = graft.Tables.lineitem(spark, sf0001)
    val got = Analytics.conformalInterval(li).collect()(0)
    val rows = li.select(
      col("l_quantity").cast("decimal(18,0)").cast("long"),
      (col("l_discount").cast("decimal(18,2)") * 100).cast("long"),
      (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"),
      concat(col("l_orderkey").cast("string"), lit(":"),
        col("l_linenumber").cast("string")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        md5Bucket(r.getString(3))))
    val train = rows.filter(_._4 < 6000)
    val calib = rows.filter(x => x._4 >= 6000 && x._4 < 8000)
    val hold = rows.filter(_._4 >= 8000)
    // exact integer moments, then the SAME fixed-order double formula
    def bi(f: ((Long, Long, Long, Long)) => BigInt) = train.map(f).sum
    val (a11, a12, a13) = (train.length.toDouble,
      bi(t => BigInt(t._1)).toDouble, bi(t => BigInt(t._2)).toDouble)
    val a22 = bi(t => BigInt(t._1) * t._1).toDouble + 1000.0
    val a23 = bi(t => BigInt(t._1) * t._2).toDouble
    val a33 = bi(t => BigInt(t._2) * t._2).toDouble + 1000.0
    val b1 = bi(t => BigInt(t._3)).toDouble
    val b2 = bi(t => BigInt(t._1) * t._3).toDouble
    val b3 = bi(t => BigInt(t._2) * t._3).toDouble
    val dA = a11 * (a22 * a33 - a23 * a23) - a12 * (a12 * a33 - a23 * a13) +
      a13 * (a12 * a23 - a22 * a13)
    val d0 = b1 * (a22 * a33 - a23 * a23) - a12 * (b2 * a33 - a23 * b3) +
      a13 * (b2 * a23 - a22 * b3)
    val d1 = a11 * (b2 * a33 - a23 * b3) - b1 * (a12 * a33 - a23 * a13) +
      a13 * (a12 * b3 - b2 * a13)
    val d2 = a11 * (a22 * b3 - b2 * a23) - a12 * (a12 * b3 - b2 * a13) +
      b1 * (a12 * a23 - a22 * a13)
    def micro(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val (b0m, b1m, b2m) = (micro(d0 / dA), micro(d1 / dA), micro(d2 / dA))
    def resid(t: (Long, Long, Long, Long)) =
      math.abs(t._3 * 1000000L - (b0m + b1m * t._1 + b2m * t._2))
    val cr = calib.map(resid).sorted
    val k = (((cr.length + 1L) * 900) + 999) / 1000
    val qhat = cr(k.toInt - 1)
    val covered = hold.map(resid).count(_ <= qhat)
    assert(got.getLong(0) == train.length && got.getLong(1) == calib.length
      && got.getLong(2) == hold.length)
    assert(got.getDouble(3) ==
      math.floor(qhat.toDouble / 1e8 * 1e6 + 0.5) / 1e6, got.toString)
    assert(got.getDouble(4) == math.floor(
      covered.toDouble / hold.length * 1e6 + 0.5) / 1e6)
    // the guarantee itself: coverage >= 1 - alpha on exchangeable splits
    assert(got.getDouble(4) >= 0.9)
    // bucket count is pure rank repartitioning: results identical
    assert(Analytics.conformalInterval(li, buckets = 13).collect()(0)
      .toString == got.toString)
  }

  // independent md5 bucket replica of Sampling.hashBucket — NOT the
  // Spark expression (same replica as TextAnalysisSpec's)
  private def md5Bucket(key: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(8)
    java.lang.Long.parseLong(hex, 16) % 10000L
  }

  test("cusumDrift: prefix closed form equals the sequential recurrence, " +
    "replayed independently") {
    // an irregular series, exercising resets on both sides
    val vals = Seq(10.0, 12.0, 3.0, 11.0, 30.0, 9.0, 8.0, 25.0)
    val events = ev(vals.zipWithIndex.map { case (v, i) =>
      (1L, f"2024-03-${i + 1}%02d 09:00:00", "view", v)
    }: _*)
    val got = Analytics.cusumDrift(events).collect()
      .map(r => (r.getString(1), r.getDouble(3), r.getDouble(4),
        r.getBoolean(5), r.getBoolean(6)))
    // independent sequential replay in exact cents-longs
    val cents = vals.map(v => (v * 100).round)
    val dd = cents.length.toLong; val tt = cents.sum
    var s = 0L; var t = 0L
    val expect = cents.map { c =>
      val z = dd * c - tt
      s = math.max(0L, s + z); t = math.max(0L, t - z)
      (math.floor(s.toDouble / tt * 1e6 + 0.5) / 1e6,
        math.floor(t.toDouble / tt * 1e6 + 0.5) / 1e6)
    }
    assert(got.length == vals.length)
    got.zip(expect).foreach { case ((day, up, dn, au, ad), (eu, ed)) =>
      assert(up == eu && dn == ed, s"$day: got ($up,$dn) want ($eu,$ed)")
      assert(au == (up > 1.0) && ad == (dn > 1.0))
    }
  }

  test("seasonalDecompose: a pure additive weekly pattern yields constant " +
    "trend, the exact centered bumps, zero residual; gaps null the window") {
    // 21 days, revenue = 10 + bump(weekday): the 7-day centered mean is
    // the constant overall mean, seasonal recovers the centered bump
    // exactly, residual is 0 on every interior day
    val bump = Map(0L -> 0.07, 1L -> -0.14, 2L -> 0.21, 3L -> 0.0,
      4L -> -0.07, 5L -> 0.14, 6L -> -0.21)
    def dayOf(i: Int) = java.time.LocalDate.of(2024, 3, 1).plusDays(i.toLong)
    val rows = (0 until 21).map { i =>
      val d = dayOf(i)
      (1L, s"$d 09:00:00", "view", 10.0 + bump(d.toEpochDay % 7))
    }
    val r = Analytics.seasonalDecompose(ev(rows: _*)).collect()
    assert(r.length == 21)
    val (edge, interior) = r.partition(_.isNullAt(3))
    assert(edge.length == 6 && interior.length == 15) // 3 each side
    interior.foreach { x =>
      assert(x.getDouble(3) == 10.0, s"trend: $x") // mean(bump) = 0
      val wd = java.time.LocalDate.parse(x.getString(1)).toEpochDay % 7
      assert(x.getDouble(4) == math.floor(bump(wd) * 1e4 + 0.5) / 1e4,
        s"seasonal: $x")
      assert(x.getDouble(5) == 0.0, s"resid: $x")
    }
    // a calendar gap: the RANGE frame sees < 7 days around it → NULLs
    // rather than a mean over non-adjacent days
    val gapped = ev(((0 until 10).filter(_ != 5)).map { i =>
      val d = dayOf(i); (1L, s"$d 09:00:00", "buy", 10.0)
    }: _*)
    val g = Analytics.seasonalDecompose(gapped).collect()
    // 9 days with one hole: every candidate ±3 window touches the hole
    // or an edge, so NO day decomposes — the gap never averages through
    assert(g.length == 9 && g.forall(_.isNullAt(3)), g.mkString(", "))
    intercept[IllegalArgumentException] {
      Analytics.seasonalDecompose(gapped, period = 4)
    }
  }

  test("seasonalDecompose: the decomposition identity holds on the " +
    "fixture within the grid") {
    val r = Analytics.seasonalDecompose(graft.Tables.events(spark, sf0001))
      .collect().filterNot(_.isNullAt(3))
    assert(r.nonEmpty)
    r.foreach { x =>
      val gap = math.abs(x.getDouble(2) -
        (x.getDouble(3) + x.getDouble(4) + x.getDouble(5)))
      assert(gap <= 2e-4, s"identity: $x gap $gap")
    }
  }

  test("diffInDiff: a planted treatment lift is recovered exactly; a " +
    "shared trend cancels; degenerate arms report 0") {
    val ids = (1L to 60L).toVector
    val aIds = ids.filter(i => md5Bucket(i.toString) < 5000).take(2)
    val bIds = ids.filter(i => md5Bucket(i.toString) >= 5000).take(2)
    // 4 days → midpoint after day 2; both arms drift +1.00 post, the
    // treated arm adds +2.00 on top: DiD must be exactly 2, trend-free
    def rows(uid: Long, pre: Double, post: Double) = Seq(
      (uid, "2024-01-01 09:00:00", "purchase", pre),
      (uid, "2024-01-04 09:00:00", "purchase", post))
    val d = ev((Seq(rows(aIds(0), 5.0, 7.98), rows(aIds(1), 5.0, 8.02)) ++
      Seq(rows(bIds(0), 9.0, 9.98), rows(bIds(1), 9.0, 10.02))).flatten: _*)
    val r = Analytics.diffInDiff(d).collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 3.0 && r.getDouble(3) == 1.0) // arm deltas
    assert(r.getDouble(4) == 2.0, r.toString) // the planted lift
    assert(r.getDouble(6) != 0.0) // jittered arms carry real variance
    // identical deltas within each arm → se2 = 0 → the guard reports 0
    val flat = ev((aIds.flatMap(u => rows(u, 5.0, 6.0)) ++
      bIds.flatMap(u => rows(u, 5.0, 6.0))): _*)
    val f = Analytics.diffInDiff(flat).collect()(0)
    assert(f.getDouble(4) == 0.0 && f.getDouble(5) == 0.0 &&
      f.getDouble(6) == 0.0)
    // a user silent in one period contributes an exact zero for it
    val lone = ev(
      (aIds(0), "2024-02-01 09:00:00", "purchase", 4.0),
      (bIds(0), "2024-02-02 09:00:00", "purchase", 4.0))
    val l = Analytics.diffInDiff(lone).collect()(0)
    // 2-day span: midpoint after day 1 — A is pre-only (delta −4),
    // B post-only (delta +4)
    assert(l.getDouble(2) == -4.0 && l.getDouble(3) == 4.0)
  }

  test("trimmedMeans: one-each-side cut drops the outliers, winsor " +
    "clamps them; trim 0 is the plain mean; fixture replay matches") {
    def orders(vs: Double*) = vs.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("o_custkey", "o_totalprice")
    // 10 values incl. two wild tails; trim=0.1 → k=1: keep 2..9
    val d = orders(0.01, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 999.0)
    val r = Analytics.trimmedMeans(d, trim = 0.1).collect()(0)
    assert(r.getLong(0) == 10L && r.getLong(1) == 1L)
    assert(r.getLong(2) == 100L && r.getLong(3) == 800L) // boundary cents
    assert(r.getDouble(4) == 4.5) // mean of 1..8 dollars
    // winsor: 0.01→1.0 and 999→8.0 ⇒ (36 + 1 + 8) / 10
    assert(r.getDouble(5) == 4.5)
    val plain = Analytics.trimmedMeans(d, trim = 0.0).collect()(0)
    assert(plain.getLong(1) == 0L)
    assert(plain.getDouble(4) == plain.getDouble(5)) // no tails to treat
    intercept[IllegalArgumentException] {
      Analytics.trimmedMeans(d, trim = 0.5)
    }
    // fixture replay: driver-side sort + positional cuts
    val orders0 = graft.Tables.orders(spark, sf0001)
    val got = Analytics.trimmedMeans(orders0).collect()(0)
    val cents = orders0.select(
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = cents.length; val k = (n.toLong * 500 / 10000).toInt
    val kept = cents.slice(k, n - k)
    val tm = math.floor(kept.map(BigInt(_)).sum.toDouble / kept.length / 100
      * 1e6 + 0.5) / 1e6
    val wm = math.floor((kept.map(BigInt(_)).sum + BigInt(k) *
      (cents(k) + cents(n - k - 1))).toDouble / n / 100 * 1e6 + 0.5) / 1e6
    assert(got.getLong(0) == n && got.getLong(1) == k)
    assert(got.getLong(2) == cents(k) && got.getLong(3) == cents(n - k - 1))
    assert(got.getDouble(4) == tm && got.getDouble(5) == wm)
    assert(Analytics.trimmedMeans(orders0, buckets = 5).collect()(0)
      .toString == got.toString)
  }

  test("doublyRobustEffect: flat covariates reduce AIPW to the arm " +
    "difference with a vanishing correction; empty arms fail loudly") {
    def u(uid: Long, views: Int, clicks: Int, cents: Double) = {
      val vs = Seq.fill(views)("view") ++ Seq.fill(clicks)("click") ++
        Seq.fill(2)("signup") ++ Seq.fill(2)("error")
      vs.zipWithIndex.map { case (t, i) =>
        (uid, f"2024-01-${i % 28 + 1}%02d 10:00:00", t, 0.0)
      } :+ ((uid, "2024-01-01 09:00:00", "purchase", cents))
    }
    val flat = ev((u(1, 3, 1, 10.0) ++ u(2, 3, 1, 20.0) ++
      u(3, 1, 3, 5.0) ++ u(4, 1, 3, 7.0)): _*)
    val r = Analytics.doublyRobustEffect(flat).collect()(0)
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L)
    // outcome models predict each arm's (shrunken) mean, so the
    // correction is near zero and the estimate sits at the plain
    // 15 − 6 = 9 dollar difference up to ridge shrinkage
    assert(math.abs(r.getDouble(4) - 9.0) < 0.5, r.toString)
    assert(math.abs(r.getDouble(3)) < 0.5, r.toString)
    // the reported decomposition closes within one grid step
    assert(math.abs(r.getDouble(2) + r.getDouble(3) - r.getDouble(4))
      <= 2e-4)
    val oneArm = ev(u(1, 3, 1, 10.0): _*)
    val e = intercept[IllegalArgumentException] {
      Analytics.doublyRobustEffect(oneArm).collect()
    }
    assert(e.getMessage.contains("arm"), e.getMessage)
  }

  test("doublyRobustEffect: agrees with ipwEffect within dollars on the " +
    "fixture (two estimators, one estimand)") {
    val events = graft.Tables.events(spark, sf0001)
    val dr = Analytics.doublyRobustEffect(events).collect()(0)
    val ipw = Analytics.ipwEffect(events).collect()(0)
    val (a, b) = (dr.getDouble(4), ipw.getDouble(7))
    // same treatment, same estimand, different bias corrections: the
    // two estimates must sit in the same neighborhood, not equal
    assert(math.abs(a - b) < math.max(20.0, 0.5 * math.abs(b)),
      s"aipw $a vs ipw $b")
  }

  test("plattCalibration: an informative score earns a positive slope " +
    "and pulls the mean to the base rate; the flat fixture score " +
    "flattens correctly") {
    // label == F exactly when totalprice is high: ml1's x1 feature is
    // informative, so the raw score separates and Platt must USE it
    val rows = (1 to 400).map { i =>
      val hi = i % 2 == 0
      (i.toLong, if (hi) 90000.0 + i else 1000.0 + i,
        "3-MEDIUM", f"2024-01-${i % 28 + 1}%02d 00:00:00",
        if (hi) "F" else "O")
    }
    val orders = rows.toDF("o_orderkey", "o_totalprice", "o_orderpriority",
      "tss", "o_orderstatus")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"),
        to_timestamp(col("tss")).as("o_orderdate"), col("o_orderstatus"))
    val r = Analytics.plattCalibration(orders, iters = 40).collect()
    val b = r.head.getDouble(3)
    assert(b > 0.0, s"platt_b: $b") // the slope must follow the signal
    // a/b constant across rows
    assert(r.forall(x => x.getDouble(2) == r.head.getDouble(2) &&
      x.getDouble(3) == b))
    // calibration's first-order claim: the calibrated mean sits closer
    // to the 0.5 base rate than the raw model's mean (GD's intercept
    // stationarity drives Σσ toward Σy)
    def pooled(rows: Array[org.apache.spark.sql.Row],
               avgIdx: Int, nIdx: Int = 1) = {
      val n = rows.map(_.getLong(nIdx)).sum.toDouble
      rows.map(x => x.getLong(nIdx) * x.getDouble(avgIdx)).sum / n
    }
    val calMean = pooled(r, 4)
    val raw = Analytics.calibrationBins(orders).collect()
    val rawMean = pooled(raw, 2)
    assert(math.abs(calMean - 0.5) < math.abs(rawMean - 0.5),
      s"cal $calMean raw $rawMean")
    // fixture: a near-uninformative score correctly flattens to ~1 bin,
    // and the bins partition the order book exactly
    val f = Analytics.plattCalibration(graft.Tables.orders(spark, sf0001))
      .collect()
    assert(f.map(_.getLong(1)).sum ==
      graft.Tables.orders(spark, sf0001).count())
  }

  test("ipwEffect: with flat covariates the Hajek estimate collapses to " +
    "the arm means; a planted confounder moves IPW toward the truth") {
    // 4 users, identical covariates (propensity constant): IPW weights
    // cancel inside each arm and ATE = plain difference of arm means.
    // Treated = views > clicks.
    def u(uid: Long, views: Int, clicks: Int, signups: Int, errors: Int,
          cents: Double) = {
      val vs = Seq.fill(views)("view") ++ Seq.fill(clicks)("click") ++
        Seq.fill(signups)("signup") ++ Seq.fill(errors)("error")
      vs.zipWithIndex.map { case (t, i) =>
        (uid, f"2024-01-${i % 28 + 1}%02d 10:00:00", t, 0.0)
      } :+ ((uid, "2024-01-01 09:00:00", "purchase", cents))
    }
    val flat = ev((u(1, 3, 1, 2, 2, 10.0) ++ u(2, 3, 1, 2, 2, 20.0) ++
      u(3, 1, 3, 2, 2, 5.0) ++ u(4, 1, 3, 2, 2, 7.0)): _*)
    val r = Analytics.ipwEffect(flat).collect()(0)
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L)
    assert(r.getDouble(5) == 15.0 && r.getDouble(6) == 6.0, r.toString)
    assert(r.getDouble(7) == 9.0)
    // planted confounder: high-signup users BOTH spend more and are
    // more often treated. Raw arm difference over-credits treatment;
    // IPW must land BELOW it (reweighting restores the signup balance)
    val conf = ev((
      u(11, 3, 1, 9, 0, 40.0) ++ u(12, 3, 1, 9, 0, 44.0) ++
      u(13, 3, 1, 0, 9, 12.0) ++
      u(14, 1, 3, 9, 0, 38.0) ++
      u(15, 1, 3, 0, 9, 10.0) ++ u(16, 1, 3, 0, 9, 8.0)): _*)
    val c = Analytics.ipwEffect(conf, iters = 30).collect()(0)
    val rawDiff = (40.0 + 44 + 12) / 3 - (38.0 + 10 + 8) / 3
    assert(c.getDouble(7) < rawDiff, s"ipw ${c.getDouble(7)} vs raw $rawDiff")
    assert(c.getDouble(7) > 0.0)
  }

  test("spearmanRho: monotone-nonlinear scores exactly 1, reversal -1, " +
    "tied case matches the hand-computed 0.5, constant column guards 0") {
    def li(rows: (Double, Double)*) = rows.zipWithIndex.map {
      case ((q, p), i) => (i.toLong, q, p)
    }.toDF("l_orderkey", "l_quantity", "l_extendedprice")
    // y = x^3: wildly non-linear, perfectly monotone → ranks identical
    val cubic = li((1 to 8).map(i => (i.toDouble, i * i * i / 100.0)): _*)
    assert(Analytics.spearmanRho(cubic).collect()(0).getDouble(1) == 1.0)
    val rev = li((1 to 8).map(i => (i.toDouble, (9 - i) * 1.0)): _*)
    assert(Analytics.spearmanRho(rev).collect()(0).getDouble(1) == -1.0)
    // ties: x = [1,1,2] cents-ranks (1.5,1.5,3), y = [.03,.04,.04] ranks
    // (1,2.5,2.5) → Pearson on midranks = 0.5 by hand
    val tied = li((1.0, 0.03), (1.0, 0.04), (2.0, 0.04))
    assert(Analytics.spearmanRho(tied).collect()(0).getDouble(1) == 0.5)
    val const = li((1.0, 0.05), (2.0, 0.05), (3.0, 0.05))
    assert(Analytics.spearmanRho(const).collect()(0).getDouble(1) == 0.0)
  }

  test("spearmanRho: fixture replay with driver-side midranks matches " +
    "digit for digit") {
    val li = graft.Tables.lineitem(spark, sf0001)
    val got = Analytics.spearmanRho(li).collect()(0)
    val rows = li.select(
      col("l_quantity").cast("decimal(18,0)").cast("long"),
      (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def mid2(vs: Seq[Long]): Map[Long, Long] = {
      val byV = vs.groupBy(identity).map { case (v, g) => (v, g.size.toLong) }
        .toSeq.sortBy(_._1)
      var c0 = 0L
      byV.map { case (v, cnt) =>
        val m = 2 * c0 + cnt + 1; c0 += cnt; v -> m
      }.toMap
    }
    val mq = mid2(rows.map(_._1)); val mp = mid2(rows.map(_._2))
    val n = rows.length.toLong
    var sx, sy = BigInt(0); var sxx, syy, sxy = BigInt(0)
    rows.foreach { case (q, p) =>
      val (x, y) = (BigInt(mq(q)), BigInt(mp(p)))
      sx += x; sy += y; sxx += x * x; syy += y * y; sxy += x * y
    }
    val cov = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
    val vx = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
    val vy = n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble
    val rho = math.floor(cov / math.sqrt(vx * vy) * 1e6 + 0.5) / 1e6
    assert(got.getLong(0) == n && got.getDouble(1) == rho, got.toString)
  }

  test("mannWhitneyU: hand-derived U and z on a 2x2 book; full ties " +
    "zero the variance and the guard reports 0") {
    // pick user ids on each side of the deterministic split by probing
    val ids = (1L to 60L).toVector
    val aIds = ids.filter(i => md5Bucket(i.toString) < 5000)
    val bIds = ids.filter(i => md5Bucket(i.toString) >= 5000)
    assert(aIds.size >= 2 && bIds.size >= 2)
    def purchases(rows: (Long, Double)*) = ev(rows.zipWithIndex.map {
      case ((uid, v), i) =>
        (uid, f"2024-01-${i % 28 + 1}%02d 10:00:00", "purchase", v)
    }: _*)
    // A = {0.10, 0.30}, B = {0.20, 0.40}: ranks 1..4, R_A = 1+3,
    // 2U_A = 8 − 2·3 = 2; var = (2·2/12)·5; z = (2 − 4)/(2·sqrt(5/3))
    val d = purchases((aIds(0), 0.10), (aIds(1), 0.30),
      (bIds(0), 0.20), (bIds(1), 0.40))
    val r = Analytics.mannWhitneyU(d).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 2L, 2L, 0L)), r.toString)
    val z = (2.0 - 2.0 * 2.0) / (2.0 * math.sqrt(2.0 * 2.0 / 12.0 * 5.0))
    assert(r.getDouble(4) == math.floor(z * 1e6 + 0.5) / 1e6, r.toString)
    // every value tied: tie term kills the variance, guard reports 0
    val tied = purchases((aIds(0), 0.05), (bIds(0), 0.05))
    val t = Analytics.mannWhitneyU(tied).collect()(0)
    assert(t.getLong(2) == 1L && t.getLong(3) == 6L) // 2U = 2·1.5 − 2
    assert(t.getDouble(4) == 0.0)
  }

  test("mannWhitneyU: fixture replay with driver-side midranks matches " +
    "every field; rank identity 2U_A + 2U_B = 2·nA·nB holds") {
    val events = graft.Tables.events(spark, sf0001)
    val got = Analytics.mannWhitneyU(events).collect()(0)
    val users = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long")).as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byVal = users.groupBy(_._2).map { case (v, g) =>
      (v, g.length.toLong, g.count(u => md5Bucket(u._1.toString) < 5000).toLong)
    }.toSeq.sortBy(_._1)
    var c0 = 0L; var r2a = BigInt(0); var ties = BigInt(0)
    byVal.foreach { case (_, cnt, cntA) =>
      r2a += BigInt(cntA) * (2 * c0 + cnt + 1)
      ties += BigInt(cnt) * cnt * cnt - cnt
      c0 += cnt
    }
    val n = users.length.toLong
    val nA = users.count(u => md5Bucket(u._1.toString) < 5000).toLong
    val u2a = r2a - BigInt(nA) * (nA + 1)
    assert(got.getLong(0) == nA && got.getLong(1) == n - nA)
    assert(got.getLong(2) == u2a.toLong && got.getLong(3) == ties.toLong)
    val varU = nA.toDouble * (n - nA) / 12.0 *
      ((n + 1.0) - ties.toDouble / (n.toDouble * (n - 1.0)))
    val z = (u2a.toDouble - nA.toDouble * (n - nA)) / (2.0 * math.sqrt(varU))
    assert(got.getDouble(4) == math.floor(z * 1e6 + 0.5) / 1e6)
    // the complement arm's doubled rank sum closes the identity exactly
    val r2b = BigInt(n) * (n + 1) - r2a
    val u2b = r2b - BigInt(n - nA) * (n - nA + 1)
    assert(u2a + u2b == BigInt(2) * nA * (n - nA))
  }

  test("cusumWarmup: warmup rows are flagged zeros, the chart starts on " +
    "day W+1 against the warm mean, short series stay all-warmup") {
    // 3 warm days at 10, then a 40-excess day: z = 3*50 - 30 = 120,
    // s_up = 120 > ws = 30 → alarm on the first monitored day
    val ev4 = ev(
      (1L, "2024-07-01 09:00:00", "view", 10.0),
      (1L, "2024-07-02 09:00:00", "view", 10.0),
      (1L, "2024-07-03 09:00:00", "view", 10.0),
      (1L, "2024-07-04 09:00:00", "view", 50.0))
    val r = Analytics.cusumWarmup(ev4, warmDays = 3).collect()
    assert(r.length == 4)
    assert(r.take(3).forall(x => x.getBoolean(7) && x.getDouble(3) == 0.0))
    val mon = r(3)
    assert(!mon.getBoolean(7) && mon.getBoolean(5), mon.toString)
    assert(mon.getDouble(3) == 4.0) // 120 / 30 in mean-day units
    // a series shorter than the warmup never monitors
    val short = Analytics.cusumWarmup(ev4, warmDays = 10).collect()
    assert(short.forall(_.getBoolean(7)))
    intercept[IllegalArgumentException] {
      Analytics.cusumWarmup(ev4, warmDays = 0)
    }
  }

  test("cusumDrift: flat series never alarms; a step alarms the up side " +
    "after sustained excess and stays keyed per event type") {
    val flat = ev((1 to 6).map(i =>
      (1L, f"2024-04-$i%02d 09:00:00", "buy", 5.0)): _*)
    val f = Analytics.cusumDrift(flat).collect()
    assert(f.forall(r => r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0 &&
      !r.getBoolean(5) && !r.getBoolean(6)))
    // 6 quiet days then 4 loud ones: the chart must alarm upward within
    // the loud run (cumulative excess passes one mean day) and the quiet
    // prefix must have pushed the DOWN side up first
    val step = ev(((1 to 6).map(i =>
      (1L, f"2024-05-$i%02d 09:00:00", "view", 10.0)) ++
      (7 to 10).map(i => (1L, f"2024-05-$i%02d 09:00:00", "view", 100.0))): _*)
    val r = Analytics.cusumDrift(step).collect()
    assert(r.exists(x => x.getBoolean(5)), r.mkString(", "))
    assert(r.take(6).exists(x => x.getDouble(4) > 0.0))
    assert(r.take(6).forall(x => !x.getBoolean(5)))
    // two types never mix their calendars
    val mixed = ev(
      (1L, "2024-06-01 09:00:00", "a", 1.0),
      (1L, "2024-06-02 09:00:00", "a", 1.0),
      (1L, "2024-06-01 09:00:00", "b", 9.0))
    val m = Analytics.cusumDrift(mixed).collect()
    assert(m.count(_.getString(0) == "a") == 2 &&
      m.count(_.getString(0) == "b") == 1)
    assert(m.forall(x => x.getDouble(3) == 0.0 || x.getString(0) == "a"))
  }
}
