package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  test("streaks: day runs with gaps, multi-visit days collapse, singletons") {
    def t(day: Int, h: Int) = new java.sql.Timestamp(day * 86400000L + h * 3600000L)
    val df = Seq(
      // u: days 1,2,3 (3-streak; day 2 visited twice), then 5,6 (2-streak)
      ("u", t(1, 1)), ("u", t(2, 2)), ("u", t(2, 9)), ("u", t(3, 0)),
      ("u", t(5, 5)), ("u", t(6, 6)),
      // v: isolated days 10 and 20
      ("v", t(10, 0)), ("v", t(20, 0)))
      .toDF("entity", "ts")
    val r = Behavior.streaks(df, "entity", "ts").orderBy("entity").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq(("u", 5L, 2L, 3L), ("v", 2L, 2L, 1L)))
  }

  test("audienceOverlap: identical sets read 1.0; disjoint 0; replayed") {
    val df = (Seq.tabulate(20)(i => ("x", i.toLong)) ++
      Seq.tabulate(20)(i => ("y", i.toLong)) ++      // y == x exactly
      Seq.tabulate(20)(i => ("z", 1000L + i)) ++     // z disjoint
      Seq(("x", 5L))).toDF("k", "u")                 // dup incidence drops
    val r = Behavior.audienceOverlap(df, "k", "u", h = 32, seed = "ao")
      .collect().map(x => ((x.getString(0), x.getString(1)),
        (x.getLong(2), x.getDouble(4)))).toMap
    assert(r(("x", "y")) == ((32L, 1.0)))
    assert(r(("x", "z"))._2 == 0.0 && r(("y", "z"))._2 == 0.0)
    // JVM replay of one signature component: key x, draw j=1
    def d(j: Int, u: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest((j + "" + u + "ao").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val minX = (0L until 20L).map(d(1, _)).min
    val minZ = (1000L until 1020L).map(d(1, _)).min
    assert(minX != minZ) // the j=1 component genuinely differs
  }

  test("stationaryDistribution: integer power iteration, sink keeps mass") {
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    // u1: A->B->A->B ; u2: A->A ; u3: B->C (C is a sink)
    val df = Seq(
      (1L, t(1), "u1", "A"), (2L, t(2), "u1", "B"),
      (3L, t(3), "u1", "A"), (4L, t(4), "u1", "B"),
      (5L, t(1), "u2", "A"), (6L, t(2), "u2", "A"),
      (7L, t(1), "u3", "B"), (8L, t(2), "u3", "C"))
      .toDF("eid", "ts", "u", "ty")
    val iters = 3
    val r = Behavior.stationaryDistribution(df, "u", "ts", "eid", "ty",
        iters = iters).orderBy("state").collect()
      .map(x => (x.getString(0), x.getLong(1)))
    // JVM replay: counts A->B 2, A->A 1 (totA 3); B->A 1, B->C 1 (totB 2)
    val n = Map(("A", "B") -> 2L, ("A", "A") -> 1L,
      ("B", "A") -> 1L, ("B", "C") -> 1L)
    val tot = Map("A" -> 3L, "B" -> 2L)
    var pi = Map("A" -> 1000000L, "B" -> 1000000L, "C" -> 1000000L)
    for (_ <- 0 until iters) {
      val moved = Seq("A", "B", "C").map { s =>
        s -> n.collect { case ((f, to), c) if to == s =>
          pi(f) * c / tot(f)
        }.sum
      }.toMap
      pi = Seq("A", "B", "C").map { s =>
        s -> (moved(s) + (if (tot.contains(s)) 0L else pi(s)))
      }.toMap
    }
    assert(r.toSeq == Seq(("A", pi("A")), ("B", pi("B")), ("C", pi("C"))))
    // the sink accumulated strictly more than its initial mass
    assert(pi("C") > 1000000L)
  }

  test("tokenBucket: refill/cap/drain fold, rejects leave level intact") {
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    val df = Seq(
      ("h", t(0), 1L, 4L),    // full bucket 10 -> accept -> 6
      ("h", t(2), 2L, 9L),    // refill 2 -> 8, reject (9 > 8)
      ("h", t(3), 3L, 8L),    // refill 1 -> 9, accept -> 1
      ("h", t(100), 4L, 3L),  // refill caps at 10, accept -> 7
      ("g", t(0), 5L, 20L))   // cost > capacity: reject on a full bucket
      .toDF("host", "ts", "eid", "cost")
    val r = Behavior.tokenBucket(df, Seq("host"), "ts", "cost",
        capacity = 10L, refillPerSec = 1L, tieBreak = Seq("eid"))
      .orderBy("eid").collect()
      .map(x => (x.getLong(2), x.getLong(3), x.getLong(4),
        x.getBoolean(5), x.getLong(6)))
    assert(r.toSeq == Seq(
      (1L, 4L, 10L, true, 6L),
      (2L, 9L, 8L, false, 8L),
      (3L, 8L, 9L, true, 1L),
      (4L, 3L, 10L, true, 7L),
      (5L, 20L, 10L, false, 10L)))
  }

  test("entryExitPages: entry/exit by (ts,id) order, bounces, exact rates") {
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    val df = Seq(
      ("u", t(1), 1L, "A"), ("u", t(2), 2L, "B"), ("u", t(3), 3L, "C"),
      ("u", t(1000), 4L, "D"),  // second session, single event = bounce
      ("v", t(1), 5L, "A"))     // bounce on A
      .toDF("user", "ts", "eid", "page")
    val r = Behavior.entryExitPages(df, "user", "ts", "eid", "page",
        gapSeconds = 60L)
      .orderBy("page").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getDouble(5), x.getDouble(6)))
    // 3 sessions total: (u: A..C), (u: D), (v: A)
    assert(r.toSeq == Seq(
      ("A", 2L, 1L, 1L, 3L, 2.0 / 3.0, 1.0 / 3.0),
      ("C", 0L, 1L, 0L, 3L, 0.0, 1.0 / 3.0),
      ("D", 1L, 1L, 1L, 3L, 1.0 / 3.0, 1.0 / 3.0)))
    val br = Behavior.entryExitPages(df, "user", "ts", "eid", "page", 60L)
      .orderBy("page").collect()
    assert(br(0).getDouble(7) == 0.5)  // A: 1 bounce of 2 entries
    assert(br(1).isNullAt(7))          // C: no entries -> null
    assert(br(2).getDouble(7) == 1.0)  // D: bounce of its only entry
  }

  test("attribution: linear and U-shape credits conserve value exactly") {
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val v = 1000001L
    val df = Seq(
      // u1 journey 1: view, click -> conv id=3
      (1L, ts(1), "u1", "view"), (2L, ts(2), "u1", "click"),
      (3L, ts(3), "u1", "purchase"),
      // u1 journey 2: three touches -> conv id=7; trailing touch dropped
      (4L, ts(4), "u1", "view"), (5L, ts(5), "u1", "click"),
      (6L, ts(6), "u1", "view"), (7L, ts(7), "u1", "purchase"),
      (8L, ts(8), "u1", "click"),
      // u2: touches but no conversion -> nothing credited
      (9L, ts(1), "u2", "view"), (10L, ts(2), "u2", "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
    def run(model: String) =
      Behavior.attribution(df, "user_id", "ts", "event_id", "event_type",
          Seq("view", "click"), "purchase", v, model)
        .orderBy("conv_event_id", "position").collect()
        .map(x => (x.getLong(3), x.getLong(1), x.getLong(4), x.getLong(5),
          x.getLong(6)))
    val lin = run("linear")
    assert(lin.toSeq == Seq(
      (3L, 1L, 2L, 1L, 500001L), (3L, 2L, 2L, 2L, 500000L),
      (7L, 4L, 3L, 1L, 333334L), (7L, 5L, 3L, 2L, 333334L),
      (7L, 6L, 3L, 3L, 333333L)))
    val pos = run("position")
    assert(pos.toSeq == Seq(
      (3L, 1L, 2L, 1L, 500001L), (3L, 2L, 2L, 2L, 500000L), // n<=2 linear
      (7L, 4L, 3L, 1L, 400000L), (7L, 5L, 3L, 2L, 200001L),
      (7L, 6L, 3L, 3L, 400000L)))
    // exact conservation per conversion, both models
    Seq(lin, pos).foreach { r =>
      r.groupBy(_._1).foreach { case (_, g) => assert(g.map(_._5).sum == v) }
    }
  }

  test("rfmScores: exact metrics and strict-> quartile bins, hand-checked") {
    def ts(day: Int) = new java.sql.Timestamp(day * 86400000L)
    // u1: days 0,9 val 1.005+2.0 -> cents 100+200; u2: day 10 x1; u3: day 5 x3; u4: day 2 x1
    val df = Seq(
      ("u1", ts(0), 1.005), ("u1", ts(9), 2.0),
      ("u2", ts(10), 0.5),
      ("u3", ts(5), 4.0), ("u3", ts(5), 1.0), ("u3", ts(6), 0.25),
      ("u4", ts(2), 10.0)).toDF("u", "t", "v")
    val r = Behavior.rfmScores(df, "u", "t", "v").orderBy("entity").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5), x.getLong(6)))
    // recency: maxday=10 -> u1:1, u2:0, u3:4, u4:8
    // freq: 2,1,3,1; cents: 300, 50, 525, 1000
    // recency sorted [0,1,4,8] thr(q25,q50,q75)=[0,1,4] -> bins: 1->1? strict>:
    //   u1 r=1: >0 yes, >1 no, >4 no -> 1; u2 r=0 -> 0; u3 r=4 -> 2; u4 r=8 -> 3
    // freq sorted [1,1,2,3] thr=[1,1,2] -> u1 f=2: >1,>1,no -> 2; u2,u4=1 -> 0; u3=3 -> 3
    // cents sorted [50,300,525,1000] thr=[50,300,525] -> 300->1, 50->0, 525->2, 1000->3
    assert(r.toSeq == Seq(
      ("u1", 1L, 2L, 300L, 1L, 2L, 1L),
      ("u2", 0L, 1L, 50L, 0L, 0L, 0L),
      ("u3", 4L, 3L, 525L, 2L, 3L, 2L),
      ("u4", 8L, 1L, 1000L, 3L, 0L, 3L)))
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnelReach: greedy earliest-reach, strict order, zero-reach steps kept") {
    // u1 completes A->B->C; u2 does B before A (B must not count);
    // u3 reaches A only; u4 has C with no A (nothing counts)
    val evs = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "A"),
      (1L, "2024-01-01 11:00:00", 2L, "B"),
      (1L, "2024-01-01 12:00:00", 3L, "C"),
      (2L, "2024-01-01 09:00:00", 4L, "B"),
      (2L, "2024-01-01 10:00:00", 5L, "A"),
      (2L, "2024-01-01 09:30:00", 6L, "X"), // non-step noise
      (3L, "2024-01-01 08:00:00", 7L, "A"),
      (4L, "2024-01-01 08:00:00", 8L, "C")
    ).map { case (u, t, id, ty) => (u, ts(t), id, ty) }
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = Behavior.funnelReach(evs, "user_id", "ts", "event_id",
        "event_type", Seq("A", "B", "C"))
      .orderBy("step_no")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2),
        x.getDouble(3), x.getDouble(4)))
    assert(r.toSeq == Seq(
      (1L, "A", 3L, 1.0, 1.0),
      (2L, "B", 1L, 1.0 / 3.0, 1.0 / 3.0),
      (3L, "C", 1L, 1.0, 1.0 / 3.0)))
  }

  test("funnelReach: strictness — same-timestamp next step does not advance") {
    val evs = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "A"),
      (1L, ts("2024-01-01 10:00:00"), 2L, "B"), // not strictly after A
      (2L, ts("2024-01-01 10:00:00"), 3L, "A"),
      (2L, ts("2024-01-01 10:00:01"), 4L, "B")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val r = Behavior.funnelReach(evs, "user_id", "ts", "event_id",
        "event_type", Seq("A", "B"))
      .orderBy("step_no").collect().map(x => (x.getString(1), x.getLong(2)))
    assert(r.toSeq == Seq(("A", 2L), ("B", 1L)))
  }

  test("funnelReach: greedy earliest reach beats a later-first-step completion") {
    // A@10, B@11, A@12, C@13: greedy takes A@10,B@11,C@13 — completes
    val evs = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "A"),
      (1L, ts("2024-01-01 11:00:00"), 2L, "B"),
      (1L, ts("2024-01-01 12:00:00"), 3L, "A"),
      (1L, ts("2024-01-01 13:00:00"), 4L, "C")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val r = Behavior.funnelReach(evs, "user_id", "ts", "event_id",
        "event_type", Seq("A", "B", "C"))
      .orderBy("step_no").collect().map(_.getLong(2))
    assert(r.toSeq == Seq(1L, 1L, 1L))
  }

  test("cohortRetention: hand-checked weekly cohorts and offsets") {
    // weeks (Mon-start): 2024-01-01, 2024-01-08, 2024-01-15
    val evs = Seq(
      (1L, ts("2024-01-02 10:00:00")), // cohort w0
      (1L, ts("2024-01-09 10:00:00")), // w0 offset 1
      (1L, ts("2024-01-16 10:00:00")), // w0 offset 2
      (2L, ts("2024-01-03 10:00:00")), // cohort w0
      (2L, ts("2024-01-17 10:00:00")), // w0 offset 2
      (3L, ts("2024-01-10 10:00:00")) // cohort w1, never returns
    ).toDF("user_id", "ts")
    val r = Behavior.cohortRetention(evs, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .collect().map(x => (x.getTimestamp(0).toString.take(10), x.getLong(1),
        x.getLong(2), x.getDouble(3)))
    assert(r.toSeq == Seq(
      ("2024-01-01", 0L, 2L, 1.0),
      ("2024-01-01", 1L, 1L, 0.5),
      ("2024-01-01", 2L, 2L, 1.0),
      ("2024-01-08", 0L, 1L, 1.0)))
  }

  test("cohortRetention: multiple events in one week count the user once") {
    val evs = Seq((1L, ts("2024-01-02 10:00:00")), (1L, ts("2024-01-03 10:00:00")),
      (1L, ts("2024-01-04 10:00:00"))).toDF("user_id", "ts")
    val r = Behavior.cohortRetention(evs, "user_id", "ts").collect()
    assert(r.length == 1 && r(0).getLong(2) == 1L)
  }

  test("transitionMatrix: exact counts and row-stochastic probabilities") {
    val evs = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "A"),
      (1L, ts("2024-01-01 11:00:00"), 2L, "B"),
      (1L, ts("2024-01-01 12:00:00"), 3L, "A"),
      (1L, ts("2024-01-01 13:00:00"), 4L, "C"),
      (2L, ts("2024-01-01 10:00:00"), 5L, "A"),
      (2L, ts("2024-01-01 11:00:00"), 6L, "B")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val r = Behavior.transitionMatrix(evs, "user_id", "ts", "event_id", "event_type")
      .orderBy("from_type", "to_type")
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getDouble(3)))
    // pairs: u1 A->B, B->A, A->C; u2 A->B  => from A: B=2, C=1; from B: A=1
    assert(r.toSeq == Seq(
      ("A", "B", 2L, 2.0 / 3.0), ("A", "C", 1L, 1.0 / 3.0), ("B", "A", 1L, 1.0)))
    // probabilities are row-stochastic
    val sums = Behavior.transitionMatrix(evs, "user_id", "ts", "event_id", "event_type")
      .groupBy("from_type").agg(sum("p").as("s")).collect().map(_.getDouble(1))
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-12))
  }

  test("transitionMatrix: first event per user contributes no pair; ties broken by id") {
    val evs = Seq(
      (1L, ts("2024-01-01 10:00:00"), 2L, "B"), // same ts, id order A(1) then B(2)
      (1L, ts("2024-01-01 10:00:00"), 1L, "A")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val r = Behavior.transitionMatrix(evs, "user_id", "ts", "event_id", "event_type")
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2)))
    assert(r.toSeq == Seq(("A", "B", 1L)))
  }

  test("lastTouch: most recent in-window touch wins; out-of-window and no-touch stay null") {
    val evs = Seq(
      // u1: two clicks then a purchase — the LATER click attributes
      (1L, ts("2024-01-01 10:00:00"), 1L, "click"),
      (1L, ts("2024-01-01 11:00:00"), 2L, "click"),
      (1L, ts("2024-01-01 12:00:00"), 3L, "purchase"),
      // u2: click 7h before purchase — outside the 6h window -> null
      (2L, ts("2024-01-01 03:00:00"), 4L, "click"),
      (2L, ts("2024-01-01 10:00:00"), 5L, "purchase"),
      // u3: purchase with no click at all -> null, row still present
      (3L, ts("2024-01-01 10:00:00"), 6L, "purchase"),
      // u4: click AFTER the purchase must not attribute backwards
      (4L, ts("2024-01-01 10:00:00"), 7L, "purchase"),
      (4L, ts("2024-01-01 11:00:00"), 8L, "click"),
      // noise type is ignored entirely
      (1L, ts("2024-01-01 11:30:00"), 9L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val r = Behavior.lastTouch(evs, "user_id", "ts", "event_id", "event_type",
        "click", "purchase", maxGapMs = 6L * 3600 * 1000)
      .orderBy("event_id")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(3)) -1L else x.getLong(3),
        if (x.isNullAt(5)) -1L else x.getLong(5)))
    assert(r.toSeq == Seq(
      (3L, 1L, 2L, 3600000L), // later click (id 2), 1h gap
      (5L, 2L, -1L, -1L),     // 7h gap > 6h window
      (6L, 3L, -1L, -1L),     // no touch
      (7L, 4L, -1L, -1L)))    // only a later click
  }

  test("lastTouch: same-timestamp touch attributes, ties fold by event_id") {
    val evs = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click"),
      (1L, ts("2024-01-01 10:00:00"), 2L, "purchase") // id order: click first
    ).toDF("user_id", "ts", "event_id", "event_type")
    val r = Behavior.lastTouch(evs, "user_id", "ts", "event_id", "event_type",
        "click", "purchase", maxGapMs = 1000L).collect()
    assert(r.length == 1 && r(0).getLong(3) == 1L && r(0).getLong(5) == 0L)
  }

  test("burstDays: integer baseline comparison, empty-baseline burst, window excludes current day") {
    // key k: days 0..6 have 2/day (base builds up), day 7 has 10 (burst:
    // 10*7=70 > 2*12=24? baseline over days 0..6 = 12 (days 1..7 window is
    // -7..-1 relative to day 7 => days 0..6, sum 14)
    def at(day: Long, n: Int) = (0 until n).map(i =>
      ("k", new Timestamp(day * 86400000L + i * 1000L), day * 100 + i))
    val evs = (
      (0L to 6L).flatMap(d => at(d, 2)) ++ at(7L, 10) ++
      at(20L, 1) // isolated day far from any baseline -> empty-baseline burst
    ).toDF("event_type", "ts", "event_id")
    val r = Behavior.burstDays(evs, "event_type", "ts", baselineDays = 7, factor = 2)
      .orderBy("day")
      .collect().map(x => (x.getLong(1), x.getLong(2), x.getLong(3), x.getBoolean(4)))
    // day 0: base 0, n 2 -> burst (2*7 > 0). day 1: base 2, 2*7=14 > 2*2=4 -> burst.
    // day 2: base 4, 14 > 8 -> burst. day 3: base 6, 14 > 12 -> burst.
    // day 4: base 8, 14 > 16 false. day 5: base 10 false. day 6: base 12 false.
    // day 7: base 14 (days 0..6), 10*7=70 > 14*2=28 -> burst.
    // day 20: base 0 -> burst.
    assert(r.toSeq == Seq(
      (0L, 2L, 0L, true), (1L, 2L, 2L, true), (2L, 2L, 4L, true),
      (3L, 2L, 6L, true), (4L, 2L, 8L, false), (5L, 2L, 10L, false),
      (6L, 2L, 12L, false), (7L, 10L, 14L, true), (20L, 1L, 0L, true)))
  }

  test("burstDays: baseline is per-key (another key's volume never leaks in)") {
    val evs = Seq(
      ("a", ts("2024-01-01 10:00:00"), 1L),
      ("a", ts("2024-01-02 10:00:00"), 2L),
      ("b", ts("2024-01-02 10:00:00"), 3L)
    ).toDF("event_type", "ts", "event_id")
    val r = Behavior.burstDays(evs, "event_type", "ts", 7, 2)
      .orderBy("key", "day")
      .collect().map(x => (x.getString(0), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq(("a", 1L, 0L), ("a", 1L, 1L), ("b", 1L, 0L)))
  }

  test("associationRules: hand-computed support/confidence/lift") {
    // baskets: u1 {x,y}, u2 {x,y}, u3 {x}, u4 {y,z}; N=4
    // n_x=3 n_y=3 n_z=1; x->y n_ab=2; z->y n_ab=1; duplicate rows collapse
    val evs = Seq(
      (1L, "x"), (1L, "y"), (1L, "x"), // dup (1,x) must not double-count
      (2L, "x"), (2L, "y"),
      (3L, "x"),
      (4L, "y"), (4L, "z")
    ).toDF("user_id", "event_type")
    val r = Behavior.associationRules(evs, "user_id", "event_type")
      .orderBy("antecedent", "consequent").collect()
      .map(x => ((x.getString(0), x.getString(1)),
        (x.getLong(2), x.getLong(3), x.getLong(4),
          x.getDouble(5), x.getDouble(6), x.getDouble(7)))).toMap
    assert(r.keySet == Set(("x", "y"), ("y", "x"), ("y", "z"), ("z", "y")))
    assert(r(("x", "y")) == ((3L, 3L, 2L, 0.5, 2.0 / 3.0, 8.0 / 9.0)))
    assert(r(("z", "y")) == ((1L, 3L, 1L, 0.25, 1.0, 4.0 / 3.0)))
    // minCount filters the tail
    val filtered = Behavior.associationRules(evs, "user_id", "event_type", minCount = 2L)
      .select("antecedent", "consequent").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(filtered == Set(("x", "y"), ("y", "x")))
  }

  test("slidingDistinct: trailing-window distinct, observed days only, dups collapse") {
    def ev(uid: Long, day: Int) = (uid, new java.sql.Timestamp(day * 86400000L))
    // u1 active days 0,1; u2 day 1 (twice); u3 day 9
    val df = Seq(ev(1, 0), ev(1, 1), ev(2, 1), ev(2, 1), ev(3, 9))
      .toDF("user_id", "ts")
    val r = Behavior.slidingDistinct(df, "ts", "user_id", windowDays = 3)
      .orderBy("day").collect().map(x => (x.getLong(0), x.getLong(1)))
    // observed days: 0, 1, 9. window [d-2, d]:
    //   day 0 -> {u1}; day 1 -> {u1, u2}; day 9 -> {u3}
    // days 2,3,10,11 would carry trailing mass but are NOT observed
    assert(r.toSeq == Seq((0L, 1L), (1L, 2L), (9L, 1L)))
    // a user active on several window days counts once
    val multi = Seq(ev(7, 0), ev(7, 1), ev(7, 2), ev(8, 2)).toDF("user_id", "ts")
    val m = Behavior.slidingDistinct(multi, "ts", "user_id", windowDays = 3)
      .orderBy("day").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(m.toSeq == Seq((0L, 1L), (1L, 1L), (2L, 2L)))
  }

  test("gapHistogram: exact ms gaps, log2 buckets, zero-gap sentinel, tie order") {
    def ev(id: Long, u: Long, ms: Long) = (id, u, new java.sql.Timestamp(ms))
    // user 1: t = 0, 1000, 1000, 4000 -> gaps 1000 (b9), 0 (b-1), 3000 (b11)
    // user 2: single event -> no gap
    val df = Seq(ev(1, 1, 0), ev(2, 1, 1000), ev(3, 1, 1000), ev(4, 1, 4000),
      ev(5, 2, 50)).toDF("event_id", "user_id", "ts")
    val r = Behavior.gapHistogram(df, "user_id", "ts", "event_id")
      .orderBy("log2_bucket").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    assert(r.toSeq == Seq((-1L, 1L, 1.0 / 3.0), (9L, 1L, 1.0 / 3.0),
      (11L, 1L, 1.0 / 3.0)))
    // bucket rule edge: gap 1 -> bucket 0; gap 2 -> bucket 1
    val edge = Behavior.gapHistogram(
      Seq(ev(1, 1, 0), ev(2, 1, 1), ev(3, 1, 3)).toDF("event_id", "user_id", "ts"),
      "user_id", "ts", "event_id")
      .orderBy("log2_bucket").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(edge.toSeq == Seq((0L, 1L), (1L, 1L)))
  }
}
