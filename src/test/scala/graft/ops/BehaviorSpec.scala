package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

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
}
