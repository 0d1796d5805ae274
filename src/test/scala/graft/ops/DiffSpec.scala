package graft.ops

import org.apache.spark.sql.functions.col
import graft.SparkSpec

class DiffSpec extends SparkSpec {
  import spark.implicits._

  test("applyChangelog: latest-seq wins, deletes remove, untouched pass through") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (5L, "e")).toDF("id", "v")
    val changes = Seq(
      (2L, 1L, "upsert", "b2"), (2L, 2L, "upsert", "b3"), // latest wins
      (3L, 5L, "delete", ""),                             // removes base row
      (4L, 1L, "upsert", "d"),                            // insert (not in base)
      (5L, 7L, "upsert", "e2"), (5L, 7L, "delete", ""))   // seq tie: delete wins
      .toDF("id", "seq", "op", "v")
    val r = Diff.applyChangelog(base, changes, "id", "seq", "op")
      .orderBy("id").collect().map(x => (x.getLong(0), x.getString(1)))
    assert(r.toSeq == Seq((1L, "a"), (2L, "b3"), (4L, "d")))
    // delete of a key not in base is a no-op; empty changelog is identity
    val r2 = Diff.applyChangelog(base,
      Seq((9L, 1L, "delete", "")).toDF("id", "seq", "op", "v"),
      "id", "seq", "op").orderBy("id").collect().map(_.getLong(0))
    assert(r2.toSeq == Seq(1L, 2L, 3L, 5L))
  }

  test("rangeDigestDiff: identical tables match; drift localizes, replayed") {
    val a = (0L until 20L).map(i => (i, s"v$i")).toDF("id", "v")
    val same = Diff.rangeDigestDiff(a, a, "id", Seq("v"), nBuckets = 4)
      .collect()
    assert(same.forall(_.getBoolean(5)) && same.forall(r =>
      r.getLong(1) == r.getLong(2)))
    // alter id 3, drop id 7
    val b = (0L until 20L).filterNot(_ == 7L)
      .map(i => (i, if (i == 3L) "CHANGED" else s"v$i")).toDF("id", "v")
    val r = Diff.rangeDigestDiff(a, b, "id", Seq("v"), 4).collect()
      .map(x => x.getLong(0) -> x.getBoolean(5)).toMap
    def md5hex(s: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    def bucket(id: Long): Long =
      java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) % 4
    val dirty = Set(bucket(3L), bucket(7L))
    (0L until 4L).foreach(bk => assert(r(bk) == !dirty.contains(bk)))
    // digest replay for one clean bucket
    def rowHash(id: Long, v: String): Long =
      java.lang.Long.parseLong(md5hex(id + "" + v).take(15), 16)
    val cleanBk = (0L until 4L).find(!dirty.contains(_)).get
    val want = (0L until 20L).filter(bucket(_) == cleanBk)
      .map(i => rowHash(i, s"v$i")).reduce(_ ^ _)
    val row = Diff.rangeDigestDiff(a, b, "id", Seq("v"), 4)
      .where(col("bucket") === cleanBk).collect().head
    assert(row.getLong(3) == want && row.getLong(4) == want)
  }

  test("threeWayMerge: classic outcomes incl. adds, deletes, conflicts") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"),
      (6L, "f")).toDF("id", "v")
    val ours = Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "D1"), (5L, "E"),
      (7L, "new")).toDF("id", "v") // 6 deleted, 7 added
    val theirs = Seq((1L, "a"), (2L, "b"), (3L, "C"), (4L, "D2"),
      (5L, "E"), (6L, "f")).toDF("id", "v")
    val r = Diff.threeWayMerge(base, ours, theirs, "id")
      .orderBy("id").collect()
      .map(x => (x.getLong(0), x.getString(1), Option(x.getString(2))))
    assert(r.toSeq == Seq(
      (1L, "unchanged", Some("a")),
      (2L, "ours", Some("B")),
      (3L, "theirs", Some("C")),
      (4L, "conflict", None),     // D1 vs D2
      (5L, "both_same", Some("E")),
      (6L, "ours", None),         // our delete wins (theirs untouched)
      (7L, "ours", Some("new")))) // added only by us; theirs untouched
  }

  test("scd2: intervals chain per key, delete closes without emitting") {
    val changes = Seq(
      (1L, 10L, "upsert", "a1"), (1L, 20L, "upsert", "a2"),
      (1L, 30L, "delete", ""), (1L, 40L, "upsert", "a3"), // re-insert
      (2L, 5L, "upsert", "b1"),                           // single open row
      (3L, 1L, "upsert", "c1"), (3L, 2L, "delete", ""))   // fully deleted
      .toDF("id", "seq", "op", "v")
    val r = Diff.scd2(changes, "id", "seq", "op")
      .orderBy("id", "valid_from_seq").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2),
        Option(x.get(3)).map(_.asInstanceOf[Long]), x.getBoolean(4)))
    assert(r.toSeq == Seq(
      (1L, "a1", 10L, Some(20L), false),
      (1L, "a2", 20L, Some(30L), false), // closed BY the delete
      (1L, "a3", 40L, None, true),
      (2L, "b1", 5L, None, true),
      (3L, "c1", 1L, Some(2L), false))) // no current row for deleted key
    // every key has at most one current row; intervals never overlap
    val cur = r.count(_._5)
    assert(cur == 2)
  }

  test("schemaDiff: added/removed/type_changed/unchanged, zero jobs") {
    val old = Seq((1L, "a", 0.5)).toDF("id", "name", "score")
    val neu = Seq((1L, 2, true)).toDF("id", "score", "fresh")
    val r = Diff.schemaDiff(old, neu).collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2), x.getString(3)))
    assert(r.toSeq == Seq(
      ("fresh", null, "boolean", "added"),
      ("id", "bigint", "bigint", "unchanged"),
      ("name", "string", null, "removed"),
      ("score", "double", "int", "type_changed")))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val day1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("url", "text")
    val day2 = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("url", "text")
    val r = Diff.snapshotDiff(day1, day2, "url", "text").orderBy("url")
      .select("url", "diff_status").collect()
      .map(x => (x.getLong(0), x.getString(1)))
    assert(r.toSeq == Seq((1L, "removed"), (2L, "unchanged"), (3L, "changed"), (4L, "added")))
    // the diff is hash-based: old_key/new_key null exactly on one-sided rows
    val keys = Diff.snapshotDiff(day1, day2, "url", "text").orderBy("url")
      .select("old_key", "new_key").collect()
    assert(keys(0).getString(0) != null && keys(0).isNullAt(1)) // removed
    assert(keys(3).isNullAt(0) && keys(3).getString(1) != null) // added
  }

  test("psiDrift: add-one smoothed terms and deterministic total") {
    // ref {a:3, b:1}, cur {a:1, b:2, c:1}; K=3 union categories, T=4 each;
    // p = (n+1)/7: a 4/7 vs 2/7, b 2/7 vs 3/7, c 1/7 vs 2/7
    val ref = Seq("a", "a", "a", "b").toDF("lang")
    val cur = Seq("a", "b", "b", "c").toDF("lang")
    val rows = Diff.psiDrift(ref, cur, "lang").orderBy("category").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    assert(rows.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((3L, 1L), (1L, 2L), (0L, 1L)))
    def term(p: Double, q: Double) = (p - q) * math.log(p / q)
    val exp = Seq(term(4.0/7, 2.0/7), term(2.0/7, 3.0/7), term(1.0/7, 2.0/7))
    rows.zip(exp).foreach { case (r, e) =>
      assert(math.abs(r.getDouble(r.fieldIndex("psi_term")) - e) < 1e-14) }
    // total = left-to-right fold over category order, identical on each row
    val psi = rows.map(_.getDouble(rows.head.fieldIndex("psi"))).distinct
    assert(psi.length == 1)
    assert(math.abs(psi.head - ((0.0 + exp(0)) + exp(1) + exp(2))) < 1e-14)
    // every PSI term is non-negative by construction
    assert(rows.forall(_.getDouble(rows.head.fieldIndex("psi_term")) >= 0.0))
  }

  test("topkChurn: set algebra hand-checked; disjoint and identical sets") {
    val a = Seq(1L, 2L, 3L).toDF("k")
    val b = Seq(2L, 3L, 4L, 5L).toDF("k")
    val r = Diff.topkChurn(a, b, "k").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((3L, 4L, 2L, 2L, 1L)))
    assert(r.getDouble(5) == 2.0 / 5.0)
    val disjoint = Diff.topkChurn(Seq(1L).toDF("k"), Seq(9L).toDF("k"), "k")
      .collect().head
    assert(disjoint.getDouble(5) == 0.0 && disjoint.getLong(2) == 0L)
    val same = Diff.topkChurn(a, a, "k").collect().head
    assert(same.getDouble(5) == 1.0 && same.getLong(3) == 0L &&
      same.getLong(4) == 0L)
  }
}
