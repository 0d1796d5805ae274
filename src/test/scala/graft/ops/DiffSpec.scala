package graft.ops

import graft.SparkSpec

class DiffSpec extends SparkSpec {
  import spark.implicits._

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
}
