package graft.core

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions._

/** The deterministic TIME half of the resource envelope (ResourceLimits.h
  * analog): op-count budgets in the linear extract path (literal count) and
  * the super-linear gate analyzer (online charging), surfacing
  * status="timeout" next to the byte-budget "limit".
  */
class KernelBudgetSpec extends AnyFunSuite {

  /** Adversarial LINEAR-kernel doc: dense single-digit literals — op-big
    * (many literals) at few bytes, so the op budget binds where the byte
    * budget does not.
    */
  def denseDoc(nClauses: Int): Array[Byte] = {
    val sb = new StringBuilder(s"p cnf 9 $nClauses\n")
    var i = 0
    while (i < nClauses) { sb.append("1 2 3 0\n"); i += 1 }
    sb.toString.getBytes("UTF-8")
  }

  /** Adversarial GATE doc: K clauses {1, 2, a_i} and K clauses {-1, -2, b_j}
    * — every (pos, neg) pair over var 1 is blocked via var 2, so the
    * blocked-set check does K^2 sorted merges while the document itself has
    * only O(K) literals.
    */
  def blockedSetDoc(k: Int): Array[Byte] = {
    val nVars = 2 + 2 * k
    val sb = new StringBuilder(s"p cnf $nVars ${2 * k}\n")
    for (i <- 1 to k) sb.append(s"1 2 ${2 + i} 0\n")
    for (j <- 1 to k) sb.append(s"-1 -2 ${2 + k + j} 0\n")
    sb.toString.getBytes("UTF-8")
  }

  test("gate analysis op count grows super-linearly; charging is deterministic") {
    val small = blockedSetDoc(8)
    val big = blockedSetDoc(64)
    val opsSmall = Gates.measureOps(small)
    val opsBig = Gates.measureOps(big)
    // literals grew 8x; quadratic blocked-set work must dominate: ops grow
    // far faster than the input (this is exactly why the gate budget cannot
    // be a parse-time check like the linear kernels')
    assert(opsBig > 20L * opsSmall,
      s"expected super-linear growth, got $opsSmall -> $opsBig")
    assert(Gates.measureOps(big) == opsBig, "op charging must be deterministic")
  }

  test("gate extract times out deterministically under budget, matches unbudgeted above it") {
    val doc = blockedSetDoc(64)
    val ops = Gates.measureOps(doc)
    intercept[KernelBudget.KernelTimeout](Gates.extract(doc, ops / 4))
    intercept[KernelBudget.KernelTimeout](Gates.extract(doc, ops / 4)) // same outcome on retry
    val budgeted = Gates.extract(doc, ops)
    assert(java.util.Arrays.equals(budgeted, Gates.extract(doc)),
      "a sufficient budget must not change the result")
  }

  test("cnf_extract: op budget fires on literal count, independent of the byte budget") {
    val spark = SparkSpec.spark
    val dense = new String(denseDoc(500), "UTF-8") // 1500 literal slots, ~4KB
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(dense), Row("p cnf 2 1\n1 -2 0\n"), Row(null)),
      StructType(Seq(StructField("text", StringType, nullable = true))))
    val out = df.select(cnf_extract(col("text"), 1 << 20, 1000L).as("x"))
      .select(col("x.parse_ok"), col("x.limited"), col("x.timed_out"), col("x.instance_id"))
      .collect()
    assert(out(0).getBoolean(0) && !out(0).getBoolean(1) && out(0).getBoolean(2),
      s"dense doc must time out (not limit): ${out(0)}")
    assert(out(0).isNullAt(3), "timed-out doc must not carry an instance id")
    assert(out(1).getBoolean(0) && !out(1).getBoolean(2) && !out(1).isNullAt(3),
      "small doc passes untouched")
    assert(!out(2).getBoolean(0) && !out(2).getBoolean(2), "null text is not a timeout")
  }

  test("FeatureJob extract stage surfaces status=timeout next to limit/parse_error/ok") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val rows = Seq(
      ("dense", new String(denseDoc(500), "UTF-8")),
      ("ok", "p cnf 2 1\n1 -2 0\n"),
      ("bad", "p cnf 2 1\n1 zz 0\n"),
      ("big", "c " + ("x" * 100000) + "\np cnf 2 1\n1 -2 0\n"))
    val df = rows.toDF("url", "text")
    val statuses = graft.runtime.FeatureJob
      .extractStage(df, "cnf", maxDocBytes = 65536, maxDocOps = 1000L)
      .select("url", "status").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(statuses == Map(
      "dense" -> "timeout", "ok" -> "ok", "bad" -> "parse_error", "big" -> "limit"),
      s"full outcome channel expected, got $statuses")
  }

  test("cnf_gate_extract carries the structured outcome channel through SQL") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val adversarial = new String(blockedSetDoc(64), "UTF-8")
    Seq(("a", adversarial), ("ok", "p cnf 2 2\n1 -2 0\n-1 2 0\n"), ("bad", "p cnf 2 1\n1 zz 0\n"))
      .toDF("id", "text").createOrReplaceTempView("budget_docs")
    val viaSql = spark.sql(
      "SELECT id, cnf_gate_extract(text).status AS st FROM budget_docs")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(viaSql("ok") == "ok" && viaSql("bad") == "parse_error", s"got $viaSql")
    // default budget is generous — the K=64 doc is adversarial but small
    assert(viaSql("a") == "ok")
    val tight = Seq(("a", adversarial)).toDF("id", "text")
      .select(cnf_gate_extract(col("text"), 1000L).as("g"))
      .select(col("g.status")).head().getString(0)
    assert(tight == "timeout")
  }
}
