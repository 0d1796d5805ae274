package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Transforms => K}

class TransformsKernelSpec extends AnyFunSuite {
  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("cnf2kis emits the reference's exact format and counts") {
    // two clauses: (1 -2), (2 3); sanitized form preserved
    val kis = K.cnf2kis(b("p cnf 3 2\n1 -2 0\n2 3 0\n"))
    assert(kis.k == 2)
    assert(kis.nodes == 4) // one node per literal occurrence
    // cliques: 1 + 1 = 2; opposite pairs: var2 has one pos + one neg -> 1; *2 reflexive = 6
    assert(kis.edges == 6)
    val lines = kis.text.linesIterator.toSeq
    assert(lines.head == "c satisfiable iff maximum independent set size is 2")
    assert(lines(1) == "c kis nNodes nEdges k")
    assert(lines(2) == "p kis 4 6 2")
    // clause cliques both directions + opposite-literal edges both directions
    assert(lines.count(_.endsWith(" 0")) == 6)
  }

  test("cnf2bip emits directed incidence edges") {
    val bip = K.cnf2bip(b("p cnf 2 2\n1 -2 0\n2 1 0\n"))
    assert(bip.nodes == 4 && bip.edges == 4)
    val lines = bip.text.linesIterator.toSeq
    assert(lines(1) == "p edge 4 4")
    // clause ids start at nVars+1 = 3; positive lit -> clause->var, negative -> var->clause
    assert(lines.contains("e 3 1")) // clause 3 -> var 1 (positive)
    assert(lines.contains("e 2 3")) // var 2 -> clause 3 (negative)
    assert(lines.contains("e 4 2") && lines.contains("e 4 1"))
  }

  test("transforms run on the sanitized form (dup literals/tautologies gone)") {
    val withJunk = K.cnf2kis(b("p cnf 3 3\n1 1 -2 0\n2 -2 3 0\n2 3 0\n"))
    val clean = K.cnf2kis(b("p cnf 3 2\n1 -2 0\n2 3 0\n"))
    assert(withJunk.text == clean.text)
  }
}

class TransformsOpsSpec extends graft.SparkSpec {
  import spark.implicits._

  test("derived instances carry provenance links (to_cnf, hash)") {
    val df = Seq("p cnf 3 2\n1 -2 0\n2 3 0\n").toDF("text")
    val kis = Transforms.kis(df, "text").head()
    assert(kis.getAs[String]("to_cnf").length == 32)
    assert(kis.getAs[String]("hash").length == 32)
    assert(kis.getAs[Long]("kis_k") == 2L)
    val norm = Transforms.normalized(df, "text").head()
    assert(norm.getAs[String]("derived_text") == "p cnf 3 2\n1 -2 0\n2 3 0\n")
    // normalize is idempotent: hash of normalized == gbd_hash of original
    assert(norm.getAs[String]("hash") == norm.getAs[String]("to_cnf"))
    val sani = Transforms.sanitized(Seq("p cnf 3 2\n1 1 -2 0\n2 3 0\n").toDF("text"), "text").head()
    assert(sani.getAs[String]("derived_text") == "p cnf 3 2\n1 -2 0\n2 3 0\n")
  }

  test("split sink: text table content-addressed + deduped, feature table payload-free, round trip joins back") {
    val dir = java.nio.file.Files.createTempDirectory("graft_split").toString
    // ids 1 and 3 derive IDENTICAL text -> one row in the text table
    val df = Seq(
      (1L, "p cnf 3 2\n1 -2 0\n2 3 0\n"),
      (2L, "p cnf 2 1\n1 2 0\n"),
      (3L, "c dup of 1\np cnf 3 2\n1 -2 0\n2 3 0\n")).toDF("id", "text")
    Transforms.writeSplit(Transforms.normalized(df, "text"), dir)
    val (text, feats) = Transforms.readSplit(spark, dir)
    assert(text.columns.toSeq.sorted == Seq("derived_text", "hash"))
    assert(!feats.columns.contains("derived_text"), "feature table must be payload-free")
    assert(text.count() == 2, "text table is content-addressed: dup text stored once")
    assert(feats.count() == 3, "feature table keeps every source row")
    val joined = feats.join(text, Seq("hash")).select("id", "derived_text").collect()
    assert(joined.length == 3, "every feature row resolves its payload by hash")
    val byId = joined.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(1L) == byId(3L) && byId(1L) != byId(2L))
  }
}
