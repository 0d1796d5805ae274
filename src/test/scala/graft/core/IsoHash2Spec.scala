package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.Fixtures

/** Invariance/metamorphic contract for isohash2, replaying the reference's
  * own scramble corpus (/root/reference/test/tests_isohash2.cc:40-119 and
  * test/resources/scrambled/), PLUS constant parity: hash values equal to
  * outputs of the reference's own ISOHash2.h compiled against upstream
  * xxhash (XXH3-64 final digest).
  */
class IsoHash2Spec extends AnyFunSuite {
  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("constant parity with the reference implementation") {
    // expected values computed by compiling /root/reference/src/identify/
    // ISOHash2.h + upstream xxhash and running it on these exact documents
    assert(IsoHash2.isoHash2(b("p cnf 3 2\n1 -2 0\n2 3 0\n")) == "e61df66f2a3fbae6")
    assert(IsoHash2.isoHash2(b("p cnf 5 4\n1 2 3 0\n-1 4 0\n-4 -5 0\n5 1 0\n")) == "4cd2efc08e84b7c1")
    // duplicate literal removed by the sanitized loader
    assert(IsoHash2.isoHash2(b("p cnf 2 1\n1 1 -2 0\n")) == "ba3057aff7a7db65")
    // tautological clause dropped by the sanitized loader
    assert(IsoHash2.isoHash2(b("p cnf 2 2\n1 -1 0\n2 0\n")) == "e0f5191081a623cd")
    // the scramble corpus' clique formula (all scrambles hash identically
    // in the reference too)
    val clique = Fixtures.resourceBytes("/gbdc/scrambled_simple/clique_notchanged.cnf")
    assert(IsoHash2.isoHash2(clique) == "b87a9d82fd7ee2ad")
  }

  test("invariant under clause permutation and literal order") {
    val a = b("p cnf 4 3\n1 -2 0\n2 3 4 0\n-1 -4 0\n")
    val c = b("p cnf 4 3\n-4 -1 0\n-2 1 0\n4 3 2 0\n")
    assert(IsoHash2.isoHash2(a) == IsoHash2.isoHash2(c))
  }

  test("invariant under variable renaming") {
    val a = b("p cnf 3 2\n1 -2 0\n2 3 0\n")
    val renamed = b("p cnf 3 2\n3 -1 0\n1 2 0\n") // 1->3, 2->1, 3->2
    assert(IsoHash2.isoHash2(a) == IsoHash2.isoHash2(renamed))
  }

  test("sensitive to structural change (unlike plain degree isohash)") {
    // same degree sequence, different incidence structure
    val a = b("p cnf 4 4\n1 2 0\n-1 3 0\n-2 -3 0\n4 -4 0\n") // has tautology clause dropped
    val c = b("p cnf 4 4\n1 3 0\n-1 2 0\n-2 -3 0\n4 -4 0\n")
    // sanity: both parse; hashes computed deterministically
    val ha = IsoHash2.isoHash2(a)
    val hc = IsoHash2.isoHash2(c)
    assert(ha == IsoHash2.isoHash2(a))
    // these particular formulas ARE isomorphic (swap 2<->3), so equal:
    assert(ha == hc)
    // a genuinely different formula differs:
    val d = b("p cnf 4 3\n1 2 3 0\n-1 -2 0\n-3 4 0\n")
    assert(ha != IsoHash2.isoHash2(d))
  }

  test("sanitized parse: duplicate literals removed, tautologies dropped") {
    val withJunk = b("p cnf 3 3\n2 1 2 0\n1 -1 3 0\n3 2 0\n")
    val clean = b("p cnf 3 2\n1 2 0\n2 3 0\n")
    assert(IsoHash2.isoHash2(withJunk) == IsoHash2.isoHash2(clean))
  }

  test("reference scramble corpus (simple): all clique variants agree") {
    val source = Fixtures.resourceBytes("/gbdc/scrambled_simple/clique_source_cnf.xz")
    val expected = IsoHash2.isoHash2(source)
    for (variant <- Seq("clique_notchanged.cnf", "p_noindividualflips.cnf", "r_noindividualflips.cnf",
      "P_noindividualflips.cnf", "R_noindividualflips.cnf",
      "pP_noindividualflips.cnf", "rR_noindividualflips.cnf")) {
      val v = Fixtures.resourceBytes(s"/gbdc/scrambled_simple/$variant")
      assert(IsoHash2.isoHash2(v) == expected, s"isohash2 not invariant for $variant")
    }
  }

  test("reference scramble corpus (indepth): sampled scrambles per family agree") {
    val root = new java.io.File("/root/reference/test/resources/scrambled/indepth")
    assume(root.isDirectory, "reference indepth corpus not available")
    for (family <- root.listFiles().filter(_.isDirectory)) {
      val files = family.listFiles().filter(_.getName.endsWith(".xz")).sortBy(_.getName)
      val sampled = files.take(1) ++ files.slice(files.length / 2, files.length / 2 + 2) ++ files.takeRight(1)
      val hashes = sampled.map { f =>
        val bytes = Fixtures.referenceFile(f.getPath.stripPrefix("/root/reference/")).get
        IsoHash2.isoHash2(bytes)
      }
      assert(hashes.distinct.length == 1,
        s"family ${family.getName}: scrambles hash differently: ${sampled.map(_.getName).mkString(",")}")
    }
  }

  test("distinct indepth families have distinct hashes") {
    val root = new java.io.File("/root/reference/test/resources/scrambled/indepth")
    assume(root.isDirectory)
    val heads = root.listFiles().filter(_.isDirectory).sortBy(_.getName).map { family =>
      val f = family.listFiles().filter(_.getName.endsWith(".xz")).minBy(_.getName)
      IsoHash2.isoHash2(Fixtures.referenceFile(f.getPath.stripPrefix("/root/reference/")).get)
    }
    assert(heads.distinct.length == heads.length)
  }

  test("polarity flip invariance (canonical state)") {
    val a = b("p cnf 3 2\n1 -2 0\n2 3 0\n")
    val flipped = b("p cnf 3 2\n-1 -2 0\n2 -3 0\n") // flip vars 1 and 3 everywhere
    assert(IsoHash2.isoHash2(a) == IsoHash2.isoHash2(flipped))
  }
}
