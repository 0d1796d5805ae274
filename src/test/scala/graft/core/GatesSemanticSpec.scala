package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** fSemantic gate recognition (GateAnalyzer.h:227-247) + the [[Sat.Ipasir]]
  * solver behind it. The MAJ (majority) gate is the canonical
  * semantic-only case: blocked, same input variables, but neither OR/AND
  * (both sides have 3 clauses) nor FULL (6 clauses != 2^3), so only the
  * UNSAT check can classify it.
  */
class GatesSemanticSpec extends AnyFunSuite {

  // ---- solver unit tests (lits are Gates packing: 2v + sign) ----

  private def lit(v: Int, positive: Boolean): Int = 2 * v + (if (positive) 0 else 1)

  test("solver: unit + contradiction is UNSAT, assumption is transient") {
    val s = new Sat.Ipasir()
    s.add(lit(1, true)); s.add(0) // (x1)
    assert(s.solve())
    s.assume(lit(1, false))
    assert(!s.solve()) // x1 assumed false against unit x1
    assert(s.solve()) // assumption consumed: SAT again
  }

  test("solver: pigeonhole PHP(3,2) is UNSAT") {
    val s = new Sat.Ipasir()
    // p_ij = pigeon i in hole j; vars 1..6 = (i-1)*2 + j
    def p(i: Int, j: Int) = (i - 1) * 2 + j
    for (i <- 1 to 3) { s.add(lit(p(i, 1), true)); s.add(lit(p(i, 2), true)); s.add(0) }
    for (j <- 1 to 2; i <- 1 to 3; k <- (i + 1) to 3) {
      s.add(lit(p(i, j), false)); s.add(lit(p(k, j), false)); s.add(0)
    }
    assert(!s.solve())
  }

  test("solver: an unterminated add keeps the clause open across calls") {
    val s = new Sat.Ipasir()
    s.add(lit(1, true)) // open clause: (x1 ...
    s.add(lit(2, true)); s.add(0) // ... x2) — ONE clause, not two units
    s.add(lit(1, false)); s.add(0) // unit (~x1)
    assert(s.solve(), "(x1 v x2) & ~x1 must be SAT; two units would be UNSAT")
    s.add(lit(2, false)); s.add(0)
    assert(!s.solve())
  }

  // ---- gate recognition through the semantic path ----

  /** MAJ(a,b,c) definition for output o: fwd (~o a b)(~o a c)(~o b c),
    * bwd (o ~a ~b)(o ~a ~c)(o ~b ~c).
    */
  private def maj(o: Int, a: Int, b: Int, c: Int): String =
    s"-$o $a $b 0\n-$o $a $c 0\n-$o $b $c 0\n$o -$a -$b 0\n$o -$a -$c 0\n$o -$b -$c 0\n"

  /** x <-> AND(l, z) — a pattern (MONO from the root side) gate whose inputs
    * mark l at its polarity, used to force the MAJ output non-monotonic.
    */
  private def and2(x: Int, l: Int, z: Int): String =
    s"-$x $l 0\n-$x $z 0\n$x ${-l} ${-z} 0\n"

  test("majority gate is classified GENERIC via the SAT check") {
    // p=1 a=2 b=3 c=4 z=5 x=6 y=7; units x, y; x=AND(p,z), y=AND(~p,z)
    val doc = ("p cnf 7 14\n6 0\n7 0\n" + and2(6, 1, 5) + and2(7, -1, 5) +
      maj(1, 2, 3, 4)).getBytes("UTF-8")
    val v = Gates.featureNames.zip(Gates.extract(doc)).toMap
    assert(v("n_generic") == 1.0, s"expected 1 generic gate: $v")
    assert(v("n_mono") == 2.0)
    assert(v("n_gates") == 3.0)
    assert(v("n_roots") == 2.0)
  }

  test("solver: fSemantic call sequence — the open literal flips the next verdict") {
    // Exactly the reference's per-check protocol over two MAJ checks: the
    // first check's unterminated o.positive() merges into the second
    // check's first clause, so setting p=true satisfies it — SAT — while a
    // clean solver on the second check alone is UNSAT.
    def runChecks(s: Sat.Ipasir, checks: Seq[(Int, Seq[Seq[Int]])]): Seq[Boolean] =
      checks.map { case (o, clauses) =>
        clauses.foreach { cl =>
          cl.foreach(l => s.add(lit(math.abs(l), l > 0)))
          s.add(0)
        }
        s.assume(lit(o, false))
        val sat = s.solve()
        s.add(lit(o, true)) // reference leaves this clause open
        sat
      }
    def majClauses(o: Int, a: Int, b: Int, c: Int) = Seq(
      Seq(o, a, b), Seq(o, a, c), Seq(o, b, c),
      Seq(o, -a, -b), Seq(o, -a, -c), Seq(o, -b, -c))
    val together = runChecks(new Sat.Ipasir(),
      Seq(1 -> majClauses(1, 2, 3, 4), 5 -> majClauses(5, 6, 7, 8)))
    assert(together == Seq(false, true), "second check weakened by the leaked literal")
    val clean = runChecks(new Sat.Ipasir(), Seq(5 -> majClauses(5, 6, 7, 8)))
    assert(clean == Seq(false), "the same check alone is UNSAT")
  }

  test("reference ipasir-state parity: open output literal suppresses the next gate") {
    // Two semantic candidates in one document, p checked first. q's ~q is
    // marked as an input by the not-nested-monotonic AND gate G (addGate
    // marks both polarities) WITHOUT ~q ever entering the BFS frontier, so
    // when the leaked p literal turns q's check SAT there is no second
    // chance via checkAddGate(~q): q stays NONE under reference ipasir
    // state, whereas a clean-per-check solver would make it GENERIC.
    // p=1 a=2 b=3 c=4 q=5 d=6 e=7 f=8 zx=9 zy=10 x=11 y=12 G=13 zg=14
    // u1=15 z1=16 u2=17 z2=18
    val doc = ("p cnf 18 31\n11 0\n12 0\n15 0\n17 0\n" +
      and2(11, 1, 9) + and2(12, -1, 10) + // force p non-monotonic
      and2(15, 13, 16) + and2(17, -13, 18) + // force G non-monotonic
      and2(13, 5, 14) + // G = AND(q, zg), notMono => marks inputs(~q)
      maj(1, 2, 3, 4) + maj(5, 6, 7, 8)).getBytes("UTF-8")
    val parsed = IsoHash2.sanitizedParse(doc)
    val r = Gates.analyze(parsed, 1) // single root-selection round
    assert(r.gateTypeOf(1) == Gates.GENERIC, "p: first semantic check is clean -> GENERIC")
    assert(r.gateTypeOf(5) == Gates.NONE, "q: leaked literal makes its check SAT -> no gate")
    assert(r.gateTypeOf(13) == Gates.AND)
    val nGeneric = r.gateTypeOf.count(_ == Gates.GENERIC)
    assert(nGeneric == 1, s"exactly one generic gate, got $nGeneric")
  }

  test("golden fixture stays byte-for-byte stable with the semantic path active") {
    // The reference golden (n_generic=0) was produced WITH semantic=true:
    // every fSemantic invocation on the fixture returned SAT. A faithful
    // solver must reproduce that — this re-runs the golden as a guard.
    val buf = graft.Fixtures.resourceBytes("/gbdc/cnf_test.cnf.xz")
    val produced = Gates.featureNames.zip(Gates.extract(buf)).toMap
    val golden = graft.Fixtures.goldenRecord("/gbdc/expected_records/cnf_gates.txt")
    for ((k, expected) <- golden)
      assert(graft.Fixtures.fequal(produced(k), expected), s"$k: ${produced(k)} vs $expected")
  }
}

/** Randomized cross-check of [[Sat.Ipasir]] against brute-force truth-table
  * enumeration, including incremental adds and assumptions between solves.
  */
class SatPropertySpec extends org.scalatest.funsuite.AnyFunSuite {

  private def bruteForce(nVars: Int, clauses: Seq[Seq[Int]], assumption: Int): Boolean = {
    // lits in Gates packing (2v + sign); var 1..nVars
    (0 until (1 << nVars)).exists { m =>
      def isTrue(l: Int) = {
        val v = (m >> ((l >> 1) - 1) & 1) == 1
        if ((l & 1) == 0) v else !v
      }
      (assumption == 0 || isTrue(assumption)) && clauses.forall(_.exists(isTrue))
    }
  }

  test("solver agrees with truth-table enumeration over random incremental CNFs") {
    val rnd = new scala.util.Random(0xC0FFEE)
    for (round <- 1 to 300) {
      val nVars = 2 + rnd.nextInt(9) // 2..10
      val s = new Sat.Ipasir()
      val clauses = scala.collection.mutable.ArrayBuffer[Seq[Int]]()
      // 2-4 incremental batches, solve after each
      for (_ <- 1 to (1 + rnd.nextInt(3))) {
        for (_ <- 1 to (1 + rnd.nextInt(8))) {
          val len = 1 + rnd.nextInt(4)
          val cl = Seq.fill(len)(2 * (1 + rnd.nextInt(nVars)) + rnd.nextInt(2))
          clauses += cl
          cl.foreach(s.add)
          s.add(0)
        }
        val assumption = if (rnd.nextBoolean()) 2 * (1 + rnd.nextInt(nVars)) + rnd.nextInt(2) else 0
        if (assumption != 0) s.assume(assumption)
        val expected = bruteForce(nVars, clauses.toSeq, assumption)
        assert(s.solve() == expected,
          s"round $round nVars=$nVars assumption=$assumption clauses=${clauses.toList}")
      }
    }
  }
}

/** Crash/termination fuzz over the full gate analysis (recognition + BFS +
  * semantic solver) on random documents — the production path must never
  * throw (beyond the structured parse/budget outcomes) or hang.
  */
class GatesFuzzSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("gate extraction terminates on 400 random documents") {
    val rnd = new scala.util.Random(0xFAB)
    for (round <- 1 to 400) {
      val nVars = 1 + rnd.nextInt(30)
      val nClauses = 1 + rnd.nextInt(60)
      val body = (1 to nClauses).map { _ =>
        val len = 1 + rnd.nextInt(5)
        Seq.fill(len)((if (rnd.nextBoolean()) 1 else -1) * (1 + rnd.nextInt(nVars)))
          .mkString(" ") + " 0"
      }.mkString("\n")
      val doc = s"p cnf $nVars $nClauses\n$body\n".getBytes("UTF-8")
      try {
        val out = Gates.featureNames.zip(Gates.extract(doc)).toMap
        assert(out.size == Gates.featureNames.length)
        // structural invariants: every var has exactly one gate type, and
        // n_gates counts exactly the non-NONE ones
        val typeCounts = Seq("n_none", "n_generic", "n_mono", "n_and", "n_or",
          "n_triv", "n_equiv", "n_full").map(out)
        assert(typeCounts.sum == out("n_vars"), s"type counts must partition vars: $out")
        assert(out("n_gates") == out("n_vars") - out("n_none"), s"n_gates mismatch: $out")
        // n_roots can legitimately be 0: a doc whose every clause is a
        // sanitizer-dropped tautology indexes nothing
      } catch {
        case _: DocParseException => () // structured outcome, fine
        case _: Sat.BudgetExceeded => () // structured outcome, fine
      }
    }
  }
}
