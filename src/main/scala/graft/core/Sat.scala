package graft.core

/** Minimal incremental SAT solver behind an IPASIR-shaped interface — the
  * stand-in for the CaDiCaL instance the reference consults during gate
  * recognition (/root/reference/src/extract/gates/GateAnalyzer.h:63-70:
  * one solver per analyzed document; clauses accumulate across the
  * document's fSemantic checks).
  *
  * Engine: iterative DPLL — two-watched-literal unit propagation +
  * chronological backtracking, single assumption per solve. The gate-check
  * instances are tiny (one gate's fwd/bwd environment, transformed), so
  * search without clause learning is adequate; a conflict/propagation
  * budget guards pathological documents (exceeding it raises
  * [[Sat.BudgetExceeded]], which the kernel layer surfaces through the
  * per-document resource envelope instead of stalling the task).
  *
  * IPASIR *state* parity matters, not just verdicts: `add` accumulates
  * literals into a pending clause terminated by 0, and the reference's
  * fSemantic leaves its post-solve output literal UNTERMINATED
  * (GateAnalyzer.h:245 has no trailing `ipasir_add(S, 0)`), so that literal
  * prepends onto the first clause of the NEXT check in the same document.
  * The solver therefore exposes exactly ipasir's add/assume/solve protocol
  * and [[Gates]] transliterates the reference call sequence, quirk included.
  *
  * Literals use the Gates/Lit packing: 2*var + sign, sign 1 = negative
  * (var >= 1). 0 is the clause terminator, as in DIMACS/ipasir.
  */
object Sat {

  final class BudgetExceeded extends RuntimeException("sat solver budget exceeded", null, false, false)

  /** Default work budget: generous for gate-sized checks, small enough that
    * a degenerate document cannot stall an executor task.
    */
  final val DefaultBudget = 4L * 1000 * 1000

  final class Ipasir(budget: Long = DefaultBudget) {
    @inline private def neg(l: Int): Int = l ^ 1

    // clause store: flat literal pool + per-clause (start, end)
    private var pool = new Array[Int](256)
    private var poolLen = 0
    private var starts = new Array[Int](32)
    private var ends = new Array[Int](32)
    private var nClauses = 0

    // watches(lit) = ids of clauses currently watching lit (first two slots)
    private var watches = new Array[Array[Int]](8)
    private var watchLen = new Array[Int](8)

    // assignment: 0 unassigned, 1 true, 2 false (per var)
    private var assign = new Array[Byte](8)
    private var maxVar = 0

    private var trail = new Array[Int](8)
    private var trailLen = 0

    private var emptyClause = false
    private var rootUnits = new Array[Int](8)
    private var nRootUnits = 0

    private var pending = new Array[Int](16)
    private var pendingLen = 0

    private var work = 0L

    private def growVars(v: Int): Unit = {
      if (v > maxVar) maxVar = v
      val needLit = 2 * v + 2
      if (needLit > watches.length) {
        val n = math.max(needLit, watches.length * 2)
        watches = java.util.Arrays.copyOf(watches, n)
        watchLen = java.util.Arrays.copyOf(watchLen, n)
      }
      if (v + 1 > assign.length)
        assign = java.util.Arrays.copyOf(assign, math.max(v + 1, assign.length * 2))
      if (maxVar + 1 > trail.length)
        trail = java.util.Arrays.copyOf(trail, math.max(maxVar + 1, trail.length * 2))
    }

    @inline private def litValue(l: Int): Int = {
      // 1 true, 2 false, 0 unassigned (under current assignment)
      val a = assign(l >> 1)
      if (a == 0) 0
      else if ((a == 1) == ((l & 1) == 0)) 1
      else 2
    }

    private def watch(lit: Int, clause: Int): Unit = {
      var w = watches(lit)
      if (w == null) { w = new Array[Int](4); watches(lit) = w }
      else if (watchLen(lit) == w.length) {
        w = java.util.Arrays.copyOf(w, w.length * 2); watches(lit) = w
      }
      w(watchLen(lit)) = clause
      watchLen(lit) += 1
    }

    /** ipasir_add: 0 terminates the pending clause; nonzero literals
      * accumulate (Gates/Lit packing).
      */
    def add(lit: Int): Unit = {
      if (lit == 0) commitPending()
      else {
        if (pendingLen == pending.length)
          pending = java.util.Arrays.copyOf(pending, pending.length * 2)
        pending(pendingLen) = lit
        pendingLen += 1
        growVars(lit >> 1)
      }
    }

    private def commitPending(): Unit = {
      // in-clause sanitation: drop duplicate literals, skip tautologies
      java.util.Arrays.sort(pending, 0, pendingLen)
      var n = 0
      var i = 0
      var taut = false
      while (i < pendingLen) {
        if (n > 0 && pending(i) == pending(n - 1)) ()
        else if (n > 0 && pending(i) == neg(pending(n - 1))) taut = true
        else { pending(n) = pending(i); n += 1 }
        i += 1
      }
      pendingLen = 0
      if (taut) return
      if (n == 0) { emptyClause = true; return }
      if (n == 1) {
        if (nRootUnits == rootUnits.length)
          rootUnits = java.util.Arrays.copyOf(rootUnits, rootUnits.length * 2)
        rootUnits(nRootUnits) = pending(0)
        nRootUnits += 1
        return
      }
      if (nClauses == starts.length) {
        starts = java.util.Arrays.copyOf(starts, starts.length * 2)
        ends = java.util.Arrays.copyOf(ends, ends.length * 2)
      }
      while (poolLen + n > pool.length)
        pool = java.util.Arrays.copyOf(pool, pool.length * 2)
      val s = poolLen
      System.arraycopy(pending, 0, pool, s, n)
      poolLen += n
      starts(nClauses) = s
      ends(nClauses) = s + n
      watch(pool(s), nClauses)
      watch(pool(s + 1), nClauses)
      nClauses += 1
    }

    @inline private def enqueue(lit: Int): Boolean = {
      val v = litValue(lit)
      if (v == 2) false
      else {
        if (v == 0) {
          assign(lit >> 1) = if ((lit & 1) == 0) 1 else 2
          trail(trailLen) = lit
          trailLen += 1
        }
        true
      }
    }

    /** Two-watch unit propagation from trail position qhead; returns false on
      * conflict. Mirrors the classic MiniSat scheme.
      */
    private def propagate(qhead0: Int): Boolean = {
      var qhead = qhead0
      while (qhead < trailLen) {
        work += 1
        if (work > budget) throw new BudgetExceeded
        val p = trail(qhead); qhead += 1
        val f = neg(p) // literal just falsified
        val ws = watches(f)
        var n = watchLen(f)
        var i = 0
        while (i < n) {
          val ci = ws(i)
          val s = starts(ci)
          // ensure pool(s+1) == f
          if (pool(s) == f) { pool(s) = pool(s + 1); pool(s + 1) = f }
          if (litValue(pool(s)) == 1) i += 1 // satisfied, keep watch
          else {
            // search a non-false literal to move the watch to
            var k = s + 2
            val e = ends(ci)
            var moved = false
            while (k < e && !moved) {
              work += 1
              if (litValue(pool(k)) != 2) {
                pool(s + 1) = pool(k); pool(k) = f
                watch(pool(s + 1), ci)
                // remove this watch entry (swap with last)
                n -= 1
                ws(i) = ws(n)
                moved = true
              }
              k += 1
            }
            if (!moved) {
              if (!enqueue(pool(s))) { // conflict (pool(s) false) or unit
                watchLen(f) = n
                return false
              }
              i += 1
            }
          }
        }
        watchLen(f) = n
      }
      true
    }

    private var assumption = 0

    /** ipasir_assume, restricted to a SINGLE assumption per solve (the only
      * shape Gates.fSemantic uses). Real ipasir ACCUMULATES assumptions; a
      * second assume before solve here would silently drop the first and
      * return a wrong verdict, so it is rejected loudly instead. The
      * assumed variable may be one no clause mentions — still a legal
      * ipasir call — so it must size the var tables like add() does.
      */
    def assume(lit: Int): Unit = {
      require(assumption == 0 || assumption == lit,
        "Sat.Solver supports one assumption per solve(); " +
          s"assume($lit) would drop pending assumption $assumption")
      growVars(lit >> 1)
      assumption = lit
    }

    /** ipasir_solve: true = SAT (10), false = UNSAT (20). Restarts the
      * assignment from scratch each call (small instances; correctness over
      * incremental trail reuse).
      */
    def solve(): Boolean = {
      val assumed = assumption
      assumption = 0
      if (emptyClause) return false
      // reset assignment
      var i = 0
      while (i < trailLen) { assign(trail(i) >> 1) = 0; i += 1 }
      trailLen = 0
      work += nRootUnits + 1
      if (work > budget) throw new BudgetExceeded

      // level 0: root units
      i = 0
      while (i < nRootUnits) {
        if (!enqueue(rootUnits(i))) return false
        i += 1
      }
      if (!propagate(0)) return false
      // assumption level
      val assumeBase = trailLen
      if (assumed != 0) {
        if (!enqueue(assumed)) return false
        if (!propagate(assumeBase)) return false
      }

      // chronological DPLL below the assumption level
      // decision stack: trail position before the decision + the decided lit
      var decPos = new Array[Int](16)
      var decLit = new Array[Int](16)
      var decFlipped = new Array[Boolean](16)
      var nDec = 0
      var nextVar = 1

      while (true) {
        // pick the lowest-indexed unassigned variable
        var v = nextVar
        while (v <= maxVar && assign(v) != 0) v += 1
        if (v > maxVar) return true // all assigned, no conflict
        nextVar = v
        // decide positive first
        if (nDec == decPos.length) {
          decPos = java.util.Arrays.copyOf(decPos, nDec * 2)
          decLit = java.util.Arrays.copyOf(decLit, nDec * 2)
          decFlipped = java.util.Arrays.copyOf(decFlipped, nDec * 2)
        }
        decPos(nDec) = trailLen
        decLit(nDec) = 2 * v
        decFlipped(nDec) = false
        nDec += 1
        enqueue(2 * v)
        var conflict = !propagate(trailLen - 1)
        while (conflict) {
          work += 1
          if (work > budget) throw new BudgetExceeded
          // backtrack to the deepest unflipped decision
          var found = false
          while (nDec > 0 && !found) {
            nDec -= 1
            val pos = decPos(nDec)
            var j = pos
            while (j < trailLen) { assign(trail(j) >> 1) = 0; j += 1 }
            trailLen = pos
            if (!decFlipped(nDec)) {
              val flipped = neg(decLit(nDec))
              decLit(nDec) = flipped
              decFlipped(nDec) = true
              decPos(nDec) = trailLen
              nDec += 1
              enqueue(flipped)
              nextVar = 1
              found = true
            }
          }
          if (!found) return false // exhausted below assumption -> UNSAT
          conflict = !propagate(trailLen - 1)
        }
      }
      false // unreachable
    }
  }
}
