package graft.core

/** ISO-hash2 — iterative Weisfeiler–Leman color refinement on the
  * literal–clause incidence structure, re-expressed from
  * /root/reference/src/identify/ISOHash2.h:35-242. Per-document (row-local)
  * algorithm:
  *
  *  - operates on the SANITIZED clause form (CNFFormula.h:126-151 loader:
  *    per-clause literal sort by (var, sign), duplicate-literal removal,
  *    tautological clauses dropped) — NOT the raw scan used by features
  *  - literal colors initialized to 1 (ISOHash2.h:55-57)
  *  - per round: order-invariant clause hash (sum + rotated-xor of mixed
  *    literal colors, xored with size; ISOHash2.h:112-124), scattered back
  *    onto the clause's literals, then a per-variable finalize mixing old
  *    pos/neg colors (ISOHash2.h:126-143)
  *  - stop when the distinct oriented-state count stabilizes, max 31 rounds
  *  - final = digest of the SORTED canonical per-var state hashes
  *
  * DOCUMENTED DIVERGENCE: the reference digests the sorted state array with
  * XXH3_64 (ISOHash2.h:220); XXH3 is not available here, so the digest is
  * XXH64 (same byte stream, same sort). The hash is an opaque
  * equivalence-class key — its contract is the invariance property, which
  * the scramble-corpus tests assert; only the constant differs from the
  * reference's output.
  */
object IsoHash2 {

  /** mix64variant13 (ISOHash2.h:72-77) — NOT splitmix64 (no increment). */
  @inline private def fastMix(k0: Long): Long = {
    var k = k0
    k ^= k >>> 30; k *= 0xbf58476d1ce4e5b9L
    k ^= k >>> 27; k *= 0x94d049bb133111ebL
    k ^ (k >>> 31)
  }

  @inline private def rotl64(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))

  private val GOLDEN = 0x9e3779b97f4a7c15L

  /** Sanitized parse (CNFFormula loader semantics): per-clause sort by
    * (var, sign), dedup, drop tautologies. Returns lits as Lit keys
    * (2*var + sign) flattened with offsets, plus nVars.
    */
  def sanitizedParse(buf: Array[Byte]): ClauseDoc = {
    val in = new ByteScanner(buf)
    val raw = new IntArrayList(32)
    val lits = new IntArrayList(256)
    val offsets = new IntArrayList(64)
    offsets.add(0)
    var nVars = 0
    while (in.readClause(raw)) {
      val n = raw.size
      if (n == 0) {
        offsets.add(lits.size) // empty clause kept (no effect on colors)
      } else {
        val keys = new Array[Int](n)
        var i = 0
        while (i < n) {
          val l = raw(i)
          keys(i) = (math.abs(l) << 1) | (if (l < 0) 1 else 0)
          i += 1
        }
        java.util.Arrays.sort(keys)
        // dedup + tautology check on adjacent entries
        var taut = false
        var m = 0
        i = 0
        while (i < n && !taut) {
          if (m > 0 && keys(i) == keys(m - 1)) () // duplicate
          else if (m > 0 && (keys(i) >> 1) == (keys(m - 1) >> 1)) taut = true
          else { keys(m) = keys(i); m += 1 }
          i += 1
        }
        if (!taut) {
          var j = 0
          while (j < m) { lits.add(keys(j)); j += 1 }
          val v = keys(m - 1) >> 1
          if (v > nVars) nVars = v
          offsets.add(lits.size)
        }
      }
    }
    new ClauseDoc(lits.toArray, offsets.toArray, nVars)
  }

  final case class Stats(hash: Long, rounds: Int, stabilized: Boolean)

  /** Run the refinement on a sanitized doc whose lits are Lit keys. */
  def run(doc: ClauseDoc, maxIterations: Int = 31): Stats = {
    val nVars = doc.nVars
    // colors indexed [var][sign]; two ping-pong buffers
    val colors = Array.fill(2)(Array.fill(2 * (nVars + 1))(1L))
    var round = 0
    var prevPartitions = 0L
    var stabilized = false
    val stateBuf = new Array[Long](nVars)

    @inline def stateOriented(p: Long, n: Long): Long = fastMix((p ^ rotl64(n, 1)) + GOLDEN)
    @inline def stateCanonical(p0: Long, n0: Long): Long = {
      var p = p0; var n = n0
      if (java.lang.Long.compareUnsigned(p, n) > 0) { val t = p; p = n; n = t }
      fastMix((p ^ rotl64(n, 1)) + GOLDEN)
    }

    while (round < maxIterations && !stabilized) {
      val oldC = colors(round % 2)
      val newC = colors((round + 1) % 2)
      java.util.Arrays.fill(newC, 0L)

      // scatter clause hashes
      var c = 0
      while (c < doc.nClauses) {
        val s = doc.clauseStart(c)
        val e = doc.clauseEnd(c)
        var a = 0L
        var b = 0L
        var i = s
        while (i < e) {
          val y = fastMix(oldC(doc.lits(i)) + GOLDEN)
          a += y
          b ^= rotl64(y, 23)
          i += 1
        }
        val ch = fastMix(a ^ fastMix(b + 0xbf58476d1ce4e5b9L) ^ (e - s).toLong)
        i = s
        while (i < e) { newC(doc.lits(i)) += ch; i += 1 }
        c += 1
      }

      // finalize per variable (ISOHash2.h:126-143)
      var v = 1
      while (v <= nVars) {
        val oldP = oldC(2 * v)
        val oldN = oldC(2 * v + 1)
        val aggP = newC(2 * v)
        val aggN = newC(2 * v + 1)
        newC(2 * v) = fastMix(oldP + fastMix(aggP) + rotl64(oldN, 1))
        newC(2 * v + 1) = fastMix(oldN + fastMix(aggN) + rotl64(oldP, 1))
        v += 1
      }

      round += 1

      // stabilization: distinct oriented state hashes of the current colors
      val cur = colors(round % 2)
      v = 1
      while (v <= nVars) {
        stateBuf(v - 1) = stateOriented(cur(2 * v), cur(2 * v + 1))
        v += 1
      }
      java.util.Arrays.sort(stateBuf)
      var partitions = if (nVars > 0) 1L else 0L
      var i = 1
      while (i < nVars) {
        if (stateBuf(i) != stateBuf(i - 1)) partitions += 1
        i += 1
      }
      if (partitions == prevPartitions) stabilized = true
      prevPartitions = partitions
    }

    // final canonical state hashes, sorted, digested
    val cur = colors(round % 2)
    var v = 1
    while (v <= nVars) {
      stateBuf(v - 1) = stateCanonical(cur(2 * v), cur(2 * v + 1))
      v += 1
    }
    java.util.Arrays.sort(stateBuf)
    Stats(Xxh64.hashLongs(stateBuf), round, stabilized)
  }

  /** Hex form matching the reference's 16-hex zero-padded rendering. */
  def isoHash2(buf: Array[Byte]): String =
    f"${run(sanitizedParse(buf)).hash}%016x"
}

/** XXH64 (public algorithm, Yann Collet) over an array of longs in
  * little-endian byte order — the final digest for IsoHash2 (stand-in for
  * the reference's XXH3_64; see divergence note above).
  */
object Xxh64 {
  private val P1 = 0x9e3779b185ebca87L
  private val P2 = 0xc2b2ae3d27d4eb4fL
  private val P3 = 0x165667b19e3779f9L
  private val P4 = 0x85ebca77c2b2ae63L
  private val P5 = 0x27d4eb2f165667c5L

  @inline private def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))
  @inline private def round(acc: Long, input: Long): Long = rotl(acc + input * P2, 31) * P1
  @inline private def mergeRound(acc0: Long, v: Long): Long = {
    val acc = acc0 ^ round(0L, v)
    acc * P1 + P4
  }

  /** XXH64(seed=0) of longs serialized little-endian (length % 8 == 0). */
  def hashLongs(data: Array[Long]): Long = {
    val len = data.length * 8L
    var h: Long = 0L
    var i = 0
    if (data.length >= 4) {
      var v1 = P1 + P2
      var v2 = P2
      var v3 = 0L
      var v4 = -P1
      while (i + 4 <= data.length) {
        v1 = round(v1, data(i))
        v2 = round(v2, data(i + 1))
        v3 = round(v3, data(i + 2))
        v4 = round(v4, data(i + 3))
        i += 4
      }
      h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
      h = mergeRound(h, v1)
      h = mergeRound(h, v2)
      h = mergeRound(h, v3)
      h = mergeRound(h, v4)
    } else {
      h = P5
    }
    h += len
    while (i < data.length) {
      h ^= round(0L, data(i))
      h = rotl(h, 27) * P1 + P4
      i += 1
    }
    h ^= h >>> 33
    h *= P2
    h ^= h >>> 29
    h *= P3
    h ^ (h >>> 32)
  }
}
