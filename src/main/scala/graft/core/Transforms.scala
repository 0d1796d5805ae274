package graft.core

/** Document transformers — derived instances with provenance
  * (SURVEY.md §2.1 S4, reference src/transform/):
  *
  *  - cnf2kis (/root/reference/src/transform/cnf2kis.h:17-96): k-independent-
  *    set reformulation — one graph node per literal OCCURRENCE, cliques
  *    within clauses, edges between opposite-literal occurrences, k = #clauses.
  *  - cnf2bip (/root/reference/src/transform/cnf2bip.cc:10-36): directed
  *    bipartite variable/clause incidence graph.
  *
  * Both operate on the sanitized clause form (CNFFormula loader) and emit
  * byte-exact text in the reference's output format. The engine-level ops
  * attach provenance (`to_cnf` = parent gbd-hash) in graft.ops.Transforms.
  */
object Transforms {

  final case class Kis(text: String, nodes: Long, edges: Long, k: Long)

  def cnf2kis(buf: Array[Byte]): Kis = {
    val doc = IsoHash2.sanitizedParse(buf)
    // literal -> node ids of its occurrences
    val lit2nodes = Array.fill(2 * doc.nVars + 2)(new IntArrayList(4))
    var nNodes = 0L
    var nEdges = 0L
    var nodeId = 1L
    var c = 0
    while (c < doc.nClauses) {
      val size = doc.clauseSize(c)
      nNodes += size
      nEdges += size.toLong * (size - 1) / 2
      var i = 0
      while (i < size) {
        lit2nodes(doc.lits(doc.clauseStart(c) + i)).add((nodeId + i).toInt)
        i += 1
      }
      nodeId += size
      c += 1
    }
    var v = 1
    while (v <= doc.nVars) {
      nEdges += lit2nodes(2 * v).size.toLong * lit2nodes(2 * v + 1).size.toLong
      v += 1
    }
    nEdges *= 2 // reflexivity, as the reference counts
    val k = doc.nClauses.toLong

    val sb = new java.lang.StringBuilder(256 + (nEdges * 12).toInt.max(0))
    sb.append("c satisfiable iff maximum independent set size is ").append(k).append('\n')
    sb.append("c kis nNodes nEdges k\n")
    sb.append("p kis ").append(nNodes).append(' ').append(nEdges).append(' ').append(k).append('\n')
    // cliques within clauses
    nodeId = 1L
    c = 0
    while (c < doc.nClauses) {
      val size = doc.clauseSize(c)
      var i = 0
      while (i < size) {
        val a = nodeId + i
        var j = i + 1
        while (j < size) {
          val b = nodeId + j
          sb.append(a).append(' ').append(b).append(" 0\n")
          sb.append(b).append(' ').append(a).append(" 0\n")
          j += 1
        }
        i += 1
      }
      nodeId += size
      c += 1
    }
    // edges between opposite-literal occurrences
    v = 1
    while (v <= doc.nVars) {
      val pos = lit2nodes(2 * v)
      val neg = lit2nodes(2 * v + 1)
      var i = 0
      while (i < pos.size) {
        var j = 0
        while (j < neg.size) {
          sb.append(pos(i)).append(' ').append(neg(j)).append(" 0\n")
          sb.append(neg(j)).append(' ').append(pos(i)).append(" 0\n")
          j += 1
        }
        i += 1
      }
      v += 1
    }
    Kis(sb.toString, nNodes, nEdges, k)
  }

  final case class Bip(text: String, nodes: Long, edges: Long)

  def cnf2bip(buf: Array[Byte]): Bip = {
    val doc = IsoHash2.sanitizedParse(buf)
    val nLits = doc.lits.length.toLong
    val nodes = doc.nVars.toLong + doc.nClauses.toLong
    val sb = new java.lang.StringBuilder(128 + (nLits * 10).toInt)
    sb.append("c directed bipartite graph representation from cnf\n")
    sb.append("p edge ").append(nodes).append(' ').append(nLits).append('\n')
    var clauseId = doc.nVars.toLong + 1
    var c = 0
    while (c < doc.nClauses) {
      var i = doc.clauseStart(c)
      while (i < doc.clauseEnd(c)) {
        val lit = doc.lits(i)
        if ((lit & 1) == 1) sb.append("e ").append(lit >> 1).append(' ').append(clauseId).append('\n')
        else sb.append("e ").append(clauseId).append(' ').append(lit >> 1).append('\n')
        i += 1
      }
      clauseId += 1
      c += 1
    }
    Bip(sb.toString, nodes, nLits)
  }
}
