package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.core.TextKernels

/** Doc-local coarse-quantizer expressions for IVF ANN. The centroid table is
  * embedded in the expression (nCentroids x dim floats — a few KB; it ships
  * to executors inside the serialized plan, the expression-level analog of a
  * broadcast). Assignment is therefore a ZERO-shuffle narrow map: the
  * round-1 formulation (cross-join corpus x centroids + row_number window)
  * shuffled nCentroids copies of the whole corpus to pick a per-row argmax —
  * the VERDICT.md scale-killer this replaces.
  */
trait CentroidExpression extends UnaryExpression with KernelCallCodegen {
  def centroids: Array[Array[Float]]
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float> input, got ${t.simpleString}")
  }

  /** Centroid ids ordered by (cosine desc, id asc), top `n`. */
  protected final def rank(vec: Array[Float], n: Int): Array[Int] = {
    val sims = new Array[Double](centroids.length)
    var i = 0
    while (i < centroids.length) { sims(i) = TextKernels.cosine(vec, centroids(i)); i += 1 }
    val ids = Array.range(0, centroids.length)
    // stable selection of top-n by (sim desc, id asc); nCentroids is small
    val out = new Array[Int](math.min(n, ids.length))
    val taken = new Array[Boolean](ids.length)
    var k = 0
    while (k < out.length) {
      var best = -1
      var bestSim = Double.NegativeInfinity
      var j = 0
      while (j < ids.length) {
        if (!taken(j) && sims(j) > bestSim) { bestSim = sims(j); best = j }
        j += 1
      }
      if (best < 0) {
        // all remaining sims are NaN (e.g. a NaN component in the input
        // embedding): fall back to the smallest untaken id so one bad
        // vector degrades to an arbitrary-but-deterministic assignment
        // instead of crashing the stage
        var j2 = 0
        while (best < 0 && j2 < ids.length) {
          if (!taken(j2)) best = j2
          j2 += 1
        }
      }
      taken(best) = true
      out(k) = best
      k += 1
    }
    out
  }
}

/** Nearest centroid id (argmax cosine, ties -> smallest id). */
case class NearestCentroid(child: Expression, centroids: Array[Array[Float]])
    extends CentroidExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"
  protected override def nullSafeEval(input: Any): Any =
    rank(input.asInstanceOf[ArrayData].toFloatArray(), 1)(0)
  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** The `n` nearest centroid ids, best first (query-side probe list). */
case class NearestCentroids(child: Expression, centroids: Array[Array[Float]], n: Int)
    extends CentroidExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"
  protected override def nullSafeEval(input: Any): Any =
    new GenericArrayData(rank(input.asInstanceOf[ArrayData].toFloatArray(), n))
  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}
