package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable HyperLogLog distinct-count sketch — the cardinality machinery
  * a 100-TB corpus needs where exact COUNT(DISTINCT) is a full shuffle of
  * every key: distinct URLs per domain, distinct tokens per language,
  * distinct simhash buckets per day. The sketch is a fixed 2^p-byte
  * register array; partial aggregation, shuffle, and re-aggregation all
  * move only sketches, and sketches from different shards / days / corpus
  * snapshots MERGE losslessly (elementwise max) — precompute per-partition
  * sketches once, answer any rollup later without touching the data.
  *
  * Everything is engine-portable by construction, in the same spirit as
  * [[graft.ops.Graph.pageRankInt]]'s exact-integer arithmetic:
  *
  *  - the hash is the first 32 bits of MD5 (every SQL engine has md5;
  *    a seeded xxhash would be faster but unverifiable externally);
  *  - the raw-HLL estimate is computed as ONE integer division of exact
  *    integers: Z = sum_j 2^-M[j] over the m registers has denominator
  *    2^(q+1), so alpha_m * m^2 / Z = (alphaNum * m^2 * 2^(q+1)) div
  *    (alphaDen * zNum) with zNum = sum_j 2^(q+1-M[j]) — an external
  *    oracle reproduces the estimate BIT-FOR-BIT in int128 SQL. No float
  *    harmonic mean, no libm, no bias-correction branches that an oracle
  *    would have to re-implement approximately. (The low-range linear-
  *    counting correction needs ln and is deliberately omitted; the raw
  *    estimator's small-cardinality bias is the documented trade for
  *    exact verifiability. Spark's own approx_count_distinct remains the
  *    choice when only a number is needed and nobody external checks it.)
  *
  * Standard-error ~ 1.04/sqrt(2^p); p=12 (4 KiB, ~1.6%) is the default.
  * The 32-bit hash space saturates near 2^32 distincts — at that scale
  * raise the register width by swapping the hash for 64-bit (the register
  * layout is width-agnostic; the oracle then needs int128 hex parsing).
  */
object HllSketch {
  /** alpha_m as an exact rational (num, den) — the standard HLL constants. */
  def alpha(m: Int): (Long, Long) = m match {
    case 16 => (673L, 1000L)
    case 32 => (697L, 1000L)
    case 64 => (709L, 1000L)
    case _  => (7213L * m, 10000L * m + 10790L)
  }

  /** First 32 bits of md5(utf8 bytes), as an unsigned value in a Long —
    * exactly `('0x' || substr(md5(v), 1, 8))::BIGINT` in SQL.
    */
  def hash32(bytes: Array[Byte]): Long = {
    val d = MessageDigest.getInstance("MD5").digest(bytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Update one register array in place with a hashed value. */
  def add(regs: Array[Byte], h: Long, p: Int): Unit = {
    val q = 32 - p
    val idx = (h >>> q).toInt
    val w = h & ((1L << q) - 1)
    val bitlen = if (w == 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(w)
    val rho = (q - bitlen + 1).toByte
    if (rho > regs(idx)) regs(idx) = rho
  }

  /** Exact-integer raw-HLL estimate from a register array; p is implied by
    * the array length (m = 2^p). BigInt intermediates: the numerator
    * alphaNum * m^2 * 2^(q+1) exceeds int64 from p=10 up (int128 in SQL).
    * An all-zero register array encodes cardinality EXACTLY 0 (no value
    * was ever added) — returned as 0 rather than the raw estimator's
    * alpha*m empty-sketch bias.
    */
  def estimate(regs: Array[Byte]): Long = {
    val m = regs.length
    val p = java.lang.Integer.numberOfTrailingZeros(m)
    val qq = 32 - p + 1
    var zNum = BigInt(0)
    var filled = 0
    var j = 0
    while (j < m) {
      if (regs(j) != 0) filled += 1
      zNum += BigInt(1) << (qq - regs(j))
      j += 1
    }
    if (filled == 0) return 0L
    val (aNum, aDen) = alpha(m)
    ((BigInt(aNum) * m * m << qq) / (BigInt(aDen) * zNum)).toLong
  }

  def requireP(p: Int): Unit =
    require(p >= 4 && p <= 16, s"hll precision must be in [4,16], got $p")
}

/** Aggregate: string column -> 2^p-byte HLL register array (binary). */
case class HllSketchAgg(child: Expression, p: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {
  HllSketch.requireP(p)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      HllSketch.add(buffer, HllSketch.hash32(v.asInstanceOf[UTF8String].getBytes), p)
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buffer.length) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = buffer
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storage: Array[Byte]): Array[Byte] = storage

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hll_sketch expects a string column, got ${t.simpleString}")
  }
  override def prettyName: String = "hll_sketch"
  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)
}

/** Aggregate: merge already-built sketches (binary -> binary) — the rollup
  * path: per-shard/per-day sketches combine into any coarser grouping
  * without rescanning data. Register widths must agree.
  */
case class HllMergeAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  // buffer starts empty and adopts the first sketch's width; a width
  // mismatch afterwards is a caller error (two different precisions)
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  private def mergeInto(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    if (other.isEmpty) buffer
    else if (buffer.isEmpty) other.clone()
    else {
      require(buffer.length == other.length,
        s"cannot merge hll sketches of different precision " +
          s"(${buffer.length} vs ${other.length} registers)")
      var i = 0
      while (i < buffer.length) {
        if (other(i) > buffer(i)) buffer(i) = other(i)
        i += 1
      }
      buffer
    }

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buffer else mergeInto(buffer, v.asInstanceOf[Array[Byte]])
  }
  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    mergeInto(buffer, other)

  override def eval(buffer: Array[Byte]): Any = buffer
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storage: Array[Byte]): Array[Byte] = storage

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hll_merge expects a binary sketch column, got ${t.simpleString}")
  }
  override def prettyName: String = "hll_merge"
  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllMergeAgg =
    copy(child = newChild)
}

/** Scalar: sketch bytes -> exact-integer raw-HLL cardinality estimate. */
case class HllEstimate(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hll_estimate expects a binary sketch column, got ${t.simpleString}")
  }
  override def prettyName: String = "hll_estimate"
  protected override def nullSafeEval(input: Any): Any = {
    val regs = input.asInstanceOf[Array[Byte]]
    if (regs.isEmpty) 0L
    else {
      require((regs.length & (regs.length - 1)) == 0,
        s"hll sketch length must be a power of two, got ${regs.length}")
      HllSketch.estimate(regs)
    }
  }
  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}
