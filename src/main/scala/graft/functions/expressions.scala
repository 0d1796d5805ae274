package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.core._

/** Shared plumbing for the doc-local kernel expressions: accepts a string or
  * binary child (the pages table carries both `text:string` and
  * `html:binary`), evaluates a pure kernel over the raw bytes, and maps a
  * malformed document to null instead of failing the task — at 10^12-doc
  * scale one bad page must not kill a stage; the pipeline derives a `status`
  * column from the null.
  *
  * These are deterministic, null-intolerant unary expressions riding
  * [[KernelCallCodegen]]: the kernels are hundreds of ops per row, so
  * generating their bodies buys nothing — but a CodegenFallback marker
  * would make the whole enclosing operator codegen-unsupported and push
  * every co-resident expression (md5s, struct assembly) onto interpreted
  * eval, so the generated stage calls the kernel through a reference
  * instead (round-5 verdict item 2).
  */
trait DocKernelExpression extends UnaryExpression with KernelCallCodegen {
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string or binary input, got ${t.simpleString}")
  }

  @inline protected final def docBytes(input: Any): Array[Byte] = input match {
    case s: UTF8String => s.getBytes
    case b: Array[Byte] => b
  }
}

/** Document formats understood by the normalization/identity expressions. */
object DocFormat {
  val Cnf = "cnf"
  val Wcnf = "wcnf"
  val Opb = "opb"
  val Pqbf = "pqbf"
  val all: Seq[String] = Seq(Cnf, Wcnf, Opb, Pqbf)
}

/** NormalizeText — the byte-identical extracted-text contract
  * (BASELINE.json input_hint). Forms:
  *  - "hash": the exact byte stream gbdhash consumes
  *    (/root/reference/src/identify/GBDHash.h:30-50 and format variants)
  *  - "file": regenerated-header one-clause-per-line form
  *    (/root/reference/src/transform/cnf2cnf.cc:15-35, CNF only)
  *  - "sanitize": duplicate-literal/tautology-free file form
  *    (/root/reference/src/transform/cnf2cnf.cc:43-86, CNF only)
  */
case class NormalizeText(child: Expression, format: String, form: String)
    extends DocKernelExpression {
  require(DocFormat.all.contains(format), s"unknown format $format")
  require(Seq("hash", "file", "sanitize").contains(form), s"unknown form $form")
  require(format == DocFormat.Cnf || form == "hash", s"form $form only supported for cnf")

  override def dataType: DataType = StringType
  override def prettyName: String = s"normalize_${format}_$form"

  protected override def nullSafeEval(input: Any): Any = {
    val buf = docBytes(input)
    try {
      val s = form match {
        case "file" => Dimacs.normalizeCnfFile(buf)
        case "sanitize" => Dimacs.sanitizeCnfFile(buf)
        case _ =>
          val sink = new BufferSink(buf.length + 16)
          format match {
            case DocFormat.Cnf => Dimacs.normalizeCnf(buf, sink)
            case DocFormat.Wcnf => Dimacs.normalizeWcnf(buf, sink)
            case DocFormat.Opb => Dimacs.normalizeOpb(buf, sink)
            case DocFormat.Pqbf => Dimacs.normalizePqbf(buf, sink)
          }
          sink.result
      }
      UTF8String.fromString(s)
    } catch {
      case _: DocParseException => null
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

/** GbdHash — exact-content instance id: md5 of the normalized byte stream,
  * computed streaming without materializing the normalized text (mirrors
  * /root/reference/src/identify/GBDHash.h). instance_id = gbd_hash(text).
  */
case class GbdHash(child: Expression, format: String) extends DocKernelExpression {
  require(DocFormat.all.contains(format), s"unknown format $format")

  override def dataType: DataType = StringType
  override def prettyName: String = s"gbd_hash_$format"

  protected override def nullSafeEval(input: Any): Any = {
    val buf = docBytes(input)
    try {
      val hex = format match {
        case DocFormat.Cnf => Dimacs.gbdHashCnf(buf)
        case DocFormat.Wcnf => Dimacs.gbdHashWcnf(buf)
        case DocFormat.Opb => Dimacs.gbdHashOpb(buf)
        case DocFormat.Pqbf => Dimacs.gbdHashPqbf(buf)
      }
      UTF8String.fromString(hex)
    } catch {
      case _: DocParseException => null
    }
  }

  override protected def withNewChildInternal(newChild: Expression): GbdHash =
    copy(child = newChild)
}

/** IsoHash — isomorphism-invariant instance id (degree-sequence form,
  * /root/reference/src/identify/ISOHash.h).
  */
case class IsoHash(child: Expression, format: String) extends DocKernelExpression {
  require(format == DocFormat.Cnf || format == DocFormat.Wcnf, s"isohash supports cnf|wcnf, got $format")

  override def dataType: DataType = StringType
  override def prettyName: String = s"iso_hash_$format"

  protected override def nullSafeEval(input: Any): Any = {
    val buf = docBytes(input)
    try {
      val hex =
        if (format == DocFormat.Cnf) Dimacs.isoHashCnf(buf)
        else Dimacs.isoHashWcnf(buf)
      UTF8String.fromString(hex)
    } catch {
      case _: DocParseException => null
    }
  }

  override protected def withNewChildInternal(newChild: Expression): IsoHash =
    copy(child = newChild)
}

/** IsoHash2 — Weisfeiler–Leman refinement hash (graft.core.IsoHash2);
  * invariant under clause/variable permutation and polarity flips.
  */
case class IsoHash2Expr(child: Expression) extends DocKernelExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "iso_hash2"
  protected override def nullSafeEval(input: Any): Any = {
    val buf = docBytes(input)
    try UTF8String.fromString(IsoHash2.isoHash2(buf))
    catch { case _: DocParseException => null }
  }
  override protected def withNewChildInternal(newChild: Expression): IsoHash2Expr =
    copy(child = newChild)
}

object FeatureSchemas {
  private def struct(names: Array[String]): StructType =
    StructType(names.map(n => StructField(n, DoubleType, nullable = false)))

  val cnf: StructType = struct(CnfBase.featureNames)
  val wcnf: StructType = struct(WcnfBase.featureNames)
  val opb: StructType = struct(OpbBase.featureNames)
  val gates: StructType = struct(Gates.featureNames)

  val sani: StructType = StructType(Seq(
    StructField("head_vars", DoubleType, nullable = false),
    StructField("head_clauses", DoubleType, nullable = false),
    StructField("norm_vars", DoubleType, nullable = false),
    StructField("norm_clauses", DoubleType, nullable = false),
    StructField("whitespace_normalised", DoubleType, nullable = false),
    StructField("has_comment", DoubleType, nullable = false),
    StructField("sani_vars", DoubleType, nullable = false),
    StructField("sani_clauses", DoubleType, nullable = false),
    StructField("has_tautological_clause", DoubleType, nullable = false),
    StructField("has_duplicate_literals", DoubleType, nullable = false),
    StructField("has_empty_clause", DoubleType, nullable = false)))
}

/** One fused pass producing the full base-feature vector as a struct of
  * doubles in the reference's feature order — the Spark analog of one
  * gbdc extractor invocation per document (SURVEY.md §2.4 A2-A4).
  */
case class ExtractFeatures(child: Expression, format: String) extends DocKernelExpression {
  require(Seq(DocFormat.Cnf, DocFormat.Wcnf, DocFormat.Opb).contains(format),
    s"extract_features supports cnf|wcnf|opb, got $format")

  override def dataType: StructType = format match {
    case DocFormat.Cnf => FeatureSchemas.cnf
    case DocFormat.Wcnf => FeatureSchemas.wcnf
    case _ => FeatureSchemas.opb
  }

  override def prettyName: String = s"${format}_features"

  protected override def nullSafeEval(input: Any): Any = {
    val buf = docBytes(input)
    try {
      val values = format match {
        case DocFormat.Cnf => CnfBase.extract(buf)
        case DocFormat.Wcnf => WcnfBase.extract(buf)
        case _ => OpbBase.extract(buf)
      }
      // non-copying wrap: fromSeq(array) would defensively copy the 58-79
      // element feature vector ONCE PER ROW through the implicit conversion
      InternalRow.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(values))
    } catch {
      case _: DocParseException => null
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ExtractFeatures =
    copy(child = newChild)
}

object CnfExtract {
  /** Default per-document byte budget (the reference's per-call
    * ResourceLimits contract, /root/reference/src/util/ResourceLimits.h:
    * time/memory budgets per extraction → structured `timeout|memout`
    * outcome at Main.cc:177-191. Here the budget is a DETERMINISTIC byte
    * cap — the kernels are linear in input bytes, so capping bytes caps
    * both work and memory, and unlike a wall-clock kill the outcome is
    * identical on every rerun, which the resume checksums require).
    */
  val DefaultMaxBytes: Int = 64 << 20

  /** Default per-document op budget (clause-literal visits — the unit the
    * feature kernels loop over; see [[graft.core.KernelBudget]]). The
    * deterministic TIME-limit analog of ResourceLimits.h next to the byte
    * (memory) cap above: bytes bound allocation, ops bound work, and the
    * two bind independently — a comment-heavy doc is byte-big but op-small,
    * a dense single-digit-literal doc is op-big at few bytes. 1<<26 is ~2s
    * of kernel work per document; the sf corpora use a few thousand ops.
    */
  val DefaultMaxOps: Long = 1L << 26

  val schema: StructType = StructType(Seq(
    StructField("instance_id", StringType, nullable = true),
    StructField("features", FeatureSchemas.cnf, nullable = true),
    StructField("parse_ok", org.apache.spark.sql.types.BooleanType, nullable = false),
    StructField("limited", org.apache.spark.sql.types.BooleanType, nullable = false),
    StructField("timed_out", org.apache.spark.sql.types.BooleanType, nullable = false),
    StructField("decode_failed", org.apache.spark.sql.types.BooleanType, nullable = false)))
}

/** Fused identity + features: one evaluation computes gbd_hash and the full
  * base-feature vector over the same in-memory buffer (one UTF8String fetch,
  * two byte-local scans) — the per-row hot path of FeatureJob. Never null:
  * a malformed doc yields (null, null, parse_ok=false, ...), a doc over the
  * byte budget yields limited=true, and a doc over the op budget (total
  * literal count — the exact work unit of the linear feature loops, known
  * after the parse) yields timed_out=true, so the status column needs no
  * second evaluation and one pathological page cannot stall a stage at
  * 10^12-doc scale. Both budgets are deterministic: the same doc gets the
  * same outcome on every executor and every retry (resume-checksum safe).
  *
  * `codec` (default "none") fuses compressed-payload ingestion BELOW the
  * parse: the payload decompresses, parses, hashes, and featurizes in ONE
  * expression evaluation — the Spark analog of the reference's streaming
  * decompressing parse (StreamBuffer.h:106-124), with no decompressed
  * intermediate column ever materialized (and so never shuffled or
  * double-evaluated by projection collapse). A corrupt stream or a blob
  * over the decompressed-size budget yields decode_failed=true — a row
  * outcome, never a task failure. The byte budget applies to the
  * COMPRESSED size first (cheap reject before any inflate work) and the
  * decompressed size second (zip-bomb guard).
  */
case class CnfExtract(child: Expression, maxBytes: Int = CnfExtract.DefaultMaxBytes,
                      maxOps: Long = CnfExtract.DefaultMaxOps,
                      codec: String = Compression.None)
    extends DocKernelExpression {
  require(Compression.codecs.contains(codec), s"unknown codec $codec")
  override def nullable: Boolean = false
  override def dataType: StructType = CnfExtract.schema
  override def prettyName: String = "cnf_extract"
  protected override def nullSafeEval(input: Any): Any = {
    val raw = docBytes(input)
    if (raw.length > maxBytes) InternalRow(null, null, false, true, false, false)
    else {
      val buf =
        if (codec == Compression.None) raw
        else try Compression.decompress(raw, codec, maxBytes)
        catch { case _: DocParseException =>
          return InternalRow(null, null, false, false, false, true)
        }
      if (buf.length > maxBytes) InternalRow(null, null, false, true, false, false)
      else try {
        // parse once; the literal count IS the op count of the linear kernel
        // loops that follow, so the time budget is checked before any of them
        val doc = ClauseDoc.parse(buf)
        if (doc.lits.length.toLong > maxOps) InternalRow(null, null, true, false, true, false)
        else {
          val hash = Dimacs.gbdHashCnf(buf)
          val features = CnfBase.extract(doc)
          InternalRow(UTF8String.fromString(hash),
            InternalRow.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(features)),
            true, false, false, false)
        }
      } catch {
        case _: DocParseException => InternalRow(null, null, false, false, false, false)
      }
    }
  }
  override def evalKernelNullable(value: Any): Any =
    if (value == null) InternalRow(null, null, false, false, false, false)
    else nullSafeEval(value)
  override def eval(input: InternalRow): Any = evalKernelNullable(child.eval(input))
  override protected def withNewChildInternal(newChild: Expression): CnfExtract =
    copy(child = newChild)
}

/** Gate-structure features (GateAnalyzer; see graft.core.Gates scope note). */
case class GateFeaturesExpr(child: Expression, maxOps: Long = KernelBudget.Unlimited)
    extends DocKernelExpression {
  override def dataType: StructType = FeatureSchemas.gates
  override def prettyName: String = "cnf_gate_features"
  protected override def nullSafeEval(input: Any): Any = {
    val buf = docBytes(input)
    try InternalRow.fromSeq(
      scala.collection.immutable.ArraySeq.unsafeWrapArray(Gates.extract(buf, maxOps)))
    catch {
      case _: DocParseException => null
      // resource envelope: a doc whose semantic gate checks blow the solver
      // budget — or whose blocked-set structure blows the op budget —
      // yields null features instead of stalling the task
      case _: graft.core.Sat.BudgetExceeded => null
      case _: KernelBudget.KernelTimeout => null
    }
  }
  override protected def withNewChildInternal(newChild: Expression): GateFeaturesExpr =
    copy(child = newChild)
}

object GateExtract {
  /** Default gate-analysis op budget. The gate analyzer is the one
    * SUPER-linear kernel (blocked-set checks multiply occurrence-list
    * sizes), so unlike the linear kernels its op count cannot be read off
    * the parse — it is charged online ([[graft.core.KernelBudget]]).
    */
  val DefaultMaxOps: Long = 1L << 26

  val schema: StructType = StructType(Seq(
    StructField("features", FeatureSchemas.gates, nullable = true),
    StructField("status", StringType, nullable = false)))
}

/** Gate features with the full structured outcome channel
  * (ok | parse_error | timeout | null_text) — the reference's per-call
  * ResourceLimits contract (Main.cc:177-191) for the analyzer whose work is
  * super-linear in the document. The solver's conflict budget and the
  * analyzer's op budget both surface as `timeout`; never null, never a
  * task failure.
  */
case class GateExtract(child: Expression, maxOps: Long = GateExtract.DefaultMaxOps)
    extends DocKernelExpression {
  override def nullable: Boolean = false
  override def dataType: StructType = GateExtract.schema
  override def prettyName: String = "cnf_gate_extract"
  protected override def nullSafeEval(input: Any): Any = {
    val buf = docBytes(input)
    try InternalRow(
      InternalRow.fromSeq(
        scala.collection.immutable.ArraySeq.unsafeWrapArray(Gates.extract(buf, maxOps))),
      UTF8String.fromString("ok"))
    catch {
      case _: DocParseException => InternalRow(null, UTF8String.fromString("parse_error"))
      case _: graft.core.Sat.BudgetExceeded => InternalRow(null, UTF8String.fromString("timeout"))
      case _: KernelBudget.KernelTimeout => InternalRow(null, UTF8String.fromString("timeout"))
    }
  }
  override def evalKernelNullable(value: Any): Any =
    if (value == null) InternalRow(null, UTF8String.fromString("null_text"))
    else nullSafeEval(value)
  override def eval(input: InternalRow): Any = evalKernelNullable(child.eval(input))
  override protected def withNewChildInternal(newChild: Expression): GateExtract =
    copy(child = newChild)
}

/** cnf2kis transform: derived k-independent-set document + metadata
  * (/root/reference/src/transform/cnf2kis.h:17-96).
  */
case class KisTransform(child: Expression) extends DocKernelExpression {
  override def dataType: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("nodes", LongType, nullable = false),
    StructField("edges", LongType, nullable = false),
    StructField("k", LongType, nullable = false)))
  override def prettyName: String = "kis_transform"
  protected override def nullSafeEval(input: Any): Any = {
    val buf = docBytes(input)
    try {
      val k = Transforms.cnf2kis(buf)
      InternalRow(UTF8String.fromString(k.text), k.nodes, k.edges, k.k)
    } catch { case _: DocParseException => null }
  }
  override protected def withNewChildInternal(newChild: Expression): KisTransform =
    copy(child = newChild)
}

/** cnf2bip transform: directed bipartite incidence graph document
  * (/root/reference/src/transform/cnf2bip.cc:10-36).
  */
case class BipTransform(child: Expression) extends DocKernelExpression {
  override def dataType: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("nodes", LongType, nullable = false),
    StructField("edges", LongType, nullable = false)))
  override def prettyName: String = "bip_transform"
  protected override def nullSafeEval(input: Any): Any = {
    val buf = docBytes(input)
    try {
      val b = Transforms.cnf2bip(buf)
      InternalRow(UTF8String.fromString(b.text), b.nodes, b.edges)
    } catch { case _: DocParseException => null }
  }
  override protected def withNewChildInternal(newChild: Expression): BipTransform =
    copy(child = newChild)
}

/** Decompress a compressed payload column (xz/gzip/bzip2/zstd, or
  * magic-byte auto-detection — the Spark analog of the reference's
  * libarchive filter-all ingestion, /root/reference/src/util/StreamBuffer.h:
  * 106-124; see graft.core.Compression). Fuses below the hash/feature
  * kernels: `gbd_hash(decompress_auto(payload))` evaluates both in one
  * narrow projection over the scan, so compressed corpora never
  * materialize a decompressed intermediate column. Corrupt streams and
  * budget violations null the row (status channel), never the task.
  */
case class Decompress(child: Expression, codec: String = Compression.Auto,
                      maxBytes: Int = Compression.DefaultMaxBytes)
    extends DocKernelExpression {
  require(Compression.codecs.contains(codec), s"unknown codec $codec")
  override def dataType: DataType = BinaryType
  override def prettyName: String = s"decompress_$codec"
  protected override def nullSafeEval(input: Any): Any =
    try Compression.decompress(docBytes(input), codec, maxBytes)
    catch { case _: DocParseException => null }
  override protected def withNewChildInternal(newChild: Expression): Decompress =
    copy(child = newChild)
}

/** Data-quality scan (/root/reference/src/extract/CNFSaniCheck.cc). */
case class SaniCheckExpr(child: Expression) extends DocKernelExpression {
  override def dataType: StructType = FeatureSchemas.sani
  override def prettyName: String = "cnf_sanicheck"

  protected override def nullSafeEval(input: Any): Any = {
    val buf = docBytes(input)
    try {
      val r = Dimacs.saniCheck(buf, sanitize = true)
      @inline def b(x: Boolean): Double = if (x) 1.0 else 0.0
      InternalRow.fromSeq(Seq[Double](
        r.headVars.toDouble, r.headClauses.toDouble, r.normVars.toDouble, r.normClauses.toDouble,
        b(r.whitespaceNormalised), b(r.hasComment),
        r.saniVars.toDouble, r.saniClauses.toDouble,
        b(r.hasTautologicalClause), b(r.hasDuplicateLiterals), b(r.hasEmptyClause)))
    } catch {
      case _: DocParseException => null
    }
  }

  override protected def withNewChildInternal(newChild: Expression): SaniCheckExpr =
    copy(child = newChild)
}

/** Raw clause structure as array<array<int>> for relational exploration
  * (explode/HOF pipelines); the fused expressions above are the hot path.
  */
case class ParseClauses(child: Expression) extends DocKernelExpression {
  override def dataType: DataType = ArrayType(ArrayType(IntegerType, containsNull = false), containsNull = false)
  override def prettyName: String = "cnf_clauses"

  protected override def nullSafeEval(input: Any): Any = {
    val buf = docBytes(input)
    try {
      val doc = ClauseDoc.parse(buf)
      val clauses = new Array[AnyRef](doc.nClauses)
      var c = 0
      while (c < doc.nClauses) {
        val s = doc.clauseStart(c)
        val e = doc.clauseEnd(c)
        clauses(c) = new GenericArrayData(java.util.Arrays.copyOfRange(doc.lits, s, e))
        c += 1
      }
      new GenericArrayData(clauses)
    } catch {
      case _: DocParseException => null
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ParseClauses =
    copy(child = newChild)
}
