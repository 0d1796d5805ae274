package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.DataType

/** Codegen adapters for heavyweight kernel expressions (round-5 verdict
  * item 2). A `CodegenFallback` expression makes its WHOLE operator
  * codegen-unsupported — `CollapseCodegenStages` refuses the stage, so
  * every co-resident expression (hashes, struct assembly, filters) drops to
  * interpreted row-at-a-time eval, not just the kernel. These kernels run
  * hundreds of ops per row, so generating their BODY buys nothing — but the
  * call must not sever the stage. These traits generate exactly the
  * interpreted call (the expression itself rides the references array and
  * is invoked through `evalKernelNullable`) while keeping the operator
  * whole-stage-codegen'd.
  */
private[functions] object KernelCodegen {
  /** Java expression for the child's value boxed to Object (null when the
    * child is null) — explicit boxing, no reliance on Janino autoboxing.
    */
  def boxedOrNull(dt: DataType, gen: ExprCode): String = {
    val jt = CodeGenerator.javaType(dt)
    val bt = CodeGenerator.boxedType(dt)
    val v = if (jt == bt) s"(Object) ${gen.value}" else s"(Object) $bt.valueOf(${gen.value})"
    s"(${gen.isNull} ? null : $v)"
  }

  /** Java statement assigning Object `tmp` (non-null) into ev.value. */
  def assignFromObject(dt: DataType, ev: ExprCode, tmp: String): String = {
    val jt = CodeGenerator.javaType(dt)
    val bt = CodeGenerator.boxedType(dt)
    if (jt == bt) s"${ev.value} = ($bt) $tmp;"
    else s"${ev.value} = (($bt) $tmp).${jt}Value();"
  }
}

/** Unary form. Null semantics are owned by [[evalKernelNullable]] — the
  * default matches `UnaryExpression.eval` (null in, null out); expressions
  * that map a null child to a sentinel row (CnfExtract, GateExtract)
  * override it, and their `eval` delegates to it so the interpreted and
  * generated paths share one definition.
  */
trait KernelCallCodegen extends UnaryExpression {
  /** Full eval semantics given the (possibly null) child value. */
  def evalKernelNullable(input: Any): Any =
    if (input == null) null else nullSafeEval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("kernelExpr", this)
    val childGen = child.genCode(ctx)
    val jt = CodeGenerator.javaType(dataType)
    val tmp = ctx.freshName("kernelOut")
    val resultCode =
      code"""
        ${childGen.code}
        Object $tmp = $self.evalKernelNullable(
          ${KernelCodegen.boxedOrNull(child.dataType, childGen)});
        boolean ${ev.isNull} = $tmp == null;
        $jt ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
        if (!${ev.isNull}) { ${KernelCodegen.assignFromObject(dataType, ev, tmp)} }
      """
    ev.copy(code = resultCode)
  }
}

/** Binary form; default `BinaryExpression.eval` null semantics (any null
  * child → null result).
  */
trait KernelCallCodegen2 extends BinaryExpression {
  /** Full eval semantics given the (possibly null) child values. */
  def evalKernelNullable(a: Any, b: Any): Any =
    if (a == null || b == null) null else nullSafeEval(a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("kernelExpr", this)
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val jt = CodeGenerator.javaType(dataType)
    val tmp = ctx.freshName("kernelOut")
    val resultCode =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        Object $tmp = $self.evalKernelNullable(
          ${KernelCodegen.boxedOrNull(left.dataType, leftGen)},
          ${KernelCodegen.boxedOrNull(right.dataType, rightGen)});
        boolean ${ev.isNull} = $tmp == null;
        $jt ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
        if (!${ev.isNull}) { ${KernelCodegen.assignFromObject(dataType, ev, tmp)} }
      """
    ev.copy(code = resultCode)
  }
}
