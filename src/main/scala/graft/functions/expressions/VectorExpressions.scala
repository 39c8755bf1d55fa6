package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the vector kernels — one tier above the
  * compiled-UDF versions in [[graft.operators.Ann]]: they participate in
  * whole-stage codegen (the generated code calls a static kernel on the
  * unsafe `ArrayData` directly, no UnsafeArrayData→Seq conversion, no
  * per-call encoder work) and are SQL-registrable
  * (see [[graft.GraftExtensions]]).
  */
object VectorKernels {
  /** Left-to-right dot product over float ArrayData, accumulated in double
    * — FP-identical to the DuckDB oracle's `list_sum(list_transform(...))`.
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.numElements(), b.numElements())
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def cosine(a: ArrayData, b: ArrayData): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
}

abstract class VectorBinaryExpression extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float> arguments, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  protected def kernelName: String

  override protected def nullSafeEval(a: Any, b: Any): Any =
    kernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  protected def kernel(a: ArrayData, b: ArrayData): Double

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.VectorKernels.$kernelName($a, $b);")
}

/** `graft_dot(a, b)` — codegen'd float-vector dot product in double. */
case class VectorDot(left: Expression, right: Expression) extends VectorBinaryExpression {
  protected def kernelName: String = "dot"
  protected def kernel(a: ArrayData, b: ArrayData): Double = VectorKernels.dot(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorDot =
    copy(left = l, right = r)
}

/** `graft_cosine(a, b)` — codegen'd cosine similarity. */
case class VectorCosine(left: Expression, right: Expression) extends VectorBinaryExpression {
  protected def kernelName: String = "cosine"
  protected def kernel(a: ArrayData, b: ArrayData): Double = VectorKernels.cosine(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorCosine =
    copy(left = l, right = r)
}
