package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity between two `array<float>` columns — the
  * ANN/near-dup scorer primitive (SURVEY §7.4 extension order: built-in <
  * native Expression < UDF). One static call inside whole-stage codegen, no
  * per-row lambda allocation — measurably cheaper than the zip_with+aggregate
  * higher-order-function formulation on an n² candidate join.
  *
  * Accumulation order matches the HOF version exactly (sequential
  * float→double), so results are bit-identical — DuckDB's
  * list_cosine_similarity oracle keeps matching.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<float> arguments, got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CosineSim.cosine($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Static entry point shared by interpreted eval and generated code.
    *
    * Degenerate-input contract (documented, deliberate):
    *  - a null ELEMENT contributes 0.0 (ArrayData.getFloat on a null slot is
    *    undefined, so elements are null-checked; parquet array schemas are
    *    routinely containsNull=true even for dense data);
    *  - mismatched lengths: dot over the common prefix, norms over each full
    *    array (mirrors the zip_with/aggregate HOF baseline);
    *  - a zero-norm vector yields NaN (0/0), matching the HOF baseline and
    *    DuckDB's list_cosine_similarity — callers ordering by cosine must
    *    filter empty/zero vectors upstream rather than rely on NaN placement.
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0 else a.getFloat(i).toDouble
      val y = if (b.isNullAt(i)) 0.0 else b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    // full norms even if lengths differ (mirrors the HOF version)
    var j = n
    while (j < a.numElements()) { val x = if (a.isNullAt(j)) 0.0 else a.getFloat(j).toDouble; na += x * x; j += 1 }
    j = n
    while (j < b.numElements()) { val y = if (b.isNullAt(j)) 0.0 else b.getFloat(j).toDouble; nb += y * y; j += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def apply(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.column(
      CosineSim(org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))
}
