package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit rolling polynomial hash with a splitmix64
  * finalizer over a string column — the shingling/fingerprinting primitive of
  * the dedup operators (same function as Dedup.polyHash, kept in lockstep by
  * DatapipeSpec).
  *
  * A real `doGenCode` (not CodegenFallback): the generated code is a single
  * static call, so the expression stays inside whole-stage codegen with zero
  * boxing — measurably cheaper than a Scala UDF in a 100 TB scan where the
  * hash runs per row. SURVEY §7.4 names this the preferred extension order:
  * built-in < native Expression < UDF.
  */
case class PolyHash64(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"polyhash64 requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "polyhash64"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash64 =
    copy(child = newChild)
}

object PolyHash64 {
  /** Static entry point shared by interpreted eval and generated code. */
  def hash(s: UTF8String): Long = hashString(s.toString)

  /** Folds over Unicode CODE POINTS (not UTF-16 code units): the DuckDB
    * replay iterates `unicode(c)` per regex '.' match, which is one code
    * point — surrogate-pair folding would diverge on any astral character.
    * Identical to the old char fold for BMP text. */
  def hashString(s: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = 31 * h + cp
      i += Character.charCount(cp)
    }
    var z = h + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Column-level entry point (classic-API bridge Column↔Expression). */
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.column(
      PolyHash64(org.apache.spark.sql.GraftBridge.expression(c)))
}
