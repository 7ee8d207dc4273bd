package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd `might_contain(key)` over a pre-built [[BloomFilter]] — the
  * probe-side primitive of [[graft.operators.BloomJoin]]. The filter rides in
  * the expression as its SERIALIZED bytes (always Java-serializable, ships to
  * executors inside the task binary exactly like Spark's own
  * BloomFilterMightContain ships its scalar-subquery result) and is
  * deserialized once per executor via the lazy transient field; generated
  * code calls a single instance method — no UDF boundary, stays inside
  * whole-stage codegen.
  *
  * Supports long and string keys (the two key shapes the KG pipeline joins
  * on: numeric ids and canonical entity strings). */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a bigint or string key, got ${other.catalogString}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  def testLong(v: Long): Boolean = filter.mightContainLong(v)
  def testString(v: UTF8String): Boolean = filter.mightContainBinary(v.getBytes)

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case LongType => testLong(input.asInstanceOf[Long])
    case StringType => testString(input.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this, classOf[BloomMightContain].getName)
    val call = child.dataType match {
      case LongType => (c: String) => s"$ref.testLong($c)"
      case StringType => (c: String) => s"$ref.testString($c)"
    }
    defineCodeGen(ctx, ev, call)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  def apply(key: org.apache.spark.sql.Column, bloom: BloomFilter): org.apache.spark.sql.Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    org.apache.spark.sql.GraftBridge.column(
      BloomMightContain(org.apache.spark.sql.GraftBridge.expression(key), bos.toByteArray))
  }
}
