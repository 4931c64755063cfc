package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `hash60(str)` — the engine's deterministic 60-bit content hash
  * (first 15 hex chars of md5 as a BIGINT; SQL-portable form
  * `conv(substring(md5(x), 1, 15), 16, 10)`), as a native Catalyst
  * expression WITH `doGenCode`: the call inlines into whole-stage codegen
  * instead of breaking the generated pipeline the way a Scala UDF or a
  * CodegenFallback expression would.
  */
case class Hash60(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"hash60 requires STRING, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Hash60.hash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60.hash($c)")
  override protected def withNewChildInternal(newChild: Expression): Hash60 = copy(child = newChild)
  override def prettyName: String = "hash60"
}

object Hash60 {
  /** Static entry point shared by interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    java.nio.ByteBuffer.wrap(md.digest(s.getBytes), 0, 8).getLong >>> 4
  }
}
