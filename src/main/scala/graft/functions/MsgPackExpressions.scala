package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `to_msgpack(value)` — encode any struct/map/array/scalar column to
  * MessagePack bytes (the reference's record wire format,
  * `/root/reference/triton/store.go:144-154`). Generates code (the
  * `Hash60` pattern: delegate to the static codec) so encode stays inside
  * whole-stage codegen instead of forcing an interpreted-projection break.
  */
case class ToMsgPack(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(input: Any): Any = MsgPackCodec.encode(input, child.dataType)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dtRef = ctx.addReferenceObj("mpChildType", child.dataType, classOf[DataType].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MsgPackCodec.encode($c, $dtRef);")
  }
  override protected def withNewChildInternal(newChild: Expression): ToMsgPack = copy(child = newChild)
  override def prettyName: String = "to_msgpack"
}

/** `from_msgpack(bin, 'ddl schema')` — decode MessagePack bytes into the
  * given type. PERMISSIVE: corrupt bytes (bad tags, truncation, trailing
  * garbage) decode to null rather than failing the task — the engine's
  * form of the reference's log-and-skip dead-lettering
  * (`/root/reference/triton/stream_reader.go:174-194`); pair with
  * `count(case when decoded is null ...)` for the skip counter.
  * Codegen'd like `ToMsgPack`; decode errors set null inline.
  */
case class FromMsgPack(child: Expression, targetType: DataType)
    extends UnaryExpression {
  override def dataType: DataType = targetType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    try MsgPackCodec.decode(input.asInstanceOf[Array[Byte]], targetType)
    catch { case _: Exception => null }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dtRef = ctx.addReferenceObj("mpType", targetType, classOf[DataType].getName)
    val childGen = child.genCode(ctx)
    val decoded = ctx.freshName("mpDecoded")
    // fresh catch parameter: a literal `e` could shadow an enclosing
    // generated local, which Janino rejects (breaking whole-stage compile)
    val err = ctx.freshName("mpErr")
    val javaType = CodeGenerator.javaType(dataType)
    val boxed = CodeGenerator.boxedType(dataType)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      $javaType ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
      if (!${childGen.isNull}) {
        Object $decoded = null;
        try {
          $decoded = graft.functions.MsgPackCodec.decode(${childGen.value}, $dtRef);
        } catch (Exception $err) {
          $decoded = null;
        }
        if ($decoded != null) {
          ${ev.isNull} = false;
          ${ev.value} = ($boxed) $decoded;
        }
      }""")
  }
  override protected def withNewChildInternal(newChild: Expression): FromMsgPack = copy(child = newChild)
  override def prettyName: String = "from_msgpack"
}

object MsgPackExpressions {
  /** Builder for SQL registration: from_msgpack(bin, 'a INT, b STRING'). */
  def fromMsgPackBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(bin, schema) if schema.foldable =>
      val ddl = schema.eval(null).asInstanceOf[UTF8String].toString
      val dt = try DataType.fromDDL(ddl) catch {
        case _: Exception => DataType.fromJson(ddl)
      }
      FromMsgPack(bin, dt)
    case _ => throw new IllegalArgumentException(
      "from_msgpack(binary, 'ddl schema string literal')")
  }

  def toMsgPackBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(v) => ToMsgPack(v)
    case _ => throw new IllegalArgumentException("to_msgpack(value)")
  }

  def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[ToMsgPack].getName, null, name, usage, "", "", "", "", "", "", "built-in")
}
