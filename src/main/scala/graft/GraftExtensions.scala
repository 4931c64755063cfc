package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import graft.functions.MsgPackExpressions

/** Session extension wiring for the engine's custom expressions — the
  * idiomatic registration point (`spark.sql.extensions=graft.GraftExtensions`)
  * so `from_msgpack` / `to_msgpack` are plain SQL functions available to
  * `expr(...)` and `spark.sql(...)` alike.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension (SURVEY preference tier c): the native
    // backward as-of join — LogicalPlan + Strategy + SparkPlan
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("to_msgpack"),
      MsgPackExpressions.info("to_msgpack", "to_msgpack(value) - encode value as MessagePack bytes"),
      MsgPackExpressions.toMsgPackBuilder _))
    ext.injectFunction((
      FunctionIdentifier("from_msgpack"),
      MsgPackExpressions.info("from_msgpack", "from_msgpack(bin, ddl) - decode MessagePack bytes as the DDL type"),
      MsgPackExpressions.fromMsgPackBuilder _))
    ext.injectFunction((
      FunctionIdentifier("hash60"),
      MsgPackExpressions.info("hash60", "hash60(str) - 60-bit md5-derived content hash (codegen)"),
      { args: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        require(args.length == 1, "hash60(str)")
        graft.functions.Hash60(args.head)
      }))
  }
}
