package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.model.Ids

/** Native Catalyst expression for the deterministic content-derived id
  * (uuid3/MD5, reference dd_core/utils/identifier.py:53-77) — SURVEY
  * §4's one optional custom hook, so ids survive in pure-SQL
  * projections without a Scala closure. Codegen-friendly: `doGenCode`
  * emits a direct static call, keeping the expression inside
  * whole-stage codegen instead of falling back to an opaque UDF.
  */
case class Uuid3Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_uuid3"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Ids.uuid3(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.model.Ids.uuid3($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Uuid3Expr =
    copy(child = newChild)
}

object GraftFunctions {
  /** Column-API entry (no registration needed). */
  def uuid3(c: Column): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      Uuid3Expr(org.apache.spark.sql.GraftSqlShim.expression(c)))

  val uuid3Info: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_uuid3"),
    new ExpressionInfo(classOf[Uuid3Expr].getName, "graft_uuid3"),
    (children: Seq[Expression]) => Uuid3Expr(children.head)
  )
}

/** SparkSessionExtensions hook: enable with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), then `graft_uuid3(expr)`
  * is available from SQL text.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftFunctions.uuid3Info)
}
