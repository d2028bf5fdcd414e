package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two array<double> columns.
  *
  * This is the one place the engine drops below the DataFrame API: the
  * equivalent `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,x) ->
  * acc+x)` is semantically identical but evaluates interpreted lambdas
  * per element — on a pair join that's the hot inner loop (candidate
  * pairs x 64 dims). The generated code is a tight primitive loop inside
  * whole-stage codegen; accumulation order matches the sequential fold,
  * so results stay bit-identical to the HOF formulation and the DuckDB
  * oracle.
  *
  * (Preference order per the build brief: compose built-ins where
  * semantics allow -> custom Expression with doGenCode -> UDF. This is
  * step 2, applied only to the measured hot path.)
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += xs.getDouble(i) * ys.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Idempotently register the engine's native functions (incl.
    * `graft_dot`) in the session registry so SQL-string plans
    * (`selectExpr`) can call them. Single source of truth:
    * [[graft.GraftExtensions.functions]] — the same list the
    * `spark.sql.extensions=graft.GraftExtensions` cluster hook injects. */
  def register(spark: SparkSession): Unit =
    graft.GraftExtensions.register(spark)
}
