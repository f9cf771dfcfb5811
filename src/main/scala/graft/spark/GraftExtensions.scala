package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns — a real Catalyst
  * `Expression` with `doGenCode`, the escalation rung between built-in
  * functions and a Scala UDF (SURVEY.md §7.3). The declarative
  * formulation `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is semantically
  * right but higher-order functions are INTERPRETED (a lambda eval +
  * boxing per element); this expression runs the same ascending-index
  * multiply-add loop inside whole-stage codegen.
  *
  * Semantics mirror the HOF composition EXACTLY so the rewrite rule below
  * is a pure optimization: zip_with pads the shorter array with null,
  * null×x = null, and sum-with-null sticks at null — so unequal lengths
  * or any null element yield NULL, same as the HOF chain. The summation
  * order is ascending-index, identical to the interpreted path and to
  * DuckDB's sequential `list_dot_product` (IEEE-identical replays — the
  * property every oracle here leans on).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two array<double> inputs, got ${left.dataType} and ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  // null even for non-null children: unequal lengths / null elements
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (x.numElements() != y.numElements()) return null
    var s = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: recognize the declarative HOF dot-product composition
  *   aggregate(zip_with(a, b, (x, y) => x * y), 0.0d, (acc, v) => acc + v)
  * and substitute [[DotProduct]]. Queries keep their DataFrame-idiomatic
  * formulation ([[graft.Queries.e1_cosine_topk]] is written exactly this
  * way) and Catalyst swaps in the codegen'd loop — the canonical "let the
  * optimizer do it" shape for a custom operator. A non-matching tree is
  * left untouched, so the rule can only accelerate, never change results
  * ([[DotProduct]] reproduces the HOF null/length semantics bit-for-bit).
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case x: NamedLambdaVariable => x.exprId == v.exprId
    case _ => false
  }

  private def isZeroDouble(e: Expression): Boolean = e match {
    // bit-exact +0.0 only: a -0.0 seed matches 0.0 under ==, but the HOF
    // chain returns -0.0 for an empty array where DotProduct returns 0.0
    case Literal(v: Double, DoubleType) => java.lang.Double.doubleToRawLongBits(v) == 0L
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b, LambdaFunction(Multiply(ml, mr, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        zero,
        LambdaFunction(Add(al, ar, _), Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
        finish)
      if isZeroDouble(zero) &&
        ((sameVar(ml, x) && sameVar(mr, y)) || (sameVar(ml, y) && sameVar(mr, x))) &&
        ((sameVar(al, acc) && sameVar(ar, v)) || (sameVar(al, v) && sameVar(ar, acc))) &&
        (finish match {
          case LambdaFunction(f: NamedLambdaVariable, Seq(p: NamedLambdaVariable), _) => f.exprId == p.exprId
          case _ => false
        }) &&
        a.dataType.isInstanceOf[ArrayType] &&
        a.dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
        b.dataType.isInstanceOf[ArrayType] &&
        b.dataType.asInstanceOf[ArrayType].elementType == DoubleType =>
      DotProduct(a, b)
  }
}

/** Engine extensions, registered via `spark.sql.extensions=
  * graft.spark.GraftExtensions` (config-based — works for spark-submit
  * clusters and embedded sessions alike):
  *   - `graft_dot(a, b)` SQL function backed by the codegen'd
  *     [[DotProduct]];
  *   - [[RewriteHofDotProduct]] in the optimizer, so declarative HOF dot
  *     products compile to the native loop automatically.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot(a, b) takes exactly two arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
  }
}
