package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two numeric array columns, double
  * accumulation in element order.
  *
  * Why a custom Catalyst expression (SURVEY.md §4 allows exactly this
  * escape hatch for perf): the composable form
  * `aggregate(zip_with(a, b, (x, y) -> x*y), 0D, +)` allocates an
  * intermediate array and evaluates interpreted lambdas per element —
  * ~100× slower inside an O(n²) similarity join, which made the
  * brute-force cosine ops dominate the whole bench. This expression
  * generates a tight primitive loop over `ArrayData` (no allocation,
  * no boxing) and participates in whole-stage codegen.
  *
  * Semantics are IDENTICAL to the composable form: (double)a[i] *
  * (double)b[i], summed left-to-right — so results stay bit-equal to
  * both the HOF version and DuckDB's `CAST(… AS DOUBLE[])` folds, and
  * 4-dp rounds remain hash-stable. Arrays shorter than the other side
  * dot over the common prefix. A null ARRAY yields null (standard
  * null-safe binary semantics); null ELEMENTS are NOT checked — they
  * read as garbage primitives, so inputs must carry none (true of
  * every fixture column and of `transform` outputs over them; a
  * containsNull rejection here would break those plans for no
  * data-level gain).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot needs array<float|double> inputs, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val leftIsFloat = elemType(left) == FloatType
    val rightIsFloat = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (leftIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightIsFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val getL =
      if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val getR =
      if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.$getL($i) * (double) $b.$getR($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}
