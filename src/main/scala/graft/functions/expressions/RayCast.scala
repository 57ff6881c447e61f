package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native even-odd ray cast: is integer point (px, py) inside the
  * polygon whose closed edge list is the FOLDABLE long-array literal
  * `third` (flattened x1,y1,x2,y2 per edge)?
  *
  * Why a custom Catalyst expression (the [[VecDot]] precedent): the
  * composable form — `aggregate` over a literal array of
  * named_structs with a per-edge lambda — allocates the edge array
  * per ROW and evaluates interpreted lambdas per edge; the polygon
  * zone family runs it per (report × candidate zone). This
  * expression hoists the edges into one JVM-final long[] shared by
  * the whole stage and generates a primitive loop that participates
  * in whole-stage codegen.
  *
  * Semantics are IDENTICAL to the HOF form (GeoOps.insideExprHof,
  * kept as the executable spec; GeoOpsSpec proves equality over the
  * complete fixture position orbit): an edge crosses the horizontal
  * ray iff it spans py vertically (strict/non-strict asymmetry makes
  * shared vertices count once) and the cross-product sign matches
  * the edge's y-direction — 64-bit integer arithmetic only, no
  * floats anywhere.
  */
case class RayCast(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = first.dataType == LongType && second.dataType == LongType &&
      (third.dataType match {
        case ArrayType(LongType, _) => true
        case _                      => false
      }) && third.foldable
    if (ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "ray_cast needs (bigint px, bigint py, foldable array<bigint>" +
          s" edges), got ${first.dataType.sql}, ${second.dataType.sql}," +
          s" ${third.dataType.sql}")
  }

  // The edge list is foldable by contract: evaluate ONCE and share
  // the primitive array across every row of the stage.
  @transient private lazy val edgeArr: Array[Long] =
    third.eval(null).asInstanceOf[ArrayData].toLongArray()

  private def insideOf(px: Long, py: Long): Boolean = {
    var cnt = 0
    var i = 0
    while (i < edgeArr.length) {
      val x1 = edgeArr(i); val y1 = edgeArr(i + 1)
      val x2 = edgeArr(i + 2); val y2 = edgeArr(i + 3)
      if (((y1 > py) != (y2 > py)) &&
          ((((x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)) > 0)
            == (y2 > y1))) cnt += 1
      i += 4
    }
    cnt % 2 == 1
  }

  override protected def nullSafeEval(px: Any, py: Any, e: Any): Any =
    insideOf(px.asInstanceOf[Long], py.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("rayEdges", edgeArr, "long[]")
    nullSafeCodeGen(ctx, ev, (px, py, _) => {
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val x1 = ctx.freshName("x1"); val y1 = ctx.freshName("y1")
      val x2 = ctx.freshName("x2"); val y2 = ctx.freshName("y2")
      s"""
         |int $cnt = 0;
         |for (int $i = 0; $i < ${edgeArr.length}; $i += 4) {
         |  long $x1 = $arr[$i];     long $y1 = $arr[$i + 1];
         |  long $x2 = $arr[$i + 2]; long $y2 = $arr[$i + 3];
         |  if ((($y1 > $py) != ($y2 > $py)) &&
         |      (((($x2 - $x1) * ($py - $y1) - ($px - $x1) * ($y2 - $y1))
         |        > 0L) == ($y2 > $y1))) $cnt++;
         |}
         |${ev.value} = ($cnt % 2) == 1;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): RayCast =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "ray_cast"
}
