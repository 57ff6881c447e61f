package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All hyperplane-LSH table codes of one vector in one pass:
  * `first` = the embedding (array<float|double>), `second` = the
  * FOLDABLE flattened plane matrix (tables·bits·dim doubles, plane
  * (t, b) at offset (t·bits + b)·dim), `third` = the foldable int
  * pair [tables, bits]. Returns array<bigint> of length `tables`;
  * bit b of element t is set iff embedding · plane(t, b) >= 0.
  *
  * Why a custom Catalyst expression (the [[RayCast]] rationale): the
  * signature matrix needs tables·bits dot products per vector. The
  * crossJoin-against-a-plane-table form materializes that many rows
  * per vector, each carrying the 64-float embedding, then pays a
  * hash aggregate plus a re-attach join; a single Project of
  * tables·bits `vec_dot(embedding, lit(coefs))` terms (round 9's
  * first attempt) is semantically right but exceeds the whole-stage
  * codegen method budget at 32×7 terms, and interpreted fallback ran
  * ~3× SLOWER than the crossJoin. This expression hoists the planes
  * into one JVM-final double[] shared by the stage and generates a
  * primitive triple loop that codegens as a single method call —
  * no row expansion, no aggregate, no join, no giant tree.
  *
  * Semantics are IDENTICAL to the vec_dot fold (spec-asserted in
  * LshSignatureSpec against the composable form): double
  * accumulation in element order per plane, sign test `>= 0`, bit b
  * weighted 1L << b — so bucket codes, candidates, and the
  * oracle-checked dedup_embed_ann output are unchanged. */
case class LshSignature(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (first.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }) && (second.dataType match {
      case ArrayType(DoubleType, _) => second.foldable
      case _                        => false
    }) && (third.dataType match {
      case ArrayType(IntegerType, _) => third.foldable
      case _                         => false
    })
    if (ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "lsh_signature needs (array<float|double> embedding, foldable" +
          " array<double> planes, foldable array<int> [tables, bits])," +
          s" got ${first.dataType.sql}, ${second.dataType.sql}," +
          s" ${third.dataType.sql}")
  }

  // Foldable by contract: evaluate once, share across the stage.
  @transient private lazy val planeArr: Array[Double] =
    second.eval(null).asInstanceOf[ArrayData].toDoubleArray()
  @transient private lazy val shape: (Int, Int) = {
    val s = third.eval(null).asInstanceOf[ArrayData].toIntArray()
    require(s.length == 2 && s(0) > 0 && s(1) > 0 && s(1) <= 63,
      s"lsh_signature shape must be [tables>0, 0<bits<=63], got " +
        s.mkString("[", ",", "]"))
    require(planeArr.length % (s(0) * s(1)) == 0,
      s"plane matrix length ${planeArr.length} not divisible by " +
        s"tables*bits = ${s(0) * s(1)}")
    (s(0), s(1))
  }

  private def leftIsFloat = first.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override protected def nullSafeEval(emb: Any, p: Any, sh: Any): Any = {
    val a = emb.asInstanceOf[ArrayData]
    val (tables, bits) = shape
    val dim = planeArr.length / (tables * bits)
    val n = math.min(a.numElements(), dim)
    val isF = leftIsFloat
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var code = 0L
      var b = 0
      while (b < bits) {
        val off = (t * bits + b) * dim
        var acc = 0.0
        var k = 0
        while (k < n) {
          val x = if (isF) a.getFloat(k).toDouble else a.getDouble(k)
          acc += x * planeArr(off + k)
          k += 1
        }
        if (acc >= 0) code |= (1L << b)
        b += 1
      }
      out(t) = code
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val (tables, bits) = shape
    val dim = planeArr.length / (tables * bits)
    val planes = ctx.addReferenceObj("lshPlanes", planeArr, "double[]")
    val getter = if (leftIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (emb, _, _) => {
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val code = ctx.freshName("code")
      val off = ctx.freshName("off")
      s"""
         |long[] $out = new long[$tables];
         |int $n = java.lang.Math.min($emb.numElements(), $dim);
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $code = 0L;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    int $off = ($t * $bits + $b) * $dim;
         |    double $acc = 0.0;
         |    for (int $k = 0; $k < $n; $k++) {
         |      $acc += (double) $emb.$getter($k) * $planes[$off + $k];
         |    }
         |    if ($acc >= 0) $code |= (1L << $b);
         |  }
         |  $out[$t] = $code;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): LshSignature =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "lsh_signature"
}
