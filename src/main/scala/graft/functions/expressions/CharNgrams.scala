package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native character n-gram array: all contiguous n-character
  * substrings of `left`, in order, as `array<string>`.
  *
  * Why a custom Catalyst expression (the [[FingerprintHash]]
  * rationale applied to the shingle path): the composable form
  * `transform(sequence(1, length(text) - n + 1), i -> substring(text,
  * i, n))` materializes a boxed index ArrayData per ROW and evaluates
  * an interpreted substring lambda per element, each of which re-walks
  * the string from byte 0 to find its code-point offset — O(L²) byte
  * scanning per document on the corpus-wide trigram path
  * (`text_char_ngrams`, the most expensive non-ANN query in the
  * round-8 bench). This expression walks the UTF-8 byte stream ONCE,
  * records code-point starts, and slices each gram directly from the
  * shared byte array inside whole-stage codegen — O(L) total, no
  * index array, no lambda frames.
  *
  * Semantics are IDENTICAL to the HOF form (spec-asserted over the
  * corpus plus non-ASCII/short/empty edges): Spark's `length` and
  * `substring` both index by CODE POINT, so gram boundaries here are
  * UTF-8 sequence starts (`(b & 0xC0) != 0x80`); strings shorter than
  * n yield an empty array (the HOF's callers filter `length >= n`
  * first — `sequence(1, 0)` would count DOWN, so the twin is only
  * defined on length >= n inputs, which the spec mirrors).
  */
case class CharNgrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = left.dataType.isInstanceOf[StringType] &&
      right.dataType == IntegerType && right.foldable
    if (ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "char_ngrams needs (string text, foldable int n), got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  // n is foldable by contract: evaluate once, share across the stage.
  @transient private lazy val n: Int = {
    val v = right.eval(null).asInstanceOf[Int]
    require(v >= 1, s"char_ngrams n must be >= 1, got $v")
    v
  }

  override protected def nullSafeEval(text: Any, nAny: Any): Any = {
    val bytes = text.asInstanceOf[UTF8String].getBytes
    val bLen = bytes.length
    val starts = new Array[Int](bLen + 1)
    var nChars = 0
    var i = 0
    while (i < bLen) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(nChars) = i; nChars += 1 }
      i += 1
    }
    starts(nChars) = bLen
    val cnt = math.max(nChars - n + 1, 0)
    val grams = new Array[AnyRef](cnt)
    var g = 0
    while (g < cnt) {
      grams(g) = UTF8String.fromBytes(
        bytes, starts(g), starts(g + n) - starts(g))
      g += 1
    }
    new GenericArrayData(grams)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (text, _) => {
      val bytes = ctx.freshName("bytes")
      val bLen = ctx.freshName("bLen")
      val starts = ctx.freshName("starts")
      val nChars = ctx.freshName("nChars")
      val cnt = ctx.freshName("cnt")
      val grams = ctx.freshName("grams")
      val i = ctx.freshName("i")
      val g = ctx.freshName("g")
      val utf8 = "org.apache.spark.unsafe.types.UTF8String"
      s"""
         |byte[] $bytes = $text.getBytes();
         |int $bLen = $bytes.length;
         |int[] $starts = new int[$bLen + 1];
         |int $nChars = 0;
         |for (int $i = 0; $i < $bLen; $i++) {
         |  if (($bytes[$i] & 0xC0) != 0x80) { $starts[$nChars++] = $i; }
         |}
         |$starts[$nChars] = $bLen;
         |int $cnt = $nChars - $n + 1; if ($cnt < 0) $cnt = 0;
         |$utf8[] $grams = new $utf8[$cnt];
         |for (int $g = 0; $g < $cnt; $g++) {
         |  $grams[$g] = $utf8.fromBytes(
         |    $bytes, $starts[$g], $starts[$g + $n] - $starts[$g]);
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($grams);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CharNgrams =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "char_ngrams"
}
