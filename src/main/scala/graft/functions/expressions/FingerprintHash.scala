package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native rolling polynomial fingerprint over a string's character
  * stream: acc := (acc·31 + codePoint) mod 1e9+7, seeded at 7.
  *
  * Why a custom Catalyst expression (the VecDot rationale applied to
  * the fingerprint path): the composable form
  * `aggregate(split(text, ''), 7L, (acc, c) -> (acc*31 + ascii(c)) %
  * 1000000007)` materializes one UTF8String PER CHARACTER plus the
  * ArrayData holding them (~8–16× the text size, transiently, per
  * row) and evaluates interpreted lambdas per element. This
  * expression decodes the string once and folds in a tight primitive
  * loop inside whole-stage codegen — the allocation the round-4
  * audit flagged on the corpus-wide fingerprint path
  * (`text_fingerprint`, `dedup_exact_fingerprint`).
  *
  * Semantics are IDENTICAL to the composable form (spec-asserted over
  * the full corpus and non-ASCII samples): Java's empty-regex split
  * yields one element per CODE POINT (surrogate pairs stay whole) and
  * `ascii` returns the first code point, so the fold steps by
  * `codePointAt`; the empty string is one empty-string element under
  * split and `ascii('') = 0`, hence the explicit (7·31 + 0) mod p
  * step. The DuckDB oracle's `list_reduce(string_split(...))` mirror
  * computes the same fold.
  */
case class FingerprintHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"fingerprint_hash needs a string input, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // split('') on '' yields [''] and ascii('') = 0: one fold step.
    if (s.isEmpty) (7L * 31L) % 1000000007L
    else {
      var acc = 7L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        acc = (acc * 31L + cp) % 1000000007L
        i += Character.charCount(cp)
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val acc = ctx.freshName("acc")
      s"""
         |java.lang.String $str = $c.toString();
         |long $acc = 7L;
         |if ($str.isEmpty()) {
         |  $acc = (7L * 31L) % 1000000007L;
         |} else {
         |  for (int $i = 0; $i < $str.length(); ) {
         |    int $cp = $str.codePointAt($i);
         |    $acc = ($acc * 31L + (long) $cp) % 1000000007L;
         |    $i += java.lang.Character.charCount($cp);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): FingerprintHash = copy(child = newChild)

  override def prettyName: String = "fingerprint_hash"
}
