package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit tf-weighted SimHash of a text's whitespace token stream in
  * ONE pass over the UTF-8 bytes: every token contributes +1 to bit
  * accumulator b when bit b of `xxhash64(token)` (seed 42 — Spark's
  * own) is set, −1 otherwise; signature bit b is set iff the
  * accumulator ends strictly positive.
  *
  * Why a custom Catalyst expression (the [[CharNgrams]] rationale):
  * the composable form explodes every token into a row, aggregates
  * (doc, term) counts, and folds 64 per-bit weighted sums as agg
  * columns — two shuffled aggregates and a corpus-sized token
  * exchange for what is a PER-ROW computation (summing ±1 per
  * OCCURRENCE equals summing tf·±1 per distinct term). This
  * expression tokenizes the byte stream in place (0x20 never occurs
  * inside a multi-byte UTF-8 sequence, so byte scanning is
  * character-safe), hashes each token slice directly from the
  * backing buffer via the same static XXH64 kernel Spark's
  * `xxhash64` uses, and never allocates a token object.
  *
  * Semantics are IDENTICAL to the composable form (spec-asserted
  * over the corpus + edge strings): Spark's `split(text, ' ')` keeps
  * empty tokens (consecutive / leading / trailing separators and the
  * empty string), so the tokenizer here emits one token per
  * separator gap INCLUDING empty ones, and `xxhash64('')` is a real
  * hash that weighs like any other token. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"simhash64 needs a string input, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.expressions.SimHash64.compute($c);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): SimHash64 = copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  private val Seed = 42L

  /** One-pass SimHash kernel; static so generated code can call it. */
  def compute(s: UTF8String): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes
    val acc = new Array[Int](64)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || Platform.getByte(base, off + i) == 0x20) {
        val h = XXH64.hashUnsafeBytes(base, off + start, i - start, Seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
