package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for the minhash affine-hash reduction
  * `(h·a + b) mod P` with P = 2^31 − 1, computed WITHOUT a 64-bit
  * division via the Mersenne identity 2^31 ≡ 1 (mod P): two shift-add
  * folds bring the value below P + 2, one conditional subtract
  * finishes.
  *
  * Why an expression and not `Column` composition: the fold's chain
  * (x → y → z → conditional subtract) references each intermediate
  * two or three times, and Catalyst codegen inlines a copy of the
  * whole subtree at every reference — the composed version evaluated
  * the multiply chain up to 12× per hash and measured ~2× SLOWER than
  * the `pmod` it replaced (SCALING.md round-13). `doGenCode` here
  * emits each intermediate as a LOCAL VARIABLE, computed once, so the
  * per-hash cost is ~8 ALU ops in place of an `lrem` — and the
  * expression stays inside whole-stage codegen, fused with the
  * signature aggregation's 128 MIN updates.
  *
  * Value contract: byte-identical to `pmod(h*a + b, 2147483647)` for
  * h in [0, P) and a, b in [0, 2^31) — the domain `signaturesOf`
  * feeds it (h is already reduced mod P; a, b come from 31-bit
  * `hashParams`). a and b must be foldable (they are per-hash
  * constants embedded into the generated code); their range is
  * validated at first evaluation. h outside [0, P) would overflow the
  * fold's exact domain (h·a + b < 2^62 + 2^31) and is the caller's
  * contract, documented rather than checked — a per-row range test
  * would cost what the fold saves.
  */
case class MinhashAffineFold(first: Expression, second: Expression,
                             third: Expression)
    extends TernaryExpression {

  private val M = 2147483647L // 2^31 - 1, Mersenne prime

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(first, second, third).forall(_.dataType == LongType)
    if (!ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"$prettyName requires three bigint arguments, got " +
            Seq(first, second, third).map(_.dataType.simpleString)
              .mkString(", "))
    else if (!second.foldable || !third.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"$prettyName requires constant (foldable) a and b — they " +
            "are embedded into the generated code")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
  }

  override def dataType: DataType = LongType

  // evaluated once (foldable by the type check); range-validated so a
  // misuse from SQL fails loudly instead of silently wrapping
  @transient private lazy val aV: Long = constVal(second, "a")
  @transient private lazy val bV: Long = constVal(third, "b")

  private def constVal(e: Expression, name: String): Long = {
    val v = e.eval() match {
      case l: java.lang.Long => l.longValue
      case other => throw graft.exceptions.InvalidArgumentValue(
        s"$prettyName: $name must be a non-null bigint constant, " +
          s"got $other")
    }
    if (v < 0 || v >= (1L << 31))
      throw graft.exceptions.InvalidArgumentValue(
        s"$prettyName: $name must sit in [0, 2^31), got $v — larger " +
          "multipliers overflow the fold's exact domain")
    v
  }

  private def fold(h: Long): Long = {
    val x = h * aV + bV
    val y = (x >>> 31) + (x & M)
    val z = (y >>> 31) + (y & M)
    if (z >= M) z - M else z
  }

  override def nullSafeEval(h: Any, a: Any, b: Any): Any =
    fold(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // touch the lazy vals so range validation fires at planning time
    val (a, b) = (aV, bV)
    nullSafeCodeGen(ctx, ev, (h, _, _) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val z = ctx.freshName("z")
      s"""
         |long $x = $h * ${a}L + ${b}L;
         |long $y = ($x >>> 31) + ($x & ${M}L);
         |long $z = ($y >>> 31) + ($y & ${M}L);
         |${ev.value} = $z >= ${M}L ? $z - ${M}L : $z;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): MinhashAffineFold =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "minhash_fold"
}
