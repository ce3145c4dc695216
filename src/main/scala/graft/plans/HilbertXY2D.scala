package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for the Hilbert-curve xy→d transform —
  * `hilbert_xy2d(x, y, bits)`: the clustering key behind
  * [[graft.operators.Layout.hilbertValue2]].
  *
  * WHY A NATIVE EXPRESSION AND NOT A Column BUILDER: the transform
  * carries state across levels (each level's reflected/transposed
  * coordinates feed the next), so a Column-tree formulation must inline
  * the previous level's trees into every reference — `nx` reads `cy`
  * twice and `cx` once inside nested `when`s — growing the expression
  * tree ~4× per level (~4^bits nodes; at bits=8 that was a 79 MiB task
  * binary and ~10 min of driver-side optimizer/codegen PER RUN,
  * independent of data size — it timed out round 15's bench capture).
  * Here the recurrence is what it really is: a flat per-row loop, one
  * expression node, O(bits) work per row, whole-stage codegen'd.
  *
  * Semantics are EXACTLY the level-by-level recurrence the q158 DuckDB
  * oracle unrolls as CTEs (`PipelineQueries.hilbertOracle`) and the
  * bits≤5 Column cross-check form keeps
  * ([[graft.operators.Layout.hilbertValue2Unrolled]]): per level
  * s = 2^i from the top bit down, quadrant digit `(3·rx) xor ry`
  * weighted s², then the lower quadrant reflected (s−1−·) and
  * transposed into canonical orientation. Caller contract as before:
  * non-negative inputs binned to < 2^bits (values ≥ 2^bits alias
  * silently); `bits ≤ 31` keeps d = Σ s·s·digit < 4^bits in a positive
  * long.
  */
case class HilbertXY2D(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31,
    s"hilbert_xy2d: bits must be in [1,31] (d < 4^bits stays a positive long), got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two bigint arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "hilbert_xy2d"

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long]
    var y = b.asInstanceOf[Long]
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0L) {
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // reflect+transpose combined, matching the oracle's CTE layer:
      // ry==0 → (nx, ny) = (rx==1 ? s-1-y : y, rx==1 ? s-1-x : x)
      if (ry == 0L) {
        val nx = if (rx == 1L) s - 1L - y else y
        y = if (rx == 1L) s - 1L - x else x
        x = nx
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val nx = ctx.freshName("hnx")
      s"""
        |long $x = $a;
        |long $y = $b;
        |long $d = 0L;
        |for (long $s = 1L << ${bits - 1}; $s > 0L; $s >>= 1) {
        |  long $rx = ($x & $s) > 0L ? 1L : 0L;
        |  long $ry = ($y & $s) > 0L ? 1L : 0L;
        |  $d += $s * $s * ((3L * $rx) ^ $ry);
        |  if ($ry == 0L) {
        |    long $nx = $rx == 1L ? $s - 1L - $y : $y;
        |    $y = $rx == 1L ? $s - 1L - $x : $x;
        |    $x = $nx;
        |  }
        |}
        |${ev.value} = $d;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertXY2D =
    copy(left = newLeft, right = newRight)
}
