package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for Euclidean (L2) distance over two
  * `array<double>` columns, with whole-stage codegen — the metric the
  * product-quantization operators rank by ([[graft.operators.Similarity]]
  * `pqEncode`/`pqTopKAdc`).
  *
  * The accumulation is one sequential left-to-right loop over the
  * elements, then one correctly-rounded `sqrt` — bit-for-bit the value
  * DuckDB's `list_distance` computes, which is what lets PQ rankings
  * (including their tie-breaks) gate against the oracle exactly, the same
  * discipline as [[CosineSimilarity]] vs `list_cosine_similarity`.
  *
  * Null semantics match [[CosineSimilarity]]: mismatched lengths or a
  * null element yield NULL, never a silently-truncated distance.
  */
case class L2Distance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = DoubleType

  // NULL for mismatched lengths / null elements even when both inputs are
  // non-null — without this, codegen hardwires isNull=false
  override def nullable: Boolean = true

  override def prettyName: String = "l2_distance"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
        |int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $s = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        |    double $d = $a.getDouble($i) - $b.getDouble($i);
        |    $s += $d * $d;
        |  }
        |  if (!${ev.isNull}) {
        |    ${ev.value} = java.lang.Math.sqrt($s);
        |  }
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Distance =
    copy(left = newLeft, right = newRight)
}
