package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two
  * `array<double>` columns, with whole-stage codegen.
  *
  * Semantically identical to the higher-order-function formulation in
  * [[graft.functions.VectorFunctions.cosineSimilarity]] (`dot /
  * sqrt(|a|²·|b|²)`, sequential left-to-right accumulation — bit-for-bit
  * the same doubles), but a single fused loop with no intermediate array
  * allocation per row: `zip_with` materializes a 64-element array per pair,
  * which is the dominant cost in all-pairs similarity scans.
  *
  * SURVEY.md §4: "Cosine similarity … custom Catalyst `Expression` with
  * codegen" — this is that expression; registration lives in
  * [[GraftFunctions]] / [[GraftExtensions]].
  */
case class CosineSimilarity(left: Expression, right: Expression)
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

  // produces NULL for mismatched lengths / null elements even when both
  // inputs are non-null — without this, codegen hardwires isNull=false
  override def nullable: Boolean = true

  override def prettyName: String = "cosine_similarity"

  // Null semantics match the higher-order-function formulation (and the
  // DuckDB oracle's spirit): mismatched lengths or a null element yield
  // NULL, never a silently-truncated similarity.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getDouble(i)
      val yv = y.getDouble(i)
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
        |int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        |    double $xv = $a.getDouble($i);
        |    double $yv = $b.getDouble($i);
        |    $dot += $xv * $yv;
        |    $na += $xv * $xv;
        |    $nb += $yv * $yv;
        |  }
        |  if (!${ev.isNull}) {
        |    ${ev.value} = $dot / java.lang.Math.sqrt($na * $nb);
        |  }
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
