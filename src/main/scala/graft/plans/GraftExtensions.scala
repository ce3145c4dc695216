package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Registration of graft's native Catalyst functions.
  *
  * Two paths, same registry entries:
  *  - cluster deployment: `spark.sql.extensions=graft.plans.GraftExtensions`
  *    (the standard `SparkSessionExtensions` injection point);
  *  - programmatic/local: [[GraftFunctions.ensureRegistered]] (idempotent),
  *    called by the engine before building plans.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}

object GraftFunctions {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val all: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"cosine_similarity requires exactly 2 arguments, got ${exprs.length}")
        CosineSimilarity(exprs.head, exprs(1))
      }))

  /** Idempotent programmatic registration into the session's function
    * registry (for sessions not built with the extensions config). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (ident, info, builder) =>
      if (!registry.functionExists(ident)) {
        registry.registerFunction(ident, info, builder)
      }
    }
  }

  /** Column-API surface for the native expression (requires registration). */
  def cosineSimilarity(a: Column, b: Column): Column =
    call_function("cosine_similarity", a, b)
}
