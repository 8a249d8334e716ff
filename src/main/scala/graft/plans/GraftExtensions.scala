package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions as SQL functions, so `spark.sql("SELECT graft_dot(a, b)")`
  * works alongside the Column API. Enable with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.arrayDot)
    ext.injectFunction(GraftExtensions.charShingles)
    ext.injectOptimizerRule(_ => IntegerizeSampleFilter)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectParser((_, parser) => new GraftSqlParser(parser))
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[ArrayDotProduct].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  val arrayDot: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("graft_dot"),
    info("graft_dot", "graft_dot(a, b) - double-precision dot product of two arrays"),
    (children: Seq[Expression]) =>
      ArrayDotProduct(
        org.apache.spark.sql.catalyst.expressions.Cast(children.head,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
        org.apache.spark.sql.catalyst.expressions.Cast(children(1),
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))))

  val charShingles: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("graft_shingles"),
    info("graft_shingles", "graft_shingles(s, n) - distinct character n-grams"),
    (children: Seq[Expression]) => {
      val n = children(1) match {
        case Literal(v: Int, _) => v
        case other => other.eval().asInstanceOf[Int]
      }
      CharShingles(children.head, n)
    })
}
