package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hot paths where Spark's built-in
  * higher-order functions (`aggregate`/`zip_with`/`transform`) fall out
  * of whole-stage codegen and evaluate a lambda per array element.
  *
  * ArrayDotProduct replaces aggregate(zip_with(a,b,·*·),0,+) in the
  * similarity operators: same left-to-right double summation (so results
  * remain bitwise identical to the DuckDB oracle's generated sum), but
  * as one generated loop over primitive array slots.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"ArrayDotProduct needs array<double> inputs, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) { sum += x.getDouble(i) * y.getDouble(i); i += 1 }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // fresh names: several dots can land in ONE generated function
    // (lshBucket emits 8, IVF's rank_d emits 2) — fixed names collide,
    // javac rejects the function, and the whole projection silently
    // falls back to interpreted eval
    val n = ctx.freshName("dotN")
    val sum = ctx.freshName("dotSum")
    val i = ctx.freshName("dotI")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Distinct character n-gram shingles of an (already normalized) string,
  * in first-occurrence order — replaces
  * array_distinct(transform(sequence(...), i -> substr(...))) which
  * interprets two lambdas per character. Single tight pass; fallback
  * (non-codegen) eval is still ~two orders of magnitude fewer virtual
  * calls than the lambda pipeline.
  */
case class CharShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (s.length <= n) {
      out.add(UTF8String.fromString(s))
    } else {
      var i = 0
      val max = s.length - n
      while (i <= max) {
        out.add(UTF8String.fromString(s.substring(i, i + n)))
        i += 1
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression): CharShingles =
    copy(child = c)
}

object expressions {
  import org.apache.spark.sql.GraftColumnBridge._

  /** Column-API wrappers. */
  def array_dot(a: Column, b: Column): Column =
    toColumn(ArrayDotProduct(toExpression(a), toExpression(b)))

  def char_shingles(s: Column, n: Int): Column =
    toColumn(CharShingles(toExpression(s), n))
}
