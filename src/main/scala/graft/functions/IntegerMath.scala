package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Integer math the Spark function library lacks (reference
  * `src/core_functions/scalar/math/numeric.cpp` gcd/lcm): codegen'd
  * binary-Euclid on longs, sign-insensitive like the reference.
  */
abstract class LongBinaryMath extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BIGINT inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
}

object LongBinaryMath {
  def gcd(a: Long, b: Long): Long = {
    var x = math.abs(a); var y = math.abs(b)
    while (y != 0) { val t = x % y; x = y; y = t }
    x
  }
}

case class Gcd(left: Expression, right: Expression) extends LongBinaryMath {
  override def prettyName: String = "gcd"

  override def nullSafeEval(l: Any, r: Any): Any =
    LongBinaryMath.gcd(l.asInstanceOf[Long], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y"); val t = ctx.freshName("t")
      s"""
         |long $x = Math.abs($a); long $y = Math.abs($b);
         |while ($y != 0L) { long $t = $x % $y; $x = $y; $y = $t; }
         |${ev.value} = $x;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class Lcm(left: Expression, right: Expression) extends LongBinaryMath {
  override def prettyName: String = "lcm"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[Long]; val b = r.asInstanceOf[Long]
    if (a == 0L || b == 0L) 0L
    else math.abs(a / LongBinaryMath.gcd(a, b) * b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y"); val t = ctx.freshName("t")
      s"""
         |if ($a == 0L || $b == 0L) { ${ev.value} = 0L; }
         |else {
         |  long $x = Math.abs($a); long $y = Math.abs($b);
         |  while ($y != 0L) { long $t = $x % $y; $x = $y; $y = $t; }
         |  ${ev.value} = Math.abs($a / $x * $b);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
