package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Vector-similarity primitives over `ARRAY<FLOAT>` embedding columns —
  * Spark has no built-in vector ops, so these are native Catalyst
  * expressions with whole-stage codegen (the hot path for similarity
  * search / near-dup detection at scale; a Scala UDF here would break the
  * codegen span and pay serialization per row).
  *
  * Semantics mirror the reference's list similarity functions
  * (reference `src/core_functions/scalar/list/list_cosine_similarity.cpp`,
  * `list_distance.cpp`, `list_inner_product.cpp`): FLOAT32 sequential
  * accumulation, FLOAT32 result — verified bit-identical against the
  * oracle engine on the fixture embeddings.
  */
abstract class FloatVectorBinary extends BinaryExpression {
  override def dataType: DataType = FloatType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  protected def compute(a: ArrayData, b: ArrayData): Float

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    require(a.numElements() == b.numElements(),
      s"vector dimensions must match: ${a.numElements()} vs ${b.numElements()}")
    compute(a, b)
  }

  /** Java loop body given array variable names; must assign `ev`. */
  protected def genLoop(ctx: CodegenContext, a: String, b: String, ev: String): String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException("vector dimensions must match: "
         |    + $a.numElements() + " vs " + $b.numElements());
         |}
         |${genLoop(ctx, a, b, ev.value.toString)}
       """.stripMargin
    })
}

/** Dot product: Σ aᵢ·bᵢ in float32. */
case class ListInnerProduct(left: Expression, right: Expression)
    extends FloatVectorBinary {
  override def prettyName: String = "list_inner_product"

  override protected def compute(a: ArrayData, b: ArrayData): Float = {
    var s = 0.0f
    var i = 0
    val n = a.numElements()
    while (i < n) { s += a.getFloat(i) * b.getFloat(i); i += 1 }
    s
  }

  override protected def genLoop(ctx: CodegenContext, a: String, b: String, ev: String): String = {
    val i = ctx.freshName("i")
    val s = ctx.freshName("s")
    s"""
       |float $s = 0.0f;
       |for (int $i = 0; $i < $a.numElements(); $i++) {
       |  $s += $a.getFloat($i) * $b.getFloat($i);
       |}
       |$ev = $s;
     """.stripMargin
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine similarity: (Σab) / √(Σa²·Σb²), all float32. */
case class ListCosineSimilarity(left: Expression, right: Expression)
    extends FloatVectorBinary {
  override def prettyName: String = "list_cosine_similarity"

  override protected def compute(a: ArrayData, b: ArrayData): Float = {
    var ip = 0.0f; var na = 0.0f; var nb = 0.0f
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val x = a.getFloat(i); val y = b.getFloat(i)
      ip += x * y; na += x * x; nb += y * y
      i += 1
    }
    ip / (math.sqrt(na.toDouble).toFloat * math.sqrt(nb.toDouble).toFloat)
  }

  override protected def genLoop(ctx: CodegenContext, a: String, b: String, ev: String): String = {
    val i = ctx.freshName("i")
    val ip = ctx.freshName("ip"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
    val x = ctx.freshName("x"); val y = ctx.freshName("y")
    s"""
       |float $ip = 0.0f; float $na = 0.0f; float $nb = 0.0f;
       |for (int $i = 0; $i < $a.numElements(); $i++) {
       |  float $x = $a.getFloat($i); float $y = $b.getFloat($i);
       |  $ip += $x * $y; $na += $x * $x; $nb += $y * $y;
       |}
       |$ev = $ip / ((float) Math.sqrt((double) $na) * (float) Math.sqrt((double) $nb));
     """.stripMargin
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Euclidean (L2) distance: √Σ(aᵢ−bᵢ)², all float32. */
case class ListDistance(left: Expression, right: Expression)
    extends FloatVectorBinary {
  override def prettyName: String = "list_distance"

  override protected def compute(a: ArrayData, b: ArrayData): Float = {
    var s = 0.0f
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val d = a.getFloat(i) - b.getFloat(i)
      s += d * d
      i += 1
    }
    math.sqrt(s.toDouble).toFloat
  }

  override protected def genLoop(ctx: CodegenContext, a: String, b: String, ev: String): String = {
    val i = ctx.freshName("i")
    val s = ctx.freshName("s"); val d = ctx.freshName("d")
    s"""
       |float $s = 0.0f;
       |for (int $i = 0; $i < $a.numElements(); $i++) {
       |  float $d = $a.getFloat($i) - $b.getFloat($i);
       |  $s += $d * $d;
       |}
       |$ev = (float) Math.sqrt((double) $s);
     """.stripMargin
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
