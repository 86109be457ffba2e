package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Seeded 60-bit md5 hash — the engine's oracle-reproducible sketch
  * primitive (MinHash bases, SimHash word hashes, LSH hyperplanes):
  * the top 60 bits of md5(utf8(seed) ':' utf8(value)), equal by
  * construction to `CAST(('0x' || substr(md5(seed || ':' || v),1,15)) AS
  * BIGINT)` in the DuckDB dialect and to the composed
  * `conv(substring(md5(...),1,15),16,10)` Spark expression it replaces.
  * One codegen'd call instead of a 5-expression chain with hex-string
  * intermediates — no per-row String allocation on the dedup hot path.
  */
case class Md5Hash64(child: Expression, seed: Int) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_hash64 requires STRING input, got ${child.dataType.catalogString}")

  override def prettyName: String = "md5_hash64"

  override def nullSafeEval(v: Any): Any =
    Md5Hash64.hash(seed, v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash64.hash($seed, $c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Md5Hash64 {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Digest "<seed>:<value>" and return the top 60 bits (= the first 15
    * hex characters of the canonical digest string) as a positive long. */
  def hash(seed: Int, value: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    md.update(java.lang.Integer.toString(seed).getBytes("US-ASCII"))
    md.update(':'.toByte)
    md.update(value.getBytes)
    val d = md.digest()
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }
}
