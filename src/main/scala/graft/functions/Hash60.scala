package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit md5-derived hash — bit-identical to the composable
  * `conv(substr(md5(s), 1, 15), 16, 10)::long` (= the DuckDB oracle's
  * `CAST('0x' || substr(md5(s),1,15) AS BIGINT)`), computed without the
  * hex round trip: the first 15 hex chars of an md5 are exactly the top
  * 60 bits of its first 8 bytes big-endian, so the value is
  * `first8BytesBE >>> 4`.
  *
  * WHY CUSTOM: this hash runs once per shingle/token in the dedup
  * family — the hot path of corpus-scale MinHash/SimHash. The builtin
  * composition allocates a 32-char hex string, substrings it, and
  * re-parses digits per row; this expression goes digest → shift with a
  * thread-local MessageDigest. Portability contract unchanged.
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "hash60"

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)

  override def nullSafeEval(s: Any): Any =
    Hash60.hash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60.hash($c)")
}

object Hash60 {
  private val localMd = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** digest(utf8 bytes) → top 60 bits of the first 8 bytes, big-endian.
    * Public + static-reachable for codegen. */
  def hash(s: UTF8String): Long = {
    val md = localMd.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val top =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top >>> 4
  }

  def apply(c: Column): Column =
    GraftSqlBridge.column(Hash60(GraftSqlBridge.expression(c)))
}
