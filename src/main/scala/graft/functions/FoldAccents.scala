package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Accent folding — canonical decomposition (NFD) followed by removal of
  * combining marks (Unicode category Mn), so `café → cafe`,
  * `Zürich → Zurich`, while non-mark letters (ø, ß, æ, đ) pass through
  * untouched. Bit-compatible with DuckDB's utf8proc-backed
  * `strip_accents`, which the oracle uses.
  *
  * Corpus-prep motivation: accent folding is a standard normalization
  * pass before dedup/fingerprinting of multilingual web text — 'café'
  * and 'cafe' variants of the same page should collide, not survive as
  * near-dups. Spark has no builtin for it (`translate` would need an
  * unbounded alphabet), so this is the custom-Expression path: a
  * codegen'd scalar with an ASCII fast path that skips normalization
  * entirely (the overwhelmingly common case in mixed corpora — one byte
  * scan, zero allocation).
  */
case class FoldAccents(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "fold_accents"

  override protected def withNewChildInternal(newChild: Expression): FoldAccents =
    copy(child = newChild)

  override def nullSafeEval(s: Any): Any =
    FoldAccents.fold(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FoldAccents.fold($c)")
}

object FoldAccents {

  /** NFD + drop Mn marks; pure-ASCII inputs return the input object
    * unchanged (no decode, no copy). Public + static-reachable for
    * codegen. */
  def fold(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    val ascii = {
      var i = 0
      var ok = true
      while (ok && i < n) { if ((s.getByte(i) & 0x80) != 0) ok = false; i += 1 }
      ok
    }
    if (ascii) return s
    val decomposed = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var i = 0
    while (i < decomposed.length) {
      val cp = decomposed.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  def apply(c: Column): Column =
    GraftSqlBridge.column(FoldAccents(GraftSqlBridge.expression(c)))

  val registryEntry: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("fold_accents"),
    new ExpressionInfo(classOf[FoldAccents].getName, "fold_accents"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "fold_accents takes 1 argument")
      FoldAccents(args.head)
    })

  /** Imperative registration (idempotent) for sessions built without the
    * extensions config. */
  def register(registry: FunctionRegistry): Unit = {
    val (id, info, builder) = registryEntry
    registry.registerFunction(id, info, builder)
  }
}
