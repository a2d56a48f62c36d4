package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge => B}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-hashing kernels for the training-data pipeline.
  *
  * [[CdcBoundaries]] computes every content-defined chunk boundary of a
  * document in ONE pass: position 1 plus every position whose 8-char
  * window's md5 opens with nibble 0 — exactly the predicate the d12 oracle
  * states in SQL (`substring(md5(substring(text, i, 8)), 1, 1) = '0'`).
  * The SQL-expressible form materializes a position array and evaluates a
  * per-position lambda (one UTF8String slice + one hex-string md5 each);
  * this expression walks the byte array once with a single reused
  * MessageDigest and reads one digest byte per window. `doGenCode` emits a
  * static call, so a chunking projection stays inside whole-stage codegen.
  *
  * Byte/char equivalence: the predicate is defined over CHARACTER windows
  * (matching the SQL oracle); the fast path slices BYTES, which is
  * identical while the text is single-byte (pure ASCII). The kernel
  * guards this at runtime — any input whose byte length differs from its
  * char length takes a char-indexed fallback that slices code-point
  * windows via `substringSQL` (exact SQL-substring semantics), so
  * multi-byte input produces correct boundaries instead of silently
  * hashing misaligned byte windows.
  */
object TextHash {

  /** 1-based content-defined chunk-boundary positions of a text column. */
  def cdc_boundaries(c: Column): Column =
    B.column(CdcBoundaries(B.expression(c)))

  /** Static kernel the generated code calls (also the interpreted eval). */
  def cdcBoundariesKernel(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (s.numChars() != n) return cdcBoundariesCharKernel(s)
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = new java.util.ArrayList[Integer](math.max(4, n / 12))
    buf.add(1)
    var p = 2
    while (p + 7 <= n) {
      md.reset()
      md.update(bytes, p - 1, 8)
      if ((md.digest()(0) & 0xf0) == 0) buf.add(p)
      p += 1
    }
    toArrayData(buf)
  }

  /** Char-indexed fallback for multi-byte text: slices 8 CODE-POINT
    * windows with SQL-substring semantics (`substringSQL`), hashing each
    * window's UTF-8 bytes — exact parity with the oracle predicate at the
    * cost of one slice per position. */
  private def cdcBoundariesCharKernel(s: UTF8String): ArrayData = {
    val chars = s.numChars()
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = new java.util.ArrayList[Integer](math.max(4, chars / 12))
    buf.add(1)
    var p = 2
    while (p + 7 <= chars) {
      val w = s.substringSQL(p, 8)
      md.reset()
      md.update(w.getBytes)
      if ((md.digest()(0) & 0xf0) == 0) buf.add(p)
      p += 1
    }
    toArrayData(buf)
  }

  private def toArrayData(buf: java.util.ArrayList[Integer]): ArrayData = {
    val out = new Array[Int](buf.size)
    var i = 0
    while (i < out.length) { out(i) = buf.get(i); i += 1 }
    new GenericArrayData(out)
  }
}

case class CdcBoundaries(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "cdc_boundaries"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    TextHash.cdcBoundariesKernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.cdcBoundariesKernel($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
