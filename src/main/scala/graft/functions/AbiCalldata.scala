package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge => B}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** F5 (native form): ABI calldata decode over real BinaryType — the
  * codegen'd analog of the reference's per-trace decoder dispatch
  * (brontes-classifier/src/classifiers/, decode via alloy `sol!` macros on
  * `&[u8]` calldata). Solidity ABI layout: a 4-byte function selector
  * followed by 32-byte big-endian words; uint values of practical size live
  * in each word's low 8 bytes.
  *
  * Both expressions implement `doGenCode` directly (NOT CodegenFallback),
  * so a decode-heavy projection stays inside whole-stage codegen: the
  * generated Java reads the byte array in place — no hex-string
  * round-trip, no UTF8String slicing, no virtual `eval` call per row. At
  * 100 TB the decode is the innermost loop of classification; keeping it
  * codegen'd is the difference between a fused scan→decode→filter stage
  * and one interpreted expression breaking the pipeline.
  */
object AbiCalldata {

  /** Low 8 bytes of ABI word `i` (after the 4-byte selector) as BIGINT;
    * NULL when the calldata is too short for that word. */
  def abi_word(c: Column, i: Int): Column =
    B.column(AbiWord(B.expression(c), i))

  /** First 4 bytes as a lowercase hex selector string; NULL when short. */
  def abi_selector(c: Column): Column =
    B.column(AbiSelector(B.expression(c)))
}

case class AbiWord(child: Expression, wordIdx: Int) extends UnaryExpression {
  require(wordIdx >= 0, "wordIdx must be non-negative")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "abi_word"

  private val tailOff = 4 + wordIdx * 32 + 24

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length < tailOff + 8) null
    else {
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (b(tailOff + i) & 0xffL); i += 1 }
      v
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val v = ctx.freshName("w")
      val i = ctx.freshName("i")
      s"""
         |if ($c.length < ${tailOff + 8}) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $v = 0L;
         |  for (int $i = 0; $i < 8; $i++) {
         |    $v = ($v << 8) | ($c[$tailOff + $i] & 0xffL);
         |  }
         |  ${ev.value} = $v;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class AbiSelector(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "abi_selector"

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length < 4) null
    else {
      val out = new Array[Byte](8)
      var i = 0
      while (i < 4) {
        val v = b(i) & 0xff
        out(2 * i) = Character.forDigit(v >>> 4, 16).toByte
        out(2 * i + 1) = Character.forDigit(v & 0xf, 16).toByte
        i += 1
      }
      UTF8String.fromBytes(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("hex")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |if ($c.length < 4) {
         |  ${ev.isNull} = true;
         |} else {
         |  byte[] $out = new byte[8];
         |  for (int $i = 0; $i < 4; $i++) {
         |    int $v = $c[$i] & 0xff;
         |    $out[2 * $i] = (byte) java.lang.Character.forDigit($v >>> 4, 16);
         |    $out[2 * $i + 1] = (byte) java.lang.Character.forDigit($v & 0xf, 16);
         |  }
         |  ${ev.value} = UTF8String.fromBytes($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
