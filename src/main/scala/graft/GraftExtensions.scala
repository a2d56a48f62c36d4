package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions._

/** SQL-surface registration of the codegen'd ABI decode expressions.
  *
  * The reference's query surface is SQL text over its stored tables
  * (S3: `brontes db` forwards SQL to clickhouse); the Spark-native analog
  * is these decode primitives being callable from `spark.sql(...)` text,
  * not only through the typed [[graft.functions.AbiCalldata]] facade. Two
  * entry points, same builders:
  *
  *   - `--conf spark.sql.extensions=graft.GraftExtensions` (or
  *     `SparkSession.builder().withExtensions(new GraftExtensions)`) wires
  *     the functions into every session of the application — the standard
  *     library-integration hook;
  *   - [[GraftExtensions.register]] installs them on an already-built
  *     session (idempotent; used by the `s3_sql_decode` query so the
  *     driver's own session needs no special build flags).
  *
  * Registration is metadata-only: the planned expression is the same
  * codegen'd Catalyst node the Column API produces, so SQL-text decode
  * stays inside whole-stage codegen (PlanSpec pins non-fallback).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.descriptions.foreach(e.injectFunction)
}

object GraftExtensions {

  /** Index arguments must be INT literals: the expressions bake offsets
    * into generated code at plan time (a per-row word index would defeat
    * the constant-folded offset arithmetic). */
  private def intArg(fn: String, e: Expression): Int = e match {
    case lit: Literal if lit.dataType == IntegerType =>
      lit.value.asInstanceOf[Int]
    case other => throw new IllegalArgumentException(
      s"$fn: index argument must be an INT literal, got ${other.sql}")
  }

  private def build(name: String, arity: Int)(
      b: Seq[Expression] => Expression): (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(AbiCalldata.getClass.getName, name),
      (args: Seq[Expression]) => {
        if (args.size != arity) throw new IllegalArgumentException(
          s"$name expects $arity arguments, got ${args.size}")
        b(args)
      })

  /** The six decode functions plus the CDC boundary kernel, by SQL name. */
  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    build("abi_word", 2)(a => AbiWord(a(0), intArg("abi_word", a(1)))),
    build("abi_selector", 1)(a => AbiSelector(a(0))),
    build("abi_int_word", 2)(a => AbiIntWord(a(0), intArg("abi_int_word", a(1)))),
    build("abi_log_word", 2)(a => AbiLogWord(a(0), intArg("abi_log_word", a(1)))),
    build("abi_array_len", 2)(a => AbiArrayLen(a(0), intArg("abi_array_len", a(1)))),
    build("abi_array_elem", 3)(a => AbiArrayElem(a(0),
      intArg("abi_array_elem", a(1)), intArg("abi_array_elem", a(2)))),
    build("cdc_boundaries", 1)(a => CdcBoundaries(a(0))))

  /** Install the functions on a live session (idempotent — re-registration
    * replaces the identical builder). */
  def register(s: SparkSession): Unit =
    descriptions.foreach { case (id, info, builder) =>
      s.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
