package graft.text

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit rolling polynomial fingerprint over a token array (Rabin-Karp /
  * FNV family): acc = acc * M + fnv1a64(token), with deliberate wrapping
  * two's-complement arithmetic.
  *
  * A custom Catalyst expression (not `functions.aggregate`) because ANSI
  * mode — Spark 4's default — turns the intended modular overflow into an
  * ARITHMETIC_OVERFLOW error in SQL-expression space; raw Java long math
  * wraps, which is exactly the fingerprint semantics. Codegen'd, so the
  * documents scan stays in WholeStageCodegen.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var acc = RollingHash.Seed
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val tok = arr.getUTF8String(i)
      acc = acc * RollingHash.Mult + (if (tok == null) 0L else RollingHash.hashToken(tok))
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // fresh names: fixed locals collide when two RollingHash instances
      // share a codegen function (→ silent interpreter fallback)
      val acc = ctx.freshName("acc"); val n = ctx.freshName("n")
      val i = ctx.freshName("i"); val tok = ctx.freshName("tok")
      s"""
         |long $acc = ${RollingHash.Seed}L;
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  UTF8String $tok = $c.getUTF8String($i);
         |  $acc = $acc * ${RollingHash.Mult}L +
         |    ($tok == null ? 0L : graft.text.RollingHash.hashToken($tok));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  val Seed: Long = -3750763034362895579L // FNV-1a 64 offset basis
  val Mult: Long = 1099511628211L        // FNV-1a 64 prime

  /** FNV-1a 64 over the token's UTF-8 bytes; called from generated code. */
  def hashToken(s: UTF8String): Long = {
    val b = s.getBytes
    var h = Seed
    var i = 0
    while (i < b.length) {
      h ^= (b(i) & 0xffL)
      h *= Mult
      i += 1
    }
    h
  }
}
