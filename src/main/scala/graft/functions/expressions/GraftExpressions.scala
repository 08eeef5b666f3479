package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot paths where a builtin
  * doesn't exist. Each implements `doGenCode` so it stays inside
  * whole-stage codegen — a Scala UDF here would box every row and
  * break the codegen span.
  */

/** popcount(a XOR b): Hamming distance between two 64-bit
  * fingerprints (SimHash near-dup distance).
  */
case class HammingDistance64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long]).toLong
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = (long) java.lang.Long.bitCount($a ^ $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "hamming64"
}

object PolyHash {
  final val Mod: Long = (1L << 61) - 1 // Mersenne prime 2^61-1
  final val Base: Long = 1000003L

  /** Polynomial rolling hash over UTF-8 bytes, mod 2^61-1. Collision
    * probability ~n²/2^61 — fine as a 100 TB dedup fingerprint.
    */
  def ofBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      // multiply mod 2^61-1 via Math.multiplyHigh to avoid overflow
      h = mulMod(h, Base)
      h += (bytes(i) & 0xffL)
      if (h >= Mod) h -= Mod
      i += 1
    }
    h
  }

  def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // (hi,lo) mod 2^61-1: fold 128-bit product at the 61-bit boundary
    val part = ((hi << 3) | (lo >>> 61)) + (lo & Mod)
    val r = (part >>> 61) + (part & Mod)
    if (r >= Mod) r - Mod else r
  }
}

/** Rolling polynomial fingerprint of a string (document
  * fingerprinting for dedup joins: 8 bytes instead of the full text).
  */
case class PolyFingerprint(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullSafeEval(v: Any): Any =
    PolyHash.ofBytes(v.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.PolyHash.ofBytes($c.getBytes());")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "poly_fingerprint"
}

object SimHash {
  /** 64-bit SimHash over whitespace tokens: each token's 64-bit hash
    * votes ±1 per bit; the sign of each bit-sum forms the fingerprint.
    * Near-identical token multisets → small Hamming distance.
    */
  def ofTokens(text: UTF8String): Long = {
    val counts = new Array[Int](64)
    val s = text.toString
    var start = 0
    val n = s.length
    var i = 0
    while (i <= n) {
      if (i == n || Character.isWhitespace(s.charAt(i))) {
        if (i > start) {
          var h = fnv64(s, start, i)
          var b = 0
          while (b < 64) {
            counts(b) += (if ((h & 1L) == 1L) 1 else -1)
            h >>>= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** FNV-1a 64-bit over a char range — fast, stable, dependency-free. */
  private def fnv64(s: String, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}

/** SimHash64 fingerprint of a document's token stream. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullSafeEval(v: Any): Any =
    SimHash.ofTokens(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** Column-level entry points (Spark 4: Column↔Expression bridge via
  * classic.ExpressionUtils).
  */
object GraftFunctions {
  import org.apache.spark.sql.graft.Bridge.{column, expression}
  def hamming64(a: Column, b: Column): Column = column(HammingDistance64(expression(a), expression(b)))
  def polyFingerprint(c: Column): Column = column(PolyFingerprint(expression(c)))
  def simhash64(c: Column): Column = column(SimHash64(expression(c)))
}
