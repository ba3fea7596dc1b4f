package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression for the 32-bit SimHash signature of a
  * document's distinct-word array.
  *
  * The built-in route — `aggregate(transform(words, md5…), zeros,
  * zip_with 32-wide vote vectors)` — runs as interpreted higher-order
  * lambdas: every word evaluates a 32-element `transform` + `zip_with`
  * through per-element closures (~|words| x 32 boxed steps per row, plus
  * an md5-hex→conv string round-trip per word). This expression is one
  * tight JVM loop per row inside whole-stage codegen.
  *
  * Semantics are BIT-IDENTICAL to the lambda formulation (and therefore
  * to the DuckDB oracle): per word, h = first 4 md5 bytes of
  * "sh:"+word (big-endian unsigned — exactly
  * `conv(substring(md5(…),1,8),16,10)`); per bit b, vote +1 if
  * (h>>b)&1 else -1; signature = Σ 2^b over positive votes.
  * DedupSpec pins expression == lambda on random unicode corpora.
  */
case class SimhashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash_sig requires array<string>, got ${other.sql}")
    }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any): Any =
    SimhashSig.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimhashSig.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashSig {

  private val Prefix = "sh:".getBytes("UTF-8")

  private val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** One pass over the word array: md5 the salted word bytes, take the
    * first 4 digest bytes big-endian unsigned (== the hex-substring
    * route), vote each of the 32 bits, fold the sign vector to a long. */
  def compute(words: ArrayData): Long = {
    val md = mdLocal.get()
    val votes = new Array[Int](32)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i)
        md.reset()
        md.update(Prefix)
        md.update(w.getBytes)
        val d = md.digest()
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var b = 0
        while (b < 32) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** Column form: 32-bit SimHash of an array<string> of words. */
  def simhash_sig(words: Column): Column =
    ColumnBridge.column(SimhashSig(ColumnBridge.expression(words)))
}
