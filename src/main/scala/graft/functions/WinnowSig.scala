package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for a document's winnowing (MOSS-style)
  * fingerprint set over normalized text: hash every K-char gram, slide a
  * window of W consecutive hashes, keep each window's minimum, distinct.
  *
  * The built-in route materialized the gram-hash array and the
  * window-minima array through interpreted `transform(sequence…)`
  * lambdas with an md5-hex→conv string round-trip per gram. This is one
  * JVM pass; hashes are the first 4 md5 bytes big-endian unsigned of
  * each gram (== `conv(substring(md5(gram),1,8),16,10)` — no salt, as in
  * the lambda twin), and the distinct set keeps first-occurrence order
  * exactly like `array_distinct`. Property-spec-pinned to the twin.
  *
  * Output null when the text holds fewer than K+W-1 chars (< 1 full
  * window) — callers filter those out, matching the oracle.
  */
case class WinnowSig(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"winnow_fps requires string, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  def compute(t: UTF8String): ArrayData = {
    val nChars = t.numChars()
    val nGrams = nChars - (k - 1)
    val nWins = nGrams - (w - 1)
    if (nWins < 1) return null
    val md = WinnowSig.mdLocal.get()
    val hs = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      val gram = t.substringSQL(i + 1, k)
      md.reset()
      md.update(gram.getBytes)
      val d = md.digest()
      hs(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    val seen = new java.util.HashSet[Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](nWins)
    i = 0
    while (i < nWins) {
      var m = hs(i)
      var j = 1
      while (j < w) {
        if (hs(i + j) < m) m = hs(i + j)
        j += 1
      }
      if (seen.add(m)) out += m
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("winnowSig", this, classOf[WinnowSig].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $self.compute($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowSig {

  private val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Column form: distinct winnowing fingerprints of a string column. */
  def winnow_fps(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowSig(ColumnBridge.expression(text), k, w))
}
