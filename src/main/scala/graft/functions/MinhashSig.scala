package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression for a document's K-permutation MinHash
  * signature over its shingle array.
  *
  * The built-in route — `transform(ss, md5…)` then K separate
  * `array_min(transform(hb, affine_i))` folds — walks the shingle array
  * K+1 times through interpreted per-element closures, with an
  * md5-hex→conv string round-trip per shingle. This expression makes ONE
  * pass: md5 each shingle once (first 4 digest bytes big-endian unsigned
  * — exactly `conv(substring(md5(…),1,8),16,10)`), update all K running
  * minima of (A_i * h + B_i) mod P in a tight loop.
  *
  * Output: array<long> of the K minima (null for an empty array, like
  * `array_min`). Bit-identical to the lambda formulation — and therefore
  * to the DuckDB oracle CTEs — pinned by OperatorPropertySpec.
  */
case class MinhashSig(
    child: Expression,
    a: Seq[Long],
    b: Seq[Long],
    p: Long) extends UnaryExpression {

  require(a.nonEmpty && a.length == b.length,
    "coefficient vectors must be non-empty and equal-length")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires array<string>, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true // empty shingle array -> null

  private val aArr = a.toArray
  private val bArr = b.toArray

  /** One pass: per non-null shingle, one md5, K affine-min updates. */
  def compute(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    val k = aArr.length
    val mins = Array.fill(k)(Long.MaxValue)
    var seen = false
    val md = MinhashSig.mdLocal.get()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        seen = true
        val w = shingles.getUTF8String(i)
        md.reset()
        md.update(MinhashSig.Prefix)
        md.update(w.getBytes)
        val d = md.digest()
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var j = 0
        while (j < k) {
          val v = (h * aArr(j) + bArr(j)) % p
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!seen) null else new GenericArrayData(mins)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhashSig", this, classOf[MinhashSig].getName)
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

object MinhashSig {

  private val Prefix = "mh:".getBytes("UTF-8")

  private val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Column form: K-minima MinHash signature of an array<string>. */
  def minhash_sig(shingles: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    ColumnBridge.column(MinhashSig(ColumnBridge.expression(shingles), a, b, p))
}
