package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst predicate `bloom.mightContainLong(key)` over a
  * driver-built [[BloomFilter]] — the codegen'd replacement for wrapping
  * `bf.mightContain` in a Scala UDF (which forces every probe row
  * through an interpreted closure boundary and blocks whole-stage
  * codegen around the scan it is supposed to cheapen).
  *
  * The filter travels as its SERIALIZED BYTES (the expression is part of
  * the plan, so whatever it captures ships to every executor — bytes are
  * compact and unconditionally serializable) and deserializes once per
  * generated-class instance / interpreted-eval thread, not per row.
  *
  * Same role as Spark's own runtime-row-level-filter expression, made
  * explicit and user-callable: false positives pass, so callers must
  * keep the exact join behind it — the result is DEFINED identical to
  * the plain join (the q_bloom_join oracle runs the plain join).
  */
case class BloomMightContainLong(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain_long requires bigint, got ${other.sql}")
    }

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  override protected def nullSafeEval(v: Any): Any =
    bf.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship only the bytes; each generated-class instance deserializes
    // once into a mutable slot on first probe
    val bytesRef = ctx.addReferenceObj("bloomBytes", filterBytes, "byte[]")
    val bloomVar = ctx.addMutableState(
      "org.apache.spark.util.sketch.BloomFilter", "graftBloom")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($bloomVar == null) {
         |  try {
         |    $bloomVar = org.apache.spark.util.sketch.BloomFilter.readFrom(
         |      new java.io.ByteArrayInputStream($bytesRef));
         |  } catch (java.io.IOException e) {
         |    throw new RuntimeException(e);
         |  }
         |}
         |${ev.value} = $bloomVar.mightContainLong($c);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {

  /** Serialize a driver-built bloom filter for embedding in the plan. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Column predicate: does `key` (bigint) possibly belong to `bf`? */
  def bloom_might_contain_long(key: Column, bf: BloomFilter): Column =
    ColumnBridge.column(
      BloomMightContainLong(ColumnBridge.expression(key), serialize(bf)))
}
