package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.price.PriceParsers

/** Native Catalyst expressions for the price family — the SURVEY §2.7
  * "UDF first, expression when stable" promotion. Semantics are the
  * PURE functions in [[graft.price.PriceParsers]] (re-expressed from
  * the reference's price_processing.py), unchanged; what changes is
  * the evaluation path: a ScalaUDF is an interpreted closure that
  * boxes every row and blocks whole-stage codegen, while these
  * expressions compile to a static call inside the generated stage.
  * `correctName` stays the one sanctioned UDF (trie+DP state makes it
  * genuinely UDF-shaped).
  */
case class ParsePrice(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"parse_price requires string, got ${other.sql}")
    }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override protected def nullSafeEval(s: Any): Any =
    ParsePrice.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("pp")
      s"""
         |java.lang.Double $tmp = graft.functions.ParsePrice.compute($c);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ParsePrice {
  /** Boxed result for eval + codegen: null encodes the parse failing
    * (Python float() semantics preserved in [[PriceParsers.parsePrice]]). */
  def compute(s: UTF8String): java.lang.Double =
    PriceParsers.parsePrice(s.toString) match {
      case Some(d) => java.lang.Double.valueOf(d)
      case None => null
    }
}

/** The 17-shop dispatcher as an expression: (shop, ocr_text, class_id)
  * -> nullable [[graft.price.PriceResult]]-shaped struct (same field
  * order and nullability the former UDF's encoder produced, so plans
  * and oracles are unchanged). */
case class ProcessPrice(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == StringType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"process_price requires (string, string, string), got " +
        children.map(_.dataType.sql).mkString("(", ", ", ")"))

  override def dataType: DataType = ProcessPrice.schema

  override def nullable: Boolean = true

  override protected def nullSafeEval(shop: Any, text: Any, classId: Any): Any =
    ProcessPrice.compute(shop.asInstanceOf[UTF8String],
      text.asInstanceOf[UTF8String], classId.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, t, c) => {
      val tmp = ctx.freshName("pr")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $tmp =
         |  graft.functions.ProcessPrice.compute($s, $t, $c);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object ProcessPrice {

  /** [[graft.price.PriceResult]] as a Catalyst struct, field order as
    * declared there (what the UDF encoder emitted). */
  val schema: StructType = StructType(Seq(
    StructField("item_price", DoubleType),
    StructField("initial_price", DoubleType),
    StructField("member_price", DoubleType),
    StructField("volume", StringType),
    StructField("packaging", StringType),
    StructField("price_ex_vat", DoubleType),
    StructField("member_tag", StringType)))

  /** Null = dispatcher None (unknown shop / class id / unparseable). */
  def compute(shop: UTF8String, text: UTF8String,
      classId: UTF8String): InternalRow =
    PriceParsers.processPriceByClassId(
        shop.toString, text.toString, classId.toString) match {
      case Some(p) => InternalRow(
        p.item_price.map(Double.box).orNull,
        p.initial_price.map(Double.box).orNull,
        p.member_price.map(Double.box).orNull,
        p.volume.map(UTF8String.fromString).orNull,
        p.packaging.map(UTF8String.fromString).orNull,
        p.price_ex_vat.map(Double.box).orNull,
        p.member_tag.map(UTF8String.fromString).orNull)
      case None => null
    }
}
