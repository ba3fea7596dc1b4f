package graft.price

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Column-level surface for price parsing.
  *
  * A deterministic ScalaUDF returning the unified [[PriceResult]] struct.
  * The parsers are pure string->struct functions, so Catalyst can constant-
  * fold literal inputs and the UDF stays a narrow row-local map — no
  * shuffle, no state, safe at any scale.
  */
object PriceFunctions {

  /** parse_price core as a UDF (reference: price_processing.py:5-20). */
  val parsePriceUdf: UserDefinedFunction =
    udf((s: String) => PriceParsers.parsePrice(s))

  def parsePrice(c: Column): Column = parsePriceUdf(c)

  /** Full shop dispatcher (reference: price_processing.py:338-389).
    * Returns NULL for unknown shops / class ids / unparseable text. */
  val processPriceUdf: UserDefinedFunction =
    udf((shop: String, text: String, classId: String) =>
      PriceParsers.processPriceByClassId(shop, text, classId))

  def processPrice(shop: Column, text: Column, classId: Column): Column =
    processPriceUdf(shop, text, classId)
}
