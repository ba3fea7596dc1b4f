package graft.price

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.{ParsePrice, ProcessPrice}

/** Column-level surface for price parsing.
  *
  * Since r8 these are native Catalyst expressions
  * ([[graft.functions.ParsePrice]] / [[graft.functions.ProcessPrice]] —
  * the SURVEY §2.7 promotion): pure row-local string->value functions
  * that codegen as static calls inside the enclosing whole-stage span
  * instead of riding interpreted ScalaUDF closures. No shuffle, no
  * state, safe at any scale; result shapes (nullable double / nullable
  * [[PriceResult]] struct) are unchanged from the UDF era.
  */
object PriceFunctions {

  /** parse_price core (reference: price_processing.py:5-20). */
  def parsePrice(c: Column): Column =
    ColumnBridge.column(ParsePrice(ColumnBridge.eagerExpression(c)))

  /** Full shop dispatcher (reference: price_processing.py:338-389).
    * Returns NULL for unknown shops / class ids / unparseable text. */
  def processPrice(shop: Column, text: Column, classId: Column): Column =
    ColumnBridge.column(ProcessPrice(
      ColumnBridge.eagerExpression(shop),
      ColumnBridge.eagerExpression(text),
      ColumnBridge.eagerExpression(classId)))
}
