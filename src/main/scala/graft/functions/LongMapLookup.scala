package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `long_lookup(s)` — broadcast-table probe: map a string through a
 * driver-built string → long table shipped as a `Broadcast` handle
 * (TorrentBroadcast once per executor; the serialized expression only
 * carries the reference), with a default for absent keys. One hash
 * probe per row inside whole-stage codegen.
 *
 * This is what `element_at(typedlit(map), key)` should be but isn't:
 * Spark's literal maps are `ArrayBasedMapData`, so `GetMapValue`
 * probes them by LINEAR SCAN — O(|vocab|) per row, hopeless for a
 * 50k-entry vocabulary against billions of rows. The HashMap probe
 * here is O(1) regardless of table size.
 */
case class LongMapLookupExpr(child: Expression,
    table: Broadcast[java.util.HashMap[String, java.lang.Long]], default: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "long_lookup"
  override protected def withNewChildInternal(c: Expression): LongMapLookupExpr =
    copy(child = c)

  override def nullSafeEval(input: Any): Any =
    LongMapLookupExpr.probe(input.asInstanceOf[UTF8String], table.value, default)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the BROADCAST (small), resolve .value() once into a
    // mutable-state local — not per row. Raw types: Janino, no generics.
    val ref = ctx.addReferenceObj("lookupTableBc", table,
      "org.apache.spark.broadcast.Broadcast")
    val tbl = ctx.addMutableState("java.util.HashMap", "lookupTable",
      v => s"$v = (java.util.HashMap) $ref.value();")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LongMapLookupExpr.probe($c, $tbl, ${default}L)")
  }
}

object LongMapLookupExpr {

  /** Generated-code entry point. */
  def probe(s: UTF8String, m: java.util.HashMap[String, java.lang.Long],
      default: Long): Long = {
    val v = m.get(s.toString)
    if (v == null) default else v.longValue()
  }

  def lookup(key: Column,
      table: Broadcast[java.util.HashMap[String, java.lang.Long]],
      default: Long): Column =
    Bridge.column(LongMapLookupExpr(Bridge.expression(key), table, default))
}
