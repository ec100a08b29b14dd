package graft.plans

import graft.functions.{BloomContainsExpr, DotExpr, Hash60Expr, JsonPointersExpr, SimHash60, TimeParseExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

/**
 * SQL surface for the engine's native expressions — the
 * `SparkSessionExtensions` registration that makes every custom
 * codegen'd expression callable from plain `spark.sql(...)` (and from
 * JDBC/notebook users who never touch the Scala API):
 *
 * {{{
 * SparkSession.builder()
 *   .withExtensions(new GraftExtensions)          // programmatic
 *   // or: .config("spark.sql.extensions", "graft.plans.GraftExtensions")
 * spark.sql("SELECT graft_hash60(text), graft_simhash60(split(text, ' ')) FROM docs")
 * }}}
 *
 * Registered functions:
 *  - `graft_hash60(s)` — portable 60-bit md5 hash (long)
 *  - `graft_simhash60(tokens)` — 60-bit SimHash of a string array
 *  - `graft_dot(a, b)` — sequential-order double dot product
 *  - `graft_json_ptr(doc, 'ptr', ...)` — RFC 6901 multi-pointer
 *    extraction; pointer arguments must be string literals (they fix
 *    the output struct's shape at plan time)
 *
 * Catalyst sees the same expression classes the DataFrame API uses,
 * so SQL calls whole-stage-compile identically — registration adds
 * surface, not a second implementation.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def literalString(e: Expression, fn: String): String = e match {
    case Literal(s: UTF8String, _) if s != null => s.toString
    case other => throw new IllegalArgumentException(
      s"$fn expects foldable string literals for pointer arguments, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_hash60"),
      info("graft_hash60", "graft_hash60(str) - first 15 md5 hex chars as a long"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_hash60 takes one argument")
        Hash60Expr(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("graft_simhash60"),
      info("graft_simhash60", "graft_simhash60(array<string>) - 60-bit SimHash"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_simhash60 takes one argument")
        SimHash60(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(array, array) - double dot product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot takes two arguments")
        DotExpr(args(0), args(1))
      }))
    ext.injectFunction((FunctionIdentifier("graft_parse_ts"),
      info("graft_parse_ts",
        "graft_parse_ts(str) - lenient seriesly timestamp parse to epoch ns"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_parse_ts takes one argument")
        TimeParseExpr(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("graft_json_ptr"),
      info("graft_json_ptr",
        "graft_json_ptr(doc, ptr...) - RFC 6901 pointers to a struct"),
      (args: Seq[Expression]) => {
        require(args.length >= 2, "graft_json_ptr needs a doc and >=1 pointer")
        JsonPointersExpr(args.head,
          args.tail.map(literalString(_, "graft_json_ptr")))
      }))
  }
}
