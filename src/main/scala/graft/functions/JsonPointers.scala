package graft.functions

import com.fasterxml.jackson.core.JsonPointer
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeType
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * RFC 6901 JSON-pointer extraction: parse the document **once** and
 * resolve N pointers against the tree (the reference extracts all of a
 * query's pointers in a single pass — query.go:70-84,93-110).
 *
 * Spark's own `get_json_object` speaks JSONPath (`$.a.b`), which
 * diverges from JSON pointer on `~0`/`~1` escapes, keys containing `.`,
 * and array indexing — hence a custom expression (SURVEY.md §7.3).
 *
 * For each pointer the result is a struct mirroring the reference's
 * dynamic-typing funnel (query.go:112-145):
 *   kind BYTE — 0 missing, 1 JSON null, 2 scalar, 3 object, 4 array
 *   str  STRING — Go `%v` of the scalar (numbers via float64, so
 *          `83` → "83", `1.5` → "1.5", bools → "true"/"false")
 *   num  DOUBLE — Go strconv.ParseFloat of `str`; null if unparsable
 *   keys ARRAY<STRING> — object keys in document order (objects only)
 *   raw  STRING — compact JSON text of the value (objects/arrays)
 */
case class JsonPointersExpr(doc: Expression, ptrs: Seq[String])
    extends UnaryExpression {

  override def child: Expression = doc
  override protected def withNewChildInternal(c: Expression): JsonPointersExpr =
    copy(doc = c)

  override def prettyName: String = "json_pointers"

  private val elemType = JsonPointersExpr.elemType
  override def dataType: DataType =
    StructType(ptrs.indices.map(i => StructField(s"p$i", elemType, nullable = true)))
  override def nullable: Boolean = true

  // an invalid pointer (e.g. no leading '/') never matches anything in
  // the reference (resolveFetch swallows errors, query.go:70-84) — a
  // null sentinel here resolves to kind=missing instead of throwing
  @transient private lazy val compiled: Array[JsonPointer] =
    ptrs.map { p =>
      try JsonPointer.compile(p) catch { case _: Exception => null }
    }.toArray

  /** Parse once, resolve every pointer. Shared by interpreted eval and
   * the generated code below; never returns null (missing pointers are
   * kind=0 struct fields, a wholly-null row when the doc won't parse). */
  def resolveAll(input: UTF8String): InternalRow = {
    val root: JsonNode =
      try JsonPointersExpr.mapper.readTree(input.toString)
      catch { case _: Exception => null }
    val out = new Array[Any](ptrs.length)
    if (root != null) {
      var i = 0
      while (i < compiled.length) {
        out(i) = JsonPointersExpr.resolve(root, compiled(i))
        i += 1
      }
    }
    new GenericInternalRow(out)
  }

  override def nullSafeEval(input: Any): Any =
    resolveAll(input.asInstanceOf[UTF8String])

  // Not CodegenFallback: fallback would interpret the whole subtree per
  // row AND evict the enclosing project from whole-stage codegen — the
  // hot path of every _query (SURVEY §7.3 v2). The JSON parse itself
  // can't be inlined, so the generated code evaluates the child in-gen
  // and makes a single virtual call into [[resolveAll]].
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("jsonPointersExpr", this,
      classOf[JsonPointersExpr].getName)
    nullSafeCodeGen(ctx, ev, docTerm =>
      s"${ev.value} = $self.resolveAll($docTerm);")
  }
}

object JsonPointersExpr {
  val elemType: StructType = StructType(Seq(
    StructField("kind", ByteType, nullable = false),
    StructField("str", StringType, nullable = true),
    StructField("num", DoubleType, nullable = true),
    StructField("keys", ArrayType(StringType, containsNull = false), nullable = true),
    StructField("raw", StringType, nullable = true),
  ))

  val KindMissing: Byte = 0
  val KindNull: Byte = 1
  val KindScalar: Byte = 2
  val KindObject: Byte = 3
  val KindArray: Byte = 4

  // BigDecimal floats keep the original magnitude, so overflow and
  // underflow (which Go's json.Unmarshal REJECTS with ErrRange,
  // dropping the value — resolveFetch omits the key) stay detectable
  // after parsing instead of collapsing to Infinity/0.0
  private[graft] val mapper = new ObjectMapper()
    .configure(com.fasterxml.jackson.databind.DeserializationFeature
      .USE_BIG_DECIMAL_FOR_FLOATS, true)

  // Go strconv.ParseFloat surface: decimal floats with optional
  // exponent, and the Inf/NaN spellings Go accepts. (Java's
  // Double.parseDouble would also accept "1f"/"0x1p3"; reject those.)
  private val floatRe =
    "^[+-]?(([0-9]+(\\.[0-9]*)?)|(\\.[0-9]+))([eE][+-]?[0-9]+)?$".r
  private val infNanRe = "^[+-]?([iI][nN][fF]([iI][nN][iI][tT][yY])?|[nN][aA][nN])$".r

  def goParseFloat(s: String): java.lang.Double = {
    if (floatRe.matches(s)) {
      val d = java.lang.Double.valueOf(s)
      // Go returns ErrRange on overflow (±Inf) and on underflow to
      // zero, and convertTofloat64 skips such values (query.go:345).
      val mantissa = s.takeWhile(c => c != 'e' && c != 'E')
      if (d.isInfinite) null
      else if (d.doubleValue() == 0.0 && mantissa.exists(c => c >= '1' && c <= '9')) null
      else d
    }
    else if (infNanRe.matches(s)) {
      val l = s.toLowerCase
      if (l.endsWith("nan")) java.lang.Double.valueOf(Double.NaN)
      else if (l.startsWith("-")) java.lang.Double.valueOf(Double.NegativeInfinity)
      else java.lang.Double.valueOf(Double.PositiveInfinity)
    } else null
  }

  /** A JSON number literal Go's float64 unmarshal would reject with
   * ErrRange: overflow to ±Inf, or underflow of a nonzero literal to
   * zero. The reference omits such values entirely (query.go:76-82). */
  private def numberOutOfRange(node: JsonNode): Boolean = {
    val d = node.doubleValue()
    d.isInfinite || d.isNaN ||
      (d == 0.0 && node.decimalValue().signum() != 0)
  }

  private[functions] def resolve(root: JsonNode, ptr: JsonPointer): InternalRow = {
    val node = if (ptr == null) com.fasterxml.jackson.databind.node.MissingNode.getInstance
      else root.at(ptr)
    val out = new Array[Any](5)
    if (node.isMissingNode || (node.isNumber && numberOutOfRange(node))) {
      out(0) = KindMissing
    } else node.getNodeType match {
      case JsonNodeType.NULL => out(0) = KindNull
      case JsonNodeType.OBJECT =>
        out(0) = KindObject
        val ks = new Array[Any](node.size())
        val it = node.fieldNames(); var i = 0
        while (it.hasNext) { ks(i) = UTF8String.fromString(it.next()); i += 1 }
        out(3) = new GenericArrayData(ks)
        out(4) = UTF8String.fromString(node.toString)
      case JsonNodeType.ARRAY =>
        out(0) = KindArray
        out(4) = UTF8String.fromString(node.toString)
      case _ =>
        // scalar funnel: numbers decode to float64 then Go %v
        out(0) = KindScalar
        val s =
          if (node.isNumber) GoFormat.goDouble(node.doubleValue())
          else if (node.isBoolean) { if (node.booleanValue()) "true" else "false" }
          else node.asText()
        out(1) = UTF8String.fromString(s)
        val d = goParseFloat(s)
        if (d != null) out(2) = d.doubleValue()
        out(4) = out(1)
    }
    new GenericInternalRow(out)
  }

  /** Column API: one struct field per pointer, document parsed once. */
  def jsonPointers(doc: Column, ptrs: Seq[String]): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(JsonPointersExpr(Bridge.expression(doc), ptrs))
  }
}
