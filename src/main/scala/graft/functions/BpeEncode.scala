package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `bpe_encode(word)` — apply a trained BPE merge table (Sennrich et
 * al. 2016, arXiv:1508.07909) to one word, returning its subword
 * tokens. This closes the tokenizer loop that
 * `CorpusStats.bpeTrain` opens: merges learned in-engine now tokenize
 * the corpus in-engine, so token budgets, packing, and fertility run
 * on the SAME tokenizer training will use, not a regex approximation.
 *
 * Semantics mirror the trainer's application loop exactly: the word
 * splits into CODE POINTS (what `bpePairCounts`' substr sees), then
 * each rule applies in merge-rank order as ONE left-to-right
 * non-overlapping pass. For any rank-consistent merge table (every
 * pair's component symbols merged at lower ranks — the invariant BPE
 * training guarantees by construction), one pass per rule is exact:
 * when rule i runs, no rule < i is applicable anywhere, and the new
 * symbol only participates in rules > i. This is also why the
 * correctness oracle can mirror the encode as CHAINED `replace` calls
 * over a marker-delimited form.
 *
 * The merge table ships as a `Broadcast` HANDLE (the serialized
 * expression carries only the reference; TorrentBroadcast moves the
 * table once per executor — the `UnigramNllExpr` shape). Word-TYPE
 * memoization makes the amortized cost per corpus row one hash probe:
 * natural-language corpora repeat word types heavily (Zipf), so the
 * O(rules · word length) walk runs roughly once per type per task,
 * not once per token. The memo is per-thread (eval path: expression
 * instances are shared across local-mode task threads) / per
 * codegen object, and capped so an adversarial corpus of unique
 * words cannot grow it unboundedly.
 */
case class BpeEncodeExpr(child: Expression,
    merges: Broadcast[Array[Array[String]]]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"
  override protected def withNewChildInternal(c: Expression): BpeEncodeExpr =
    copy(child = c)

  @transient private lazy val memo:
      ThreadLocal[java.util.HashMap[String, ArrayData]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, ArrayData]())

  override def nullSafeEval(input: Any): Any =
    BpeEncodeExpr.encode(input.asInstanceOf[UTF8String], merges.value,
      memo.get())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the BROADCAST (small), resolve .value() once into a
    // mutable-state local — not per row. Raw types: Janino, no generics.
    val ref = ctx.addReferenceObj("bpeMergesBc", merges,
      "org.apache.spark.broadcast.Broadcast")
    val tbl = ctx.addMutableState("java.lang.String[][]", "bpeMerges",
      v => s"$v = (java.lang.String[][]) $ref.value();")
    val memoV = ctx.addMutableState("java.util.HashMap", "bpeMemo",
      v => s"$v = new java.util.HashMap();")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeEncodeExpr.encode($c, $tbl, $memoV)")
  }
}

/**
 * `bpe_encode_text(text)` — whole-document BPE encode: splits on
 * single spaces (the [[graft.operators.TextOps]] `tokens` contract,
 * `split(text, " ")`) and concatenates each word's
 * [[BpeEncodeExpr]] tokens in order. One codegen'd virtual call per
 * ROW instead of one interpreted higher-order-function lambda per
 * WORD — the HOF form (`flatten(transform(tokens, bpe(_)))`)
 * evaluates the lambda outside whole-stage codegen and read 17 s at
 * the 100× probe; this form reads ~2 s for identical output.
 *
 * `pretok = true` switches the split to the GPT-2 regex
 * pre-tokenizer ([[PreTokenizeExpr]]): segments keep their leading
 * space (which then participates in merges, the `Ġ`-style GPT-2
 * vocabulary shape) and each segment encodes independently —
 * merges never span a segment boundary, the pre-tokenizer's whole
 * point. The ws split stays the default.
 */
case class BpeEncodeTextExpr(child: Expression,
    merges: Broadcast[Array[Array[String]]],
    pretok: Boolean = false) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode_text"
  override protected def withNewChildInternal(c: Expression): BpeEncodeTextExpr =
    copy(child = c)

  @transient private lazy val memo:
      ThreadLocal[java.util.HashMap[String, ArrayData]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, ArrayData]())

  override def nullSafeEval(input: Any): Any =
    if (pretok)
      BpeEncodeExpr.encodeTextPretok(input.asInstanceOf[UTF8String],
        merges.value, memo.get())
    else
      BpeEncodeExpr.encodeText(input.asInstanceOf[UTF8String], merges.value,
        memo.get())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMergesBc", merges,
      "org.apache.spark.broadcast.Broadcast")
    val tbl = ctx.addMutableState("java.lang.String[][]", "bpeMerges",
      v => s"$v = (java.lang.String[][]) $ref.value();")
    val memoV = ctx.addMutableState("java.util.HashMap", "bpeMemo",
      v => s"$v = new java.util.HashMap();")
    val fn = if (pretok) "encodeTextPretok" else "encodeText"
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeEncodeExpr.$fn($c, $tbl, $memoV)")
  }
}

object BpeEncodeExpr {

  // word types actually seen per task stay far below this for any
  // natural corpus; the cap only bounds adversarial all-unique input
  private val memoCap = 1 << 20

  /** One rank-ordered application of the merge table over a symbol
   * array — the trainer's left-to-right non-overlapping pass, shared
   * by the plain and byte-fallback encodes. */
  private def mergePass(start: Array[String],
      rules: Array[Array[String]]): Array[String] = {
    var syms = start
    var i = 0
    while (i < rules.length && syms.length >= 2) {
      val l = rules(i)(0)
      val r = rules(i)(1)
      // one left-to-right, non-overlapping pass (the trainer's loop)
      var j = 0
      var changed = false
      while (j < syms.length - 1 && !changed) {
        changed = syms(j) == l && syms(j + 1) == r
        j += 1
      }
      if (changed) {
        val b = Array.newBuilder[String]
        j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
            b += (l + r); j += 2
          } else { b += syms(j); j += 1 }
        }
        syms = b.result()
      }
      i += 1
    }
    syms
  }

  /** The `<0xXX>` piece for one byte — SentencePiece's byte-fallback
   * rendering (uppercase hex). */
  def bytePiece(b: Int): String = f"<0x$b%02X>"

  /** UTF-8 byte pieces of one code point — pure integer arithmetic
   * (so the SQL oracle reproduces it from `unicode(c)` exactly). */
  def byteFallback(cp: Int): Array[String] =
    if (cp < 0x80) Array(bytePiece(cp))
    else if (cp < 0x800)
      Array(bytePiece(0xC0 | (cp >> 6)), bytePiece(0x80 | (cp & 0x3F)))
    else if (cp < 0x10000)
      Array(bytePiece(0xE0 | (cp >> 12)),
        bytePiece(0x80 | ((cp >> 6) & 0x3F)),
        bytePiece(0x80 | (cp & 0x3F)))
    else
      Array(bytePiece(0xF0 | (cp >> 18)),
        bytePiece(0x80 | ((cp >> 12) & 0x3F)),
        bytePiece(0x80 | ((cp >> 6) & 0x3F)),
        bytePiece(0x80 | (cp & 0x3F)))

  /** Generated-code / eval entry point. */
  def encode(w: UTF8String, rules: Array[Array[String]],
      memo: java.util.HashMap[String, ArrayData]): ArrayData = {
    val s = w.toString
    val hit = memo.get(s)
    if (hit != null) return hit
    // code-point split (NOT UTF-16 units): matches bpePairCounts'
    // substr semantics and bpeTrain's driver split
    val syms = mergePass(
      s.codePoints().toArray.map(cp => new String(Character.toChars(cp))),
      rules)
    val out = new GenericArrayData(
      syms.map(x => UTF8String.fromString(x): Any))
    if (memo.size < memoCap) memo.put(s, out)
    out
  }

  /** Byte-fallback word encode: code points OUTSIDE the alphabet
   * (sorted cp array, binary-searched) decompose into their UTF-8
   * `<0xXX>` pieces BEFORE the merge pass — the GPT-2/SentencePiece
   * byte_fallback norm, so arbitrary UTF-8 always encodes with zero
   * unknown-piece loss. Merge rules then apply to the mixed
   * char/byte-piece stream as usual (rules trained over byte pieces
   * fire on them; rules over out-of-alphabet chars simply never
   * match, on both engines alike). */
  def encodeBytes(w: UTF8String, rules: Array[Array[String]],
      alpha: Array[Int],
      memo: java.util.HashMap[String, ArrayData]): ArrayData = {
    val s = w.toString
    val hit = memo.get(s)
    if (hit != null) return hit
    val b = Array.newBuilder[String]
    s.codePoints().toArray.foreach { cp =>
      if (java.util.Arrays.binarySearch(alpha, cp) >= 0)
        b += new String(Character.toChars(cp))
      else b ++= byteFallback(cp)
    }
    val syms = mergePass(b.result(), rules)
    val out = new GenericArrayData(
      syms.map(x => UTF8String.fromString(x): Any))
    if (memo.size < memoCap) memo.put(s, out)
    out
  }

  /** Whole-text vocab-card entry point: the doc's BPE tokens
   * PRE-AGGREGATED doc-locally — one `(token, cnt)` row per DISTINCT
   * token in the doc (a hash pass, no sort) — so one explode feeds
   * corpus counts (`sum(cnt)`) AND document frequency (`count(*)`)
   * in a single scan, over per-doc-distinct rows instead of every
   * token occurrence. Computed here, inside codegen: the
   * `transform(..., (x, i) => …)` HOF form of the same derivation
   * evaluates its lambda interpreted per ELEMENT and measured 2× the
   * whole query at the 100× probe, and per-occurrence struct rows
   * still read 1.5× — the doc-local combine is what pays. */
  def encodeTextCard(t: UTF8String, rules: Array[Array[String]],
      memo: java.util.HashMap[String, ArrayData]): ArrayData = {
    val toks = encodeText(t, rules, memo)
    val n = toks.numElements()
    // mutable-cell values: ONE hash probe per occurrence (get+put
    // would double it — this loop runs once per corpus token and
    // dominated the card's 100× probe)
    val counts = new java.util.HashMap[UTF8String, Array[Long]](32)
    var i = 0
    while (i < n) {
      val tok = toks.getUTF8String(i)
      val c = counts.get(tok)
      if (c == null) counts.put(tok, Array(1L)) else c(0) += 1L
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](e.getKey, e.getValue()(0)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Whole-text byte-fallback entry point — [[encodeText]]'s split
   * contract with [[encodeBytes]] per word. */
  def encodeTextBytes(t: UTF8String, rules: Array[Array[String]],
      alpha: Array[Int],
      memo: java.util.HashMap[String, ArrayData]): ArrayData = {
    val parts = t.toString.split(" ", -1)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) {
        val a = encodeBytes(UTF8String.fromString(parts(i)), rules,
          alpha, memo)
        var j = 0
        val n = a.numElements()
        while (j < n) { out += a.getUTF8String(j); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Whole-text entry point: split on single spaces (the exact
   * `split(text, " ")` semantics — a regex whose pattern is one
   * space splits on literal spaces, keeping empty tokens, which
   * encode to nothing), words encoded via the shared memo. */
  def encodeText(t: UTF8String, rules: Array[Array[String]],
      memo: java.util.HashMap[String, ArrayData]): ArrayData = {
    val parts = t.toString.split(" ", -1)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) {
        val a = encode(UTF8String.fromString(parts(i)), rules, memo)
        var j = 0
        val n = a.numElements()
        while (j < n) { out += a.getUTF8String(j); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Whole-text PRETOK entry point: [[PreTokenizeExpr]]'s regex
   * segments (leading spaces attached) each encode independently via
   * the shared word-type memo — a segment is never empty by regex
   * construction, and whitespace-run segments encode like any other
   * (their symbols merge only if the table says so). */
  def encodeTextPretok(t: UTF8String, rules: Array[Array[String]],
      memo: java.util.HashMap[String, ArrayData]): ArrayData = {
    val segs = PreTokenizeExpr.segments(t)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    val np = segs.numElements()
    while (i < np) {
      val a = encode(segs.getUTF8String(i), rules, memo)
      var j = 0
      val n = a.numElements()
      while (j < n) { out += a.getUTF8String(j); j += 1 }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def bpe(word: Column, merges: Broadcast[Array[Array[String]]]): Column =
    Bridge.column(BpeEncodeExpr(Bridge.expression(word), merges))

  def bpeText(text: Column, merges: Broadcast[Array[Array[String]]],
      pretok: Boolean = false): Column =
    Bridge.column(BpeEncodeTextExpr(Bridge.expression(text), merges, pretok))

  def bpeTextBytes(text: Column, merges: Broadcast[Array[Array[String]]],
      alphabet: Broadcast[Array[Int]]): Column =
    Bridge.column(BpeEncodeTextBytesExpr(Bridge.expression(text), merges,
      alphabet))

  def bpeTextCard(text: Column,
      merges: Broadcast[Array[Array[String]]]): Column =
    Bridge.column(BpeEncodeTextCardExpr(Bridge.expression(text), merges))
}

/** `bpe_encode_text_card(text)` — [[BpeEncodeTextExpr]]'s tokens
 * pre-aggregated doc-locally to `(token, cnt)` runs
 * ([[BpeEncodeExpr.encodeTextCard]]): the one-scan input of the
 * vocab data card. */
case class BpeEncodeTextCardExpr(child: Expression,
    merges: Broadcast[Array[Array[String]]]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("token", StringType,
        nullable = false),
      org.apache.spark.sql.types.StructField("cnt",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "bpe_encode_text_card"
  override protected def withNewChildInternal(c: Expression): BpeEncodeTextCardExpr =
    copy(child = c)

  @transient private lazy val memo:
      ThreadLocal[java.util.HashMap[String, ArrayData]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, ArrayData]())

  override def nullSafeEval(input: Any): Any =
    BpeEncodeExpr.encodeTextCard(input.asInstanceOf[UTF8String],
      merges.value, memo.get())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMergesBc", merges,
      "org.apache.spark.broadcast.Broadcast")
    val tbl = ctx.addMutableState("java.lang.String[][]", "bpeMerges",
      v => s"$v = (java.lang.String[][]) $ref.value();")
    val memoV = ctx.addMutableState("java.util.HashMap", "bpeMemo",
      v => s"$v = new java.util.HashMap();")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeEncodeExpr.encodeTextCard($c, $tbl, $memoV)")
  }
}

/**
 * `bpe_encode_text_bytes(text)` — [[BpeEncodeTextExpr]] with BYTE
 * FALLBACK: code points outside the broadcast alphabet decompose
 * into UTF-8 `<0xXX>` pieces before the merge pass (the
 * GPT-2/SentencePiece byte_fallback norm), so arbitrary multilingual
 * UTF-8 — including astral-plane characters — always encodes to
 * known pieces with zero loss. Same broadcast-handle / word-type
 * memoization / codegen shape as the plain form.
 */
case class BpeEncodeTextBytesExpr(child: Expression,
    merges: Broadcast[Array[Array[String]]],
    alphabet: Broadcast[Array[Int]]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode_text_bytes"
  override protected def withNewChildInternal(c: Expression): BpeEncodeTextBytesExpr =
    copy(child = c)

  @transient private lazy val memo:
      ThreadLocal[java.util.HashMap[String, ArrayData]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, ArrayData]())

  override def nullSafeEval(input: Any): Any =
    BpeEncodeExpr.encodeTextBytes(input.asInstanceOf[UTF8String],
      merges.value, alphabet.value, memo.get())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMergesBc", merges,
      "org.apache.spark.broadcast.Broadcast")
    val tbl = ctx.addMutableState("java.lang.String[][]", "bpeMerges",
      v => s"$v = (java.lang.String[][]) $ref.value();")
    val aref = ctx.addReferenceObj("bpeAlphaBc", alphabet,
      "org.apache.spark.broadcast.Broadcast")
    val alpha = ctx.addMutableState("int[]", "bpeAlpha",
      v => s"$v = (int[]) $aref.value();")
    val memoV = ctx.addMutableState("java.util.HashMap", "bpeMemo",
      v => s"$v = new java.util.HashMap();")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeEncodeExpr.encodeTextBytes($c, $tbl, $alpha, $memoV)")
  }
}
