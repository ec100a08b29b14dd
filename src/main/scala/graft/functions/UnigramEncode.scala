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
 * `unigram_encode(word)` — Viterbi segmentation of one word under a
 * unigram language model over subword pieces (Kudo 2018,
 * arXiv:1804.10959 — the SentencePiece unigram algorithm; the OTHER
 * major subword tokenizer next to BPE). The model is a broadcast
 * `(piece, nll_micro)` table; the segmentation minimizes the
 * integer-exact triple
 *
 *   (Σ nll_micro, #pieces, leftmost-longest)
 *
 * by dynamic programming over code-point positions: `best[i] = min
 * over j of best[j] + nll(piece[j..i))` with the tie broken first on
 * piece count, then on the SMALLEST split point j (the longest final
 * piece) — a total order any engine reproduces (the oracle's DP uses
 * the identical triple). A single code point absent from the vocab
 * scores `unkNllMicro` (coverage: the DP is always feasible); unknown
 * multi-code-point pieces are not candidates.
 *
 * Same deployment shape as [[BpeEncodeExpr]]: broadcast HANDLE in the
 * serialized expression, per-thread/per-codegen-object word-TYPE
 * memoization (Zipf makes the amortized per-row cost one hash probe),
 * capped memo.
 */
case class UnigramEncodeExpr(child: Expression,
    vocab: Broadcast[Array[(String, Long)]], maxPieceLen: Int,
    unkNllMicro: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_encode"
  override protected def withNewChildInternal(c: Expression): UnigramEncodeExpr =
    copy(child = c)

  @transient private lazy val memo: ThreadLocal[UnigramEncodeExpr.Memo] =
    ThreadLocal.withInitial(() =>
      new UnigramEncodeExpr.Memo(vocab.value, maxPieceLen, unkNllMicro))

  override def nullSafeEval(input: Any): Any =
    memo.get().encode(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ugVocabBc", vocab,
      "org.apache.spark.broadcast.Broadcast")
    val memoV = ctx.addMutableState("graft.functions.UnigramEncodeExpr.Memo",
      "ugMemo",
      v => s"""$v = new graft.functions.UnigramEncodeExpr.Memo(
        (scala.Tuple2[]) $ref.value(), $maxPieceLen, ${unkNllMicro}L);""")
    defineCodeGen(ctx, ev, c => s"$memoV.encodeU($c)")
  }
}

/** Whole-document form: split on single spaces (the `tokens`
 * contract), concatenate each word's Viterbi pieces — one codegen'd
 * call per ROW (the [[BpeEncodeTextExpr]] argument). */
case class UnigramEncodeTextExpr(child: Expression,
    vocab: Broadcast[Array[(String, Long)]], maxPieceLen: Int,
    unkNllMicro: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_encode_text"
  override protected def withNewChildInternal(c: Expression): UnigramEncodeTextExpr =
    copy(child = c)

  @transient private lazy val memo: ThreadLocal[UnigramEncodeExpr.Memo] =
    ThreadLocal.withInitial(() =>
      new UnigramEncodeExpr.Memo(vocab.value, maxPieceLen, unkNllMicro))

  override def nullSafeEval(input: Any): Any =
    memo.get().encodeText(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ugVocabBc", vocab,
      "org.apache.spark.broadcast.Broadcast")
    val memoV = ctx.addMutableState("graft.functions.UnigramEncodeExpr.Memo",
      "ugMemo",
      v => s"""$v = new graft.functions.UnigramEncodeExpr.Memo(
        (scala.Tuple2[]) $ref.value(), $maxPieceLen, ${unkNllMicro}L);""")
    defineCodeGen(ctx, ev, c => s"$memoV.encodeTextU($c)")
  }
}

/** `greedy_encode(word)` — [[UnigramEncodeExpr.Memo.segmentGreedy]]
 * as a codegen'd expression: greedy longest-match over the same
 * broadcast piece table (the score column is ignored; membership
 * decides). */
case class GreedyEncodeExpr(child: Expression,
    vocab: Broadcast[Array[(String, Long)]], maxPieceLen: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "greedy_encode"
  override protected def withNewChildInternal(c: Expression): GreedyEncodeExpr =
    copy(child = c)

  @transient private lazy val memo: ThreadLocal[UnigramEncodeExpr.Memo] =
    ThreadLocal.withInitial(() =>
      new UnigramEncodeExpr.Memo(vocab.value, maxPieceLen, 0L))

  override def nullSafeEval(input: Any): Any =
    memo.get().encodeGreedyU(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ugVocabBc", vocab,
      "org.apache.spark.broadcast.Broadcast")
    val memoV = ctx.addMutableState("graft.functions.UnigramEncodeExpr.Memo",
      "ugMemo",
      v => s"""$v = new graft.functions.UnigramEncodeExpr.Memo(
        (scala.Tuple2[]) $ref.value(), $maxPieceLen, 0L);""")
    defineCodeGen(ctx, ev, c => s"$memoV.encodeGreedyU($c)")
  }
}

/** `unigram_encode_bytes(word)` — [[UnigramEncodeExpr]] with BYTE
 * FALLBACK (the SentencePiece `byte_fallback` norm): the Viterbi DP
 * is IDENTICAL (unknown single code points still score
 * `unkNllMicro`, so the segmentation decision matches the plain
 * form piece for piece), but at emit time every unknown single-cp
 * piece renders as its UTF-8 `<0xXX>` pieces
 * ([[BpeEncodeExpr.byteFallback]]) — so arbitrary mixed-script +
 * astral input encodes with ZERO unknown-piece loss, and `n_pieces`
 * counts the bytes actually emitted. */
case class UnigramEncodeBytesExpr(child: Expression,
    vocab: Broadcast[Array[(String, Long)]], maxPieceLen: Int,
    unkNllMicro: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_encode_bytes"
  override protected def withNewChildInternal(c: Expression): UnigramEncodeBytesExpr =
    copy(child = c)

  @transient private lazy val memo: ThreadLocal[UnigramEncodeExpr.Memo] =
    ThreadLocal.withInitial(() =>
      new UnigramEncodeExpr.Memo(vocab.value, maxPieceLen, unkNllMicro))

  override def nullSafeEval(input: Any): Any =
    memo.get().encodeBytesU(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ugVocabBc", vocab,
      "org.apache.spark.broadcast.Broadcast")
    val memoV = ctx.addMutableState("graft.functions.UnigramEncodeExpr.Memo",
      "ugMemo",
      v => s"""$v = new graft.functions.UnigramEncodeExpr.Memo(
        (scala.Tuple2[]) $ref.value(), $maxPieceLen, ${unkNllMicro}L);""")
    defineCodeGen(ctx, ev, c => s"$memoV.encodeBytesU($c)")
  }
}

/** `greedy_encode_marked(word)` —
 * [[UnigramEncodeExpr.Memo.segmentGreedyMarked]] as a codegen'd
 * expression: BERT-style continuation-aware WordPiece inference over
 * a `##`-marked vocab ([[graft.operators.CorpusStats
 * .wordpieceVocabMarked]]). */
case class GreedyEncodeMarkedExpr(child: Expression,
    vocab: Broadcast[Array[(String, Long)]], maxPieceLen: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "greedy_encode_marked"
  override protected def withNewChildInternal(c: Expression): GreedyEncodeMarkedExpr =
    copy(child = c)

  @transient private lazy val memo: ThreadLocal[UnigramEncodeExpr.Memo] =
    ThreadLocal.withInitial(() =>
      new UnigramEncodeExpr.Memo(vocab.value, maxPieceLen, 0L))

  override def nullSafeEval(input: Any): Any =
    memo.get().encodeGreedyMarkedU(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ugVocabBc", vocab,
      "org.apache.spark.broadcast.Broadcast")
    val memoV = ctx.addMutableState("graft.functions.UnigramEncodeExpr.Memo",
      "ugMemo",
      v => s"""$v = new graft.functions.UnigramEncodeExpr.Memo(
        (scala.Tuple2[]) $ref.value(), $maxPieceLen, 0L);""")
    defineCodeGen(ctx, ev, c => s"$memoV.encodeGreedyMarkedU($c)")
  }
}

/** `greedy_encode_bytes(word)` — [[GreedyEncodeExpr]] with the same
 * emit-time byte fallback: greedy longest-match is unchanged, and
 * unknown single code points (which the plain form passes through
 * raw) render as their UTF-8 `<0xXX>` pieces. */
case class GreedyEncodeBytesExpr(child: Expression,
    vocab: Broadcast[Array[(String, Long)]], maxPieceLen: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "greedy_encode_bytes"
  override protected def withNewChildInternal(c: Expression): GreedyEncodeBytesExpr =
    copy(child = c)

  @transient private lazy val memo: ThreadLocal[UnigramEncodeExpr.Memo] =
    ThreadLocal.withInitial(() =>
      new UnigramEncodeExpr.Memo(vocab.value, maxPieceLen, 0L))

  override def nullSafeEval(input: Any): Any =
    memo.get().encodeGreedyBytesU(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ugVocabBc", vocab,
      "org.apache.spark.broadcast.Broadcast")
    val memoV = ctx.addMutableState("graft.functions.UnigramEncodeExpr.Memo",
      "ugMemo",
      v => s"""$v = new graft.functions.UnigramEncodeExpr.Memo(
        (scala.Tuple2[]) $ref.value(), $maxPieceLen, 0L);""")
    defineCodeGen(ctx, ev, c => s"$memoV.encodeGreedyBytesU($c)")
  }
}

object UnigramEncodeExpr {

  private val memoCap = 1 << 20

  /** Shared DP + memo. The same class backs the distributed
   * expressions AND the driver-side EM trainer
   * ([[graft.operators.CorpusStats]]), so training and serving
   * segment identically by construction. */
  final class Memo(vocabArr: Array[(String, Long)], maxPieceLen: Int,
      unkNllMicro: Long) extends Serializable {

    private val vocab = {
      val m = new java.util.HashMap[String, Long](vocabArr.length * 2)
      vocabArr.foreach { case (p, s) => m.put(p, s) }
      m
    }
    private val cache = new java.util.HashMap[String, Array[String]]()
    private val cacheU = new java.util.HashMap[String, ArrayData]()

    /**
     * Greedy longest-match segmentation (the WordPiece inference
     * rule, sans continuation marks): at each position take the
     * LONGEST vocab piece starting there, unknown single code points
     * pass through — the third classic subword algorithm next to BPE
     * merges and unigram Viterbi, here as the cheap O(len·maxLen)
     * tier sharing the same vocab table and memo.
     */
    def segmentGreedy(word: String): Array[String] = {
      val hit = cacheG.get(word)
      if (hit != null) return hit
      val cps = word.codePoints().toArray
      val n = cps.length
      val off = new Array[Int](n + 1)
      var k = 0
      var co = 0
      while (k < n) { co += Character.charCount(cps(k)); off(k + 1) = co; k += 1 }
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < n) {
        var l = math.min(maxPieceLen, n - i)
        var found = -1
        while (l >= 1 && found < 0) {
          if (vocab.containsKey(word.substring(off(i), off(i + l)))) found = l
          else l -= 1
        }
        val take = if (found > 0) found else 1
        out += word.substring(off(i), off(i + take))
        i += take
      }
      val arr = out.toArray
      if (cacheG.size < memoCap) cacheG.put(word, arr)
      arr
    }

    private val cacheG = new java.util.HashMap[String, Array[String]]()

    def encodeGreedyU(w: UTF8String): ArrayData =
      new GenericArrayData(segmentGreedy(w.toString)
        .map(x => UTF8String.fromString(x): Any))

    /**
     * CONTINUATION-MARKED greedy longest-match — BERT's actual
     * WordPiece inference: at the word start the candidate piece is
     * probed PLAIN, at every later position with the `##` prefix, so
     * word-initial and word-internal vocab entries match separately
     * ([[graft.operators.CorpusStats.wordpieceTrainMarked]]'s
     * namespace). Emitted pieces carry their marker (`un ##aff
     * ##able`); unknown single code points pass through in the same
     * positional form (`c` / `##c`). `maxPieceLen` bounds the
     * UNMARKED piece content length.
     */
    def segmentGreedyMarked(word: String): Array[String] = {
      val hit = cacheGM.get(word)
      if (hit != null) return hit
      val cps = word.codePoints().toArray
      val n = cps.length
      val off = new Array[Int](n + 1)
      var k = 0
      var co = 0
      while (k < n) { co += Character.charCount(cps(k)); off(k + 1) = co; k += 1 }
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < n) {
        val mark = if (i == 0) "" else "##"
        var l = math.min(maxPieceLen, n - i)
        var found = -1
        while (l >= 1 && found < 0) {
          if (vocab.containsKey(mark + word.substring(off(i), off(i + l))))
            found = l
          else l -= 1
        }
        val take = if (found > 0) found else 1
        out += (mark + word.substring(off(i), off(i + take)))
        i += take
      }
      val arr = out.toArray
      if (cacheGM.size < memoCap) cacheGM.put(word, arr)
      arr
    }

    private val cacheGM = new java.util.HashMap[String, Array[String]]()

    def encodeGreedyMarkedU(w: UTF8String): ArrayData =
      new GenericArrayData(segmentGreedyMarked(w.toString)
        .map(x => UTF8String.fromString(x): Any))

    /** Viterbi over code points; returns the piece list. */
    def segment(word: String): Array[String] = {
      val hit = cache.get(word)
      if (hit != null) return hit
      val cps = word.codePoints().toArray
      val n = cps.length
      if (n == 0) return Array.empty
      // char offsets of each code point boundary
      val off = new Array[Int](n + 1)
      var k = 0
      var co = 0
      while (k < n) { co += Character.charCount(cps(k)); off(k + 1) = co; k += 1 }
      val INF = Long.MaxValue / 4
      val nll = Array.fill(n + 1)(INF)
      val cnt = Array.fill(n + 1)(Int.MaxValue)
      val back = Array.fill(n + 1)(-1)
      nll(0) = 0L; cnt(0) = 0
      var i = 1
      while (i <= n) {
        var j = math.max(0, i - maxPieceLen)
        while (j < i) {
          if (nll(j) < INF) {
            val piece = word.substring(off(j), off(i))
            // containsKey FIRST: get on a missing key unboxes null to 0,
            // which would read as a perfect (free) score
            val s: Long =
              if (vocab.containsKey(piece)) vocab.get(piece)
              else if (i - j == 1) unkNllMicro
              else -1L
            if (s >= 0L) {
              val cand = nll(j) + s
              val candC = cnt(j) + 1
              // triple order: (nll, count, smallest j = longest piece)
              if (cand < nll(i) ||
                  (cand == nll(i) && (candC < cnt(i) ||
                    (candC == cnt(i) && j < back(i))))) {
                nll(i) = cand; cnt(i) = candC; back(i) = j
              }
            }
          }
          j += 1
        }
        i += 1
      }
      val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
      var p = n
      while (p > 0) {
        val j = back(p)
        pieces += word.substring(off(j), off(p))
        p = j
      }
      val out = pieces.reverseIterator.toArray
      if (cache.size < memoCap) cache.put(word, out)
      out
    }

    /** Total micro NLL of the best segmentation (the trainer's
     * E-step score; unk pieces contribute `unkNllMicro`). */
    def segmentNll(word: String): Long = {
      var t = 0L
      segment(word).foreach { p =>
        t += (if (vocab.containsKey(p)) vocab.get(p) else unkNllMicro)
      }
      t
    }

    def encode(word: String): ArrayData = {
      val hit = cacheU.get(word)
      if (hit != null) return hit
      val out = new GenericArrayData(
        segment(word).map(x => UTF8String.fromString(x): Any))
      if (cacheU.size < memoCap) cacheU.put(word, out)
      out
    }

    /** Emit-time byte fallback: every piece the model doesn't know
     * (by construction a single code point — the DP/greedy admit no
     * other unknowns) expands to its UTF-8 `<0xXX>` pieces. */
    private def expandUnknown(pieces: Array[String]): Array[String] = {
      var any = false
      var i = 0
      while (i < pieces.length && !any) {
        any = !vocab.containsKey(pieces(i)); i += 1
      }
      if (!any) return pieces
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      pieces.foreach { p =>
        if (vocab.containsKey(p)) out += p
        else p.codePoints().toArray.foreach(cp =>
          out ++= BpeEncodeExpr.byteFallback(cp))
      }
      out.toArray
    }

    private val cacheB = new java.util.HashMap[String, ArrayData]()
    private val cacheGB = new java.util.HashMap[String, ArrayData]()

    def encodeBytesU(w: UTF8String): ArrayData = {
      val s = w.toString
      val hit = cacheB.get(s)
      if (hit != null) return hit
      val out = new GenericArrayData(expandUnknown(segment(s))
        .map(x => UTF8String.fromString(x): Any))
      if (cacheB.size < memoCap) cacheB.put(s, out)
      out
    }

    def encodeGreedyBytesU(w: UTF8String): ArrayData = {
      val s = w.toString
      val hit = cacheGB.get(s)
      if (hit != null) return hit
      val out = new GenericArrayData(expandUnknown(segmentGreedy(s))
        .map(x => UTF8String.fromString(x): Any))
      if (cacheGB.size < memoCap) cacheGB.put(s, out)
      out
    }

    /** Generated-code entry points (UTF8String in/out). */
    def encodeU(w: UTF8String): ArrayData = encode(w.toString)

    def encodeTextU(t: UTF8String): ArrayData = encodeText(t.toString)

    def encodeText(t: String): ArrayData = {
      val parts = t.split(" ", -1)
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      var i = 0
      while (i < parts.length) {
        if (parts(i).nonEmpty) {
          val a = encode(parts(i))
          var j = 0
          val n = a.numElements()
          while (j < n) { out += a.getUTF8String(j); j += 1 }
        }
        i += 1
      }
      new GenericArrayData(out.toArray)
    }
  }

  def unigram(word: Column, vocab: Broadcast[Array[(String, Long)]],
      maxPieceLen: Int, unkNllMicro: Long): Column =
    Bridge.column(UnigramEncodeExpr(Bridge.expression(word), vocab,
      maxPieceLen, unkNllMicro))

  def greedy(word: Column, vocab: Broadcast[Array[(String, Long)]],
      maxPieceLen: Int): Column =
    Bridge.column(GreedyEncodeExpr(Bridge.expression(word), vocab,
      maxPieceLen))

  def unigramText(text: Column, vocab: Broadcast[Array[(String, Long)]],
      maxPieceLen: Int, unkNllMicro: Long): Column =
    Bridge.column(UnigramEncodeTextExpr(Bridge.expression(text), vocab,
      maxPieceLen, unkNllMicro))

  def unigramBytes(word: Column, vocab: Broadcast[Array[(String, Long)]],
      maxPieceLen: Int, unkNllMicro: Long): Column =
    Bridge.column(UnigramEncodeBytesExpr(Bridge.expression(word), vocab,
      maxPieceLen, unkNllMicro))

  def greedyBytes(word: Column, vocab: Broadcast[Array[(String, Long)]],
      maxPieceLen: Int): Column =
    Bridge.column(GreedyEncodeBytesExpr(Bridge.expression(word), vocab,
      maxPieceLen))

  def greedyMarked(word: Column, vocab: Broadcast[Array[(String, Long)]],
      maxPieceLen: Int): Column =
    Bridge.column(GreedyEncodeMarkedExpr(Bridge.expression(word), vocab,
      maxPieceLen))
}
