package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The tokenizer loop closed: bpeTrain's merges applied by bpeEncode
 * reproduce the classic Sennrich result, ids are stable, and the
 * packed layout consumes TRUE token counts. */
class BpeEncodeSpec extends SparkSpec {
  import spark.implicits._

  // the Sennrich et al. 2016 worked example: low×5 lower×2 newest×6
  // widest×3 → merges (e,s),(es,t),(l,o),(lo,w); "lowest" → [low, est]
  private def sennrichDocs = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
  ).zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")

  test("bpeTrain learns the classic Sennrich merges in order") {
    val m = CorpusStats.bpeTrain(sennrichDocs, $"text", merges = 4)
      .orderBy("merge_rank")
      .select("merge_rank", "left", "right")
      .as[(Int, String, String)].collect().toSeq
    assert(m == Seq((0, "e", "s"), (1, "es", "t"), (2, "l", "o"),
      (3, "lo", "w")))
  }

  test("encode ∘ train reproduces the Sennrich tokenization") {
    val merges = CorpusStats.bpeTrain(sennrichDocs, $"text", merges = 4)
    val probe = Seq((1L, "lowest newest widest low")).toDF("doc_id", "text")
    val enc = CorpusStats.bpeEncode(probe, $"doc_id", $"text", merges)
    val row = enc.head()
    assert(row.getSeq[String](1) == Seq("low", "est", "n", "e", "w", "est",
      "w", "i", "d", "est", "low"))
    assert(row.getLong(2) == 11L)
  }

  test("training-corpus words re-encode to the trainer's final symbols") {
    val merges = CorpusStats.bpeTrain(sennrichDocs, $"text", merges = 4)
    val types = sennrichDocs.distinct()
    val enc = CorpusStats.bpeEncode(types, $"doc_id", $"text", merges)
    val byWord = types.join(enc, types("doc_id") === enc("id"))
      .select($"text", $"bpe_tokens").as[(String, Seq[String])]
      .collect().toMap
    assert(byWord("low") == Seq("low"))
    assert(byWord("lower") == Seq("low", "e", "r"))
    assert(byWord("newest") == Seq("n", "e", "w", "est"))
    assert(byWord("widest") == Seq("w", "i", "d", "est"))
  }

  test("astral-plane code points stay whole through train and encode") {
    val docs = Seq.fill(3)("😀😀") // 😀😀 ×3
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val merges = CorpusStats.bpeTrain(docs, $"text", merges = 1)
    val m = merges.select("left", "right").as[(String, String)].head()
    assert(m == ("😀", "😀")) // whole emoji, not surrogates
    val probe = Seq((1L, "😀😀😀"))
      .toDF("doc_id", "text")
    val enc = CorpusStats.bpeEncode(probe, $"doc_id", $"text", merges).head()
    assert(enc.getSeq[String](1) ==
      Seq("😀😀", "😀"))
  }

  test("left-to-right non-overlapping pass matches the trainer's loop") {
    val merges = Seq((0, "a", "a", 0L))
      .toDF("merge_rank", "left", "right", "pair_count")
    val docs = Seq((1L, "aaa aaaa a")).toDF("doc_id", "text")
    val enc = CorpusStats.bpeEncode(docs, $"doc_id", $"text", merges).head()
    assert(enc.getSeq[String](1) == Seq("aa", "a", "aa", "aa", "a"))
  }

  test("empty and whitespace-only texts encode to zero tokens") {
    val merges = Seq((0, "a", "b", 0L))
      .toDF("merge_rank", "left", "right", "pair_count")
    val docs = Seq((1L, ""), (2L, "   "), (3L, "ab  ab"))
      .toDF("doc_id", "text")
    val out = CorpusStats.bpeEncode(docs, $"doc_id", $"text", merges)
      .orderBy("id").select("n_bpe_tokens").as[Long].collect().toSeq
    assert(out == Seq(0L, 0L, 2L)) // double space contributes nothing
  }

  test("bpeEncodeIds: lexicographic vocab, ids resolve, none unknown") {
    val merges = CorpusStats.bpeTrain(sennrichDocs, $"text", merges = 4)
    val (ids, vocab) = CorpusStats.bpeEncodeIds(sennrichDocs, $"doc_id",
      $"text", merges)
    val v = vocab.orderBy("token_id").as[(Long, String)].collect().toSeq
    // distinct emitted tokens, lexicographic rank
    assert(v.map(_._2) == v.map(_._2).sorted)
    assert(v.map(_._1) == v.indices.map(_.toLong))
    val allIds = ids.select(explode($"token_ids")).as[Long].collect()
    assert(allIds.forall(i => i >= 0 && i < v.size)) // no -1 (unknown)
    // ids decode back to the string tokens through the vocab table
    val idOf = v.map { case (i, t) => (t, i) }.toMap
    val enc = CorpusStats.bpeEncode(sennrichDocs, $"doc_id", $"text", merges)
    val strings = enc.orderBy("id").select("bpe_tokens")
      .as[Seq[String]].collect().toSeq
    val numeric = ids.orderBy("id").select("token_ids")
      .as[Seq[Long]].collect().toSeq
    assert(strings.map(_.map(idOf)) == numeric)
  }

  test("bpeVocabStats: one-pass card equals hand counts (n, df, share)") {
    val merges = CorpusStats.bpeTrain(sennrichDocs, $"text", merges = 4)
    // one multi-word doc with in-doc repetition so count > doc_freq
    val docs = Seq((1L, "low low newest"), (2L, "lowest"), (3L, "low"))
      .toDF("doc_id", "text")
    val card = CorpusStats.bpeVocabStats(docs, $"doc_id", $"text",
        merges, k = 10)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // tokens: doc1 = [low, low, n, e, w, est], doc2 = [low, est],
    // doc3 = [low] → total 9
    assert(card("low") == ((4L, 3L, 4L * 1000000L / 9L)))
    assert(card("est") == ((2L, 2L, 2L * 1000000L / 9L)))
    assert(card("n") == ((1L, 1L, 1L * 1000000L / 9L)))
    assert(card.keySet == Set("low", "est", "n", "e", "w"))
  }

  test("byte fallback: arbitrary UTF-8 encodes with zero loss, round-trips") {
    val merges = CorpusStats.bpeTrain(sennrichDocs, $"text", merges = 4)
    val alphabet = CorpusStats.bpeAlphabet(sennrichDocs, $"text")
    // mixed scripts + punctuation + 2/3/4-byte code points, all
    // OUTSIDE the training alphabet (which is d,e,i,l,n,o,r,s,t,w)
    val wild = Seq(
      (1L, "lowest Köln 東京 😀🦜 mixé"),
      (2L, "newest кот!"),
      (3L, "𝔘nicode")) // astral math letter leading a known tail
      .toDF("doc_id", "text")
    val enc = CorpusStats.bpeEncodeBytes(wild, $"doc_id", $"text",
      merges, alphabet.toSeq)
    val rows = enc.orderBy("id").select("id", "bpe_tokens")
      .as[(Long, Seq[String])].collect()
    // decode: chars pass through, <0xXX> pieces reassemble as UTF-8 —
    // the round trip must reproduce every word byte-for-byte
    def decode(pieces: Seq[String]): String = {
      val bytes = scala.collection.mutable.ArrayBuffer.empty[Byte]
      val sb = new StringBuilder
      def flush(): Unit = if (bytes.nonEmpty) {
        sb.append(new String(bytes.toArray,
          java.nio.charset.StandardCharsets.UTF_8))
        bytes.clear()
      }
      pieces.foreach { p =>
        if (p.length == 6 && p.startsWith("<0x") && p.endsWith(">"))
          bytes += Integer.parseInt(p.substring(3, 5), 16).toByte
        else { flush(); sb.append(p) }
      }
      flush(); sb.toString
    }
    val texts = wild.orderBy("doc_id").select("text")
      .as[String].collect()
    rows.zip(texts).foreach { case ((_, pieces), text) =>
      assert(decode(pieces) == text.split(" ").mkString(""),
        s"round trip lost content for: $text")
    }
    // in-alphabet words still merge normally ("lowest" → low,est)
    assert(rows(0)._2.take(2) == Seq("low", "est"))
  }

  test("byte fallback ids: CLOSED vocab, the -1 sentinel is unreachable") {
    val merges = CorpusStats.bpeTrain(sennrichDocs, $"text", merges = 4)
    val alphabet = CorpusStats.bpeAlphabet(sennrichDocs, $"text")
    // encode a corpus DISJOINT from anything the vocab was built from
    // — unseen scripts and astral chars; the closed vocabulary
    // (alphabet ∪ merge outputs ∪ 256 byte pieces) must cover it all
    val wild = Seq((1L, "Zürich 北京 🦜 shout"), (2L, "žluťoučký kůň"))
      .toDF("doc_id", "text")
    val (ids, vocab) = CorpusStats.bpeEncodeIdsBytes(wild, $"doc_id",
      $"text", merges, alphabet.toSeq)
    val v = vocab.orderBy("token_id").as[(Long, String)].collect().toSeq
    assert(v.map(_._2) == v.map(_._2).sorted)
    // all 256 byte pieces are present regardless of corpus content
    assert((0 until 256).forall(b =>
      v.exists(_._2 == graft.functions.BpeEncodeExpr.bytePiece(b))))
    val allIds = ids.select(explode($"token_ids")).as[Long].collect()
    assert(allIds.nonEmpty && allIds.forall(i => i >= 0 && i < v.size),
      "closed vocab must make the -1 unknown sentinel unreachable")
  }

  test("packSequences over true token ids conserves the stream layout") {
    val merges = CorpusStats.bpeTrain(sennrichDocs, $"text", merges = 4)
    val (ids, _) = CorpusStats.bpeEncodeIds(sennrichDocs, $"doc_id",
      $"text", merges)
    val packed = Packing.packSequences(ids, $"id", $"n_bpe_tokens",
      seqLen = 8)
    val total = ids.agg(sum($"n_bpe_tokens")).head().getLong(0)
    val windows = packed
      .agg(max($"start_seq" + $"n_seqs")).head().getLong(0)
    assert(windows == (total + 7) / 8) // contiguous stream, no gaps
    assert(packed.count() == sennrichDocs.count())
  }

  test("fertilityBpe reports true-tokenizer counts") {
    val merges = CorpusStats.bpeTrain(sennrichDocs, $"text", merges = 4)
    val docs = Seq((1L, "s1", "low lowest"), (2L, "s1", "newest"))
      .toDF("doc_id", "source", "text")
    val r = CorpusStats.fertilityBpe(docs, $"source", $"text", merges).head()
    // low→1, lowest→2, newest→4 true tokens; 3 ws tokens; 17 chars
    assert(r.getAs[Long]("ws_tokens") == 3L)
    assert(r.getAs[Long]("bpe_tokens") == 7L)
    assert(r.getAs[Long]("n_chars") == 16L)
    assert(r.getAs[Double]("fertility") == 7.0 / 3.0)
  }
}
