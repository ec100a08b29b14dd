package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: sliding word trigrams, deduplicated") {
    val r = Seq("a b c d a b c d").toDF("t")
      .select(TextOps.shingles($"t", 3)).as[Seq[String]].head()
    assert(r.toSet == Set("a b c", "b c d", "c d a", "d a b"))
    // shorter than k → empty
    assert(Seq("a b").toDF("t").select(TextOps.shingles($"t", 3))
      .as[Seq[String]].head().isEmpty)
  }

  test("hash60 matches the md5-hex-prefix definition") {
    val got = Seq("abc").toDF("t").select(TextOps.hash60($"t")).as[Long].head()
    // first 15 hex chars of md5("abc") = 900150983cd24fb (0x900150983cd24fb)
    assert(got == java.lang.Long.parseLong("900150983cd24fb", 16))
  }

  test("langId picks the stopword-richest language") {
    val df = Seq(
      "the cat is on the mat and it is happy",
      "el gato de la casa y un perro en el patio",
      "nothing matching here xyz qqq").toDF("t")
    val r = df.select(TextOps.langId($"t")).as[String].collect()
    assert(r.toSeq == Seq("en", "es", "und"))
  }

  test("quality columns compute exact ratios") {
    val r = Seq("the quick fox!").toDF("t")
      .select(TextOps.qualityColumns($"t").map { case (n, c) => c.as(n) }: _*)
      .head()
    assert(r.getAs[Long]("n_words") == 3)
    assert(r.getAs[Double]("mean_word_len") == 12.0 / 3) // 14 chars - 3 + 1
    assert(r.getAs[Double]("punct_ratio") == 1.0 / 14)
    assert(r.getAs[Double]("stopword_ratio") == 1.0 / 3)
  }

  test("token counts: whitespace vs BPE-ish") {
    val r = Seq("hello world42 x!y").toDF("t")
      .select(TextOps.tokenCounts($"t").map { case (n, c) => c.as(n) }: _*)
      .head()
    assert(r.getAs[Long]("ws_tokens") == 3)
    // hello | world | 42 | x | ! | y
    assert(r.getAs[Long]("bpe_tokens") == 6L)
  }

  test("fingerprint normalizes whitespace and case") {
    val df = Seq("The  Quick\tFox", "the quick fox").toDF("t")
      .select(TextOps.fingerprint($"t")).as[String].collect()
    assert(df(0) == df(1))
  }

  test("winnowing fingerprints: sorted, distinct, window minima of gram hashes") {
    val text = "the quick brown fox jumps over the lazy dog"
    val Seq(fps) = Seq(text).toDF("t")
      .select(TextOps.winnowFingerprints($"t", k = 8, w = 4)).as[Seq[Long]].collect().toSeq
    assert(fps.nonEmpty && fps == fps.sorted && fps.distinct == fps)
    // reference recomputation: minima of each 4-window over 8-gram hashes
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val grams = text.sliding(8).map(h60).toVector
    val expect = grams.sliding(4).map(_.min).toVector.distinct.sorted
    assert(fps == expect)
  }

  test("repetition metrics: top/dup n-gram fractions, short docs null") {
    val df = Seq(
      (0L, "a b a b a"), // 2-grams: ab, ba, ab, ba → top 2/4, dup 1 - 2/4
      (1L, "x y"),       // one gram → top 1.0, dup 0.0
      (2L, "q")          // no 2-grams → nulls
    ).toDF("doc_id", "text")
    val r = TextOps.repetition(df, $"doc_id", $"text", n = 2)
      .orderBy("doc_id").collect()
    assert(r(0).getDouble(1) == 0.5 && r(0).getDouble(2) == 0.5)
    assert(r(1).getDouble(1) == 1.0 && r(1).getDouble(2) == 0.0)
    assert(r(2).isNullAt(1) && r(2).isNullAt(2))
  }

  test("decontamination flags docs sharing an 8-gram with the benchmark") {
    val bench = Seq("w1 w2 w3 w4 w5 w6 w7 w8").toDF("text")
    val docs = Seq(
      (0L, "pre w1 w2 w3 w4 w5 w6 w7 w8 post"), // contains the window
      (1L, "w1 w2 w3 w4 w5 w6 w7 DIFFERENT"),   // 7-gram overlap only
      (2L, "short doc")
    ).toDF("doc_id", "text")
    val r = TextOps.decontaminate(docs, $"doc_id", $"text", bench, $"text")
      .orderBy("doc_id").collect()
    assert(r.map(x => (x.getLong(1), x.getBoolean(2))).toSeq ==
      Seq((1L, true), (0L, false), (0L, false)))
  }

  test("chunking: size/stride windows, short and empty docs") {
    val docs = Seq((1L, "abcdefghij"), (2L, "abc"), (3L, "")).toDF("doc_id", "text")
    val out = TextOps.chunk(docs, $"doc_id", $"text", size = 4, stride = 3)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Int, String)].collect().toSeq
    // len 10, size 4, stride 3 -> chunks at 0,3,6 (ceil((10-4)/3)=2) = 3 chunks
    assert(out == Seq(
      (1L, 0, "abcd"), (1L, 1, "defg"), (1L, 2, "ghij"),
      (2L, 0, "abc")))
  }

  test("chunking covers every character when stride < size") {
    val docs = Seq((1L, "x" * 1013)).toDF("doc_id", "text")
    val chunks = TextOps.chunk(docs, $"doc_id", $"text", 200, 150)
      .as[(Long, Int, String)].collect()
    val covered = chunks.map(c => (c._2 * 150, c._2 * 150 + c._3.length))
      .sortBy(_._1)
    assert(covered.head._1 == 0 && covered.last._2 == 1013)
    covered.sliding(2).foreach { case Array((_, e), (s, _)) => assert(s <= e) }
  }

  test("bloom-prefiltered decontamination equals the exact path") {
    // 60 docs, a few contaminated: the bloom probe + exact confirm
    // must reproduce the broadcast-join result row for row, any fpp
    val bench = Seq("w1 w2 w3 w4 w5 w6 w7 w8",
      "q1 q2 q3 q4 q5 q6 q7 q8 q9").toDF("text")
    val docs = ((0L until 50L).map(i => (i, s"filler$i a b c d e f g h")) ++
      Seq((50L, "x w1 w2 w3 w4 w5 w6 w7 w8 y"),
        (51L, "q2 q3 q4 q5 q6 q7 q8 q9 tail")))
      .toDF("doc_id", "text")
    for (fpp <- Seq(0.5, 0.01)) { // high fpp stresses the confirm join
      val exact = TextOps.decontaminate(docs, $"doc_id", $"text", bench, $"text")
        .orderBy("doc_id").collect().toSeq
      val bloom = TextOps.decontaminateBloom(docs, $"doc_id", $"text",
          bench, $"text", fpp = fpp)
        .orderBy("doc_id").collect().toSeq
      assert(bloom == exact, s"fpp=$fpp")
    }
  }

  test("fingerprint decontamination survives small edits; exact 8-grams don't") {
    val passage = "the quick brown fox jumps over the lazy dog in the park today"
    val bench = Seq(passage).toDF("text")
    val docs = Seq(
      (0L, s"intro $passage outro"),               // verbatim reuse
      (1L, passage.replace("lazy", "lazyy") + "!"), // lightly edited reuse
      (2L, "completely different words entirely here now")
    ).toDF("doc_id", "text")
    val fp = TextOps.decontaminateByFingerprint(docs, $"doc_id", $"text",
      bench, $"text").orderBy("doc_id").collect()
    assert(fp(0).getBoolean(2) && fp(1).getBoolean(2) && !fp(2).getBoolean(2))
    // the exact word-8-gram check misses the edited copy (word count
    // differs inside every 8-gram window that spans the edit)
    val exact = TextOps.decontaminate(docs, $"doc_id", $"text", bench, $"text")
      .orderBy("doc_id").collect()
    assert(exact(0).getBoolean(2))
  }

  test("PII redaction replaces emails, IPs, phones and counts them") {
    val t = "mail a@b.co now ip 1.2.3.4 call +1 (555) 010-0100 end"
    val cols = TextOps.redactPii($"t").map { case (n, c) => c.as(n) }
    val r = Seq(t).toDF("t").select(cols: _*).head()
    assert(r.getLong(0) == 1 && r.getLong(1) == 1 && r.getLong(2) == 1)
    assert(r.getString(3) == "mail <EMAIL> now ip <IP> call <PHONE> end")
  }

  test("PII v2: Luhn/IBAN/entropy checks gate counts and redaction") {
    // one valid card, one 16-digit Luhn reject, one valid IBAN, one
    // check-digit-off IBAN, one high-entropy secret, one 33-char
    // low-entropy reject, an IPv6, plus the v1 trio
    val t = "c 4111 1111 1111 1111 bad 4111 1111 1111 1112 " +
      "ib DE89370400440532013000 nb GB82WEST12345698765431 " +
      "k aB3dE6gH9jK2mN5pQ8sT1vW4yZ7cF0rU lo " + ("a" * 33) +
      " v6 2001:0db8:85a3:0000:0000:8a2e:0370:7334 " +
      "m a@b.co ip 1.2.3.4 call +1 (555) 010-0100 end"
    val cols = TextOps.redactPiiV2($"t").map { case (n, c) => c.as(n) }
    val r = Seq(t).toDF("t").select(cols: _*).head()
    assert(r.getLong(0) == 1, "emails")
    assert(r.getLong(1) == 1, "ips")
    assert(r.getLong(2) == 1, "phones")
    assert(r.getLong(3) == 1, s"cards: Luhn must reject ...1112")
    assert(r.getLong(4) == 1, "ipv6")
    assert(r.getLong(5) == 1, "ibans: mod-97 must reject the off-by-one")
    assert(r.getLong(6) == 1, "secrets: 'a'*33 fails the entropy floor")
    val red = r.getString(7)
    assert(red.contains("<CARD>") && red.contains("4111 1111 1111 1112"),
      s"valid card redacted, invalid kept: $red")
    assert(red.contains("<IBAN>") && red.contains("GB82WEST12345698765431"))
    assert(red.contains("<SECRET>") && red.contains("a" * 33))
    assert(red.contains("<IPV6>") && red.contains("<EMAIL>") &&
      red.contains("<IP>") && red.contains("<PHONE>"))
    // boundary pins for the validators themselves
    def one(s: String, c: org.apache.spark.sql.Column) =
      Seq(s).toDF("c").select(c).as[Boolean].head()
    assert(one("79927398713", TextOps.luhnValid($"c")))   // classic vector
    assert(!one("79927398714", TextOps.luhnValid($"c")))
    assert(one("GB82WEST12345698765432", TextOps.ibanValid($"c")))
    assert(!one("GB82WEST12345698765430", TextOps.ibanValid($"c")))
    // exactly 16 distinct symbols passes; 15 fails; missing a class fails
    assert(one("abcdefghijklmN01" + "a" * 16, TextOps.secretLike($"c")))
    assert(!one("abcdefghijklmN1" + "a" * 17, TextOps.secretLike($"c")))
    assert(!one("abcdefghijklmn01" + "a" * 16, TextOps.secretLike($"c")),
      "no uppercase must fail the diversity check")
  }

  test("winnowing fingerprints: shared passages overlap, short docs empty") {
    val a = "the quick brown fox jumps over the lazy dog in the park"
    val b = "a quick brown fox jumps over the lazy dog near me"
    val r = Seq(a, b).toDF("t")
      .select(TextOps.winnowFingerprints($"t")).as[Seq[Long]].collect()
    assert(r(0).toSet.intersect(r(1).toSet).nonEmpty) // shared passage survives edits
    assert(Seq("tiny").toDF("t")
      .select(TextOps.winnowFingerprints($"t")).as[Seq[Long]].head().isEmpty)
  }

  test("novelty: shared grams lower the ratio; short docs are null") {
    // k=3 grams: doc 1 "a b c d" → {abc, bcd}; doc 2 "a b c" → {abc};
    // abc is shared, bcd unique → doc 1 novelty 1/2, doc 2 0/1.
    // doc 3 is too short for any gram → zero counts, null ratio.
    val docs = Seq((1L, "a b c d"), (2L, "a b c"), (3L, "x y"))
      .toDF("doc_id", "text")
    val got = TextOps.novelty(docs, $"doc_id", $"text", k = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(got == Seq((1L, 2L, 1L, Some(0.5)), (2L, 1L, 0L, Some(0.0)),
      (3L, 0L, 0L, None)))
  }

  test("gopher rules: integer micro signals and the keep gate") {
    // 50 words (the paper's §A1.1 floor), all alpha, stopwords 'the'
    // ×24 → keeps; the others each fail exactly one rule (too short /
    // no stopwords / long words)
    val keepDoc = (Seq.fill(24)("the word") :+ "tail ok").mkString(" ")
    val docs = Seq(
      (1L, keepDoc),
      (2L, "the a short doc"),                           // < minWords
      (3L, Seq.fill(50)("word").mkString(" ")),          // no stopwords
      (4L, (Seq.fill(10)("the") ++
        Seq.fill(40)("extraordinarily")).mkString(" ")), // mwl 12.6 > 10
      (5L, null.asInstanceOf[String]))                   // null text
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id") +:
        TextOps.gopherRules(col("text")).map { case (n, c) => c.as(n) }: _*)
      .orderBy("doc_id").collect()
    val byId = got.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getBoolean(6))
    assert(!byId(2L).getBoolean(6) && byId(2L).getLong(1) == 4L)
    assert(!byId(3L).getBoolean(6) && byId(3L).getLong(5) == 0L)
    assert(!byId(4L).getBoolean(6)) // mean word len (30+600)/50 over cap
    assert(byId(5L).isNullAt(1) && !byId(5L).getBoolean(6))
    // micro ratios are exact truncating divides: doc 1 has 50 words,
    // 24×("the"(3)+"word"(4))+"tail"(4)+"ok"(2) = 174 chars
    assert(byId(1L).getLong(2) == 174L)
    assert(byId(1L).getLong(3) == 174L * 1000000L / 50L)
    assert(byId(1L).getLong(4) == 1000000L)
    assert(byId(1L).getLong(5) == 24L)
    // threshold overrides restore a bench-tuned short-form gate
    val short = docs.filter(col("doc_id") === 2L)
      .select(TextOps.gopherRules(col("text"), minWords = 2, maxWords = 90)
        .toMap.apply("gopher_keep").as("k")).head()
    assert(short.getBoolean(0))
  }

  test("urlParts: host/domain/path/canonical decomposition") {
    val urls = Seq(
      (1L, "https://www.Example.com/a/b/c?q=1&utm_source=x#frag"),
      (2L, "http://user:pw@Sub.News.example.CO.UK:8080/path/"),
      (3L, "https://example.com"),
      (4L, "https://10.0.0.1/x"),
      (5L, "not a url"),
      (6L, null.asInstanceOf[String]),
      (7L, "https://localhost/a"),
      (8L, "https://a.b.example.com/?gclid=1&utm_campaign=z"))
      .toDF("id", "url")
    val got = urls.select(col("id") +:
        TextOps.urlParts(col("url")).map { case (n, c) => c.as(n) }: _*)
      .orderBy("id").collect()
    val byId = got.map(r => r.getLong(0) -> r).toMap
    def s(id: Long, i: Int) = Option(byId(id).getAs[String](i))
    // 1: lowercased host, frag dropped, utm stripped, depth 3, 2 params
    assert(s(1L, 2) == Some("www.example.com"))
    assert(s(1L, 3) == Some("example.com"))
    assert(byId(1L).getLong(5) == 3L && byId(1L).getLong(6) == 2L)
    assert(s(1L, 7) == Some("https://www.example.com/a/b/c?q=1"))
    // 2: userinfo + port stripped, multi-label suffix → 3-label domain,
    // trailing slash trimmed in canon
    assert(s(2L, 2) == Some("sub.news.example.co.uk"))
    assert(s(2L, 3) == Some("example.co.uk"))
    assert(s(2L, 7) == Some("http://sub.news.example.co.uk/path"))
    // 3: no path → depth 0; canon has no trailing slash
    assert(byId(3L).getLong(5) == 0L && s(3L, 7) == Some("https://example.com"))
    // 4: IP host passes through whole
    assert(s(4L, 3) == Some("10.0.0.1"))
    // 5/6: invalid / null → all-null parts
    assert((1 to 7).forall(i => byId(5L).isNullAt(i)))
    assert((1 to 7).forall(i => byId(6L).isNullAt(i)))
    // 7: single-label host is its own registered domain
    assert(s(7L, 3) == Some("localhost"))
    // 8: all params tracking → canon drops the '?' entirely
    assert(s(8L, 7) == Some("https://a.b.example.com"))
    assert(byId(8L).getLong(6) == 2L) // n_params counts raw params
  }

  test("scriptProfile: range counts, dominant-script chain, nulls") {
    val docs = Seq(
      (1L, "hello world 123"),
      (2L, "你好世界 hello"),      // 4 CJK > ... but 5 latin wins ties? 5>4
      (3L, "你好世界你好"),         // pure CJK
      (4L, "привет мир"),          // cyrillic
      (5L, "مرحبا"),               // arabic
      (6L, "12345 !!!"),           // digits only → none
      (7L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id") +:
        TextOps.scriptProfile(col("text")).map { case (n, c) => c.as(n) }: _*)
      .orderBy("doc_id").collect()
    val byId = got.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getLong(2) == 10L && byId(1L).getLong(3) == 3L &&
      byId(1L).getString(7) == "latin")
    assert(byId(2L).getLong(4) == 4L && byId(2L).getLong(2) == 5L &&
      byId(2L).getString(7) == "latin") // 5 latin >= 4 cjk
    assert(byId(3L).getString(7) == "cjk" && byId(3L).getLong(4) == 6L)
    assert(byId(4L).getString(7) == "cyrillic" && byId(4L).getLong(5) == 9L)
    assert(byId(5L).getString(7) == "arabic" && byId(5L).getLong(6) == 5L)
    assert(byId(6L).getString(7) == "none" && byId(6L).getLong(3) == 5L)
    assert(byId(7L).isNullAt(1) && byId(7L).isNullAt(7))
    // n_chars counts codepoints, not bytes: doc 3 is 6 chars
    assert(byId(3L).getLong(1) == 6L)
  }

  test("contamination report: per-group ppm rates, truncating divide") {
    val bench = Seq("w1 w2 w3 w4 w5 w6 w7 w8").toDF("text")
    val docs = Seq(
      (0L, "pre w1 w2 w3 w4 w5 w6 w7 w8 post", "srcA"), // contaminated
      (1L, "clean a b c d e f g h i j",        "srcA"),
      (2L, "also clean k l m n o p q r",       "srcA"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8",          "srcB"), // contaminated
      (4L, "fine here",                        "srcB")
    ).toDF("doc_id", "text", "source")
    val got = TextOps.contaminationReport(docs, $"doc_id", $"text",
        $"source", bench, $"text")
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("srcA", 3L, 1L, 333333L), // 1/3 → truncated micro
      ("srcB", 2L, 1L, 500000L)))
  }
}
