package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  test("byKey: min-id keeper per derived key; null keys never cluster") {
    import spark.implicits._
    val docs = Seq(
      (5L, "https://a.com/x"), (3L, "https://a.com/x"), // dup, keeper 3
      (7L, "https://b.com/y"),                          // singleton
      (9L, null.asInstanceOf[String]),                  // null key
      (11L, null.asInstanceOf[String]))                 // null key too
      .toDF("doc_id", "url")
    val r = Dedup.byKey(docs, col("doc_id"), col("url"))
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getLong(3), x.getBoolean(4)))
    assert(r.toSeq == Seq(
      (3L, 3L, 2L, true), (5L, 3L, 2L, false), (7L, 7L, 1L, true),
      (9L, 9L, 1L, true), (11L, 11L, 1L, true))) // nulls: own keepers
  }

  test("clusters: transitive closure maps chains to one keeper") {
    import spark.implicits._
    // components: {1,5,2} via chain 1-5, 5-2 (no 1-2 pair); {7,9}; 3 unpaired
    val pairs = Seq((1L, 5L), (5L, 2L), (7L, 9L)).toDF("id1", "id2")
    val got = Dedup.clusters(pairs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (5L, 1L), (7L, 7L), (9L, 7L)))
  }

  test("clusters: long path needs multiple propagation rounds") {
    import spark.implicits._
    // a path 10-9-8-...-1: diameter 9, keeper 1 for every node
    val pairs = (1L until 10L).map(i => (i + 1, i)).toDF("id1", "id2")
    val got = Dedup.clusters(pairs).collect()
    assert(got.length == 10 && got.forall(_.getLong(1) == 1L))
  }

  test("clusters: alternating stars agrees with label propagation") {
    import spark.implicits._
    // mixed shapes: a triangle-with-tail {1,5,2,12}, a pair {7,9}, a
    // star {20,21,22,23}, and chained ids arriving in unhelpful order
    val pairs = Seq((1L, 5L), (5L, 2L), (2L, 12L), (7L, 9L),
      (20L, 21L), (20L, 22L), (20L, 23L), (12L, 1L)).toDF("id1", "id2")
    val lp = Dedup.clusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val st = Dedup.clusters(pairs, alternatingStars = true).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(st == lp)
    assert(st.filter(_._2 == 1L).map(_._1) == Set(1L, 2L, 5L, 12L))
  }

  test("clusters: stars converge in fewer rounds on a depth-8 chain") {
    import spark.implicits._
    // path 1-2-...-9 (diameter 8), edges shuffled so no round gets a
    // free ordering; both variants must label everything 1
    val pairs = scala.util.Random.shuffle((1L until 9L).map(i => (i, i + 1)))
      .toDF("id1", "id2")
    val (lpDf, lpRounds) = Dedup.clustersLabelProp(pairs)
    val (stDf, stRounds) = Dedup.clustersStars(pairs)
    val lp = lpDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val st = stDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lp == st && st == (1L to 9L).map(i => i -> 1L).toSet)
    // pointer doubling beats one-hop propagation on deep chains
    assert(stRounds < lpRounds,
      s"stars took $stRounds rounds, label prop $lpRounds")
    // and stars stay cheap on the common near-clique shape
    val clique = (for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b))
      .toDF("id1", "id2")
    assert(Dedup.clustersStars(clique)._2 <= 2)
  }

  test("clusters: stars handle empty pair frames") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(Dedup.clusters(empty, alternatingStars = true).isEmpty)
  }
  import spark.implicits._

  val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 0
    (2L, "the quick brown fox jumps over the sleepy dog"), // near dup
    (3L, "completely different text about spark engines"),
    (4L, "another unrelated document entirely different words"),
  ).toDF("doc_id", "text")

  test("exact dedup finds identical texts") {
    val r = Dedup.exact(docs, col("doc_id"), col("text")).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("keep_id") == 0L)
    assert(r.head.getAs[scala.collection.Seq[Long]]("ids").toSeq == Seq(0L, 1L))
  }

  test("shared substrings: flags the boilerplate pair, counts distinct grams") {
    import spark.implicits._
    val boiler = (1 to 12).map(i => s"b$i").mkString(" ") // exactly one 12-gram
    val data = Seq(
      (1L, s"$boiler unique tail one two three"),
      (2L, s"different head $boiler"),
      (3L, "totally unrelated words " + (1 to 12).map(i => s"x$i").mkString(" ")))
      .toDF("doc_id", "text")
    val r = Dedup.sharedSubstrings(data, col("doc_id"), col("text"), k = 12)
      .orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(r.map(x => (x._1, x._3)) == Seq((1L, true), (2L, true), (3L, false)))
    assert(r(0)._2 >= 1 && r(1)._2 >= 1 && r(2)._2 == 0)
  }

  test("source overlap normalizes pair order and counts the diagonal") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id1", "id2")
    val docs = Seq((1L, "A"), (2L, "B"), (3L, "B"), (4L, "A"),
      (5L, "A"), (6L, "A")).toDF("doc_id", "src")
    val out = Dedup.sourceOverlap(pairs, docs, col("doc_id"), col("src"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // (1,2)=A-B and (3,4)=B-A both normalize to (A,B); (5,6) is the
    // within-A diagonal
    assert(out == Map(("A", "B") -> 2L, ("A", "A") -> 1L))
  }

  test("minhash signatures: identical docs share all minima, near dups most") {
    val sigs = Dedup.minhashSignatures(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L) == sigs(1L))
    // true shingle jaccard(0,2) = 5/9 ≈ 0.56 → expect ≈ 0.56·64 ≈ 36 ± noise
    val shared23 = sigs(0L).zip(sigs(2L)).count { case (a, b) => a == b }
    assert(shared23 > 20, s"near dups should share many minima, got $shared23/64")
    val shared03 = sigs(0L).zip(sigs(3L)).count { case (a, b) => a == b }
    assert(shared03 < 16, s"unrelated docs should share few minima, got $shared03/64")
  }

  test("minhash LSH pipeline returns verified near-dup pairs") {
    val pairs = Dedup.minhashPairs(docs, col("doc_id"), col("text"), threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((0L, 1L), (0L, 2L), (1L, 2L)))
    assert(pairs.filter(p => p._2 == 1L).head._3 == 1.0)
  }

  test("containment: a doc inside a bigger doc pairs one-way") {
    val small = "alpha beta gamma delta epsilon"
    val big = s"intro words here $small plus a very long tail of other tokens " +
      "that keeps going well past the quoted body and dilutes jaccard a lot"
    val other = "totally different content with no overlap at all whatsoever"
    val d = Seq((1L, small), (2L, big), (3L, other)).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(d, col("doc_id"), col("text"),
        threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // small→big: every small shingle appears in big → containment 1.0;
    // big→small is far below threshold; `other` pairs with nothing
    assert(got.map(p => (p._1, p._2)).toSet == Set((1L, 2L)), got.toSeq)
    assert(got.head._3 == 1.0)
    // the symmetric jaccard between 1 and 2 is small — the pair LSH
    // at J-threshold 0.5 would never score it
    val j = Dedup.minhashPairs(d, col("doc_id"), col("text"), threshold = 0.5)
      .collect()
    assert(!j.map(r => (r.getLong(0), r.getLong(1))).contains((1L, 2L)))
  }

  test("containment: prefix filter preserves exact recall on forced ties") {
    // every doc shares its commonest shingles; containment must still
    // find the contained pair because the CONTAINED side's rarest
    // shingles hit the container's full set
    val base = "x y z w v u"
    val d = Seq(
      (1L, base),                        // contained in 2 and 3
      (2L, s"$base extra padding tokens one"),
      (3L, s"prefix words then $base more after"),
      (4L, "x y z unrelated suffix here")) // partial overlap only
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(d, col("doc_id"), col("text"),
        threshold = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L)), got.toString)
  }

  test("containment: the precomputed-sets variant is bit-identical to " +
      "the end-to-end entry (shared-build equivalence)") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "intro alpha beta gamma delta epsilon plus long tail words"),
      (3L, "alpha beta gamma delta"),
      (4L, "totally unrelated content with no overlap at all"))
      .toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2)).toSeq
    val direct = norm(Dedup.containmentPairs(d, col("doc_id"),
      col("text"), threshold = 0.8))
    // the pipeline shape: shingle once, checkpoint, fan out
    val shared = Dedup.hashedShingleSets(d, col("doc_id"), col("text"))
      .localCheckpoint()
    assert(norm(Dedup.containmentPairsFromSets(shared,
      threshold = 0.8)) == direct)
    assert(direct.nonEmpty)
  }

  test("lshRecallAudit: exact truth vs banded pipeline, full recall on dups") {
    val d = (0L to 39L).map(i => (i, if (i % 10 == 0)
        "the quick brown fox jumps over the lazy dog again and again"
      else s"unique document body number $i with its own distinct words $i"))
      .toDF("doc_id", "text")
    val out = Dedup.lshRecallAudit(d, col("doc_id"), col("text"),
        threshold = 0.9, rate = 1.0).head()
    // the 4 identical docs form C(4,2)=6 exact pairs; J=1.0 pairs
    // share every band, so the banding finds all of them
    assert(out.getLong(0) == 6L, out.toString)   // true_pairs
    assert(out.getLong(1) == 6L)                 // found_pairs
    assert(out.getLong(2) == 0L)                 // missed_pairs
    assert(out.getLong(3) == 1000000L)           // recall_micro
  }

  test("simhash: identical fingerprints for dups, close for near dups") {
    val fp = Dedup.simhashes(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) == fp(1L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(0L), fp(2L)) <= 12, s"near dup hamming ${ham(fp(0L), fp(2L))}")
    assert(ham(fp(0L), fp(3L)) > 12, s"unrelated hamming ${ham(fp(0L), fp(3L))}")
  }

  test("simhash banded pairs find hamming-0 dups without all-pairs join") {
    val pairs = Dedup.simhashPairs(docs, col("doc_id"), col("text"), maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 1L)))
  }

  test("ngram jaccard pairs with blocking") {
    val blocked = docs.withColumn("blk", lit("all"))
    val pairs = Dedup.ngramJaccardPairs(blocked, col("doc_id"), col("text"),
      col("blk"), threshold = 0.5).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((0L, 1L), (0L, 2L), (1L, 2L)))
    // prefix filtering is EXACT: agrees with the brute-force all-pairs
    // Jaccard at several thresholds (incl. boundary-sensitive ones)
    import spark.implicits._
    val sets = docs.collect().map { r =>
      val w = r.getString(1).split(" ").toSeq
      r.getLong(0) -> w.sliding(3).map(_.mkString(" ")).toSet
    }.toMap
    Seq(0.3, 0.5, 0.7).foreach { t =>
      val brute = (for {
        a <- sets.keys; b <- sets.keys if a < b
        j = sets(a).intersect(sets(b)).size.toDouble /
          sets(a).union(sets(b)).size
        if j >= t
      } yield (a, b)).toSet
      val got = Dedup.ngramJaccardPairs(blocked, col("doc_id"), col("text"),
        col("blk"), threshold = t).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute, s"threshold=$t")
    }
  }

  test("incremental: batch flags against the corpus only") {
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (2L, "some corpus document about distributed query engines"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (11L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 0
      (13L, "the quick brown fox jumps over the sleepy dog"), // near dup of 0
      (15L, "a genuinely novel document with fresh content words"),
      (17L, "a genuinely novel document with fresh content words")) // batch-internal dup: NOT flagged
      .toDF("doc_id", "text")
    val out = Dedup.incremental(batch, corpus, col("doc_id"), col("text"),
        threshold = 0.5)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(out.toSeq == Seq(
      (11L, 1, 1, 0),   // exact dup is also a trivial near dup
      (13L, 0, 1, 0),
      (15L, 0, 0, 1),
      (17L, 0, 0, 1)))  // internal dups are the batch-side exact() pass's job
  }

  test("incrementalIndexed: identical verdicts from the prebuilt index") {
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (2L, "some corpus document about distributed query engines"),
      (4L, ""))                        // shingle-less: null bkeys path
      .toDF("doc_id", "text")
    val batch = Seq(
      (11L, "the quick brown fox jumps over the lazy dog"),
      (13L, "the quick brown fox jumps over the sleepy dog"),
      (15L, "a genuinely novel document with fresh content words"))
      .toDF("doc_id", "text")
    val index = Dedup.corpusIndex(corpus, col("doc_id"), col("text"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
    val direct = rows(Dedup.incremental(batch, corpus,
      col("doc_id"), col("text"), threshold = 0.5))
    val indexed = rows(Dedup.incrementalIndexed(batch, index, corpus,
      col("doc_id"), col("text"), threshold = 0.5))
    assert(indexed == direct)
    assert(indexed == Seq((11L, 1, 1, 0), (13L, 0, 1, 0), (15L, 0, 0, 1)))
  }

  test("corpusIndexUpsert equals a from-scratch rebuild, bit for bit") {
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (2L, "some corpus document about distributed query engines"),
      (4L, "an early draft that will be re-ingested with new text"),
      (6L, ""))                        // shingle-less: null bkeys path
      .toDF("doc_id", "text")
    val base = Dedup.corpusIndex(corpus, col("doc_id"), col("text"))
    val batch = Seq(
      (8L, "a freshly admitted document about streaming admission"),
      // re-ingest with CHANGED text: the stale row must retire
      (4L, "the re-ingested replacement text, entirely different now"),
      // re-ingest degenerating to null text: stale row must STILL
      // retire (the raw-batch-ids anti-join, not fresh's)
      (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val upserted = Dedup.corpusIndexUpsert(base, batch,
      col("doc_id"), col("text"))
    val scratch = Dedup.corpusIndex(
      corpus.filter(!col("doc_id").isin(2L, 4L)).unionByName(batch),
      col("doc_id"), col("text"))
    // collect_list order inside bkeys is plan-dependent — compare
    // the band-key SETS (sorted), which is what probing consumes
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("fp"), col("sz"),
          array_sort(col("bkeys")).as("bk"), col("idx_params"))
        .collect().map(r => (r.getLong(0), r.getString(1),
          Option(r.get(2)), Option(r.get(3)).map(_.toString),
          r.getString(4)))
        .sortBy(_._1).toSeq
    assert(rows(upserted) == rows(scratch))
    // exactly one row per doc — no stale duplicates survived
    assert(upserted.groupBy("doc_id").count()
      .filter(col("count") > 1).isEmpty)
  }

  test("corpusIndexDelete equals a from-scratch build on corpus minus ids") {
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (2L, "some corpus document about distributed query engines"),
      (4L, "a document scheduled for takedown with enough words"),
      (6L, ""))
      .toDF("doc_id", "text")
    val base = Dedup.corpusIndex(corpus, col("doc_id"), col("text"))
    val dels = Seq(4L, 6L, 99L).toDF("id") // 99 absent: no-op
    val deleted = Dedup.corpusIndexDelete(base, dels, col("id"))
    val scratch = Dedup.corpusIndex(
      corpus.filter(!col("doc_id").isin(4L, 6L)), col("doc_id"), col("text"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("fp"), col("sz"),
          array_sort(col("bkeys")).as("bk"), col("idx_params"))
        .collect().map(r => (r.getLong(0), r.getString(1),
          Option(r.get(2)), Option(r.get(3)).map(_.toString),
          r.getString(4)))
        .sortBy(_._1).toSeq
    assert(rows(deleted) == rows(scratch))
  }

  test("gramIndexDelete re-mins deleted keepers; equals from-scratch") {
    // doc 0 is the keeper of the shared run; doc 2 repeats it (the
    // runner-up that must become keeper after 0's takedown); doc 4 is
    // unrelated; doc 0 also holds a run occurring NOWHERE else (must
    // vanish from the index)
    val shared = (1 to 8).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (0L, s"only in zero alpha beta gamma delta $shared"),
      (2L, s"prefix tokens here $shared suffix tail"),
      (4L, "completely unrelated content with its own words repeated"))
      .toDF("doc_id", "text")
    val l = 4
    val full = Dedup.gramIndex(corpus, col("doc_id"), col("text"), l)
    val remaining = corpus.filter(col("doc_id") =!= 0L)
    val deleted = Dedup.gramIndexDelete(full, Seq(0L).toDF("id"),
      col("id"), remaining, col("doc_id"), col("text"), l)
    val scratch = Dedup.gramIndex(remaining, col("doc_id"), col("text"), l)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("gh"), col("f.doc_id"), col("f.pos"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .sortBy(x => (x._1, x._2, x._3)).toSeq
    assert(rows(deleted) == rows(scratch))
    // the shared run's keeper really moved to doc 2 (re-min fired)
    val movedKeepers = rows(deleted).map(_._2).toSet
    assert(movedKeepers.contains(2L))
    assert(!movedKeepers.contains(0L))
    // doc-0-only grams vanished: deleted index is strictly smaller
    assert(rows(deleted).size < rows(full).size)
  }

  test("token gram-index family: upsert/delete/incremental ≡ from-scratch; " +
      "word↔token indexes never cross") {
    import spark.implicits._
    // id streams with a shared 6-id run across docs 0 and 2 (doc 0
    // keeps), a doc-0-only run, and a batch doc 1 repeating the run
    val shared = (100L to 107L)
    val docs = Seq(
      (0L, Seq(1L, 2L, 3L, 4L) ++ shared),
      (2L, Seq(9L, 8L) ++ shared ++ Seq(7L, 6L, 5L, 11L)),
      (4L, (200L to 212L).toSeq),
      (1L, Seq(30L, 31L) ++ shared ++ Seq(32L, 33L, 34L, 35L)),
      (3L, (300L to 311L).toSeq))
      .toDF("doc_id", "toks")
    val l = 4
    val corpus = docs.filter($"doc_id" % 2 === 0)
    val batch = docs.filter($"doc_id" % 2 === 1)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("gh"), col("f.doc_id"), col("f.pos"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .sortBy(x => (x._1, x._2, x._3)).toSeq
    // upsert ≡ from-scratch
    val part = Dedup.gramIndexTokens(corpus.filter($"doc_id" === 0L),
      $"doc_id", $"toks", l)
    val upserted = Dedup.gramIndexUpsertTokens(part,
      corpus.filter($"doc_id" =!= 0L), $"doc_id", $"toks", l)
    val full = Dedup.gramIndexTokens(corpus, $"doc_id", $"toks", l)
    assert(rows(upserted) == rows(full))
    // delete ≡ from-scratch on corpus ∖ ids (remaining passed
    // UNFILTERED — the anti-join guard must exclude the deleted doc)
    val afterDel = Dedup.gramIndexDeleteTokens(full, Seq(0L).toDF("id"),
      col("id"), corpus, $"doc_id", $"toks", l)
    val scratch = Dedup.gramIndexTokens(corpus.filter($"doc_id" =!= 0L),
      $"doc_id", $"toks", l)
    assert(rows(afterDel) == rows(scratch))
    assert(rows(afterDel).map(_._2).toSet.contains(2L)) // re-min fired
    // incremental ≡ batch operator over corpus ∪ batch, batch rows
    val inc = Dedup.exactSubstringIncrementalTokens(batch, full,
        $"doc_id", $"toks", l)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(3))).toSeq
    val all = Dedup.exactSubstringDedupTokens(docs, $"doc_id", $"toks", l)
      .filter($"doc_id" % 2 === 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(3))).toSeq
    assert(inc == all)
    assert(inc.find(_._1 == 1L).get._3 >= shared.size,
      "batch doc repeating a corpus run must lose it")
    // namespace guard: a WORD index can never screen token probes
    val wordIdx = Dedup.gramIndex(
      Seq((0L, "a b c d e f")).toDF("doc_id", "text"), col("doc_id"),
      col("text"), l)
    val e = intercept[Exception] {
      Dedup.exactSubstringIncrementalTokens(batch, wordIdx,
        $"doc_id", $"toks", l).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("gramIndex built with")), e.toString)
  }

  test("corpusIndexUpsert rejects an index built with other parameters") {
    val corpus = Seq((0L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val batch = Seq((1L, "some new batch document")).toDF("doc_id", "text")
    val index = Dedup.corpusIndex(corpus, col("doc_id"), col("text"),
      shingleK = 3)
    val e = intercept[Exception] {
      Dedup.corpusIndexUpsert(index, batch,
        col("doc_id"), col("text"), shingleK = 5).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("corpusIndex built with")), e.toString)
  }

  test("incrementalIndexed rejects an index built with other parameters") {
    val corpus = Seq((0L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val batch = Seq((1L, "some new batch document")).toDF("doc_id", "text")
    val index = Dedup.corpusIndex(corpus, col("doc_id"), col("text"),
      shingleK = 3)
    val e = intercept[Exception] {
      Dedup.incrementalIndexed(batch, index, corpus,
        col("doc_id"), col("text"), shingleK = 5).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("corpusIndex built with")), e.toString)
  }

  test("mass-duplicate bucket streams its quadratic pairs (no giant array)") {
    import spark.implicits._
    // 800 identical docs + 200 distinct: every identical doc shares
    // every band bucket, so the bucket yields C(800,2) = 319,600 pairs
    // — streamed via chained explodes, never one O(n^2) array value
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = ((0 until 800).map(i => (i.toLong, base)) ++
      (800 until 1000).map(i => (i.toLong, s"unique document number $i with words " +
        s"that do not repeat elsewhere ${i * 7} ${i * 13} ${i * 31}")))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, col("doc_id"), col("text"), threshold = 0.9)
    assert(pairs.count() == 800L * 799 / 2)
    // and simhash over the same corpus
    val sh = Dedup.simhashPairs(docs, col("doc_id"), col("text"), maxDist = 0)
    assert(sh.count() >= 800L * 799 / 2)
  }

  test("minhashPairsBounded: equals the exact path when no bucket is " +
      "oversized; bounded hot buckets emit only true pairs") {
    import spark.implicits._
    // normal corpus: no bucket over the cap → BIT-identical output
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "sits down beside the quiet river to watch the slow boats go by"
    val docs = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, base + s" tail$i")
      else (i, s"doc $i " + ("unique words nr" + i + " ") * 15)
    }.toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id1", "id2", "jaccard")
        .as[(Long, Long, Double)].collect().toSeq.sorted
    val exact = pairs(Dedup.minhashPairs(docs, $"doc_id", $"text",
      threshold = 0.8, bands = 8))
    val bounded = pairs(Dedup.minhashPairsBounded(docs, $"doc_id", $"text",
      threshold = 0.8, bands = 8, maxBucket = 4096))
    assert(exact.nonEmpty && bounded == exact)
    // hot cluster: 60 near-identical copies, cap 8 → buckets refine;
    // every emitted pair is still exact-verified ≥ t and a subset of
    // the exact path's pair set
    val page = (1 to 120).map(j => s"w$j").mkString(" ")
    val hot = (0L until 60L).map { i =>
      val toks = (1 to 120).map(j =>
        if (j == 60) s"h${i}x" else s"w$j") // 1-token perturbation
      (1000L + i, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val hotExact = pairs(Dedup.minhashPairs(hot, $"doc_id", $"text",
      threshold = 0.8, bands = 8)).toSet
    val hotBounded = pairs(Dedup.minhashPairsBounded(hot, $"doc_id", $"text",
      threshold = 0.8, bands = 8, maxBucket = 8))
    assert(hotBounded.nonEmpty, "capped buckets must still pair members")
    assert(hotBounded.toSet.subsetOf(hotExact))
    assert(hotBounded.forall(_._3 >= 0.8))
    // the cap engaged: output is far below the ~k²/2 exact pair set
    assert(hotBounded.size < hotExact.size / 2,
      s"expected star-capped output, got ${hotBounded.size} of ${hotExact.size}")
    // connectivity survives the star: most members still pair
    val touched = hotBounded.flatMap(p => Seq(p._1, p._2)).toSet
    assert(touched.size >= 30,
      s"anchor star must keep the cluster connected, touched ${touched.size}")
  }

  test("duplicate input ids never self-pair") {
    // same doc_id appearing twice (un-deduplicated upstream union)
    val dup = docs.union(docs.filter(col("doc_id") === 0L))
    val mh = Dedup.minhashPairs(dup, col("doc_id"), col("text"), threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(mh.forall(p => p._1 != p._2))
    val sh = Dedup.simhashPairs(dup, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sh.forall(p => p._1 != p._2))
  }

  test("exactKeepBest: highest quality wins, ties break to min id") {
    import spark.implicits._
    // docs 1/3/5 identical text (whitespace-normalized): 3 has the
    // best quality → keeper. docs 2/4 tie on quality → min id keeps.
    val docs = Seq(
      (1L, "same text", 9L), (3L, "same  text", 20L), (5L, "same text ", 9L),
      (2L, "other", 7L), (4L, "other", 7L),
      (6L, "solo", 4L)).toDF("doc_id", "text", "q")
    val got = Dedup.exactKeepBest(docs, col("doc_id"), col("text"), col("q"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    assert(got == Seq(
      (1L, 3L, 3L, false), (2L, 2L, 2L, true), (3L, 3L, 3L, true),
      (4L, 2L, 2L, false), (5L, 3L, 3L, false), (6L, 6L, 1L, true)))
  }

  test("spanDedup: first occurrence survives, later ones are cut") {
    import spark.implicits._
    // k=2 spans: docs a and b share span "x y" at span 0; b's copy is
    // cut. c is too short for any span (1 word) and passes verbatim.
    // d duplicates ITS OWN span ("p q p q"): the second in-doc copy
    // is cut too. Tails ("t1"/"t2"/odd trailing words) always survive.
    val docs = Seq(
      ("a", "x y a b t1"),
      ("b", "x y c d t2"),
      ("c", "z"),
      ("d", "p q p q r")).toDF("doc_id", "text")
    val got = Dedup.spanDedup(docs, col("doc_id"), col("text"), k = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      ("a", "x y a b t1", 2L, 0L),
      ("b", "c d t2", 2L, 1L),
      ("c", "z", 0L, 0L),
      ("d", "p q r", 2L, 1L)))
  }

  test("spanDedup: doc losing every span keeps only its tail") {
    import spark.implicits._
    val docs = Seq(("a", "x y"), ("b", "x y tail")).toDF("doc_id", "text")
    val got = Dedup.spanDedup(docs, col("doc_id"), col("text"), k = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(("a", "x y", 1L, 0L), ("b", "tail", 1L, 1L)))
  }

  test("clusterSplit: near-dup clusters land whole in one split") {
    import spark.implicits._
    // a + b are near-dups (shared shingles), c/d/e singletons
    val base = (1 to 30).map("tok" + _).mkString(" ")
    val docs = Seq(
      ("a", base), ("b", base + " extra"),
      ("c", (1 to 20).map("x" + _).mkString(" ")),
      ("d", (1 to 20).map("y" + _).mkString(" ")),
      ("e", (1 to 20).map("z" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.clusterSplit(docs, col("doc_id"), col("text"),
        splits = Seq(("train", 800000L), ("val", 100000L),
          ("test", 100000L)), threshold = 0.8)
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getString(2))).toMap
    assert(out.keySet == Set("a", "b", "c", "d", "e"))
    // the near-dup pair shares a representative AND a split — the
    // leakage-free property a doc-level hash split cannot give
    assert(out("a") == out("b"))
    // singletons represent themselves
    assert(out("c")._1 == "c" && out("d")._1 == "d")
    assert(out.values.forall(v =>
      Set("train", "val", "test").contains(v._2)))
    // deterministic: re-run is identical
    val again = Dedup.clusterSplit(docs, col("doc_id"), col("text"),
        splits = Seq(("train", 800000L), ("val", 100000L),
          ("test", 100000L)), threshold = 0.8)
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getString(2))).toMap
    assert(again == out)
  }

  test("exactSubstringDedup: maximal duplicated passage cut once, kept once") {
    import spark.implicits._
    // passage P = p1..p8 (8 tokens) embedded at DIFFERENT offsets —
    // the case spanDedup's fixed span grid cannot cut. l=4: every
    // 4-window of P is duplicated, the windows merge to ONE maximal
    // span, doc a (first) keeps it, doc b loses exactly P.
    val p = (1 to 8).map("p" + _).mkString(" ")
    val r8 = (1 to 8).map("r" + _).mkString(" ")
    val docs = Seq(
      ("a", s"a1 a2 a3 $p z1 z2"),
      ("b", s"b1 $p y1 y2 y3 y4 y5"),
      ("c", "c1 c2 c3"), // shorter than l: verbatim
      ("d", s"$r8 d1 d2 d3 d4 $r8")) // self-dup: 2nd copy cut
      .toDF("doc_id", "text")
    val got = Dedup.exactSubstringDedup(docs, col("doc_id"), col("text"),
        l = 4)
      .orderBy("doc_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq(
      ("a", s"a1 a2 a3 $p z1 z2", 0L, 0L),
      ("b", "b1 y1 y2 y3 y4 y5", 8L, 1L),
      ("c", "c1 c2 c3", 0L, 0L),
      ("d", s"$r8 d1 d2 d3 d4", 8L, 1L)))
  }

  test("exactSubstringDedupTokens mirrors the word path over a bijection") {
    import spark.implicits._
    // the SAME corpus twice: once as words, once as ids under a
    // word↔id bijection — every mark/merge/cut decision depends only
    // on equality classes, so the survivors must correspond exactly
    // (the id path emits arrays where the word path re-joins text)
    val p = (1 to 8).map("p" + _)
    val words = Seq(
      ("a", Seq("a1", "a2", "a3") ++ p ++ Seq("z1", "z2")),
      ("b", Seq("b1") ++ p ++ Seq("y1", "y2", "y3", "y4", "y5")),
      ("c", Seq("c1", "c2", "c3")))
    val vocab = words.flatMap(_._2).distinct.sorted.zipWithIndex.toMap
    val wdocs = words.map { case (d, ws) => (d, ws.mkString(" ")) }
      .toDF("doc_id", "text")
    val tdocs = words.map { case (d, ws) =>
      (d, ws.map(w => vocab(w).toLong)) }.toDF("doc_id", "toks")
    val w = Dedup.exactSubstringDedup(wdocs, col("doc_id"), col("text"),
        l = 4).orderBy("doc_id")
      .collect().map(r => (r.getString(0),
        if (r.getString(1).isEmpty) Seq.empty[String]
        else r.getString(1).split(" ").toSeq,
        r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val t = Dedup.exactSubstringDedupTokens(tdocs, col("doc_id"),
        col("toks"), l = 4).orderBy("doc_id")
      .collect().map(r => (r.getString(0), r.getSeq[Long](1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(w.map(_._1) == t.map(_._1))
    w.zip(t).foreach { case ((_, ws, wn, wd, wsp), (_, ts, tn, td, tsp)) =>
      assert(ts == ws.map(x => vocab(x).toLong),
        s"id survivors must mirror word survivors: $ws vs $ts")
      assert((wn, wd, wsp) == (tn, td, tsp))
    }
    // and the token path actually cut something
    assert(t.find(_._1 == "b").get._4 == 8L)
  }

  test("exactSubstringDedup: keeper window punches a hole in a drop span") {
    import spark.implicits._
    // doc e repeats doc a's passage AND owns a fresh passage Q that
    // doc f later duplicates: inside e, Q's tokens are covered by
    // KEEPER windows (first occurrence of Q) — they survive even
    // where adjacent to dropped tokens; f loses its copy of Q.
    val p = (1 to 6).map("p" + _).mkString(" ")
    val q = (1 to 6).map("q" + _).mkString(" ")
    val docs = Seq(
      ("a", s"$p a1 a2 a3 a4 a5"),
      ("e", s"$p $q"),
      ("f", s"f1 f2 $q f3")).toDF("doc_id", "text")
    val got = Dedup.exactSubstringDedup(docs, col("doc_id"), col("text"),
        l = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(
      ("a", s"$p a1 a2 a3 a4 a5"),
      ("e", q), // P dropped (2nd copy), Q kept (1st copy)
      ("f", "f1 f2 f3")))
  }

  test("exactSubstringIncremental ≡ batch dedup restricted to the batch") {
    import spark.implicits._
    val p = (1 to 10).map("p" + _).mkString(" ")
    val q = (1 to 10).map("q" + _).mkString(" ")
    val docs = Seq(
      (0L, s"a1 a2 $p a3"), (2L, s"b1 $q"), // corpus (even)
      (1L, s"c1 $p c2 c3"), // batch doc repeating a corpus passage
      (3L, s"$q d1 $q"), // batch doc repeating corpus + itself
      (5L, "e1 e2 e3")) // clean batch doc
      .toDF("doc_id", "text")
    val corpus = docs.filter($"doc_id" % 2 === 0)
    val batch = docs.filter($"doc_id" % 2 === 1)
    val inc = Dedup.exactSubstringIncremental(batch,
        Dedup.gramIndex(corpus, $"doc_id", $"text", l = 4),
        $"doc_id", $"text", l = 4)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    val full = Dedup.exactSubstringDedup(docs, $"doc_id", $"text", l = 4)
      .filter($"doc_id" % 2 === 1)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(inc.toSeq == full.toSeq)
    // and the cuts are the expected ones: both corpus passages gone
    assert(inc.toMap.apply(1L) == "c1 c2 c3")
    assert(inc.toMap.apply(3L) == "d1")
    // upsert ≡ rebuild, bit for bit
    val upserted = Dedup.gramIndexUpsert(
        Dedup.gramIndex(corpus, $"doc_id", $"text", l = 4),
        batch, $"doc_id", $"text", l = 4)
      .collect().map(_.toString).sorted.toSeq
    val rebuilt = Dedup.gramIndex(docs, $"doc_id", $"text", l = 4)
      .collect().map(_.toString).sorted.toSeq
    assert(upserted == rebuilt)
  }

  test("gramIndex consumers reject an index built under a different l") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val idx4 = Dedup.gramIndex(docs, $"doc_id", $"text", l = 4)
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    Seq(
      () => Dedup.gramIndexUpsert(idx4, docs, $"doc_id", $"text", l = 5)
        .collect(),
      () => Dedup.exactSubstringIncremental(docs, idx4,
        $"doc_id", $"text", l = 5).collect(),
      () => Dedup.gramIndexDelete(idx4, Seq(1L).toDF("id"), col("id"),
        docs, $"doc_id", $"text", l = 5).collect()
    ).foreach { f =>
      val e = intercept[Exception](f())
      assert(msgs(e).exists(_.contains("gramIndex built with")), e.toString)
    }
    // legacy frames without the tag adopt it (pre-guard artifacts)
    val legacy = idx4.drop("idx_params")
    assert(Dedup.gramIndexUpsert(legacy, docs.limit(0), $"doc_id",
      $"text", l = 4).columns.contains("idx_params"))
  }

  test("exactSubstringDedup: self-overlapping periodic repeat") {
    import spark.implicits._
    // "a b a b a b", l=2: keeper windows ab@0, ba@1 cover [0,3);
    // non-keepers ab@2, ba@3, ab@4 cover [2,6) — the overlapping
    // subtraction keeps exactly the first period-plus-one tokens
    val docs = Seq(("g", "a b a b a b")).toDF("doc_id", "text")
    val r = Dedup.exactSubstringDedup(docs, col("doc_id"), col("text"),
      l = 2).head()
    assert(r.getString(1) == "a b a" && r.getLong(3) == 3L &&
      r.getLong(4) == 1L)
  }
}
