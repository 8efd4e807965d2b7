package graft.operators

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("tfIdf: hand-computed tf/df/idf on a tiny corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cat dog cat"), (2L, "dog fish"), (3L, "cat bird")
    ).toDF("id", "text")
    val res = TextAnalysis.tfIdf(docs, "id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(res((1L, "cat"))._1 == 2) // tf
    assert(res((1L, "cat"))._2 == 2) // df: docs 1 and 3
    assert(res((2L, "fish"))._2 == 1)
    // smooth idf: tf * (ln((N+1)/(df+1)) + 1), N = 3
    val expected = 2.0 * (math.log(4.0 / 3.0) + 1.0)
    assert(math.abs(res((1L, "cat"))._3 - expected) < 1e-12)
    // rarer terms score higher at equal tf
    assert(res((2L, "fish"))._3 > res((2L, "dog"))._3)
  }

  test("chunkDocs: hand-checked windows with overlap, short docs, " +
      "exact-multiple tails, and the stride guard") {
    import spark.implicits._
    val docs = Seq(
      (1L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"), // 10 tokens
      (2L, "solo"),                           // 1 token
      (3L, "a0 a1 a2 a3 a4 a5 a6 a7")         // 8 = exact window
    ).toDF("id", "text")
    val got = TextAnalysis.chunkDocs(docs, "id", "text",
        windowTokens = 8, strideTokens = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3)))).toMap
    // starts 0,4,8 while < 10: sizes 8,6,2; every token covered
    assert(got((1L, 0L)) == (("w0 w1 w2 w3 w4 w5 w6 w7", 8L)))
    assert(got((1L, 1L)) == (("w4 w5 w6 w7 w8 w9", 6L)))
    assert(got((1L, 2L)) == (("w8 w9", 2L)))
    assert(got((2L, 0L)) == (("solo", 1L)))
    // n == window still emits the stride-4 tail (starts 0 and 4)
    assert(got((3L, 0L)) == (("a0 a1 a2 a3 a4 a5 a6 a7", 8L)))
    assert(got((3L, 1L)) == (("a4 a5 a6 a7", 4L)))
    assert(got.size == 6)
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkDocs(docs, "id", "text",
        windowTokens = 4, strideTokens = 5)
    }
  }

  test("vocabulary: document frequencies, ties by token") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "a b")).toDF("id", "text")
    val v = TextAnalysis.vocabulary(docs, "id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(v.toSeq == Seq(("a", 3L), ("b", 2L), ("c", 1L)))
  }

  test("bigramPmi: collocations score high, chance pairs near zero") {
    import spark.implicits._
    // "new york" always co-occurs; "the" pairs with everything
    val docs = Seq(
      (1L, "new york is big"), (2L, "new york is old"),
      (3L, "the city is big"), (4L, "the city is old")
    ).toDF("id", "text")
    val pmi = TextAnalysis.bigramPmi(docs, "text", minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val ny = pmi(("new", "york"))
    assert(ny._1 == 2L)
    // exact PMI: p(ab)=2/12, c(new)=c(york)=2, nUni=16
    val expect = math.log((2.0 / 12.0) / ((2.0 / 16.0) * (2.0 / 16.0)))
    assert(math.abs(ny._2 - expect) < 1e-12)
    // the deterministic collocation outranks the promiscuous one
    assert(ny._2 > pmi(("is", "big"))._2)
  }

  test("charEntropy: hand-computed nats, constant text scores 0, " +
      "astral codepoints count once, empty text drops out") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aabb"),          // ln 2
      (2L, "zzzz"),          // 0
      (3L, "abcd"),          // ln 4
      (4L, "😀😀x"), // 2× astral + x: H(2/3,1/3)
      (5L, ""),
      // CRLF crawl text: \n excluded, \r COUNTED (the explicit
      // [^\n] class — Java `.` would silently drop the \r too and
      // diverge from the RE2 twin)
      (6L, "ab\r\nab\r\n")).toDF("doc_id", "text")
    val got = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(!got.contains(5L), "empty text has no characters")
    assert(got(1L)._1 == 4L && got(1L)._2 == 2L)
    assert(math.abs(got(1L)._3 - math.log(2.0)) < 1e-8)
    assert(got(2L)._3 == 0.0)
    assert(math.abs(got(3L)._3 - math.log(4.0)) < 1e-8)
    // the emoji is ONE codepoint (n_chars 3, 2 distinct)
    assert(got(4L)._1 == 3L && got(4L)._2 == 2L)
    val h = -(2.0 / 3) * math.log(2.0 / 3) - (1.0 / 3) * math.log(1.0 / 3)
    assert(math.abs(got(4L)._3 - h) < 1e-8)
    // doc 6 "ab\r\nab\r\n": 6 counted chars {a:2, b:2, \r:2}, \n out
    assert(got(6L)._1 == 6L && got(6L)._2 == 3L)
    assert(math.abs(got(6L)._3 - math.log(3.0)) < 1e-8)
  }

  test("distinctNgrams: hand counts for bigrams and unigrams, " +
      "boilerplate flood scores low, gram-less keys drop") {
    import spark.implicits._
    val docs = Seq(
      ("tpl", "buy now click here"), ("tpl", "buy now click here"),
      ("tpl", "buy now click here"),
      ("var", "alpha beta gamma"), ("var", "delta epsilon zeta"),
      ("tiny", "one")).toDF("src", "text")
    val bi = TextAnalysis.distinctNgrams(docs, "src", "text", n = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // tpl: 3 docs x 3 bigrams = 9 occurrences, 3 distinct -> 1/3
    // (ratio decimal(18,9)-bridged)
    assert(bi("tpl") === ((9L, 3L, 0.333333333)))
    // var: 2+2 = 4 occurrences, all distinct -> 1.0
    assert(bi("var") === ((4L, 4L, 1.0)))
    // "one" has no bigrams: the key drops
    assert(!bi.contains("tiny"))
    // unigram path: tiny has 1/1
    val uni = TextAnalysis.distinctNgrams(docs, "src", "text", n = 1)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(uni("tiny") === 1L && uni("tpl") === 4L)
  }

  test("vocabGrowth: cumulative docs and distinct-token curve, " +
      "repeat-only tail flattens, fewer docs than buckets") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b"), (2L, "b c"), (3L, "a b"), (4L, "a c"))
      .toDF("doc_id", "text")
    // buckets=2: docs {1,2} then {3,4}; vocab after slice 1 = {a,b,c}
    // = 3, slice 2 adds nothing (saturated corpus)
    val got = TextAnalysis.vocabGrowth(docs, "doc_id", "text",
      buckets = 2).orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 2L, 3L), (2L, 4L, 3L)))
    // growing corpus: each slice introduces a new token
    val grow = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("doc_id", "text")
    val g = TextAnalysis.vocabGrowth(grow, "doc_id", "text",
      buckets = 4).orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(g.toSeq === Seq((1L, 1L, 1L), (2L, 2L, 2L),
      (3L, 3L, 3L), (4L, 4L, 4L)))
    // 2 docs, 5 buckets: only occupied tiles report
    val small = TextAnalysis.vocabGrowth(
      Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text"),
      "doc_id", "text", buckets = 5).orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(small.toSeq === Seq((1L, 1L, 1L), (2L, 2L, 2L)))
  }

  test("skipgramPmi: hand-computed window-2 pair counts and PMI, " +
      "canonical unordered pairs, window growth only adds pairs") {
    import spark.implicits._
    val docs = Seq((1L, "a b c a")).toDF("id", "text")
    val got = TextAnalysis.skipgramPmi(docs, "text", window = 2,
      minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // d=1: (a,b)(b,c)(c,a→a c); d=2: (a,c)(b,a→a b)
    assert(got.view.mapValues(_._1).toMap ===
      Map(("a", "b") -> 2L, ("a", "c") -> 2L, ("b", "c") -> 1L))
    // npair = 3 + 2 = 5; unigrams a:2 b:1 c:1, nuni = 4
    val expectAb = math.log((2.0 / 5.0) / ((2.0 / 4.0) * (1.0 / 4.0)))
    assert(math.abs(got(("a", "b"))._2 - expectAb) < 1e-12)
    // window=1 restricted to adjacency only
    val w1 = TextAnalysis.skipgramPmi(docs, "text", window = 1,
      minCount = 1).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(w1 === Map(("a", "b") -> 1L, ("a", "c") -> 1L,
      ("b", "c") -> 1L))
    // untokenizable corpus: empty result, not an error
    assert(TextAnalysis.skipgramPmi(
      Seq((1L, "   ")).toDF("id", "text"), "text", window = 3)
      .count() == 0L)
  }

  test("repetition: most repeated bigram share, short docs drop out") {
    import spark.implicits._
    val df = Seq(
      (1L, "buy now buy now buy now today"), // "buy now" 3 of 6 bigrams
      (2L, "all distinct words here"),       // every bigram unique
      (3L, "single")                          // no bigrams at all
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == 2)
    assert(out(0) == ((1L, 6L, 3L, 0.5)))
    assert(out(1) == ((2L, 3L, 1L, 1.0 / 3.0)))
  }

  test("charBigramScore: typical text scores above gibberish; short " +
      "docs drop out; hand-check on a tiny corpus") {
    import spark.implicits._
    val df = Seq(
      (1L, "ababab"),       // in-distribution for this corpus
      (2L, "ababab"),
      (3L, "zq"),           // rare characters
      (4L, "x")             // no bigrams → dropped
    ).toDF("doc_id", "text")
    val out = TextAnalysis.charBigramScore(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(1L)._2 == 5L) // 5 bigrams in "ababab"
    // corpus counts: ab=6, ba=4, zq=1; prefix a=6, b=4, z=1
    // doc1 = (3*ln(6/6) + 2*ln(4/4)) / 5 = 0
    assert(byId(1L)._3 == 0.0)
    assert(byId(1L)._3 == byId(2L)._3)
    // "zq": ln(1/1) = 0 too in this tiny corpus — so instead assert
    // ordering on a corpus where frequencies actually differ
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the rat ate the hat"),
      (3L, "qqxzzj qzx jzzq")) // off-distribution
      .toDF("doc_id", "text")
    val scores = TextAnalysis.charBigramScore(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(1L) > scores(3L) && scores(2L) > scores(3L))
  }

  test("trainBpeMerges: hand-checked merge order on the classic " +
      "low/lower/lowest corpus; segmentation reproduces training") {
    import spark.implicits._
    import graft.functions.TextFunctions.bpe_segment
    // words: low×3, lower×1, lowest×1, newest×2
    // pair counts: lo 5, ow 5 (tie → lex: "l o" first), then "lo w" 5,
    // then es/st tie at 3 → "e s", then "es t" 3
    val df = Seq((1L, "low low low lower"), (2L, "lowest newest newest"))
      .toDF("id", "text")
    val merges = TextAnalysis.trainBpeMerges(df, "text", numMerges = 4)
    assert(merges == Seq(("l", "o"), ("lo", "w"), ("e", "s"), ("es", "t")),
      s"got $merges")
    // "lowest" segments to [low, est] under those 4 merges
    val ranks = TextAnalysis.bpeRanks(merges)
    val seg = Seq((1L, "lowest unseen")).toDF("id", "text")
      .select(bpe_segment(col("text"), ranks).as("s"))
      .head.getSeq[String](0).toSeq
    assert(seg.take(2) == Seq("low", "est"), s"got $seg")
    // out-of-vocab word decomposes with the same merges, no crash:
    // u n s e e n → es merge applies → u n s een? no: e,e then e,n —
    // only (e,s) and (es,t) trained, "ee" untouched
    assert(seg.drop(2) == Seq("u", "n", "s", "e", "e", "n"), s"got $seg")
  }

  test("perplexityBuckets: thirds by LM score, head is the cleanest, " +
      "approx mode agrees away from the cut") {
    import spark.implicits._
    // 30 docs: 10 clean english-ish, 10 mildly repetitive, 10 gibberish
    val docs = ((1 to 10).map(i => (i.toLong, s"the cat sat on the mat $i")) ++
      (11 to 20).map(i => (i.toLong, s"ab ab ab ba ab $i")) ++
      (21 to 30).map(i => (i.toLong, s"qz xj zq jx wv $i"))).toDF("doc_id", "text")
    val out = TextAnalysis.perplexityBuckets(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getString(3)))
    assert(out.length == 30)
    val byBucket = out.groupBy(_._3)
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    // every head score >= every middle score >= every tail score
    assert(byBucket("head").map(_._2).min >=
      byBucket("middle").map(_._2).max)
    assert(byBucket("middle").map(_._2).min >=
      byBucket("tail").map(_._2).max)
    // buckets are ~thirds (interpolated edges may shift one doc)
    assert(byBucket.values.forall(g => g.length >= 8 && g.length <= 12))
    // approx mode: same ordering property (edges may differ slightly)
    val approx = TextAnalysis.perplexityBuckets(docs, "doc_id", "text",
      approx = true)
      .collect().map(r => (r.getDouble(2), r.getString(3)))
      .groupBy(_._2)
    assert(approx("head").map(_._1).min >= approx("tail").map(_._1).max)
  }

  test("perplexityBuckets on an unscorable corpus returns an empty " +
      "frame with the bucket column, not an error") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.perplexityBuckets(df, "doc_id", "text")
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_bigrams", "lm_score", "bucket"))
    assert(out.count() == 0L)
  }

  test("charBigramScore on an empty/too-short corpus returns an empty " +
      "frame with the right schema, not an error") {
    import spark.implicits._
    val out = TextAnalysis.charBigramScore(
      Seq((1L, "x"), (2L, "")).toDF("doc_id", "text"), "doc_id", "text")
    assert(out.columns.toSeq == Seq("doc_id", "n_bigrams", "lm_score"))
    assert(out.count() == 0)
  }

  test("charBigramModel: maxModelRows guard raises (bounded, named " +
      "dials) instead of collecting an oversized model; minCount " +
      "prunes rare bigrams out of model AND denominators") {
    import spark.implicits._
    // "abcdefgh" has 7 distinct bigrams — a cap of 5 must raise
    val corpus = Seq((1L, "abcdefgh")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.charBigramModel(corpus, "text", maxModelRows = 5)
    }
    assert(e.getMessage.contains("maxModelRows=5"))
    assert(e.getMessage.contains("minCount"))
    // a cap at exactly the distinct count passes
    assert(TextAnalysis.charBigramModel(
      corpus, "text", maxModelRows = 7).size == 7)
    // minCount=2 on "aabab": bigrams aa(1) ab(2) ba(1) → only "ab"
    // survives, and its prefix denominator counts ONLY surviving
    // a-prefixed bigrams (2), so P(ab|a)=1 → lnp=0 exactly
    val pruned = TextAnalysis.charBigramModel(
      Seq((1L, "aabab")).toDF("doc_id", "text"), "text", minCount = 2L)
    assert(pruned.size == 1 && pruned.get("ab") == 0.0, s"$pruned")
  }

  test("scoreWithBigramModel: pre-fit model applies to NEW docs, " +
      "unseen bigrams take the floor") {
    import spark.implicits._
    val corpus = Seq((1L, "ababab"), (2L, "ababab")).toDF("doc_id", "text")
    val model = TextAnalysis.charBigramModel(corpus, "text")
    // in-model doc scores 0 (all P=1 in this corpus); a doc of unseen
    // bigrams scores ln(floor)
    val out = TextAnalysis.scoreWithBigramModel(
      Seq((10L, "abab"), (11L, "zzzz")).toDF("doc_id", "text"),
      "doc_id", "text", model, floorProb = 1e-9)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(10L) == 0.0)
    assert(math.abs(out(11L) - math.log(1e-9)) < 1e-4)
  }

  test("charBigramScore: astral (non-BMP) text uses codepoint bigrams " +
      "in fit AND score — in-corpus docs never hit the unseen floor") {
    import spark.implicits._
    // codepoint bigrams of "a😀b😀a": a😀, 😀b, b😀, 😀a — each P=…
    // derived from the corpus itself, so every score is finite and
    // far above the ln(1e-9) floor a UTF-16 mismatch would produce
    val corpus = Seq((1L, "a😀b😀a"), (2L, "😀😀😀")).toDF("doc_id", "text")
    val out = TextAnalysis.charBigramScore(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out(1L)._1 == 4L, "codepoint bigram count, not UTF-16 units")
    assert(out(2L)._1 == 2L)
    assert(out.values.forall(_._2 > math.log(1e-9) / 2),
      s"astral fit/score mismatch floored a score: $out")
  }

  test("char_bigram_lm kernel is total: no-bigram inputs score " +
      "(0, floor), never NaN or negative counts") {
    import spark.implicits._
    val model = new java.util.HashMap[String, java.lang.Double]()
    model.put("ab", java.lang.Double.valueOf(0.0))
    val floor = math.log(1e-9)
    val rows = Seq("", "x", "😀", "ab").toDF("t")
      .select(graft.functions.TextFunctions
        .char_bigram_lm(org.apache.spark.sql.functions.col("t"), model,
          floor).as("s"))
      .select("s.n_bigrams", "s.mean_lnp").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows(0) == ((0L, floor)))
    assert(rows(1) == ((0L, floor)))
    assert(rows(2) == ((0L, floor))) // one astral codepoint: no bigram
    assert(rows(3) == ((1L, 0.0)))
  }

  test("bigramPmi on an untokenizable corpus returns empty, not an error") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "   ")).toDF("id", "text")
    assert(TextAnalysis.bigramPmi(docs, "text").count() == 0)
    assert(TextAnalysis.bigramPmi(docs.limit(0), "text").count() == 0)
  }
  test("blocklistAudit: token-boundary matching (no substring hits), " +
      "case-fold, distinct sorted terms, zero-shuffle narrow plan") {
    import spark.implicits._
    val df = Seq(
      (1L, "the Assassin class shows nothing"),
      (2L, "bad ass and BAD words"),
      (3L, "clean text only")
    ).toDF("id", "t")
    val audit = TextAnalysis.blocklistAudit(df, "id", "t",
      Seq("ass", "bad", "unused"))
    val out = audit.orderBy("id").collect()
    // "assassin" contains "ass" as a substring but not as a token
    assert(out(0).getInt(1) == 0 && out(0).getString(2) == "" &&
      out(0).getBoolean(3))
    // distinct (BAD+bad counted once), sorted ascending, joined
    assert(out(1).getInt(1) == 2 && out(1).getString(2) == "ass bad" &&
      !out(1).getBoolean(3))
    assert(out(2).getInt(1) == 0 && out(2).getBoolean(3))
    val plan = audit.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") &&
      !plan.toLowerCase.contains("join"), plan)
  }
}
