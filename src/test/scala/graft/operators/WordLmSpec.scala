package graft.operators

import graft.SparkSpec

/** Hand-checked stupid-backoff arithmetic for the word n-gram LM —
  * every backoff tier exercised against values computed by hand from
  * the fixture counts. */
class WordLmSpec extends SparkSpec {
  import spark.implicits._

  // corpus engineered so the pruned (>= 2) tables contain exactly:
  //   trigrams: "a b c" (x2)
  //   bigrams:  "a b" (x3), "b c" (x2)
  // tokens: a=3, b=3, c=2, d=1, total=9
  private val docs = Seq(
    (1L, "a b c"),
    (2L, "a b c"),
    (3L, "a b d")).toDF("doc_id", "text")

  private def fit() = TextAnalysis.wordLmModel(docs, "text")

  test("fit: pruned tables carry exactly the >= 2 n-grams, unigrams " +
      "unpruned, total is the token count") {
    val m = fit()
    assert(m.total == 9L)
    assert(m.uni.get("a") == 3L && m.uni.get("b") == 3L &&
      m.uni.get("c") == 2L && m.uni.get("d") == 1L)
    assert(m.bi.size() == 2 && m.bi.get("a b") == 3L &&
      m.bi.get("b c") == 2L)
    assert(m.tri.size() == 1 && m.tri.get("a b c") == 2L)
  }

  test("fit: maxModelRows guard fails LOUDLY with the lockstep remedy " +
      "when the pruned tables outgrow the driver bound") {
    val ex = intercept[IllegalArgumentException] {
      TextAnalysis.wordLmModel(docs, "text", maxModelRows = 3)
    }
    assert(ex.getMessage.contains("maxModelRows") &&
      ex.getMessage.contains("LOCKSTEP"),
      s"guard must name the cap and the twin-HAVING remedy: " +
        s"${ex.getMessage}")
    // at the cap boundary the fit succeeds unchanged (4 unigrams)
    val m = TextAnalysis.wordLmModel(docs, "text", maxModelRows = 4)
    assert(m.total == 9L && m.uni.size() == 4)
  }

  test("score: every tier hand-checked (unigram start, bigram pos-2, " +
      "trigram, alpha-bigram, alpha^2-unigram)") {
    val m = fit()
    val got = TextAnalysis.scoreWithWordLm(docs, "doc_id", "text", m)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    val a = 0.4
    // doc 1/2 "a b c": pos1 uni a: ln(3/9); pos2 bigram "a b": ln(3/3);
    // pos3 trigram "a b c": ln(2/3) [context c(a b)=3]
    val s1 = (math.log(3.0 / 9.0) + math.log(3.0 / 3.0) +
      math.log(2.0 / 3.0)) / 3.0
    // doc 3 "a b d": pos1 ln(3/9); pos2 ln(3/3); pos3: trigram "a b d"
    // pruned (count 1), bigram "b d" pruned (count 1) → alpha^2 * uni:
    // ln((0.4*0.4) * (1/9))
    val s3 = (math.log(3.0 / 9.0) + math.log(3.0 / 3.0) +
      math.log(a * a * (1.0 / 9.0))) / 3.0
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(_._1) == List(1L, 2L, 3L))
    assert(got.forall(_._2 == 3L))
    assert(math.abs(got(0)._3 - r6(s1)) < 1e-9, s"${got(0)} vs $s1")
    assert(math.abs(got(1)._3 - r6(s1)) < 1e-9)
    assert(math.abs(got(2)._3 - r6(s3)) < 1e-9, s"${got(2)} vs $s3")
  }

  test("score: the alpha-bigram tier (trigram miss, bigram hit) " +
      "hand-checked on a 4-token doc") {
    val m = fit()
    // "d a b c": pos1 uni d ln(1/9); pos2 bigram "d a" pruned →
    // alpha*uni(a): ln(0.4*(3/9)); pos3 trigram "d a b" pruned, bigram
    // "a b" hit → ln(0.4*(3/3)); pos4 trigram "a b c" hit → ln(2/3)
    val probe = Seq((9L, "d a b c")).toDF("doc_id", "text")
    val got = TextAnalysis.scoreWithWordLm(probe, "doc_id", "text", m)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).head
    val want = (math.log(1.0 / 9.0) + math.log(0.4 * (3.0 / 9.0)) +
      math.log(0.4 * (3.0 / 3.0)) + math.log(2.0 / 3.0)) / 4.0
    assert(got._1 == 4L)
    assert(math.abs(got._2 - want) < 1e-6, s"$got vs $want")
  }

  test("unseen tokens (streaming batch) take the floor, empty docs " +
      "drop, prune-order violation fails loudly") {
    val m = fit()
    val probe = Seq((1L, "zz zz"), (2L, "   ")).toDF("doc_id", "text")
    val got = TextAnalysis.scoreWithWordLm(probe, "doc_id", "text", m)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // only doc 1 survives (doc 2 has no tokens); both its positions
    // score the ln(1e-9) floor: pos1 unseen uni, pos2 unseen bi+uni
    assert(got.length == 1 && got.head._1 == 1L && got.head._2 == 2L)
    assert(math.abs(got.head._3 - math.log(1e-9)) < 1e-6)
    val err = intercept[IllegalArgumentException] {
      TextAnalysis.wordLmModel(docs, "text", minCountBi = 3L,
        minCountTri = 2L)
    }
    assert(err.getMessage.contains("minCountBi"))
  }

  test("gibberish scores below typical text (the quality-filter " +
      "contract)") {
    val corpus = (1L to 40L)
      .map(i => (i, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val mixed = corpus.unionByName(
      Seq((99L, "zxq wvv qqj xkz pfff")).toDF("doc_id", "text"))
    val scored = TextAnalysis.wordLmScore(mixed, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored(99L) < scored(1L) - 1.0,
      s"gibberish ${scored(99L)} not far below typical ${scored(1L)}")
  }

  test("streaming micro-batches scored with a pre-fit model equal the " +
      "batch scoring pass on the same rows (fit/score split contract)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = (1L to 20L)
      .map(i => (i, s"alpha beta gamma doc$i delta epsilon zeta"))
      .toDF("doc_id", "text")
    val model = TextAnalysis.wordLmModel(corpus, "text")
    val batch = TextAnalysis.scoreWithWordLm(corpus, "doc_id", "text",
      model).orderBy("doc_id").collect().map(_.toSeq).toSeq
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val scored = TextAnalysis.scoreWithWordLm(
      source.toDF().toDF("doc_id", "text"), "doc_id", "text", model)
    val q = scored.writeStream.format("memory")
      .queryName("wordlm_stream_out").outputMode("append").start()
    try {
      val rows = corpus.collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      source.addData(rows.take(7))
      q.processAllAvailable()
      source.addData(rows.drop(7))
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT doc_id, n_tokens, lm_score FROM wordlm_stream_out " +
          "ORDER BY doc_id").collect().map(_.toSeq).toSeq
      assert(streamed == batch,
        "pre-fit word-LM scoring must be micro-batch invariant")
    } finally q.stop()
  }
}
