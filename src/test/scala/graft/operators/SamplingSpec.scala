package graft.operators

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("capPerKey keeps the first n rows per key by the given order") {
    import spark.implicits._
    val df = Seq(("en", 3L), ("en", 1L), ("en", 2L), ("fr", 9L), ("fr", 8L))
      .toDF("lang", "id")
    val out = Sampling.capPerKey(df, Seq("lang"), Seq("id"), n = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("en", 1L), ("en", 2L), ("fr", 8L), ("fr", 9L)))
  }

  test("hashSample is deterministic, partitioning-independent, ~fraction-sized") {
    import spark.implicits._
    val df = spark.range(10000).toDF("id")
    val a = Sampling.hashSample(df, "id", "28").collect()
      .map(_.getLong(0)).toSet
    val b = Sampling.hashSample(df.repartition(13), "id", "28").collect()
      .map(_.getLong(0)).toSet
    assert(a == b) // same rows whatever the partitioning
    val frac = a.size.toDouble / 10000
    assert(frac > 0.12 && frac < 0.20, s"fraction $frac vs expected ~0.156")
  }

  test("hashSample rejects non-hex thresholds") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Sampling.hashSample(Seq(1).toDF("id"), "id", "ZZ")
    }
  }

  test("stratifiedHashSample honors per-key fractions deterministically") {
    import spark.implicits._
    val df = spark.range(12000)
      .select(col("id"), (col("id") % 3).cast("string").as("k"))
    val fr = Map("0" -> 1.0, "1" -> 0.25, "2" -> 0.0)
    val a = Sampling.stratifiedHashSample(df, "id", "k", fr)
    val byKey = a.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // fraction 1.0 keeps everything, 0.0 keeps nothing
    assert(byKey("0") == 4000L)
    assert(!byKey.contains("2"))
    val f1 = byKey("1").toDouble / 4000
    assert(f1 > 0.2 && f1 < 0.3, s"stratum-1 fraction $f1 vs ~0.25")
    // partitioning-independent: identical rows after a repartition
    val b = Sampling.stratifiedHashSample(df.repartition(13), "id", "k", fr)
    assert(a.select("id").collect().map(_.getLong(0)).toSet ==
      b.select("id").collect().map(_.getLong(0)).toSet)
    // a row's fate depends only on its own id+key: the stratum-1
    // survivors are exactly the global hashSample survivors of that key
    val direct = Sampling.hashSample(df.filter(col("k") === "1"), "id",
      "4000").select("id").collect().map(_.getLong(0)).toSet
    assert(a.filter(col("k") === "1").select("id").collect()
      .map(_.getLong(0)).toSet == direct)
  }

  test("stratifiedHashSample applies the default fraction to unmapped keys") {
    import spark.implicits._
    val df = spark.range(4000)
      .select(col("id"), lit("zz").as("k"))
    val out = Sampling.stratifiedHashSample(df, "id", "k",
      Map("en" -> 0.5), defaultFraction = 1.0)
    assert(out.count() == 4000L)
    val none = Sampling.stratifiedHashSample(df, "id", "k",
      Map("en" -> 0.5), defaultFraction = 0.0)
    assert(none.count() == 0L)
  }

  test("weightedSample is deterministic, partitioning-independent, and " +
      "favors heavy weights") {
    import spark.implicits._
    // 1000 light rows (w=1) + 50 heavy rows (w=1000)
    val df = ((1 to 1000).map(i => (i.toLong, 1.0)) ++
      (2001 to 2050).map(i => (i.toLong, 1000.0))).toDF("id", "w")
    val a = Sampling.weightedSample(df, "id", "w", n = 50)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.weightedSample(df.repartition(13), "id", "w", n = 50)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b) // same winners whatever the partitioning
    // heavy rows are ~1000x more likely per slot: expect the heavy
    // group to dominate the 50 winners
    val heavy = a.count(_ >= 2001L)
    assert(heavy >= 40, s"only $heavy/50 winners from the heavy group")
  }

  test("weightedSample: zero/null/negative weights never win when " +
      "positive-weight rows remain") {
    import spark.implicits._
    val df = Seq((1L, Some(5.0)), (2L, Some(0.0)), (3L, None),
      (4L, Some(-2.0)), (5L, Some(1.0))).toDF("id", "w")
    val winners = Sampling.weightedSample(df, "id", "w", n = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(winners == Set(1L, 5L))
  }

  test("weightedSample: both modes exclude ineligible rows even when n " +
      "exceeds the eligible count") {
    import spark.implicits._
    val df = Seq((1L, Some(5.0)), (2L, Some(0.0)), (3L, None),
      (4L, Some(-2.0)), (5L, Some(1.0))).toDF("id", "w")
    for (mode <- Seq(false, true)) {
      val got = Sampling.weightedSample(df, "id", "w", n = 4,
          roundKeys = mode)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got == Set(1L, 5L), s"roundKeys=$mode returned $got")
    }
  }

  test("weightedSample plans a TakeOrderedAndProject, no corpus shuffle") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, 1.0)).toDF("id", "w")
    val plan = Sampling.weightedSample(df, "id", "w", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no top-n plan:\n$plan")
    assert(!plan.contains("Exchange"), s"corpus shuffles:\n$plan")
  }

  test("weightedSample roundKeys mode: same winners as raw mode away " +
      "from key collisions, nonpositive weights excluded") {
    import spark.implicits._
    val df = ((1 to 200).map(i => (i.toLong, (i % 7 + 1).toDouble)) ++
      Seq((500L, 0.0), (501L, -1.0))).toDF("id", "w")
    val raw = Sampling.weightedSample(df, "id", "w", n = 50)
      .select("id").collect().map(_.getLong(0)).toSet
    val rounded = Sampling.weightedSample(df, "id", "w", n = 50,
      roundKeys = true)
      .select("id").collect().map(_.getLong(0)).toSet
    // keys here are O(0.01..36) with 1e-6 rounding: collisions at the
    // cut are possible but rare — demand near-total agreement
    assert((raw intersect rounded).size >= 49, s"raw $raw vs $rounded")
    assert(!rounded.contains(500L) && !rounded.contains(501L))
    // still the same narrow top-n plan
    val plan = Sampling.weightedSample(df, "id", "w", 5, roundKeys = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject") && !plan.contains("Exchange"))
  }

  test("rebalanceToMix approximates the target mix by downsampling, " +
      "binding key kept whole, unlisted keys dropped") {
    import spark.implicits._
    // 1000 en, 200 de, 100 fr, 50 junk. Targets en .5 / de .3 / fr .2:
    // T = min(1000/.5, 200/.3, 100/.2) = 500 (fr binding, kept whole);
    // expected keeps: en 250, de 150, fr 100
    val df = ((1 to 1000).map(i => (i.toLong, "en")) ++
      (2001 to 2200).map(i => (i.toLong, "de")) ++
      (3001 to 3100).map(i => (i.toLong, "fr")) ++
      (4001 to 4050).map(i => (i.toLong, "junk"))).toDF("id", "lang")
    val got = Sampling.rebalanceToMix(df, "id", "lang",
      Map("en" -> 0.5, "de" -> 0.3, "fr" -> 0.2))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!got.contains("junk"))
    assert(got("fr") == 100L, s"binding key downsampled: $got")
    // md5 thresholds are statistical: allow ±20% per stratum
    assert(math.abs(got("en") - 250L) <= 50, s"en off target: $got")
    assert(math.abs(got("de") - 150L) <= 30, s"de off target: $got")
    // deterministic: same inputs, same sample, any partitioning
    val again = Sampling.rebalanceToMix(df.repartition(17), "id", "lang",
      Map("en" -> 0.5, "de" -> 0.3, "fr" -> 0.2))
      .select("id").collect().map(_.getLong(0)).toSet
    val first = Sampling.rebalanceToMix(df, "id", "lang",
      Map("en" -> 0.5, "de" -> 0.3, "fr" -> 0.2))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(first == again)
  }

  test("temperatureMix: alpha=1 is identity, alpha<1 flattens toward " +
      "the smallest key, null keys drop, deterministic") {
    import spark.implicits._
    // 1600 en, 400 de, 100 fr, 3 null
    val df = ((1 to 1600).map(i => (i.toLong, "en")) ++
      (2001 to 2400).map(i => (i.toLong, "de")) ++
      (3001 to 3100).map(i => (i.toLong, "fr")) ++
      Seq((9001L, null), (9002L, null), (9003L, null))
        .map { case (i, v) => (i, v.asInstanceOf[String]) })
      .toDF("id", "lang")
    val ident = Sampling.temperatureMix(df, "id", "lang", alpha = 1.0)
    assert(ident.count() === 2100L, "alpha=1 keeps every non-null-key row")
    // alpha = 0.5: f_k = (100/n_k)^0.5 -> en 1/4, de 1/2, fr 1
    val got = Sampling.temperatureMix(df, "id", "lang", alpha = 0.5)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("fr") === 100L, s"smallest key binds at fraction 1: $got")
    assert(math.abs(got("en") - 400L) <= 80, s"en ~1600/4: $got")
    assert(math.abs(got("de") - 200L) <= 40, s"de ~400/2: $got")
    assert(!got.contains(null), s"null keys dropped: $got")
    // pure function of the data: partitioning cannot move the sample
    val a = Sampling.temperatureMix(df.repartition(13), "id", "lang", 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureMix(df, "id", "lang", 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("shuffleOrder: a dense deterministic permutation, salt-varied, " +
      "partitioning-invariant") {
    import spark.implicits._
    val df = (1L to 500L).toDF("id")
    val a = Sampling.shuffleOrder(df, "id", materialize = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.values.toSeq.sorted === (0L until 500L), "dense 0..n-1")
    assert(a.keySet === (1L to 500L).toSet)
    // not the identity order (md5 actually permutes)
    assert((1L to 500L).count(i => a(i) == i - 1) < 50)
    val b = Sampling.shuffleOrder(df.repartition(7), "id",
      materialize = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b, "same permutation on any partitioning")
    val other = Sampling.shuffleOrder(df, "id", salt = "epoch2",
      materialize = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(other !== a, "a different salt is a different epoch order")
  }

  test("unimaxMix water-fills: small keys whole, the rest split " +
      "evenly, full budget keeps everything") {
    import spark.implicits._
    // 1000 en, 300 de, 50 fr; budget 550:
    // fr (50) full-takes (50*3=150 <= 550); remaining 500 over 2 keys
    // -> tau=250: de ~250 of 300, en ~250 of 1000
    val df = ((1 to 1000).map(i => (i.toLong, "en")) ++
      (2001 to 2300).map(i => (i.toLong, "de")) ++
      (3001 to 3050).map(i => (i.toLong, "fr"))).toDF("id", "lang")
    val got = Sampling.unimaxMix(df, "id", "lang", budget = 550L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("fr") === 50L, s"smallest key taken whole: $got")
    assert(math.abs(got("de") - 250L) <= 50, s"de ~250: $got")
    assert(math.abs(got("en") - 250L) <= 50, s"en ~250: $got")
    // budget >= corpus: identity
    assert(Sampling.unimaxMix(df, "id", "lang", 5000L).count() === 1350L)
    // determinism across partitioning
    val a = Sampling.unimaxMix(df.repartition(11), "id", "lang", 550L)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.unimaxMix(df, "id", "lang", 550L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("rebalanceToMix: targeted key with zero rows is ignored, not a " +
      "corpus-emptying T=0") {
    import spark.implicits._
    val df = ((1 to 100).map(i => (i.toLong, "en")) ++
      (201 to 300).map(i => (i.toLong, "de"))).toDF("id", "lang")
    val got = Sampling.rebalanceToMix(df, "id", "lang",
      Map("en" -> 0.5, "de" -> 0.5, "absent" -> 0.5))
    assert(got.count() == 200L) // balanced already: everything kept
  }

  test("assignSplits: ~80/10/10 proportions, total coverage, and " +
      "group-key leakage safety") {
    import spark.implicits._
    // 5 rows per group: splitting on the GROUP key must put all five
    // in the same split
    val df = (1 to 2000).map(i => (i.toLong, s"g${i / 5}"))
      .toDF("id", "grp")
    val out = Sampling.assignSplits(df, "grp",
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000L) // every row assigned
    assert(math.abs(counts("train") - 1600L) <= 160, s"$counts")
    assert(counts.keySet == Set("train", "valid", "test"))
    // leakage: one split per group
    val perGroup = out.groupBy("grp")
      .agg(countDistinct("split").as("n")).agg(max("n")).head.getLong(0)
    assert(perGroup == 1L, "a group straddles splits")
    // deterministic across partitioning
    val again = Sampling.assignSplits(df.repartition(7), "grp",
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
      .orderBy("id").collect().toSeq
    assert(again == out.orderBy("id").collect().toSeq)
    // fractions must sum to 1
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(df, "grp", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("stratifiedHashSample rejects out-of-range fractions") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Sampling.stratifiedHashSample(Seq((1L, "a")).toDF("id", "k"),
        "id", "k", Map("a" -> 1.5))
    }
  }

  test("systematicSample keeps exactly every k-th row in order, " +
      "partitioning-invariant, offset/every guards fire") {
    import spark.implicits._
    val df = (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v")
    def ids(frame: org.apache.spark.sql.DataFrame) =
      Sampling.systematicSample(frame, Seq(col("id").asc),
          every = 5, offset = 2, materialize = false)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
    // positions 3, 8, 13, 18 (1-based pos with (pos-1)%5 == 2)
    assert(ids(df) === Seq(3L, 8L, 13L, 18L))
    assert(ids(df.repartition(7)) === Seq(3L, 8L, 13L, 18L))
    // every=1 keeps everything
    assert(Sampling.systematicSample(df, Seq(col("id").asc), 1,
      materialize = false).count() == 20L)
    intercept[IllegalArgumentException] {
      Sampling.systematicSample(df, Seq(col("id").asc), 5, offset = 5)
    }
  }

  test("quotaSample: exact per-stratum counts, short strata taken " +
      "whole, unlisted strata dropped, partitioning-independent") {
    import spark.implicits._
    val df = ((1 to 100).map(i => (i.toLong, "en")) ++
      (201 to 205).map(i => (i.toLong, "fr")) ++
      (301 to 310).map(i => (i.toLong, "xx"))).toDF("id", "lang")
    val got = Sampling.quotaSample(df, "id", "lang",
      Map("en" -> 7L, "fr" -> 50L), materialize = false)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("en" -> 7L, "fr" -> 5L),
      s"exact quota, whole short stratum, no unlisted stratum: $got")
    // deterministic membership across partitionings
    val a = Sampling.quotaSample(df.repartition(9), "id", "lang",
      Map("en" -> 7L, "fr" -> 50L), materialize = false)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.quotaSample(df, "id", "lang",
      Map("en" -> 7L, "fr" -> 50L), materialize = false)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a === b && a.size === 12)
    // defaultQuota admits unlisted strata
    assert(Sampling.quotaSample(df, "id", "lang", Map("en" -> 1L),
      defaultQuota = 2L, materialize = false).count() === 5L)
  }

  test("epochCappedAlloc: hand-computed water level, caps bite in " +
      "(cap, key) order, epochs never exceed the cap factor") {
    import spark.implicits._
    // per-doc token counts summing to a=100, b=400, c=1000 per source;
    // R=2 -> caps 200, 800, 2000; T=1500:
    //   j=1 a: 200*3=600 <= 1500 -> capped, rem 1300
    //   j=2 b: 800*2=1600 > 1300 -> tau = 1300/2 = 650
    //   j=3 c: 650
    val df = Seq(("a", 100L), ("b", 150L), ("b", 250L), ("c", 1000L))
      .toDF("src", "n")
    val got = Sampling.epochCappedAlloc(df, "src", "n",
      budget = 1500L, maxEpochs = 2L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getBoolean(5)))).toMap
    assert(got("a") === ((100L, 200L, 200.0, 2.0, true)))
    assert(got("b") === ((400L, 800L, 650.0, 1.625, false)))
    assert(got("c") === ((1000L, 2000L, 650.0, 0.65, false)))
    // epochs never exceed R anywhere
    assert(got.values.forall(_._4 <= 2.0))
    // a later key re-passing after a failure must NOT cap: caps
    // (10, 10, 14), T=29 -> j=1: 10*3=30 > 29 fails, so NOTHING caps
    // even though 10*2 <= 29 would re-pass at j=2; everyone gets
    // tau = 29/3
    val re = Sampling.epochCappedAlloc(
      Seq(("x", 5L), ("y", 5L), ("z", 7L)).toDF("src", "n"),
      "src", "n", budget = 29L, maxEpochs = 2L)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(3), r.getBoolean(5))).toMap
    assert(re.values.forall(!_._2), s"one-way flag violated: $re")
    assert(re.values.forall(v => math.abs(v._1 - 29.0 / 3) < 1e-9))
    // budget >= all caps: everything capped at R epochs
    val full = Sampling.epochCappedAlloc(df, "src", "n",
      budget = 99999L, maxEpochs = 2L)
      .collect().map(r => (r.getDouble(4), r.getBoolean(5)))
    assert(full.forall { case (e, c) => c && e === 2.0 })
    // determinism across partitioning
    val p = Sampling.epochCappedAlloc(df.repartition(7), "src", "n",
      budget = 1500L, maxEpochs = 2L).collect().toSeq.map(_.toString)
    val q = Sampling.epochCappedAlloc(df, "src", "n",
      budget = 1500L, maxEpochs = 2L).collect().toSeq.map(_.toString)
    assert(p === q)
  }
}
