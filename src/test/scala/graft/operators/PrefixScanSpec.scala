package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrefixScanSpec extends SparkSpec {

  test("runningSum matches the single-partition window on any " +
      "partitioning") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (i.toLong, (i * 7 % 13).toLong))
      .toDF("id", "len")
    for (parts <- Seq(1, 7, 32)) {
      val got = PrefixScan.runningSum(df.repartition(parts), Seq("id"),
        "len", "cum")
        .orderBy("id").select("id", "cum").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      var s = 0L
      val want = (1 to 5000).map { i => s += i * 7 % 13; (i.toLong, s) }
      assert(got.toSeq == want)
    }
  }

  test("runningSum treats null lengths as zero and keeps all columns") {
    import spark.implicits._
    val df = Seq((1L, Some(5L), "a"), (2L, None, "b"), (3L, Some(2L), "c"))
      .toDF("id", "len", "tag")
    val out = PrefixScan.runningSum(df, Seq("id"), "len", "cum")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getString(2)))
    assert(out.toSeq == Seq((1L, 5L, "a"), (2L, 5L, "b"), (3L, 7L, "c")))
  }

  test("runningSum plans no single-partition global window") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, 1L)).toDF("id", "len")
    val plan = PrefixScan.runningSum(df, Seq("id"), "len")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"scan fell back to a window:\n$plan")
  }

  test("packSequences assigns chunks by first-token offset") {
    import spark.implicits._
    // lengths 3,4,5,... over chunkSize 8:
    // doc1 starts 0 (chunk 0), doc2 starts 3 (chunk 0),
    // doc3 starts 7 (chunk 0), doc4 starts 12 (chunk 1), ...
    val df = Seq((1L, 3L), (2L, 4L), (3L, 5L), (4L, 6L), (5L, 7L))
      .toDF("doc_id", "n_tokens")
    val out = PrefixScan.packSequences(df, "n_tokens", chunkSize = 8,
      orderCols = Seq("doc_id"))
      .orderBy("doc_id").select("doc_id", "start_offset", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, 0L, 0L), (2L, 3L, 0L), (3L, 7L, 0L),
      (4L, 12L, 1L), (5L, 18L, 2L)))
  }

  test("packSequencesByKey packs each key's stream independently") {
    import spark.implicits._
    val df = Seq(
      (1L, "en", 5L), (2L, "fr", 5L), (3L, "en", 5L), (4L, "fr", 6L),
      (5L, "en", 2L)).toDF("doc_id", "lang", "len")
    val out = PrefixScan.packSequencesByKey(df, Seq("lang"), "len",
      chunkSize = 8, orderCols = Seq("doc_id"))
      .orderBy("doc_id")
      .select("doc_id", "start_offset", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // en stream: docs 1,3,5 at offsets 0,5,10; fr stream: 2,4 at 0,5
    assert(out.toSeq == Seq(
      (1L, 0L, 0L), (2L, 0L, 0L), (3L, 5L, 0L), (4L, 5L, 0L),
      (5L, 10L, 1L)))
  }

  test("runningSum output is internally consistent on nondeterministic " +
      "input (cache held until materialization)") {
    import spark.implicits._
    // unseeded rand(): every recomputation draws new values. If pass 2
    // re-ran after the cache was dropped, partition offsets from pass 1
    // would be added to DIFFERENT values and the running totals would
    // not telescope. The eager localCheckpoint pins one materialization.
    val df = spark.range(1, 2001).toDF("id")
      .withColumn("len", floor(rand() * 10).cast("long"))
      .repartition(8)
    val out = PrefixScan.runningSum(df, Seq("id"), "len", "cum")
      .orderBy("id").select("id", "len", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    var run = 0L
    out.foreach { case (id, len, cum) =>
      run += len
      assert(cum == run, s"row $id: cum $cum != running $run")
    }
    // and repeated actions on the SAME frame agree (lineage truncated)
    val again = PrefixScan.runningSum(df, Seq("id"), "len", "cum")
    assert(again.collect().toSeq == again.collect().toSeq)
  }

  test("materialize=false (deterministic input) matches the " +
      "materializing path and persists nothing") {
    import spark.implicits._
    val df = (1 to 3000).map(i => (i.toLong, (i * 11 % 17).toLong))
      .toDF("id", "len").repartition(8)
    // ids, not sizes: other suites' checkpoints in the shared session
    // get cleaned ASYNCHRONOUSLY between the two samples — only NEW
    // persisted ids can implicate this call
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val lazyOut = PrefixScan.runningSum(df, Seq("id"), "len", "cum",
      materialize = false)
    // repeated actions recompute the scan; deterministic lineage makes
    // every recomputation agree with itself and with the eager path
    val first = lazyOut.orderBy("id").collect().toSeq
    assert(lazyOut.orderBy("id").collect().toSeq == first)
    // nothing cached or checkpointed: that materialization is exactly
    // what the flag avoids at corpus scale (the eager path leaves its
    // localCheckpoint persisted — by design)
    val fresh = spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore
    assert(fresh.isEmpty, s"lazy path left persisted RDDs behind: $fresh")
    val eagerOut = PrefixScan.runningSum(df, Seq("id"), "len", "cum")
    assert(eagerOut.orderBy("id").collect().toSeq == first)
  }

  test("takeByBudget fills the budget greedily in priority order") {
    import spark.implicits._
    // priorities 5,4,3,2,1 with costs 4,4,4,4,4 and budget 10:
    // the two best fit (cum 4, 8); the third would overflow (12)
    val df = Seq((1L, 9.0, 4L), (2L, 7.0, 4L), (3L, 5.0, 4L),
      (4L, 3.0, 4L), (5L, 1.0, 4L)).toDF("id", "prio", "cost")
    val got = PrefixScan.takeByBudget(df, "cost", budget = 10L,
      orderBy = Seq(col("prio").desc, col("id").asc))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 4L), (2L, 8L)))
    // a later cheap row does NOT leapfrog the overflowing one: greedy
    // prefix semantics, not knapsack
    val df2 = Seq((1L, 9.0, 4L), (2L, 7.0, 8L), (3L, 5.0, 1L))
      .toDF("id", "prio", "cost")
    val got2 = PrefixScan.takeByBudget(df2, "cost", budget = 5L,
      orderBy = Seq(col("prio").desc, col("id").asc))
      .select("id").collect().map(_.getLong(0))
    assert(got2.toSeq == Seq(1L))
  }

  test("output-column collision is rejected") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      PrefixScan.runningSum(Seq((1L, 1L)).toDF("id", "running_total"),
        Seq("id"), "id")
    }
  }

  test("packSpans: a doc crossing the chunk boundary spans two packs, " +
      "an exact fill ends its pack, zero-length docs span their start " +
      "chunk") {
    import spark.implicits._
    // capacity 10: docs of 4, 6 (fills chunk 0 exactly), 12 (spans
    // chunks 1-2), 0 (no tokens), 3
    val df = Seq((1L, 4L), (2L, 6L), (3L, 12L), (4L, 0L), (5L, 3L))
      .toDF("id", "n")
    val got = PrefixScan.packSpans(
      PrefixScan.packSequences(df, "n", chunkSize = 10L,
        orderCols = Seq("id"), materialize = false),
      "n", chunkSize = 10L)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // (id, start_offset, chunk_id, last_pack, n_packs_spanned)
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 0L, 1L),
      (2L, 4L, 0L, 0L, 1L),   // ends at token 9 — still chunk 0
      (3L, 10L, 1L, 2L, 2L),  // tokens 10..21 span chunks 1-2
      (4L, 22L, 2L, 2L, 1L),  // zero-length: spans its start chunk
      (5L, 22L, 2L, 2L, 1L)))
    // keyed form: spans restart per key
    val keyed = PrefixScan.packSpans(
      PrefixScan.packSequencesByKey(
        Seq((1L, "a", 7L), (2L, "a", 7L), (3L, "b", 7L))
          .toDF("id", "k", "n"),
        Seq("k"), "n", chunkSize = 10L, orderCols = Seq("id")),
      "n", chunkSize = 10L)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(5), r.getLong(6)))
    // (id, last_pack, n_packs_spanned): doc 2 starts at offset 7 in
    // key a's stream and spans chunks 0-1; key b restarts at 0
    assert(keyed.toSeq ==
      Seq((1L, 0L, 1L), (2L, 1L, 2L), (3L, 0L, 1L)))
  }

  test("packByLength: power-of-two buckets, (len DESC, id) batch " +
      "cuts, zero lengths land in bucket 0, partitioning-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // lens 1,1 → bucket 0; 2,3,3,3 → bucket 1; 0 → bucket 0
    val docs = Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 3L), (5L, 3L),
      (6L, 3L), (7L, 0L)).toDF("id", "len")
    def run(df: org.apache.spark.sql.DataFrame) =
      PrefixScan.packByLength(df, "id", "len", batchDocs = 2,
          materialize = false)
        .select("id", "length_bucket", "batch_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
    val got = run(docs)
    // bucket 0 order (len desc, id): (1,1),(2,1),(7,0) → batches 0,0,1
    // bucket 1 order: (4,3),(5,3),(6,3),(3,2) → batches 0,0,1,1
    assert(got.toSeq === Seq((1L, 0L, 0L), (2L, 0L, 0L), (3L, 1L, 1L),
      (4L, 1L, 0L), (5L, 1L, 0L), (6L, 1L, 1L), (7L, 0L, 1L)))
    assert(run(docs.repartition(5)).toSeq === got.toSeq,
      "batch assignment must not depend on input partitioning")
    // padding waste of bucket-1 batch 1: max 3 * 2 docs - (3+2) = 1
    val waste = PrefixScan.packByLength(docs, "id", "len", 2,
        materialize = false)
      .groupBy("length_bucket", "batch_id")
      .agg((max("len") * count(lit(1)) - sum("len")).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(waste((1L, 1L)) == 1L && waste((1L, 0L)) == 0L)
  }

  test("runningSumByKey fails LOUD on a high-cardinality key (the " +
      "driver-side offset guard), and the bound is caller-raisable") {
    import spark.implicits._
    // a near-unique key: every row its own group — exactly the call
    // the low-cardinality contract forbids (the driver would hold one
    // offset entry per row)
    val df = (1 to 200).map(i => (i.toLong, s"k$i", 1L))
      .toDF("id", "k", "len")
    val e = intercept[IllegalArgumentException] {
      PrefixScan.runningSumByKey(df, Seq("k"), Seq(col("id")), "len",
        "cum", materialize = false, maxKeyEntries = 50).count()
    }
    assert(e.getMessage.contains("maxKeyEntries"), e.getMessage)
    // raising the bound admits the same call (the guard is a contract
    // check, not a correctness limit)
    val n = PrefixScan.runningSumByKey(df, Seq("k"), Seq(col("id")),
      "len", "cum", materialize = false, maxKeyEntries = 1000).count()
    assert(n == 200L)
  }

  test("runningSumByKey equals the partitioned-window reference on a " +
      "hot-key shape, any partitioning, nulls count as a key and 0") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // one hot key (800 rows), two small ones, a null key, a null value
    val rows = (1 to 800).map(i => ("hot", i.toLong, (i % 7).toLong)) ++
      Seq(("a", 901L, 5L), ("a", 902L, 7L), ("b", 903L, 11L)) ++
      Seq((null.asInstanceOf[String], 904L, 13L),
        ("a", 905L, -1L))
    val df = rows.toDF("k", "id", "v")
      .withColumn("v", when(col("id") === 905L,
        lit(null).cast("long")).otherwise(col("v")))
    val got = PrefixScan.runningSumByKey(df.repartition(13),
        Seq("k"), Seq(col("id").asc), "v", "rt", materialize = false)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    val ref = df.withColumn("rt",
        sum(coalesce(col("v"), lit(0L))).over(
          Window.partitionBy("k").orderBy("id")))
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(got === ref)
    // the null-value row contributed 0, not a poisoned sum
    assert(got(905L) === got(902L))
  }

  test("runningSumByKey (materialize=true) destroys its offsets " +
      "broadcast once the result is checkpointed — repeated calls " +
      "must not accumulate broadcast blocks; the lazy path keeps " +
      "the broadcast alive because the returned plan re-reads it") {
    import spark.implicits._
    val df = (1 to 50).map(i => (s"k${i % 3}", i.toLong, 1L))
      .toDF("k", "id", "v")
    val eager = PrefixScan.runningSumByKey(df, Seq("k"),
      Seq(col("id").asc), "v", "rt", materialize = true)
    assert(eager.count() == 50L)
    val bcEager = PrefixScan.lastOffsetsBroadcastForTest.get
    val e = intercept[org.apache.spark.SparkException](bcEager.value)
    assert(e.getMessage.toLowerCase.contains("destroy"), e.getMessage)
    // the checkpointed result stays fully readable after the destroy
    assert(eager.agg(sum("rt")).head.getLong(0) > 0L)
    val lazyRes = PrefixScan.runningSumByKey(df, Seq("k"),
      Seq(col("id").asc), "v", "rt", materialize = false)
    val bcLazy = PrefixScan.lastOffsetsBroadcastForTest.get
    assert(bcLazy ne bcEager)
    assert(lazyRes.count() == 50L)
    bcLazy.value // still alive — the lazy plan depends on it
  }
}
