package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Versioned snapshot table: commits, the generation registry, and
  * as-of reconstruction (latest-write-wins, tombstone persistence,
  * partition-pruned reads). */
class LakeSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft-snap-").toAbsolutePath.toString

  private def state(root: String, g: Long): Map[Long, (String, Long)] =
    Lake.readAsOf(spark, root, Seq("id"), g).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

  test("as-of reads reconstruct every historical generation: insert, " +
      "update, delete, re-insert after delete") {
    val root = tmp()
    val base = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "v", "n")
    assert(Lake.commitSnapshot(spark, root, base, Seq("id")) == 0L)
    assert(Lake.commitSnapshot(spark, root,
      Seq((2L, "b2", 21L), (4L, "d", 40L)).toDF("id", "v", "n"),
      Seq("id")) == 1L)
    assert(Lake.commitSnapshot(spark, root,
      base.limit(0), Seq("id"),
      deletes = Some(Seq(Tuple1(1L)).toDF("id"))) == 2L)
    // re-insert a deleted key: the later write must win the tombstone
    assert(Lake.commitSnapshot(spark, root,
      Seq((1L, "a3", 11L)).toDF("id", "v", "n"), Seq("id")) == 3L)
    assert(Lake.snapshotGenerations(spark, root).get == Seq(0L, 1L, 2L, 3L))
    assert(state(root, 0L) ==
      Map(1L -> ("a", 10L), 2L -> ("b", 20L), 3L -> ("c", 30L)))
    assert(state(root, 1L) ==
      Map(1L -> ("a", 10L), 2L -> ("b2", 21L), 3L -> ("c", 30L),
        4L -> ("d", 40L)))
    assert(state(root, 2L) ==
      Map(2L -> ("b2", 21L), 3L -> ("c", 30L), 4L -> ("d", 40L)),
      "gen-2 read must hide the tombstoned key")
    assert(state(root, 3L) ==
      Map(1L -> ("a3", 11L), 2L -> ("b2", 21L), 3L -> ("c", 30L),
        4L -> ("d", 40L)),
      "re-insert after delete must resurrect the key")
    // reading PAST state after later commits exist is the whole point
    assert(state(root, 0L)(2L) == ("b", 20L))
    // beyond-newest reads the current state
    assert(state(root, 99L) == state(root, 3L))
  }

  test("readAsOf prunes generation directories (PartitionFilters) and " +
      "a commit never rewrites prior generations") {
    val root = tmp()
    Lake.commitSnapshot(spark, root,
      Seq((1L, "a", 1L)).toDF("id", "v", "n"), Seq("id"))
    val gen0Files = Lake.fileStats(spark, s"$root/gen=0")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    Lake.commitSnapshot(spark, root,
      Seq((2L, "b", 2L)).toDF("id", "v", "n"), Seq("id"))
    assert(Lake.fileStats(spark, s"$root/gen=0")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      == gen0Files, "a commit must not touch prior generations")
    val plan = Lake.readAsOf(spark, root, Seq("id"), 0L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(!plan.contains("gen=1"),
      s"as-of-0 scan must prune the gen=1 directory:\n$plan")
  }

  test("guards: missing keys fail loudly; empty registry is None; " +
      "delete-only commits carry the schema") {
    val root = tmp()
    assert(Lake.snapshotGenerations(spark, root)
      .forall(_.isEmpty), "no commits yet")
    intercept[IllegalArgumentException] {
      Lake.commitSnapshot(spark, root,
        Seq((1L, "a")).toDF("id", "v"), Seq("missing"))
    }
    val base = Seq((1L, "a", 1L), (2L, "b", 2L)).toDF("id", "v", "n")
    Lake.commitSnapshot(spark, root, base, Seq("id"))
    // delete-only commit: upserts frame supplies only the schema
    Lake.commitSnapshot(spark, root, base.limit(0), Seq("id"),
      deletes = Some(Seq(Tuple1(2L)).toDF("id")))
    assert(state(root, 1L) == Map(1L -> ("a", 1L)))
  }

  test("streaming ingest into a snapshot table: one commit per " +
      "micro-batch, and as-of reads reconstruct every batch boundary") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmp() + "/t"
    val source = MemoryStream[(Long, String, Long)]
    val q = source.toDF().toDF("id", "v", "n").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          Lake.commitSnapshot(spark, root, batch, Seq("id"))
        ()
      }.start()
    try {
      source.addData((1L, "a", 1L), (2L, "b", 2L))
      q.processAllAvailable()
      source.addData((2L, "b2", 22L), (3L, "c", 3L)) // upsert + insert
      q.processAllAvailable()
      assert(Lake.snapshotGenerations(spark, root).get == Seq(0L, 1L))
      assert(state(root, 0L) == Map(1L -> ("a", 1L), 2L -> ("b", 2L)),
        "the pre-upsert state must stay readable after the next trigger")
      assert(state(root, 1L) ==
        Map(1L -> ("a", 1L), 2L -> ("b2", 22L), 3L -> ("c", 3L)))
    } finally q.stop()
  }

  test("a TORN commit (no _SUCCESS marker) is invisible to readers " +
      "and the next commit numbers past it") {
    val root = tmp()
    Lake.commitSnapshot(spark, root,
      Seq((1L, "a", 1L)).toDF("id", "v", "n"), Seq("id"))
    // simulate a writer dying mid-commit on gen=1: data file present,
    // no _SUCCESS marker
    Seq((9L, "torn", 9L)).toDF("id", "v", "n")
      .withColumn("__deleted", lit(false))
      .write.parquet(s"$root/gen=1")
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$root/gen=1/_SUCCESS"))
    assert(Lake.snapshotGenerations(spark, root).get == Seq(0L),
      "torn generation must not register as a commit")
    assert(state(root, 99L) == Map(1L -> ("a", 1L)),
      "torn rows must stay invisible to as-of reads")
    // the next commit must NOT collide with the torn directory
    val g = Lake.commitSnapshot(spark, root,
      Seq((2L, "b", 2L)).toDF("id", "v", "n"), Seq("id"))
    assert(g == 2L, s"next commit must number past the torn dir, got $g")
    assert(Lake.snapshotGenerations(spark, root).get == Seq(0L, 2L))
    assert(state(root, 99L) == Map(1L -> ("a", 1L), 2L -> ("b", 2L)))
  }

  test("two concurrent writers: at most one commit per generation, " +
      "the loser fails with NO partial visible state") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val root = tmp()
    Lake.commitSnapshot(spark, root,
      Seq((1L, "base", 0L)).toDF("id", "v", "n"), Seq("id"))
    val gate = new java.util.concurrent.CountDownLatch(1)
    def writer(tag: String) = Future {
      gate.await()
      scala.util.Try(Lake.commitSnapshot(spark, root,
        Seq((100L, tag, 1L)).toDF("id", "v", "n"), Seq("id")))
    }
    val (fa, fb) = (writer("a"), writer("b"))
    gate.countDown()
    val outcomes = Seq(fa, fb).map(Await.result(_, 120.seconds))
    val won = outcomes.flatMap(_.toOption)
    assert(won.nonEmpty, "at least one writer must commit")
    assert(won.distinct.size == won.size,
      s"two commits may never share a generation: $won")
    // the registry and the reconstructed state agree with exactly the
    // successful commits — a loser leaves nothing visible
    val gens = Lake.snapshotGenerations(spark, root).get
    assert(gens == (0L +: won.sorted),
      s"registry $gens must hold the base commit plus the winners $won")
    val got = state(root, 99L)
    assert(got(1L) == ("base", 0L) && got.contains(100L) &&
      got.size == 2, got.toString)
  }

  test("commitSnapshot retries a lost race on the next generation: " +
      "both commits land, serialized, history intact") {
    val root = tmp()
    Lake.commitSnapshot(spark, root,
      Seq((1L, "a", 1L)).toDF("id", "v", "n"), Seq("id"))
    // deterministic race replay: the hook sends the first attempt to
    // the ALREADY-COMMITTED gen=0 (as if a racer landed between this
    // writer's listing and its write) → errorifexists → the retry
    // re-lists and lands on the real next generation
    var calls = 0
    val g = Lake.commitSnapshotImpl(spark, root,
      Seq((2L, "b", 2L)).toDF("id", "v", "n"), Seq("id"), None,
      maxAttempts = 3,
      genHook = { next => calls += 1; if (calls == 1) 0L else next })
    assert(calls == 2, s"expected one lost race + one retry, got $calls")
    assert(g == 1L, s"loser must land on the next free generation, got $g")
    assert(Lake.snapshotGenerations(spark, root).get == Seq(0L, 1L))
    assert(state(root, 99L) ==
      Map(1L -> ("a", 1L), 2L -> ("b", 2L)),
      "gen-0 rows must survive the failed attempt against its dir")
    assert(state(root, 0L) == Map(1L -> ("a", 1L)))
  }

  test("a mid-write failure of this writer's OWN attempt is not a " +
      "lost race: rethrown immediately, never retried at later " +
      "generations, registry untouched") {
    val root = tmp()
    Lake.commitSnapshot(spark, root,
      Seq((1L, "a", 1L)).toDF("id", "v", "n"), Seq("id"))
    // poison one row so the write job fails AFTER the committer has
    // created the target directory — the old exists(target)
    // classification misread exactly this as a lost race and retried
    // the genuine write error at successive generations
    val bad = Seq((2L, "b", 2L), (3L, "c", 3L)).toDF("id", "v", "n")
      .withColumn("v",
        when(col("id") === 3L, expr("raise_error('boom')"))
          .otherwise(col("v")))
    val e = intercept[IllegalStateException] {
      Lake.commitSnapshot(spark, root, bad, Seq("id"))
    }
    assert(e.getMessage.contains("mid-write") &&
      !e.getMessage.contains("lost the race"), e.getMessage)
    assert(Lake.snapshotGenerations(spark, root).get == Seq(0L),
      "the failed writer must not land anything committed")
    // no retry happened: nothing (committed or torn) exists past the
    // single attempted generation
    val dirs = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("gen=")).map(_.getName).sorted
    assert(!dirs.contains("gen=2"),
      s"mid-write failure must not be retried at gen=2: " +
        dirs.mkString(","))
  }

  test("the errorifexists pre-check failure classifies as a lost " +
      "race: a racer creating the target in the pre-check-to-write " +
      "window (its _SUCCESS not yet visible) must be retryable, not " +
      "a hard mid-write failure") {
    val root = tmp()
    val dir = s"$root/gen=0"
    Seq((1L, "a")).toDF("id", "v").write.parquet(dir)
    // the real exception Spark raises when errorifexists collides —
    // the classifier must recognize this exact shape, because in the
    // race window it fires before OUR job writes anything
    val e = intercept[Throwable] {
      Seq((2L, "b")).toDF("id", "v")
        .write.mode("errorifexists").parquet(dir)
    }
    assert(Lake.isPathExistsFailure(e),
      s"errorifexists collision not classified as a race: $e")
    // a genuine job failure must NOT classify as a race
    assert(!Lake.isPathExistsFailure(
      new RuntimeException("boom", new IllegalStateException("inner"))))
    // cycle-safe on a self-caused chain
    val cyc = new RuntimeException("a")
    assert(!Lake.isPathExistsFailure(cyc))
  }

  test("commitSnapshot rethrows after maxAttempts lost races and on " +
      "non-race failures") {
    val root = tmp()
    Lake.commitSnapshot(spark, root,
      Seq((1L, "a", 1L)).toDF("id", "v", "n"), Seq("id"))
    val e = intercept[IllegalStateException] {
      Lake.commitSnapshotImpl(spark, root,
        Seq((2L, "b", 2L)).toDF("id", "v", "n"), Seq("id"), None,
        maxAttempts = 2, genHook = _ => 0L) // every attempt collides
    }
    assert(e.getMessage.contains("lost the race"), e.getMessage)
    assert(Lake.snapshotGenerations(spark, root).get == Seq(0L),
      "failed committer must leave the registry untouched")
  }
}
