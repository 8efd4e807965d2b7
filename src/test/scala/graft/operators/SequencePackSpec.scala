package graft.operators

import graft.SparkSpec

/** Concat-and-chunk packing: placement arithmetic hand-checked,
  * boundary spanning, zero-token docs, shard isolation. */
class SequencePackSpec extends SparkSpec {
  import spark.implicits._

  private def pack(rows: Seq[(Long, String, Long)], cap: Long) =
    Sampling.sequencePack(
      rows.toDF("id", "shard", "n"), "id", "n", cap,
      shardCols = Seq("shard"), orderCols = Seq("id"))
      .orderBy("shard", "id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))

  test("placement: offsets accumulate, a doc crossing the capacity " +
      "boundary spans two packs, an exact fill ends its pack") {
    // capacity 10: docs of 4, 6 (fills pack 0 exactly), 12 (spans
    // packs 1-2), 3
    val got = pack(Seq((1L, "a", 4L), (2L, "a", 6L), (3L, "a", 12L),
      (4L, "a", 3L)), cap = 10L)
    assert(got.toSeq == Seq(
      (1L, "a", 4L, 0L, 0L, 0L, 1L),
      (2L, "a", 6L, 4L, 0L, 0L, 1L), // ends at token 9 — still pack 0
      (3L, "a", 12L, 10L, 1L, 2L, 2L), // tokens 10..21 span packs 1-2
      (4L, "a", 3L, 22L, 2L, 2L, 1L)))
  }

  test("zero-token docs occupy no tokens and land at the current " +
      "offset's pack") {
    val got = pack(Seq((1L, "a", 10L), (2L, "a", 0L), (3L, "a", 5L)),
      cap = 10L)
    assert(got(1) == (2L, "a", 0L, 10L, 1L, 1L, 1L))
    assert(got(2) == (3L, "a", 5L, 10L, 1L, 1L, 1L))
  }

  test("shards pack independently: offsets restart per shard and a " +
      "global order is refused") {
    val got = pack(Seq((1L, "a", 7L), (2L, "b", 7L), (3L, "a", 7L),
      (4L, "b", 7L)), cap = 10L)
    assert(got.filter(_._2 == "a").map(x => (x._4, x._5, x._6)).toSeq ==
      Seq((0L, 0L, 0L), (7L, 0L, 1L)))
    assert(got.filter(_._2 == "b").map(x => (x._4, x._5, x._6)).toSeq ==
      Seq((0L, 0L, 0L), (7L, 0L, 1L)))
    intercept[IllegalArgumentException] {
      Sampling.sequencePack(Seq((1L, 2L)).toDF("id", "n"), "id", "n",
        10L, shardCols = Nil, orderCols = Seq("id"))
    }
  }
}
