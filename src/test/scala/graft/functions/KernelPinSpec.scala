package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end pins of the native (FNV/murmur) hash kernels over the
  * REAL sf0.001 documents parquet — the coverage that used to ride on
  * the rows-only `simhash_sigs` / `fingerprint_counts` registrations
  * (retired round 9: their algorithm logic is oracle-green through
  * the shared-md5 twins `simhash_md5` / `fingerprint_winnow`; only
  * the 64-bit native hash VALUES were unpinned, and these frozen
  * values pin exactly that). If a kernel's bit layout, seed, or
  * tokenization drifts, these literals break loudly.
  */
class KernelPinSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("fingerprints + simhash64 native kernels are frozen on real data") {
    val got = docs.orderBy("doc_id").limit(5)
      .select(col("doc_id"),
        size(TextFunctions.fingerprints(col("text"))).as("n_fp"),
        TextFunctions.simhash64(col("text")).as("sig"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSeq
    val want = Seq(
      (0L, 46, 8932058734822431805L),
      (1L, 174, 5716093806424987791L),
      (2L, 128, 5713911345596143757L),
      (3L, 107, 8031965530990921917L),
      (4L, 64, 9184955686315366539L))
    assert(got === want, s"native kernel drift: $got")
  }

  test("HLL xxhash64 register layout is frozen on real data (the " +
      "portable md5 mode is oracle-pinned; this freezes the scale " +
      "path's native hash)") {
    import graft.operators.Hll
    val toks = docs.select(
      org.apache.spark.sql.functions.explode(
        TextFunctions.tokens(col("text"))).as("tok"))
    val got = Hll.sketch(toks, "tok", m = 64, portableHash = false)
      .orderBy("reg").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    val want = Seq((1, 1), (5, 1), (8, 2), (12, 1), (13, 2), (16, 4),
      (17, 7), (18, 1), (21, 2), (23, 2), (26, 1), (38, 4), (40, 3),
      (44, 5), (47, 2), (49, 1), (50, 2), (51, 3), (53, 1), (54, 1),
      (57, 1), (62, 2))
    assert(got === want, s"xxhash HLL drift: $got")
  }

  test("simhash64 of near-identical real docs stays within a small " +
      "Hamming distance of itself under a one-token edit") {
    val base = docs.orderBy("doc_id").limit(3)
      .select(col("doc_id"), col("text"))
    val edited = base.withColumn("text",
      concat(col("text"), lit(" zzappendix")))
    val joined = base.select(col("doc_id"),
        TextFunctions.simhash64(col("text")).as("a"))
      .join(edited.select(col("doc_id"),
        TextFunctions.simhash64(col("text")).as("b")), Seq("doc_id"))
      .select(bit_count(col("a").bitwiseXOR(col("b"))).as("hd"))
      .collect().map(_.getInt(0))
    assert(joined.forall(_ <= 16),
      s"one-token edit moved simhash by ${joined.toSeq} bits")
  }
}
