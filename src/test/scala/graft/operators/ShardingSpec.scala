package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(sf() + "/documents.parquet")
    .select("doc_id")

  test("assignment matches a driver-side rendezvous reimplementation") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def refShard(key: String, n: Int, salt: String): Int =
      (0 until n).map(s => hex(s"$s:$salt:$key")).zipWithIndex
        .maxBy(_._1)._2
    val got = Sharding.shardPlan(
      Seq(1L, 2L, 42L, 999L, 123456L).toDF("doc_id"),
      "doc_id", numShards = 7, salt = "v1")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    for ((k, s) <- got)
      assert(s === refShard(k.toString, 7, "v1"), s"key $k")
  }

  test("shards are in range, deterministic, and salt-sensitive") {
    val a = Sharding.shardPlan(docs, "doc_id", 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = Sharding.shardPlan(docs, "doc_id", 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a === b)
    assert(a.values.forall(s => s >= 0 && s < 8))
    assert(a.values.toSet.size === 8) // all shards used at ~500 keys
    val salted = Sharding.shardPlan(docs, "doc_id", 8, salt = "v2")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a.count { case (k, s) => salted(k) != s } > 0)
  }

  test("growing N by one moves ~1/(N+1) of keys; mod-hash moves most") {
    val n8 = Sharding.shardPlan(docs, "doc_id", 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val n9 = Sharding.shardPlan(docs, "doc_id", 9)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val total = n8.size.toDouble
    val hrwMoved = n8.count { case (k, s) => n9(k) != s } / total
    assert(hrwMoved > 0.0 && hrwMoved < 0.25,
      s"HRW moved $hrwMoved, expected ~1/9")
    // the scheme HRW replaces: md5(key) mod N reassigns ~8/9 of keys
    val m8 = docs.select(col("doc_id"),
      pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 14),
        16, 10).cast("long"), lit(8L)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m9 = docs.select(col("doc_id"),
      pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 14),
        16, 10).cast("long"), lit(9L)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val modMoved = m8.count { case (k, s) => m9(k) != s } / total
    assert(hrwMoved < modMoved,
      s"HRW ($hrwMoved) should move fewer keys than mod ($modMoved)")
  }

  test("shardBalance reports rows, weight, and skew summing to N") {
    val d = spark.read.parquet(sf() + "/documents.parquet")
      .select("doc_id", "n_chars")
    val plan = Sharding.shardPlan(d, "doc_id", 8)
    val bal = Sharding.shardBalance(plan, Some("n_chars")).collect()
    assert(bal.length === 8)
    val totalRows = bal.map(_.getLong(1)).sum
    assert(totalRows === d.count())
    // skew values average exactly 1 by construction
    val skewSum = bal.map(_.getDouble(3)).sum
    assert(math.abs(skewSum - 8.0) < 1e-9)
    assert(bal.map(_.getDouble(3)).max < 2.0) // no pathological shard
  }

  test("shardPlan rejects an input that already carries 'shard'") {
    val d = spark.read.parquet(sf() + "/documents.parquet")
      .select("doc_id", "n_chars")
    val once = Sharding.shardPlan(d, "doc_id", 8)
    val e = intercept[IllegalArgumentException] {
      Sharding.shardPlan(once, "doc_id", 9)
    }
    assert(e.getMessage.contains("shard"))
    val e2 = intercept[IllegalArgumentException] {
      Sharding.shardBalance(once, Some("weight"))
    }
    assert(e2.getMessage.contains("reserved"))
  }
}
