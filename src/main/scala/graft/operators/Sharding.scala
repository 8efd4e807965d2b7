package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic output sharding for training-data export — the last
  * stage of every corpus pipeline: N shard files, balanced, stable
  * across reruns, and MINIMALLY disturbed when N changes.
  *
  * Rendezvous (highest-random-weight) hashing, Thaler & Ravishankar
  * 1998: each key scores every shard with an independent hash and
  * lands on the argmax. Versus `hash(key) mod N` (which reassigns
  * ~100% of keys when N changes — every shard file rewritten on a
  * re-export with a different shard count), HRW moves EXACTLY the
  * keys whose new shard's score exceeds their old max — 1/(N+1) of
  * the corpus in expectation when growing N by one (spec-asserted).
  * At 100 TB, re-exporting 1/65 of the data instead of all of it is
  * the difference between an incremental and a full rewrite.
  *
  * Scale shape: the score vector is ONE narrow codegen'd projection
  * (`transform(sequence(...))` — an in-row array, never an explode),
  * so assignment costs N hashes per row with zero shuffle; the
  * balance report is one grouped count. md5-based scores so the
  * assignment replays bit-identically in any engine (the gate-twin
  * hash convention); murmur/xxhash would be faster per byte but the
  * cost is noise next to the parquet write this stage feeds.
  */
object Sharding {

  /** Shard id (0-based) for `key` under `numShards` via rendezvous
    * hashing: argmax over md5(shard || ':' || salt || ':' || key).
    * Ties are md5 collisions — ignored by construction. `salt`
    * versions the whole layout (bump it to force a full reshard).
    *
    * Cost is `numShards` hashes per row — fine to a few thousand
    * shards. For 10⁵+ output files, compose two levels (HRW into
    * √N groups, then HRW within the group, salting the second level
    * with the group id): √N + √N hashes per row, and a shard-count
    * change still only disturbs its own subtree. */
  def rendezvousShard(key: Column, numShards: Int,
      salt: String = ""): Column = {
    require(numShards >= 1, "numShards must be >= 1")
    val scores = transform(
      sequence(lit(0), lit(numShards - 1)),
      s => md5(concat(s.cast("string"), lit(":"), lit(salt), lit(":"),
        key.cast("string"))))
    (array_position(scores, array_max(scores)) - 1).cast("int")
  }

  /** Assignment frame: input plus a `shard` column. Rejects inputs
    * that already carry a `shard` column — `withColumn` would
    * silently REPLACE it (a re-sharded frame piped back in would
    * lose its original assignment with no error). */
  def shardPlan(df: DataFrame, keyCol: String, numShards: Int,
      salt: String = ""): DataFrame = {
    require(!df.columns.contains("shard"),
      "input already has a 'shard' column — drop or rename it before " +
        "shardPlan (withColumn would silently replace it)")
    df.withColumn("shard", rendezvousShard(col(keyCol), numShards, salt))
  }

  /** Per-shard balance report over an assignment: rows, weight (bytes
    * if `weightCol` given, else rows again), and each shard's share
    * of a perfectly uniform load (skew = shard_weight × numShards /
    * total_weight — 1.0 is perfect, the max over shards is the
    * straggler factor). Single grouped aggregate + one broadcast
    * one-row total; shards-sized output. */
  def shardBalance(assigned: DataFrame, weightCol: Option[String] = None)
      : DataFrame = {
    val reserved = Seq("__tw", "__ns", "n_rows", "weight", "skew")
    require(weightCol.forall(w => !reserved.contains(w)),
      s"weightCol collides with reserved internal/output columns " +
        s"$reserved — rename upstream")
    val w = weightCol.map(col(_).cast("long")).getOrElse(lit(1L))
    val per = assigned.groupBy("shard")
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum(w).cast("long").as("weight"))
    val tot = per.agg(sum("weight").cast("long").as("__tw"),
      count(lit(1)).cast("long").as("__ns"))
    per.crossJoin(broadcast(tot))
      .select(col("shard"), col("n_rows"), col("weight"),
        (col("weight").cast("double") * col("__ns").cast("double")
          / col("__tw").cast("double")).as("skew"))
  }
}
