package graft.store

import graft.Schemas
import graft.functions.{Embed, Embedder}
import graft.operators.{Metric, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Schema coercion for ingest — the bulk form of the reference's
  * `set_data` preprocessing (`/root/reference/vsu/base/VectorSearchBase
  * .py:101-126`): require `target` (P3 — the reference silently no-ops,
  * quirk Q3; we raise), pad missing `option1..5` with NULL (P6), drop
  * extra columns (projection to `save_columns + vector`), keep a
  * pre-supplied `vector` column if present.
  */
object Ingest {
  def normalizeToSchema(df: DataFrame): DataFrame = {
    require(df.columns.contains("target"),
      "ingest frame must have a 'target' column (reference quirk Q3: " +
        "silently ignored there; rejected here)")
    // target is cast alongside the options: a non-string target (e.g.
    // numeric ids) would otherwise produce a store schema that diverges
    // from Schemas.record and break the append path's unionByName
    val padded = Schemas.optionCols.foldLeft(
      df.withColumn("target", col("target").cast(StringType))) { (d, c) =>
      if (d.columns.contains(c)) d.withColumn(c, col(c).cast(StringType))
      else d.withColumn(c, lit(null).cast(StringType))
    }
    val keep = Schemas.saveCols ++
      (if (df.columns.contains("vector")) Seq("vector") else Nil)
    padded.select(keep.map(col): _*)
  }

  /** Deterministic sequential ids `startAt..startAt+N-1` in `sortCols`
    * order — rowid parity (Q5, `/root/reference/vsu/base/
    * VectorSearchBase.py:47,89`).
    *
    * Scale: `orderBy` range-partitions (partitions are globally
    * ordered), then `zipWithIndex` numbers across partitions with one
    * extra count job — no single-partition window, survives 100×.
    */
  def withSequentialIds(df: DataFrame, startAt: Long,
      sortCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val sorted =
      if (sortCols.nonEmpty) df.orderBy(sortCols.map(col): _*) else df
    val schema = sorted.schema.add("id", LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (startAt + i))
    }
    spark.createDataFrame(rdd, schema)
      .select(("id" +: sorted.columns.toSeq).map(col): _*)
  }
}

/** Spark-native vector store — capability mirror of the reference's
  * `VectorSearchBase` (`/root/reference/vsu/base/VectorSearchBase.py`):
  * ingest (schema-coerce, embed-if-missing, first-wins dedup on
  * `target`, sequential ids), exact k-NN query, and reset. Storage is a
  * cached DataFrame (`:memory:` parity), a parquet path (durable,
  * `db_name` parity — `VectorSearchBase.py:18,26`), or a catalog table
  * bucketed by `target` (the 100 TB append path — see below).
  *
  * Scale design: ingest is bulk (no per-row inserts — S7 is a single
  * `write.mode(append)`), dedup is a hash-shuffle anti-join on `target`
  * (never post-union dropDuplicates — U1), queries are brute-force
  * scans planned as `TakeOrderedAndProject` (no corpus shuffle).
  *
  * '''Bucketed durable mode''' (`bucketedTable`): the store persists as
  * a catalog table `bucketBy(numBuckets, target)`. Appends then (a)
  * anti-join the incoming batch against a bucketed scan whose
  * `outputPartitioning` already matches the join key — only the
  * O(batch) incoming side shuffles, the existing store is NEVER
  * re-exchanged — and (b) write ONLY the fresh rows as new per-bucket
  * files, so an append writes O(batch), not O(store). The plain `path`
  * mode rewrites the full store every append (fine for small stores;
  * its swap-rename gives stronger crash atomicity), which at 100 TB
  * makes the append loop quadratic — bucketed mode is the scale
  * default. Plan shape is regression-guarded in PlanAuditSpec.
  */
final class VectorStore(
    val spark: SparkSession,
    val embedder: Embedder,
    val path: Option[String] = None,
    val batchSize: Int = 256,
    val queryPrefix: String = "query: ",
    val bucketedTable: Option[String] = None,
    val numBuckets: Int = 32) {

  require(path.isEmpty || bucketedTable.isEmpty,
    "choose ONE durable mode: parquet path or bucketed table")
  require(numBuckets > 0, "numBuckets must be positive")

  import Ingest._

  private var mem: Option[DataFrame] = None

  private def emptyData: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], Schemas.record)

  /** Current store contents (id, target, option1..5, vector). */
  def data: DataFrame = mem.getOrElse {
    val df = (path, bucketedTable) match {
      case (Some(p), _) =>
        recoverIfInterrupted(p)
        if (fileExists(p)) spark.read.parquet(p) else emptyData
      case (_, Some(tbl)) =>
        if (spark.catalog.tableExists(tbl)) spark.table(tbl) else emptyData
      case _ => emptyData
    }
    mem = Some(df)
    df
  }

  /** Crash recovery for the durable swap (see [[persist]]): if a crash
    * hit between "live → __old" and "__staging → live", the backup is
    * still intact — restore it. A stale __staging dir is deleted before
    * the next write, never renamed over live data. */
  private def recoverIfInterrupted(p: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(p)
    val backup = new org.apache.hadoop.fs.Path(p + "__old")
    if (!fs.exists(live) && fs.exists(backup)) fs.rename(backup, live)
  }

  private def fileExists(p: String): Boolean = {
    val hadoopPath = new org.apache.hadoop.fs.Path(p)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(hadoopPath)
  }

  def isEmpty: Boolean = data.isEmpty

  /** Typed view of the store (SURVEY §1.4). */
  def typed: org.apache.spark.sql.Dataset[graft.VectorRecord] = {
    implicit val enc: org.apache.spark.sql.Encoder[graft.VectorRecord] =
      org.apache.spark.sql.Encoders.product[graft.VectorRecord]
    data.as[graft.VectorRecord]
  }

  /** Bulk ingest (`set_data` parity, `VectorSearchBase.py:101-133`).
    *
    * @param df       input frame; must have `target`; `vector` optional
    *                 (embedded with `embedder` when missing — the
    *                 "vector already present" branch is
    *                 `VectorSearchBase.py:115`)
    * @param append   false = replace (drop + reinsert, S8/U2); true =
    *                 append with first-wins dedup on `target` (U1/J3)
    * @param sortCols deterministic insertion order for id assignment
    *                 (Q5) and first-wins tiebreaks; defaults to
    *                 `target` order
    */
  def setData(df: DataFrame, append: Boolean = false,
      sortCols: Seq[String] = Seq("target")): Unit = {
    val inBatchDeduped = prepareIngest(df, sortCols)

    if (append && !isEmpty) {
      val existing = data
      val fresh = appendAntiJoin(inBatchDeduped)
      val maxId = existing.agg(max("id")).head.getLong(0)
      val freshWithIds = withSequentialIds(fresh, maxId + 1, sortCols)
        .select(Schemas.record.fieldNames.map(col): _*)
      bucketedTable match {
        case Some(tbl) =>
          // the bucketed win: write ONLY the fresh rows as new
          // per-bucket files — the existing store is neither read back
          // nor rewritten (saveAsTable(append) resolves by name and
          // enforces the matching bucket spec)
          freshWithIds.write.mode("append").format("parquet")
            .bucketBy(numBuckets, "target").sortBy("target")
            .saveAsTable(tbl)
          spark.catalog.refreshTable(tbl)
          mem = Some(spark.table(tbl))
        case None =>
          persist(existing.unionByName(freshWithIds), truncateLineage = true)
      }
    } else {
      val withIds = withSequentialIds(inBatchDeduped, startAt = 1L, sortCols)
        .select(Schemas.record.fieldNames.map(col): _*)
      bucketedTable match {
        case Some(tbl) =>
          // materialize BEFORE the rewrite when the table already
          // exists: writeBucketed drops it (files included) before the
          // write plan runs, so a replace whose input derives from the
          // store itself would otherwise scan just-deleted files
          val safe =
            if (spark.catalog.tableExists(tbl)) withIds.localCheckpoint(true)
            else withIds
          graft.operators.Bucketing.writeBucketed(safe, tbl, "target",
            numBuckets)
          mem = Some(spark.table(tbl))
        case None => persist(withIds)
      }
    }
  }

  /** Shared ingest preparation: schema coercion, float32 discipline,
    * embed-if-missing, first-wins in-batch dedup. */
  private def prepareIngest(df: DataFrame,
      sortCols: Seq[String]): DataFrame = {
    val coerced = normalizeToSchema(df)
    val embedded =
      if (coerced.columns.contains("vector")) {
        // float32 discipline (F5): cast only when the element type
        // differs — casting array<float,nullable> to the non-null
        // variant is rejected by Catalyst, and parquet-read arrays are
        // nullable-element even when no element is null
        import org.apache.spark.sql.types.{ArrayType, FloatType}
        coerced.schema("vector").dataType match {
          case ArrayType(FloatType, _) => coerced
          case ArrayType(_, n) =>
            coerced.withColumn("vector", col("vector").cast(ArrayType(FloatType, n)))
          case other => throw new IllegalArgumentException(
            s"'vector' column must be an array of floats, got $other")
        }
      } else
        Embed.embedColumn(coerced, "target", "vector", embedder, batchSize,
          prefix = queryPrefix)
    // first-wins WITHIN the incoming batch (reference: pandas
    // drop_duplicates keep-first, VectorSearchBase.py:124) — min_by
    // partial aggregation (one candidate per (partition, target)
    // crosses the shuffle), mirroring Dedup.exactFirstWins; a
    // row_number window would ship and sort every row. Ties among rows
    // with identical sortCols values are arbitrary (there is no "input
    // order" in a distributed frame) — pass a unique key for full
    // determinism.
    graft.operators.Dedup.exactFirstWins(embedded, Seq("target"), sortCols)
  }

  /** Last-wins UPSERT — beyond-reference but the first thing a real
    * user asks for: rows whose `target` already exists REPLACE the
    * stored values while KEEPING their id (downstream references stay
    * valid); new targets append with fresh sequential ids. Three
    * equi-joins on `target` (inner for updates, two anti for the
    * untouched/fresh splits), no windows; in bucketed mode the joins
    * against the existing side stay Exchange-free like the append
    * path. */
  def updateData(df: DataFrame, sortCols: Seq[String] = Seq("target")): Unit = {
    val batch = prepareIngest(df, sortCols)
    if (isEmpty) { setData(batch); return }
    val existing = data
    val updated = existing.select(col("id"), col("target"))
      .join(batch, Seq("target"))
      .select(Schemas.record.fieldNames.map(col): _*)
    val untouched = existing
      .join(batch.select("target"), Seq("target"), "left_anti")
      .select(Schemas.record.fieldNames.map(col): _*)
    val fresh = batch.join(existing.select("target"), Seq("target"), "left_anti")
    val maxId = existing.agg(max("id")).head.getLong(0)
    val freshWithIds = withSequentialIds(fresh, maxId + 1, sortCols)
      .select(Schemas.record.fieldNames.map(col): _*)
    val result = untouched.unionByName(updated).unionByName(freshWithIds)
    bucketedTable match {
      case Some(tbl) =>
        // an update rewrites matched rows, so this is a full-table
        // rewrite by construction (append-only files cannot replace);
        // materialize first — the plan reads the very table the
        // rewrite drops
        val materialized = result.localCheckpoint(true)
        graft.operators.Bucketing.writeBucketed(materialized, tbl, "target",
          numBuckets)
        mem = Some(spark.table(tbl))
      case None => persist(result, truncateLineage = true)
    }
  }

  /** First-wins vs existing rows: left-anti on `target` (J3) — the
    * deterministic bulk form of insert-if-absent
    * (`VectorSearchBase.py:79-87`); existing rows always win. Exposed
    * package-private so PlanAuditSpec can pin the bucketed-mode shape
    * (existing side scans its buckets with no Exchange). */
  private[graft] def appendAntiJoin(inBatch: DataFrame): DataFrame =
    inBatch.join(data.select("target"), Seq("target"), "left_anti")

  /** Bucketed-mode maintenance: every append adds one file set per
    * bucket, so a long append stream accumulates small files (the LSM
    * problem every append-friendly layout has). `compactBuckets`
    * rewrites the table once — same rows, same bucket spec, one file
    * set — restoring scan efficiency; run it on the same cadence you
    * would any table-maintenance job. No-op for non-bucketed stores. */
  def compactBuckets(): Unit = bucketedTable.foreach { tbl =>
    if (spark.catalog.tableExists(tbl)) {
      // repartition to the bucket spec's own hash so each write task
      // holds exactly one bucket → one file per bucket after rewrite
      val materialized = data.localCheckpoint(true)
        .repartition(numBuckets, col("target"))
      graft.operators.Bucketing.writeBucketed(materialized, tbl, "target",
        numBuckets)
      mem = Some(spark.table(tbl))
    }
  }

  private def persist(df: DataFrame, truncateLineage: Boolean = false): Unit = {
    path match {
      case Some(p) =>
        // staging write + swap-via-backup: the live dir is renamed
        // aside (not deleted) before staging is promoted, so a crash at
        // any point leaves either the old or the new data recoverable
        // (see recoverIfInterrupted); delete-then-rename would lose the
        // store if the rename never ran. Staging also can't be read
        // concurrently with the overwrite of the path we read from.
        val conf = spark.sparkContext.hadoopConfiguration
        val fs = new org.apache.hadoop.fs.Path(p).getFileSystem(conf)
        val live = new org.apache.hadoop.fs.Path(p)
        val backup = new org.apache.hadoop.fs.Path(p + "__old")
        val staging = new org.apache.hadoop.fs.Path(p + "__staging")
        fs.delete(staging, true) // stale staging from a crashed write
        df.write.mode("overwrite").parquet(p + "__staging")
        fs.delete(backup, true)
        if (fs.exists(live)) fs.rename(live, backup)
        fs.rename(staging, live)
        fs.delete(backup, true)
        mem = Some(spark.read.parquet(p))
      case None =>
        // Appends localCheckpoint (eager): materializes AND truncates
        // lineage — without it, iterated appends (streaming ingest)
        // accumulate an unbounded plan chain where batch N depends on
        // the full history of batches 1..N-1. Replace ingests start a
        // fresh lineage from the source, so a plain cache suffices
        // (cheaper: no block-store write of every partition). The old
        // cache is dropped only after the new materialization, which
        // reads it cheaply.
        val materialized =
          if (truncateLineage) df.localCheckpoint(true)
          else { val c = df.cache(); c.count(); c }
        mem.foreach(old => if (old ne materialized) old.unpersist())
        mem = Some(materialized)
    }
  }

  /** Drop everything (`reset_db`, `VectorSearchBase.py:96-99`). Also
    * removes any crash backup/staging dirs — otherwise a leftover
    * `__old` would silently resurrect the deleted store through
    * [[recoverIfInterrupted]] on the next open. */
  def reset(): Unit = {
    mem.foreach(_.unpersist())
    mem = None
    path.foreach { p =>
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(p).getFileSystem(conf)
      fs.delete(new org.apache.hadoop.fs.Path(p), true)
      fs.delete(new org.apache.hadoop.fs.Path(p + "__old"), true)
      fs.delete(new org.apache.hadoop.fs.Path(p + "__staging"), true)
    }
    bucketedTable.foreach(tbl => spark.sql(s"DROP TABLE IF EXISTS $tbl"))
    mem = Some(emptyData)
  }

  private var zsLabels: Seq[(String, Array[Float])] = Nil

  /** Embed the zero-shot label set (`set_zeroshot_labels`,
    * `/root/reference/vsu/base/VectorSearchBase.py:135-139`). Labels
    * get the SAME prefix as stored rows — the reference's label path
    * delegates to the main embed function, which prepends 'query: '
    * (`/root/reference/vsu/text/_classes.py:47-59`). */
  def setZeroshotLabels(labels: Seq[String]): Unit = {
    require(labels.nonEmpty, "label set must be non-empty")
    zsLabels = labels.zip(
      embedder.embed(labels.map(queryPrefix + _)).map(_.clone()))
  }

  /** Classify every stored row against the label set (`do_zeroshot`).
    * E5 semantics by default: stored vectors normalized on the fly
    * (quirk Q6); pass `softmax = true` for the CLIP probability variant
    * (`/root/reference/vsu/image/_classes.py:21-36`). */
  def doZeroshot(softmax: Boolean = false): DataFrame = {
    require(zsLabels.nonEmpty, "call setZeroshotLabels first")
    if (softmax)
      graft.operators.ZeroShot.classifySoftmax(data, "vector", zsLabels,
        normalizeData = true)
    else
      graft.operators.ZeroShot.classify(data, "vector", zsLabels)
  }

  /** Single-row insert-if-absent (`insert_data` parity,
    * `/root/reference/vsu/base/VectorSearchBase.py:77-94`): a 1-row
    * append — existing `target` wins. Bulk ingest should use
    * [[setData]]; this is API-parity convenience. */
  def insertData(target: String, options: Seq[String] = Nil,
      vector: Option[Array[Float]] = None): Unit = {
    require(options.length <= Schemas.optionCols.length,
      s"at most ${Schemas.optionCols.length} option columns")
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val padded = options.padTo(Schemas.optionCols.length, null)
    val (schema, values) = vector match {
      case Some(v) =>
        (StructType(
          StructField("target", StringType) +:
            Schemas.optionCols.map(StructField(_, StringType)) :+
            StructField("vector", Schemas.vectorType)),
          (target +: padded) :+ v)
      case None =>
        (StructType(
          StructField("target", StringType) +:
            Schemas.optionCols.map(StructField(_, StringType))),
          target +: padded)
    }
    val row = spark.createDataFrame(
      java.util.List.of(Row.fromSeq(values)), schema)
    setData(row, append = !isEmpty)
  }

  // trained-model caches for skip_build parity (reference keeps
  // self.clf / self.regr on the instance, initialized to None — quirk
  // Q2, VectorSearchBase.py:227-228,244 — and reuses them across calls;
  // like the reference, set_data/reset do NOT invalidate them).
  // Divergence from the reference, deliberately: the cache remembers
  // the training arguments, so skipBuild NEVER hands back a model
  // trained on a different label column / hyperparameters — it retrains
  // instead (the reference would silently reuse the stale model).
  private var clfCache: Option[(Seq[Any], graft.ml.MlpResult)] = None
  private var regrCache: Option[(Seq[Any], graft.ml.MlpResult)] = None

  /** Train an MLP classifier on stored vectors against a stored label
    * column (`MLP_Classifier`, `/root/reference/vsu/base/
    * VectorSearchBase.py:219-234`): stratified 75/25 split, holdout
    * accuracy, predictions for ALL rows.
    *
    * @param skipBuild reuse the previously trained classifier when one
    *                  was built WITH THE SAME arguments (`skip_build`
    *                  parity); first or differently-parameterized calls
    *                  always train
    */
  def mlpClassifier(yLabel: String, hidden: Seq[Int] = Seq(100),
      maxIter: Int = 300, skipBuild: Boolean = false): graft.ml.MlpResult = {
    require(!isEmpty, "store is empty")
    val args = Seq[Any](yLabel, hidden, maxIter)
    if (!skipBuild || !clfCache.exists(_._1 == args))
      clfCache = Some(args -> graft.ml.MlpBridge.trainClassifier(
        data.filter(col(yLabel).isNotNull), "vector", yLabel, hidden, maxIter))
    clfCache.get._2
  }

  /** Train a regressor on stored vectors (`MLP_Regressor` capability —
    * GBT substitute, see MlpBridge M8 note). `skipBuild` reuses the
    * cached model as in [[mlpClassifier]]. */
  def mlpRegressor(yLabel: String, maxIter: Int = 50,
      skipBuild: Boolean = false): graft.ml.MlpResult = {
    require(!isEmpty, "store is empty")
    val args = Seq[Any](yLabel, maxIter)
    if (!skipBuild || !regrCache.exists(_._1 == args))
      regrCache = Some(args -> graft.ml.MlpBridge.trainRegressor(
        data.filter(col(yLabel).isNotNull), "vector", yLabel, maxIter))
    regrCache.get._2
  }

  /** k-NN by raw vector (`query` parity minus the embed step). Returns
    * `(id, target, option1..5, distance)` ascending squared-L2 with id
    * tiebreak; empty result on empty store (P5 — the reference returns
    * None, `VectorSearchBase.py:209-210`). */
  def queryVector(q: Array[Float], k: Int = 5): DataFrame =
    Similarity.topK(data, "vector", "id", q, k, Metric.SquaredL2)
      .select(("id" +: Schemas.saveCols :+ "distance").map(col): _*)

  /** k-NN by text: embed with the single query prefix (quirk Q1: the
    * reference double-prefixes queries, `/root/reference/vsu/text/
    * _classes.py:48,62-64`; we apply it once) then search. */
  def query(q: String, k: Int = 5): DataFrame =
    queryVector(embedder.embedOne(queryPrefix + q), k)

  /** `query_with_info` parity (`VectorSearchBase.py:215-217`): query
    * result with all-null columns dropped (P4 — unused option slots
    * vanish). The null-count aggregation runs on ≤ k rows. */
  def queryWithInfo(q: String, k: Int = 5): DataFrame =
    dropAllNullColumns(query(q, k))

  def queryVectorWithInfo(q: Array[Float], k: Int = 5): DataFrame =
    dropAllNullColumns(queryVector(q, k))

  private def dropAllNullColumns(df: DataFrame): DataFrame = {
    val counts = df.select(df.columns.map(c => count(col(c)).as(c)): _*)
      .head
    val keep = df.columns.zipWithIndex
      .collect { case (c, i) if counts.getLong(i) > 0 => c }
    if (keep.isEmpty) df else df.select(keep.map(col): _*)
  }
}
