package graft.sources

import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JSON-lines ingest/egress — the interchange format LLM data
  * pipelines actually exchange corpora in (one JSON document per
  * line). The reference itself only loads CSV
  * (`/root/reference/vsu/sample/main.py:8-15`); JSONL rounds out the
  * source surface for crawl dumps and tokenizer-ready exports.
  *
  * Scale notes: JSON-lines splits by newline, so reads parallelize per
  * file block like CSV/parquet. Schema inference costs one extra pass
  * over the data — at 100 TB ALWAYS pass `schema` (inference also
  * widens inconsistent fields to string silently; a declared schema
  * surfaces those rows in `_corrupt_record` instead).
  */
object JsonlSource {

  /** Read JSON-lines; pass `schema` at scale (see class doc). */
  def read(spark: SparkSession, path: String,
      schema: Option[StructType] = None,
      extraOptions: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.options(extraOptions)
    schema.fold(r)(r.schema).json(path)
  }

  /** Write as JSON-lines. Null fields are OMITTED from each line
    * (standard JSONL convention; they read back as null), and
    * `ignoreNullFields=false` is available via `extraOptions` when a
    * downstream consumer needs explicit nulls. */
  def write(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite,
      extraOptions: Map[String, String] = Map.empty): Unit =
    df.write.mode(mode).options(extraOptions).json(path)
}
