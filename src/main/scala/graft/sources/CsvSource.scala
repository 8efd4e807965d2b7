package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV ingest utilities — the reference's sample loading path
  * (S1/S2/S3 in SURVEY §2.1): header CSV with non-ASCII (Japanese)
  * column names, renamed onto the fixed store schema, with relative
  * file paths resolved against a base directory
  * (`/root/reference/vsu/sample/main.py:8-15,107-111`).
  */
object CsvSource {

  /** S1: header CSV read; UTF-8, multiline-safe defaults. */
  def read(spark: SparkSession, path: String,
      extraOptions: Map[String, String] = Map.empty): DataFrame =
    spark.read
      .option("header", "true")
      .option("encoding", "UTF-8")
      .options(extraOptions)
      .csv(path)

  /** S2: map user columns onto the store schema and DROP everything
    * not mentioned (the reference projects to save_columns after the
    * rename — unmapped columns never reach the store). */
  def renamed(df: DataFrame, mapping: Map[String, String]): DataFrame = {
    val missing = mapping.keySet -- df.columns.toSet
    require(missing.isEmpty, s"rename source columns not found: $missing")
    df.select(mapping.map { case (from, to) => col(from).as(to) }.toSeq: _*)
  }

  /** S3: resolve a relative-path column against a base directory
    * (`os.path.join` parity: absolute paths pass through). */
  def resolvePaths(df: DataFrame, pathCol: String, baseDir: String): DataFrame = {
    val base = if (baseDir.endsWith("/")) baseDir else baseDir + "/"
    df.withColumn(pathCol,
      when(col(pathCol).startsWith("/"), col(pathCol))
        .otherwise(concat(lit(base), col(pathCol))))
  }
}
