package graft

import org.apache.spark.sql.types._

/** Typed view of a stored record (SURVEY §1.4: typed surface for the
  * public API and tests; internals stay DataFrame for Catalyst). */
final case class VectorRecord(
    id: Long,
    target: String,
    option1: Option[String],
    option2: Option[String],
    option3: Option[String],
    option4: Option[String],
    option5: Option[String],
    vector: Array[Float])

/** Canonical record schema of the vector store.
  *
  * Reference parity: the fixed `data` table of stkdev/VectorSearchUtil
  * (`/root/reference/vsu/base/VectorSearchBase.py:21,45-52`) — `id` rowid,
  * `target` + five free-text option columns, and a float32 vector. The
  * SQLite text round-trip codec for vectors (`VectorSearchBase.py:12-13`)
  * is NOT reproduced: Spark has native arrays.
  */
object Schemas {
  val optionCols: Seq[String] = (1 to 5).map(i => s"option$i")

  /** Metadata columns coerced at ingest (`save_columns`,
    * `/root/reference/vsu/base/VectorSearchBase.py:21`). */
  val saveCols: Seq[String] = "target" +: optionCols

  val vectorType: ArrayType = ArrayType(FloatType, containsNull = false)

  /** Post-ingest schema: `id` is 1..N insertion order (rowid parity,
    * `/root/reference/vsu/base/VectorSearchBase.py:47,89`). */
  val record: StructType = StructType(
    StructField("id", LongType, nullable = false) +:
      saveCols.map(c => StructField(c, StringType, nullable = true)) :+
      StructField("vector", vectorType, nullable = true)
  )

  /** Documents table of the test harness (`/root/repo/TESTDATA.md`). */
  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)
  ))
}
