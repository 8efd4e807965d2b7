package graft.operators

import graft.{SparkEntry, SparkSpec}

/** The `*_saved_knn` registrations (search over a persisted index
  * artifact) must answer IDENTICALLY to their in-query-fit `*_knn`
  * twins: same hyperparameters, same seed, same session — the only
  * difference allowed is WHERE the trained parameters live (parquet
  * artifact vs process memory). A drift here would mean the artifact
  * round-trip loses or reorders trained state. */
class SavedIndexSpec extends SparkSpec {

  private val families = Seq(
    "ivf_knn" -> "ivf_saved_knn",
    "sq8_knn" -> "sq8_saved_knn",
    "pq_knn" -> "pq_saved_knn",
    "opq_knn" -> "opq_saved_knn",
    "ivfpq_knn" -> "ivfpq_saved_knn",
    "pca_sq8_knn" -> "pca_sq8_saved_knn")

  for ((live, saved) <- families)
    test(s"$saved equals the live $live path row-for-row") {
      val dir = sf()
      val a = SparkEntry.queries(live)(spark, dir)
        .collect().map(_.toSeq).toSeq
      val b = SparkEntry.queries(saved)(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(b == a, s"saved-artifact search drifted from live fit " +
        s"($saved vs $live)")
      assert(a.nonEmpty)
    }

  test("a second loadSaved call serves the memoized artifact (no refit)") {
    // the artifact root is process-memoized: two invocations of the
    // saved query return the same result from the same persisted files
    val dir = sf()
    val first = SparkEntry.queries("sq8_saved_knn")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val second = SparkEntry.queries("sq8_saved_knn")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(first == second && first.nonEmpty)
  }
}
