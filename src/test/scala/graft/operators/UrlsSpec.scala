package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.canonicalize(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("scheme and host lowercase; path and query stay case-sensitive") {
    assert(canon("HTTPS://Example.COM/Path?Q=Va") ==
      Seq("https://example.com/Path?Q=Va"))
  }

  test("fragment dropped, default ports dropped per scheme, " +
      "non-default ports kept") {
    assert(canon(
      "https://example.com:443/a#top",
      "http://example.com:80/a",
      "https://example.com:8443/a",
      "http://example.com:443/a") == Seq(
      "https://example.com/a",
      "http://example.com/a",
      "https://example.com:8443/a",
      "http://example.com:443/a")) // 443 is NOT http's default
  }

  test("tracking params dropped, surviving param ORDER preserved, " +
      "emptied query loses its '?'") {
    assert(canon(
      "https://x.com/a?utm_source=f&b=2&a=1&fbclid=z",
      "https://x.com/a?utm_campaign=c&gclid=1&msclkid=2&mc_eid=3") == Seq(
      "https://x.com/a?b=2&a=1",
      "https://x.com/a"))
  }

  test("trailing slashes collapse; root path unifies with bare host") {
    assert(canon(
      "https://x.com/a/",
      "https://x.com/a///",
      "https://x.com/",
      "https://x.com") == Seq(
      "https://x.com/a",
      "https://x.com/a",
      "https://x.com",
      "https://x.com"))
  }

  test("whitespace trimmed; schemeless strings pass through with only " +
      "trim + fragment strip (no host to lowercase)") {
    assert(canon("  https://x.com/a  ", "Example.COM/Path#f", "") ==
      Seq("https://x.com/a", "Example.COM/Path", ""))
  }

  test("a param merely CONTAINING a tracking name survives — the " +
      "match anchors at the param start") {
    assert(canon("https://x.com/a?xutm_source=1&myfbclid=2&b=utm_") ==
      Seq("https://x.com/a?xutm_source=1&myfbclid=2&b=utm_"))
  }

  test("dedupByCanonical: variants collapse to one row, min id wins, " +
      "n_variants counts the fetches") {
    val df = Seq(
      (3L, "https://X.com/a/?utm_source=f"),
      (1L, "https://x.com/a"),
      (2L, "https://x.com:443/a#frag"),
      (9L, "http://other.com/b")).toDF("id", "url")
    val out = Urls.dedupByCanonical(df, "id", "url")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(out == Set(
      ("https://x.com/a", 1L, 3L),
      ("http://other.com/b", 9L, 1L)))
  }
}
