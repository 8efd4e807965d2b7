package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec

class WetSourceSpec extends SparkSpec {

  private val recs = Seq(
    ("http://a.example.com/1", "2024-01-01T00:00:01Z", "alpha beta"),
    ("http://a.example.com/2", "2024-01-01T00:00:02Z", "gamma"),
    ("http://a.example.com/3", "2024-01-01T00:00:03Z", "delta epsilon zeta"))

  test("multi-member gzip round-trips every record") {
    val bytes = WetSource.writeMembers(recs, gzipPerRecord = true)
    val got = WetSource.parseBytes("f.gz", bytes)
    assert(got.map(r => (r.url, r.warcDate, r.text)) === recs)
    assert(got.forall(_.recordType === "conversion"))
    assert(got.map(_.nBytes) ===
      recs.map(_._3.getBytes(UTF_8).length.toLong))
  }

  test("plain (uncompressed) concatenation parses identically") {
    val bytes = WetSource.writeMembers(recs, gzipPerRecord = false)
    val got = WetSource.parseBytes("f.wet", bytes)
    assert(got.map(_.url) === recs.map(_._1))
  }

  test("non-ASCII payload: Content-Length is octets, text decodes UTF-8") {
    val r = Seq(("http://x/1", "2024-01-01T00:00:00Z", "café ’"))
    val got = WetSource.parseBytes("f", WetSource.writeMembers(r))
    assert(got.head.text === "café ’")
    assert(got.head.nBytes ===
      "café ’".getBytes(UTF_8).length.toLong)
    assert(got.head.nBytes > got.head.text.length) // multi-byte chars
  }

  test("truncated final record is dropped, prior records survive") {
    val full = WetSource.writeMembers(recs, gzipPerRecord = false)
    // cut mid-payload of the LAST record ("delta epsilon zeta")
    val cutAt = new String(full, UTF_8).indexOf("delta") + 2
    val torn = full.take(cutAt)
    val got = WetSource.parseBytes("f", torn)
    assert(got.map(_.url) === recs.take(2).map(_._1))
  }

  test("torn header block at EOF is dropped") {
    val full = WetSource.writeMembers(recs.take(1), gzipPerRecord = false)
    val keep = WetSource.writeMembers(recs.take(1), gzipPerRecord = false)
    val torn = keep ++ "WARC/1.0\r\nWARC-Target-URI: http://t".getBytes(UTF_8)
    assert(WetSource.parseBytes("f", torn).map(_.url) ===
      Seq(recs.head._1))
    assert(full.length < torn.length) // the tear is really appended
  }

  test("corrupt gzip member salvages records framed before it") {
    val good = WetSource.writeMembers(recs.take(2), gzipPerRecord = true)
    val bad = WetSource.writeMembers(recs.drop(2), gzipPerRecord = true)
    // corrupt the second file's deflate body (past its 10-byte header)
    bad(bad.length / 2) = (bad(bad.length / 2) ^ 0x5a).toByte
    val got = WetSource.parseBytes("f.gz", good ++ bad)
    // the two intact members always survive; the corrupted third must
    // never produce a record with mangled text
    assert(got.map(_.url).take(2) === recs.take(2).map(_._1))
    assert(got.forall(r => recs.exists(x =>
      x._1 == r.url && x._3 == r.text)))
  }

  test("garbage between records resyncs on the next WARC/ magic") {
    val a = WetSource.writeMembers(recs.take(1), gzipPerRecord = false)
    val b = WetSource.writeMembers(recs.drop(2), gzipPerRecord = false)
    val bytes = a ++ "junk line\r\nmore junk\r\n".getBytes(UTF_8) ++ b
    assert(WetSource.parseBytes("f", bytes).map(_.url) ===
      Seq(recs.head._1, recs(2)._1))
  }

  test("missing Content-Length is skipped without derailing the file") {
    val noLen = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Target-URI: http://nolen\r\n\r\n").getBytes(UTF_8)
    val ok = WetSource.writeMembers(recs.take(1), gzipPerRecord = false)
    val got = WetSource.parseBytes("f", noLen ++ ok)
    assert(got.map(_.url) === Seq(recs.head._1))
  }

  test("read() parallelizes per file and filters WARC-Type") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-wet")
    java.nio.file.Files.write(tmp.resolve("a.warc.wet.gz"),
      WetSource.writeMembers(recs.take(2)))
    // a hand-framed NON-conversion (warcinfo) record to filter out
    val info = ("WARC/1.0\r\nWARC-Type: warcinfo\r\n" +
      "Content-Length: 7\r\n\r\ncrawler\r\n\r\n").getBytes(UTF_8)
    val gzInfo = {
      val bo = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bo)
      gz.write(info); gz.close(); bo.toByteArray
    }
    val mixed = gzInfo ++ WetSource.writeMembers(recs.drop(2))
    java.nio.file.Files.write(tmp.resolve("b.warc.wet.gz"), mixed)
    val df = WetSource.read(spark, tmp.toString + "/*.warc.wet.gz")
    val urls = df.select("url").collect().map(_.getString(0)).sorted
    assert(urls === recs.map(_._1).toArray) // 3 conversion, 0 warcinfo
    assert(df.columns.toSet === Set("file", "url", "warcDate",
      "recordType", "contentType", "nBytes", "text"))
  }
}
