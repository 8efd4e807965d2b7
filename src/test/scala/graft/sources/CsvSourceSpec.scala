package graft.sources

import graft.SparkSpec
import graft.functions.HashEmbedder
import graft.store.VectorStore

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Reference sample-scenario parity (`/root/reference/vsu/sample/
  * main.py:8-15,104-119`): Japanese-header CSV → rename → ingest →
  * query. Fixture synthesized here (not copied from the reference). */
class CsvSourceSpec extends SparkSpec {

  private lazy val csvDir: String = {
    val d = Files.createTempDirectory("graft-csv").toString
    val text = Seq(
      "タイトル,作者,発表年",
      "都市の鳩について,山田花子,2018",
      "川沿いの猫の記録,佐藤太郎,2019",
      "山の天気の観測,鈴木一郎,2020").mkString("\n")
    Files.write(Paths.get(d, "books.csv"),
      text.getBytes(StandardCharsets.UTF_8))
    val imgs = Seq("画像パス", "img/a.png", "/abs/b.png").mkString("\n")
    Files.write(Paths.get(d, "imgs.csv"),
      imgs.getBytes(StandardCharsets.UTF_8))
    d
  }

  test("S1: header CSV with non-ASCII columns") {
    val df = CsvSource.read(spark, s"$csvDir/books.csv")
    assert(df.columns.toSeq == Seq("タイトル", "作者", "発表年"))
    assert(df.count() == 3)
  }

  test("S2: rename keeps only mapped columns") {
    val df = CsvSource.renamed(
      CsvSource.read(spark, s"$csvDir/books.csv"),
      Map("タイトル" -> "target", "作者" -> "option1"))
    assert(df.columns.toSeq.sorted == Seq("option1", "target"))
    // 発表年 dropped (not in save_columns) — main.py:107-108 parity
  }

  test("S2: missing source column raises") {
    intercept[IllegalArgumentException] {
      CsvSource.renamed(
        CsvSource.read(spark, s"$csvDir/books.csv"),
        Map("nope" -> "target"))
    }
  }

  test("S3: relative paths resolved, absolute pass through") {
    val df = CsvSource.resolvePaths(
      CsvSource.renamed(CsvSource.read(spark, s"$csvDir/imgs.csv"),
        Map("画像パス" -> "target")),
      "target", "/base/dir")
    val paths = df.collect().map(_.getString(0)).toSet
    assert(paths == Set("/base/dir/img/a.png", "/abs/b.png"))
  }

  test("CSV → rename → store → query end-to-end (sample1_1 parity)") {
    val store = new VectorStore(spark, HashEmbedder(dim = 32))
    store.setData(CsvSource.renamed(
      CsvSource.read(spark, s"$csvDir/books.csv"),
      Map("タイトル" -> "target", "作者" -> "option1")))
    assert(store.data.count() == 3)
    val res = store.queryWithInfo("都市の鳩について", k = 2).collect()
    assert(res.length == 2)
    assert(res.head.getString(1) == "都市の鳩について")
  }

  test("insertData: single-row insert-if-absent") {
    val store = new VectorStore(spark, HashEmbedder(dim = 8))
    store.insertData("first row", Seq("opt"))
    store.insertData("second row")
    store.insertData("first row", Seq("changed")) // absent wins: no-op
    val rows = store.data.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows.head.getString(2) == "opt")
  }
}
