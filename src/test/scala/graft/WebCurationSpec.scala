package graft

import org.apache.spark.sql.functions._

import graft.operators.WebCuration

/** URL/host web-curation family: the canonicalizer rule set pinned edge
  * by edge (the DuckDB oracle only sees the synthesized corpus shapes;
  * this spec owns the general contract), plus the relational stages.
  */
class WebCurationSpec extends SparkSpec {
  import spark.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("u").select(WebCuration.canonicalUrl(col("u")))
      .collect().head.getString(0)

  test("canonicalizeUrl: every documented rule, edge by edge") {
    // fragment dropped
    assert(canon("https://a.com/x#sec") === "https://a.com/x")
    // scheme+host lowercased, path/query case PRESERVED
    assert(canon("HTTPS://A.CoM/Path?Q=V") === "https://a.com/Path?Q=V")
    // www. stripped (host only — path 'www.' untouched)
    assert(canon("https://www.a.com/www.b") === "https://a.com/www.b")
    // default ports stripped per scheme; non-default and cross-scheme kept
    assert(canon("http://a.com:80/x") === "http://a.com/x")
    assert(canon("https://a.com:443/x") === "https://a.com/x")
    assert(canon("http://a.com:8080/x") === "http://a.com:8080/x")
    assert(canon("http://a.com:443/x") === "http://a.com:443/x")
    assert(canon("https://a.com:80/x") === "https://a.com:80/x")
    // tracking params dropped order-preserving; names case-insensitive;
    // a bare (no '=') tracking name also drops; utm in a VALUE is kept
    assert(canon("https://a.com/x?utm_source=f&id=3&UTM_campaign=c&p=2")
      === "https://a.com/x?id=3&p=2")
    assert(canon("https://a.com/x?ref&id=3") === "https://a.com/x?id=3")
    assert(canon("https://a.com/x?q=utm_source") === "https://a.com/x?q=utm_source")
    assert(canon("https://a.com/x?fbclid=1&gclid=2&msclkid=3&mc_cid=4&mc_eid=5")
      === "https://a.com/x")
    // emptied query loses its '?'
    assert(canon("https://a.com/x?utm_source=f") === "https://a.com/x")
    // ONE trailing slash dropped; root path collapses onto the authority
    assert(canon("https://a.com/x/") === "https://a.com/x")
    assert(canon("https://a.com/x//") === "https://a.com/x/")
    assert(canon("https://a.com/") === "https://a.com")
    assert(canon("https://a.com") === "https://a.com")
    // trailing slash applies to the PATH, not a query value
    assert(canon("https://a.com/x?d=/") === "https://a.com/x?d=/")
    // non-URL shapes: trimmed + fragment-stripped only
    assert(canon("  not a url #frag ") === "not a url")
    // the whole pile at once
    assert(canon(" HTTP://WWW.Site7.Example.COM:80/Articles/3/?utm_source=F&id=9&ref=h#Sec ")
      === "http://site7.example.com/Articles/3?id=9")
    // null in, null out
    val n = Seq[(Integer, String)]((1, null)).toDF("i", "u")
      .select(WebCuration.canonicalUrl(col("u"))).collect().head
    assert(n.isNullAt(0))
  }

  test("url_canonicalize is SQL-registered and matches the Column API") {
    val got = spark.sql(
      "SELECT url_canonicalize('HTTP://WWW.A.com:80/X/?utm_source=f&id=2#s')")
      .collect().head.getString(0)
    assert(got === "http://a.com/X?id=2")
  }

  test("urlKeyDedup collapses canon-equal variants to min id") {
    val rows = Seq(
      (1L, "http://a.com/x"), (2L, "HTTP://WWW.a.com:80/x/"),
      (3L, "http://a.com/x?utm_source=f"), (4L, "http://a.com/y"))
      .toDF("doc_id", "url")
    val got = WebCuration.urlKeyDedup(rows, "url", "doc_id")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got === Map(
      "http://a.com/x" -> ((1L, 3L)), "http://a.com/y" -> ((4L, 1L))))
  }

  test("streamed canonical-URL dedup (canonicalize -> dropDuplicates on " +
      "the canon key) matches batch urlKeyDedup's key set under " +
      "at-least-once redelivery") {
    import java.nio.file.Files
    val rows = Seq(
      (1L, "http://a.com/x"), (2L, "HTTP://WWW.a.com:80/x/"),
      (3L, "http://a.com/x?utm_source=f"), (4L, "http://a.com/y"),
      (5L, "https://B.com/z#frag"), (6L, "https://b.com/z"))
      .toDF("doc_id", "url")
    val dir = Files.createTempDirectory("graft-surl-").toString
    rows.coalesce(1).write.parquet(s"$dir/a")
    rows.coalesce(1).write.parquet(s"$dir/b") // redelivery
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/a").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/*")
      .withColumn("canon_url", WebCuration.canonicalUrl(col("url")))
      .dropDuplicates("canon_url")
    val q = stream.writeStream.format("memory").queryName("surl")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("surl").select("canon_url")
        .collect().map(_.getString(0)).toSet
      val batch = WebCuration.urlKeyDedup(rows, "url", "doc_id")
        .select("canon_url").collect().map(_.getString(0)).toSet
      assert(streamed === batch)
      assert(spark.table("surl").count() === batch.size.toLong,
        "exactly one row per canonical key")
    } finally q.stop()
  }

  test("domainStats aggregates per domain; withBlocklist broadcast-flags") {
    val rows = Seq(
      (1L, "https://a.com/1", "one two three", 13L),
      (2L, "https://WWW.a.com/2", "four five", 9L),
      (3L, "http://b.com:8080/x", "six", 3L))
      .toDF("doc_id", "url", "text", "n_chars")
    val stats = WebCuration.domainStats(rows, "url", "text", "n_chars")
    val got = stats.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(
      "a.com" -> ((2L, 5L, 11000000L)), // (13+9)*1e6 DIV 2
      "b.com" -> ((1L, 1L, 3000000L)))) // port is not part of the domain
    val flagged = WebCuration.withBlocklist(
        stats, Seq("a.com").toDF("domain"))
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(flagged === Map("a.com" -> 1L, "b.com" -> 0L))
  }
}
