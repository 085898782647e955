package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private val urls = Seq(
    (1L, "https://good.example.org/en/1"),
    (2L, "http://bad.example.org/page?q=1"),
    (3L, "https://bad.example.org:8080/path"),   // port stops the host
    (4L, "https://host.example.org"),            // no path
    (5L, "ftp://not-http.example.org/x"),        // wrong scheme -> no domain
    (6L, "plain text, not a url")
  ).toDF("id", "url")

  test("domain extraction: scheme, port, path, and non-URL edge cases") {
    val got = urls.select($"id", UrlOps.extractDomain($"url").as("d"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "good.example.org")
    assert(got(2L) == "bad.example.org")
    assert(got(3L) == "bad.example.org")
    assert(got(4L) == "host.example.org")
    assert(got(5L) == "")
    assert(got(6L) == "")
  }

  test("literal flag path == broadcast-join flag path") {
    val blocklist = Seq("bad.example.org", "absent.example.org")
    val lit = UrlOps.flagBlocked(urls, "url", blocklist)
      .select($"id", $"domain", $"blocked")
      .as[(Long, String, Boolean)].collect().toSet
    val joined = UrlOps.flagBlockedJoin(urls, "url",
        blocklist.toDF("domain"))
      .select($"id", $"domain", $"blocked")
      .as[(Long, String, Boolean)].collect().toSet
    assert(lit == joined)
    assert(lit.filter(_._3).map(_._1) == Set(2L, 3L))
  }
}
