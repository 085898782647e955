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

  test("canonicalizeUrl: each normalization step, alone and composed") {
    val cases = Seq(
      // fragment
      "https://a.org/x#frag"                 -> "https://a.org/x",
      // scheme+host lowercase, path case preserved
      "HTTPS://A.ORG/Path"                   -> "https://a.org/Path",
      // default ports dropped; non-default kept
      "https://a.org:443/x"                  -> "https://a.org/x",
      "http://a.org:80/x"                    -> "http://a.org/x",
      "http://a.org:8080/x"                  -> "http://a.org:8080/x",
      // tracking params dropped, survivor order preserved
      "https://a.org/x?utm_source=f&id=1&b=2" -> "https://a.org/x?id=1&b=2",
      "https://a.org/x?ref=tw"               -> "https://a.org/x",
      "https://a.org/x?fbclid=1&gclid=2"     -> "https://a.org/x",
      // a param merely CONTAINING a tracked name survives
      "https://a.org/x?xref=1&myutm_a=2"     -> "https://a.org/x?xref=1&myutm_a=2",
      // trailing slashes
      "https://a.org/x/"                     -> "https://a.org/x",
      "https://a.org/"                       -> "https://a.org",
      // everything at once
      "HTTP://A.Org:80/P/?utm_a=1&id=9#z"    -> "http://a.org/P?id=9"
    )
    val df = cases.zipWithIndex.map { case ((u, e), i) => (i.toLong, u, e) }
      .toDF("id", "url", "expected")
    val out = df.select($"id",
        UrlOps.canonicalizeUrl($"url").as("canon"), $"expected")
      .as[(Long, String, String)].collect()
    out.foreach { case (id, got, want) =>
      assert(got == want, s"case $id: $got != $want")
    }
  }

  test("dedupByCanonicalUrl keeps the smallest id per canonical key") {
    val df = Seq(
      (10L, "https://a.org/x?utm_s=1"),
      (3L,  "HTTPS://A.ORG/x#f"),
      (7L,  "https://a.org/x/"),
      (5L,  "https://a.org/y")
    ).toDF("doc_id", "url")
    val out = UrlOps.dedupByCanonicalUrl(df, "url", "doc_id")
      .select($"doc_id", $"canon_url", $"keep")
      .as[(Long, String, Boolean)].collect().toSet
    assert(out == Set(
      (10L, "https://a.org/x", false),
      (3L,  "https://a.org/x", true),
      (7L,  "https://a.org/x", false),
      (5L,  "https://a.org/y", true)))
  }
}
