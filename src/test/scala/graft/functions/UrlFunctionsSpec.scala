package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graft.{CanonicalUrl, RegisteredDomain, UrlFunctions, UrlHost}
import graft.SparkSpec

/** Unit matrix for the URL canonicalizer — the generic behavior the
  * closed-form `doc_url_canon` oracle can't cover (it only exercises
  * the synthesized distribution). Cases follow the rules documented
  * on [[UrlFunctions]].
  */
class UrlFunctionsSpec extends SparkSpec {

  private def canon(u: String): String = UrlFunctions.canonicalize(u)
  private def dom(u: String): String = UrlFunctions.registeredDomain(u)

  test("scheme and host lowercase; www and default ports drop; fragment drops") {
    assert(canon("HTTP://WWW.Example.COM:80/Page#frag") === "http://example.com/Page")
    assert(canon("HTTPS://Example.com:443/") === "https://example.com/")
    assert(canon("https://example.com") === "https://example.com/")
  }

  test("EVERY leading www label strips — required for idempotence (review-caught)") {
    // one-shot stripping made canonicalize non-idempotent on
    // 'www.www.' hosts, which silently changed results under the
    // CollapseIdempotentCalls optimizer rule
    assert(canon("http://www.www.example.com/") === "http://example.com/")
    assert(canon(canon("http://www.www.example.com/"))
      === canon("http://www.www.example.com/"))
    assert(UrlFunctions.host("www.www.example.com") === "example.com")
    assert(UrlFunctions.host("https://www.www.example.com/x") === "example.com")
  }

  test("non-default ports survive; path case survives") {
    assert(canon("http://example.com:443/A/B") === "http://example.com:443/A/B")
    assert(canon("https://example.com:80/x") === "https://example.com:80/x")
    assert(canon("http://example.com:8080/CaseSensitive") ===
      "http://example.com:8080/CaseSensitive")
  }

  test("trailing slash trims except the bare root") {
    assert(canon("http://example.com/a/b/") === "http://example.com/a/b")
    assert(canon("http://example.com/") === "http://example.com/")
  }

  test("query params: tracking dropped, rest sorted, emptied query drops '?'") {
    assert(canon("http://e.com/p?b=2&a=1") === "http://e.com/p?a=1&b=2")
    assert(canon("http://e.com/p?b=2&utm_source=x&a=1&gclid=99") ===
      "http://e.com/p?a=1&b=2")
    assert(canon("http://e.com/p?utm_campaign=x") === "http://e.com/p")
    assert(canon("http://e.com/p?UTM_Source=x&FBCLID=1") === "http://e.com/p")
    // empty segments ('&&') drop; valueless keys survive
    assert(canon("http://e.com/p?&b&a=1&") === "http://e.com/p?a=1&b")
  }

  test("userinfo strips; trailing host dot strips; host keeps subdomains") {
    assert(canon("http://user:pw@Sub.Example.com./x") === "http://sub.example.com/x")
  }

  test("non-URLs canonicalize to null") {
    assert(canon("not a url") === null)
    assert(canon("ftp://example.com/x") === null)
    assert(canon("http://") === null)
    assert(canon("http://:8080/x") === null)
    assert(canon("http://e.com:bad/x") === null)
  }

  test("registered domain: eTLD+1 with the multi-part suffix subset") {
    assert(dom("http://a.b.example.com/x") === "example.com")
    assert(dom("www.example.com") === "example.com")
    assert(dom("http://deep.sub.example.co.uk/") === "example.co.uk")
    assert(dom("example.co.jp") === "example.co.jp")
    assert(dom("localhost") === "localhost")
    assert(dom("10.0.0.1") === "10.0.0.1") // IPv4 literal stays whole
    assert(dom("https://www.gov.uk/") === "gov.uk") // suffix itself, 2 labels
  }

  test("url_host accepts URLs and bare hosts, rejects junk") {
    assert(UrlFunctions.host("HTTP://WWW.E.com:80/x") === "e.com")
    assert(UrlFunctions.host("WWW.Example.ORG.") === "example.org")
    assert(UrlFunctions.host("plainhost") === "plainhost") // legal bare label
    assert(UrlFunctions.host("has/slash") === null)
    assert(UrlFunctions.host("two words") === null)
  }

  test("expressions run inside codegen over a DataFrame and null-propagate") {
    import spark.implicits._
    val df = Seq(
      Some("HTTP://WWW.Example.COM:80/Page/?b=2&utm_source=x&a=1#f"),
      Some("not a url"), // spaces: invalid as URL and as bare host
      None).toDF("url")
      .select(
        CanonicalUrl(col("url")).as("c"),
        UrlHost(col("url")).as("h"),
        RegisteredDomain(col("url")).as("d"))
    val rows = df.collect()
    assert(rows(0).getString(0) === "http://example.com/Page?a=1&b=2")
    assert(rows(0).getString(1) === "example.com")
    assert(rows(0).getString(2) === "example.com")
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1) && rows(1).isNullAt(2))
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1) && rows(2).isNullAt(2))
  }

  test("PSL data file: full rule grammar — comments, multi-part, wildcard, exception") {
    import org.apache.spark.sql.graft.PublicSuffixList
    val psl = java.nio.file.Files.createTempFile("graft-psl", ".dat")
    java.nio.file.Files.write(psl,
      """// ===BEGIN ICANN DOMAINS===
        |com
        |uk
        |co.uk
        |ck   trailing-junk-after-whitespace-ignored
        |*.ck
        |!www.ck
        |jp
        |kobe.jp
        |*.kobe.jp
        |!city.kobe.jp
        |""".stripMargin.getBytes("UTF-8"))
    PublicSuffixList.install(PublicSuffixList.load(psl.toString))
    try {
      // exact multi-part: longest rule wins over 'uk'
      assert(dom("deep.sub.example.co.uk") === "example.co.uk")
      // wildcard: every label under ck is a public suffix
      assert(dom("foo.bar.x.ck") === "bar.x.ck")
      // exception beats the wildcard: www.ck IS registrable
      assert(dom("sub.www.ck") === "www.ck")
      // (the bare host "www.ck" is out of reach here by design: the
      // canonicalizer strips EVERY leading www label before the PSL
      // sees the host, so it arrives as "ck" — rule 2 of canonicalize)
      assert(dom("www.ck") === "ck")
      // the canonical kobe.jp triple from the PSL spec examples
      assert(dom("a.b.ide.kobe.jp") === "b.ide.kobe.jp") // *.kobe.jp
      assert(dom("x.city.kobe.jp") === "city.kobe.jp")   // !city.kobe.jp
      assert(dom("y.kobe.jp") === "y.kobe.jp")           // exact kobe.jp
      // unlisted TLD: implicit '*' default rule
      assert(dom("a.b.example.zz") === "example.zz")
    } finally {
      PublicSuffixList.reset() // back to property/env/embedded resolution
      java.nio.file.Files.deleteIfExists(psl)
    }
  }

  test("PSL resolution: graft.psl.path property activates a file; missing file fails loudly") {
    import org.apache.spark.sql.graft.PublicSuffixList
    val psl = java.nio.file.Files.createTempFile("graft-psl", ".dat")
    java.nio.file.Files.write(psl, "com.example\n".getBytes("UTF-8"))
    try {
      System.setProperty("graft.psl.path", psl.toString)
      PublicSuffixList.reset()
      assert(dom("a.b.com.example") === "b.com.example")
      System.setProperty("graft.psl.path", "/nonexistent/psl.dat")
      PublicSuffixList.reset()
      intercept[IllegalArgumentException](dom("a.b.com"))
    } finally {
      System.clearProperty("graft.psl.path")
      PublicSuffixList.reset()
      java.nio.file.Files.deleteIfExists(psl)
    }
    // embedded fallback restored
    assert(dom("deep.sub.example.co.uk") === "example.co.uk")
  }

  test("PSL snapshot: the full publicsuffix.org file (2023-02-09) resolves long-tail rules") {
    // A dated, committed snapshot of the real list (Debian package
    // `publicsuffix` 20230209.2326, MPL 2.0 — public data), wired
    // through the same graft.psl.path hook a deployment uses, so the
    // FULL-FILE code path (14k lines, 107 wildcards, 8 exceptions) is
    // exercised — not just the grammar on synthetic five-line files.
    import org.apache.spark.sql.graft.{PublicSuffixList, UrlFunctions}
    val res = getClass.getResource("/public_suffix_list-20230209.dat")
    assert(res != null, "committed PSL snapshot missing from test resources")
    val path = java.nio.file.Paths.get(res.toURI).toString
    System.setProperty("graft.psl.path", path)
    PublicSuffixList.reset()
    try {
      // every case below is OUTSIDE the embedded subset — wrong
      // without the file, right with it:
      // wildcard *.kawasaki.jp: bar.kawasaki.jp is itself a public
      // suffix, so the registrable name is one label above it
      assert(dom("a.foo.bar.kawasaki.jp") === "foo.bar.kawasaki.jp")
      assert(dom("foo.bar.kawasaki.jp") === "foo.bar.kawasaki.jp")
      // exception !city.kawasaki.jp: city.kawasaki.jp is registrable
      assert(dom("x.city.kawasaki.jp") === "city.kawasaki.jp")
      // long-tail ccSLD the embedded set lacks
      assert(dom("a.example.com.bn") === "example.com.bn")
      // deep US locality chain: pvt.k12.ma.us is a 4-label suffix
      assert(dom("school.pvt.k12.ma.us") === "school.pvt.k12.ma.us")
      // the embedded subset's own cases still hold under the file
      assert(dom("deep.sub.example.co.uk") === "example.co.uk")
      // contrast: the embedded fallback gets the wildcard case WRONG
      // (kawasaki.jp is not in its 16-suffix set) — the documented
      // trade the file exists to fix
      assert(PublicSuffixList.embedded.suffixLabels(
        Array("bar", "kawasaki", "jp")) === 1)
    } finally {
      System.clearProperty("graft.psl.path")
      PublicSuffixList.reset()
    }
  }

  test("SQL registration: canonical_url/url_host/registered_domain callable from spark.sql") {
    graft.GraftSession.tune(spark)
    val r = spark.sql(
      "SELECT canonical_url('HTTPS://A.B.co.uk:443/p/?utm_source=t&z=1') AS c, " +
        "url_host('WWW.X.Com') AS h, registered_domain('a.b.co.uk') AS d")
      .collect()(0)
    assert(r.getString(0) === "https://a.b.co.uk/p?z=1")
    assert(r.getString(1) === "x.com")
    assert(r.getString(2) === "b.co.uk")
  }
}
