/* Hosted with UrlFunctions — same packaging rationale. */
package org.apache.spark.sql.graft

import java.nio.file.{Files, Paths}

/** Public Suffix List rules for [[UrlFunctions.registeredDomain]] —
  * the eTLD+1 grouping every per-domain crawl rollup keys on.
  *
  * The PSL (publicsuffix.org) is a DATA FILE, not code: it changes
  * monthly, so a production deployment ships the current list next to
  * the job and points `graft.psl.path` (system property, checked
  * first) or `GRAFT_PSL_PATH` (environment) at it — both are read
  * once per JVM, so setting them via `spark-defaults`
  * (`spark.driver.extraJavaOptions` / `spark.executor.extraJavaOptions`
  * plus `--files`) activates the same list on the driver and every
  * executor. Without a file the embedded subset
  * ([[UrlFunctions.multiPartSuffixes]]) applies — correct for the
  * common gTLDs and the major ccSLDs, wrong for long-tail ccTLDs a
  * real crawl would hit (the documented trade; wire the file).
  *
  * Supports the full rule grammar of the standard format:
  * comment lines (`//`), rule-up-to-first-whitespace, wildcard rules
  * (`*.ck`), and exception rules (`!www.ck`). Matching follows the
  * publicsuffix.org algorithm: exception rules prevail (public suffix
  * = the exception minus its leftmost label), otherwise the longest
  * matching rule wins, and the implicit default rule `*` makes the
  * last label a public suffix when nothing matches. Hosts are
  * expected in lowercase ASCII form (the canonicalizer's output);
  * IDN labels match only in the form the file lists them.
  */
final class PublicSuffixList private[graft] (
    private val exact: Set[String],
    private val wildcardParents: Set[String],
    private val exceptions: Set[String]) extends Serializable {

  /** Label count of `labels`' public suffix (0 when an exception rule
    * consumes the whole candidate — e.g. host == "www.ck" under
    * `!www.ck`, whose public suffix is "ck" seen from one more
    * label). Never exceeds `labels.length`.
    */
  def suffixLabels(labels: Array[String]): Int = {
    val n = labels.length
    var best = 1 // implicit default rule "*"
    var k = 1
    while (k <= n) {
      val cand = labels.slice(n - k, n).mkString(".")
      if (exceptions.contains(cand)) return k - 1
      if (exact.contains(cand)) best = math.max(best, k)
      if (k >= 2 &&
          wildcardParents.contains(labels.slice(n - (k - 1), n).mkString(".")))
        best = math.max(best, k)
      k += 1
    }
    math.min(best, n)
  }
}

object PublicSuffixList {

  /** The embedded fallback: [[UrlFunctions.multiPartSuffixes]] as
    * exact rules (single-label TLDs come free from the default rule).
    */
  lazy val embedded: PublicSuffixList =
    new PublicSuffixList(UrlFunctions.multiPartSuffixes, Set.empty, Set.empty)

  /** Parse standard PSL lines (comments, blanks, wildcards,
    * exceptions). The literal default rule `*` is dropped — it is
    * already implicit in the matcher.
    */
  def parse(lines: Iterator[String]): PublicSuffixList = {
    val exact = Set.newBuilder[String]
    val wild = Set.newBuilder[String]
    val exc = Set.newBuilder[String]
    lines.foreach { raw =>
      val t = raw.trim
      if (t.nonEmpty && !t.startsWith("//")) {
        // spec: the rule is everything up to the first whitespace
        val rule = t.split("\\s+", 2)(0).toLowerCase(java.util.Locale.ROOT)
        if (rule.startsWith("!")) exc += rule.substring(1)
        else if (rule.startsWith("*.")) wild += rule.substring(2)
        else if (rule != "*") exact += rule.stripPrefix(".")
      }
    }
    new PublicSuffixList(exact.result(), wild.result(), exc.result())
  }

  def load(path: String): PublicSuffixList = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }

  @volatile private var current: PublicSuffixList = _

  /** The list [[UrlFunctions.registeredDomain]] consults. Resolved
    * once per JVM: `graft.psl.path` property, then `GRAFT_PSL_PATH`
    * env, then [[embedded]]. A missing configured file fails loudly —
    * a deployment that THINKS it shipped the PSL must not silently
    * group long-tail ccTLDs wrong.
    */
  def active: PublicSuffixList = {
    var c = current
    if (c == null) { c = resolve(); current = c }
    c
  }

  private def resolve(): PublicSuffixList =
    sys.props.get("graft.psl.path").orElse(sys.env.get("GRAFT_PSL_PATH")) match {
      case Some(p) =>
        require(Files.exists(Paths.get(p)), s"configured PSL file missing: $p")
        load(p)
      case None => embedded
    }

  /** Explicit install (tests; programmatic deploys). */
  def install(psl: PublicSuffixList): Unit = current = psl

  /** Drop the cached list so the next [[active]] re-resolves. */
  def reset(): Unit = current = null
}
