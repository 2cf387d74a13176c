package graft

import graft.llmops.Web
import graft.llmops.Web.{RobotsGroup, RobotsRule}

class RobotsSpec extends SparkSpec {

  private val policy =
    """# fixture crawl policy
      |User-agent: graftbot
      |Disallow: /private/
      |Allow: /private/ok/
      |Disallow: /*.json$
      |Disallow: /api/
      |Allow: /api/*/docs
      |Disallow: /tmp*
      |
      |User-agent: *
      |Allow: /public/
      |Disallow: /
      |""".stripMargin

  test("parseRobots: groups, comments, agent runs, garbage tolerance") {
    val gs = Web.parseRobots(policy)
    assert(gs.length === 2)
    assert(gs(0).agents === Vector("graftbot"))
    assert(gs(0).rules.length === 6)
    assert(gs(1).agents === Vector("*"))
    assert(gs(1).rules === Vector(
      RobotsRule(allow = true, "/public/"),
      RobotsRule(allow = false, "/")))
    // consecutive user-agent lines share ONE group; a rule line ends
    // the run so a later user-agent opens a NEW group
    val multi = Web.parseRobots(
      "User-agent: a\nUser-agent: b\nDisallow: /x\n" +
        "User-agent: c\nDisallow: /y\n")
    assert(multi.length === 2)
    assert(multi(0).agents === Vector("a", "b"))
    assert(multi(1).agents === Vector("c"))
    // rules before any user-agent ignored; empty Disallow: matches
    // nothing (RFC 9309 allow-all); junk lines skipped; null safe
    val junk = Web.parseRobots(
      "Disallow: /orphan\nUser-agent: z\nDisallow:\n" +
        "Crawl-delay: 10\nnot a line\nDisallow: /real # trail\n")
    assert(junk.length === 1)
    assert(junk(0).rules === Vector(RobotsRule(allow = false, "/real")))
    assert(Web.parseRobots(null) === Vector.empty)
    assert(Web.parseRobots("") === Vector.empty)
  }

  test("robotsMatches: prefix, *, $, degenerate patterns") {
    assert(Web.robotsMatches("/private/", "/private/x"))
    assert(!Web.robotsMatches("/private/", "/privatex"))
    assert(Web.robotsMatches("/*.json$", "/data/a.json"))
    assert(!Web.robotsMatches("/*.json$", "/data/a.json/x"))
    assert(Web.robotsMatches("/api/*/docs", "/api/v1/docs"))
    assert(Web.robotsMatches("/api/*/docs", "/api/v1/docs/extra"))
    assert(!Web.robotsMatches("/api/*/docs", "/api/docs"))
    assert(Web.robotsMatches("/tmp*", "/tmpfoo"))
    assert(Web.robotsMatches("*", "/anything"))
    assert(Web.robotsMatches("/a*b*c$", "/aXbYbZc"))
    assert(!Web.robotsMatches("/a*b*c$", "/aXbYcZ"))
    assert(Web.robotsMatches("/$", "/"))
    assert(!Web.robotsMatches("/$", "/x"))
  }

  test("crawl-delay + sitemaps: per-group delay selection, global " +
    "sitemap lines, garbage values ignored") {
    val txt =
      """Sitemap: https://a.com/sm1.xml
        |User-agent: fastbot
        |Crawl-delay: 0.5
        |Disallow: /x
        |User-agent: slowbot
        |Crawl-delay: 10
        |Disallow: /y
        |User-agent: slowbot
        |Crawl-delay: 2
        |User-agent: *
        |Crawl-delay: nonsense
        |Disallow: /
        |SITEMAP: https://a.com/sm2.xml  # trailing comment
        |""".stripMargin
    val gs = Web.parseRobots(txt)
    assert(gs(0).crawlDelayMillis === Some(500L))
    assert(gs(1).crawlDelayMillis === Some(10000L))
    assert(gs(3).crawlDelayMillis === None) // unparseable -> absent
    assert(Web.robotsCrawlDelayFor(gs, "FastBot/2") === Some(500L))
    // same token in two groups: conservative minimum
    assert(Web.robotsCrawlDelayFor(gs, "slowbot") === Some(2000L))
    // * fallback has no valid delay
    assert(Web.robotsCrawlDelayFor(gs, "unknown") === None)
    assert(Web.robotsSitemaps(txt) ===
      Vector("https://a.com/sm1.xml", "https://a.com/sm2.xml"))
    assert(Web.robotsSitemaps(null) === Vector.empty)
  }

  test("robotsMatches: seeded fuzz against a reference regex " +
    "translation") {
    // reference semantics: anchored at start, '*' -> '.*', trailing
    // '$' -> end anchor, everything else literal
    def refMatch(pattern: String, path: String): Boolean = {
      val endAnchored = pattern.endsWith("$")
      val pat = if (endAnchored) pattern.dropRight(1) else pattern
      val rx = pat.split("\\*", -1)
        .map(java.util.regex.Pattern.quote)
        .mkString("(?s).*") + (if (endAnchored) "$" else "(?s).*$")
      java.util.regex.Pattern.compile("^" + rx).matcher(path).matches()
    }
    val rnd = new scala.util.Random(9309)
    val chars = "/ab3.$*"
    def rs(n: Int) =
      (0 until n).map(_ => chars(rnd.nextInt(chars.length))).mkString
    var checked = 0
    (0 until 4000).foreach { _ =>
      val pattern = "/" + rs(rnd.nextInt(8))
      val path = "/" + rs(rnd.nextInt(12))
      // '$' is only an anchor at the END of a rule; skip patterns with
      // interior '$' (the RFC leaves them undefined, we treat interior
      // '$' as literal and so does the reference translation — but
      // a trailing-'$'-after-'*' etc. must still agree)
      assert(Web.robotsMatches(pattern, path) === refMatch(pattern, path),
        s"pattern=$pattern path=$path")
      checked += 1
    }
    assert(checked === 4000)
  }

  test("group selection: exact token case-insensitive, combined " +
    "groups, * fallback") {
    val gs = Web.parseRobots(policy)
    val g = Web.robotsRulesFor(gs, "GraftBot/1.2 (+https://example)")
    assert(g.length === 6)
    val o = Web.robotsRulesFor(gs, "OtherBot/0.1")
    assert(o === Vector(RobotsRule(allow = true, "/public/"),
      RobotsRule(allow = false, "/")))
    // two groups naming the same token are COMBINED (RFC 9309)
    val comb = Web.robotsRulesFor(Web.parseRobots(
      "User-agent: x\nDisallow: /a\nUser-agent: x\nDisallow: /b\n"),
      "x")
    assert(comb.map(_.pattern) === Vector("/a", "/b"))
    // no * group and no match -> no rules -> everything allowed
    assert(Web.robotsRulesFor(Web.parseRobots(
      "User-agent: y\nDisallow: /\n"), "x") === Vector.empty)
  }

  test("decision: longest match wins, Allow wins ties, no match " +
    "allows") {
    val rules = Web.robotsRulesFor(Web.parseRobots(policy), "graftbot")
    def d(p: String) = Web.robotsDecision(rules, p)
    assert(d("/public/x") === None)
    assert(Web.robotsIsAllowed(rules, "/public/x"))
    assert(d("/private/x") === Some(RobotsRule(allow = false, "/private/")))
    assert(d("/private/ok/x") ===
      Some(RobotsRule(allow = true, "/private/ok/")))
    assert(d("/data/a.json") === Some(RobotsRule(allow = false, "/*.json$")))
    assert(d("/data/a.json/x") === None)
    assert(d("/api/v1/docs") === Some(RobotsRule(allow = true, "/api/*/docs")))
    assert(d("/api/v1/other") === Some(RobotsRule(allow = false, "/api/")))
    assert(d("/tmpfoo") === Some(RobotsRule(allow = false, "/tmp*")))
    // equal-length tie -> Allow wins
    val tie = Seq(RobotsRule(allow = false, "/t/"),
      RobotsRule(allow = true, "/t/"))
    assert(Web.robotsDecision(tie, "/t/x").exists(_.allow))
    // empty/null path normalizes to "/" (the * group's Disallow: /
    // catches it)
    val other = Web.robotsRulesFor(Web.parseRobots(policy), "nobody")
    assert(!Web.robotsIsAllowed(other, ""))
    assert(!Web.robotsIsAllowed(other, null))
  }

  test("withRobotsAllowedByPolicy: per-domain robots table joined to " +
    "the corpus; missing policy allows") {
    import spark.implicits._
    val pol = Seq(
      ("a.com", "User-agent: *\nDisallow: /\n"),
      ("b.com", "User-agent: bot\nDisallow: /x/*3$\n"),
      ("c.com", "User-agent: bot\nAllow: /x/*\nDisallow: /\n"))
      .toDF("domain", "robots_txt")
    val docs = Seq(
      (1L, "a.com", "/x/1"), (2L, "b.com", "/x/3"),
      (3L, "b.com", "/x/4"), (4L, "c.com", "/x/9"),
      (5L, "nopolicy.com", "/anything"))
      .toDF("id", "domain", "path")
    val out = Web.withRobotsAllowedByPolicy(docs, "domain", "path",
      pol, "domain", "robots_txt", "Bot/1.0")
      .orderBy("id")
      .select("robots_allowed", "robots_rule")
      .collect()
      .map(r => (r.getBoolean(0), Option(r.getString(1))))
    assert(out.toSeq === Seq(
      (false, Some("/")), // * fallback group blocks all of a.com
      (false, Some("/x/*3$")), (true, None), // named group on b.com
      (true, Some("/x/*")), // longer Allow beats Disallow / on c.com
      (true, None))) // no robots.txt row -> allowed
  }

  test("withRobotsAllowedByPolicy: duplicate policy rows never multiply " +
    "corpus rows; latest fetch wins with an order column") {
    import spark.implicits._
    // two fetches of a.com's robots.txt: the older allows, the newer
    // blocks — a naive left join would emit BOTH verdicts per corpus row
    val pol = Seq(
      ("a.com", "User-agent: *\nAllow: /\n", 1L),
      ("a.com", "User-agent: *\nDisallow: /\n", 2L),
      ("b.com", "User-agent: *\nDisallow: /x\n", 1L))
      .toDF("domain", "robots_txt", "fetched_at")
    val docs = Seq((1L, "a.com", "/p"), (2L, "b.com", "/x/1"))
      .toDF("id", "domain", "path")
    val out = Web.withRobotsAllowedByPolicy(docs, "domain", "path",
      pol, "domain", "robots_txt", "Bot/1.0",
      policyOrderCol = Some("fetched_at"))
      .orderBy("id").select("id", "robots_allowed").collect()
    assert(out.length === 2) // no row multiplication
    assert(out.map(r => (r.getLong(0), r.getBoolean(1))).toSeq ===
      Seq((1L, false), (2L, false))) // newest a.com policy decided
    // without an order column: still one row per corpus row
    val out2 = Web.withRobotsAllowedByPolicy(docs, "domain", "path",
      pol, "domain", "robots_txt", "Bot/1.0").collect()
    assert(out2.length === 2)
  }

  test("crawl-delay policy join + frontier schedule: slots x delay, " +
    "fractional seconds, missing-policy default") {
    import spark.implicits._
    val pol = Seq(
      ("a.com", "User-agent: *\nCrawl-delay: 2.5\n"),
      ("b.com", "User-agent: *\nDisallow: /x\n")) // no delay named
      .toDF("domain", "robots_txt")
    val frontier = Seq(
      ("a.com", "https://a.com/1", 5L), ("a.com", "https://a.com/2", 9L),
      ("a.com", "https://a.com/3", 9L), // ties break by url asc
      ("b.com", "https://b.com/1", 2L), // policy without a Crawl-delay
      ("c.com", "https://c.com/1", 1L)) // no policy row at all
      .toDF("domain", "url", "n_refs")
    val out = Web.frontierSchedule(
      Web.withCrawlDelayByPolicy(frontier, "domain", pol, "domain",
        "robots_txt", "Bot/1.0", defaultDelayMillis = 700L),
      "domain", "url", "n_refs", "robots_delay_ms")
      .orderBy("url")
      .select("url", "robots_delay_ms", "fetch_slot", "fetch_time_ms")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      ("https://a.com/1", 2500L, 2L, 5000L), // lowest priority: slot 2
      ("https://a.com/2", 2500L, 0L, 0L), // n_refs 9, url tiebreak
      ("https://a.com/3", 2500L, 1L, 2500L),
      ("https://b.com/1", 700L, 0L, 0L), // delay-less policy -> default
      ("https://c.com/1", 700L, 0L, 0L))) // missing policy -> default
  }

  test("frontierScheduleRecency: lastmod freshness outranks " +
    "popularity; same-day ranks by time-of-day, date-only after " +
    "timestamped; undated last") {
    import spark.implicits._
    val frontier = Seq(
      // undated but most-referenced: ranks AFTER every dated seed
      ("a.com", "https://a.com/hot", null: String, 99L),
      // same day: later time first, earlier time second, date-only
      // (no time field) after ANY timestamped same-day entry —
      // popularity never outranks a same-day time difference
      ("a.com", "https://a.com/d1", "2024-03-05T23:59:59Z", 1L),
      ("a.com", "https://a.com/d0", "2024-03-05T04:00:00Z", 9L),
      ("a.com", "https://a.com/d2", "2024-03-05", 7L),
      // fresher date wins regardless of popularity
      ("a.com", "https://a.com/new", "2024-03-06", 0L),
      // unparseable lastmod ranks with the undated tail (by n_refs)
      ("a.com", "https://a.com/bad", "not-a-date", 5L))
      .toDF("domain", "url", "lastmod", "n_refs")
      .withColumn("robots_delay_ms",
        org.apache.spark.sql.functions.lit(100L))
    val out = Web.frontierScheduleRecency(frontier, "domain", "url",
      "lastmod", "n_refs", "robots_delay_ms")
      .orderBy("fetch_slot").select("url").collect()
      .map(_.getString(0))
    assert(out.toSeq === Seq(
      "https://a.com/new",   // 2024-03-06
      "https://a.com/d1",    // 03-05 T23:59:59
      "https://a.com/d0",    // 03-05 T04:00:00
      "https://a.com/d2",    // 03-05 date-only (no time field)
      "https://a.com/hot",   // undated, n_refs 99
      "https://a.com/bad"))  // unparseable, n_refs 5
  }

  test("frontierSchedule: NULL registered domains (host IS a public " +
    "suffix) schedule per host, never one shared politeness queue") {
    import spark.implicits._
    // two unrelated public-suffix hosts with null domain, plus a
    // normal domain — each must get its OWN slot sequence
    val frontier = Seq(
      (null: String, "github.io", "https://github.io/a", 5L),
      (null: String, "github.io", "https://github.io/b", 3L),
      (null: String, "ck", "https://ck/x", 9L),
      ("a.com", "a.com", "https://a.com/1", 1L))
      .toDF("domain", "url_host", "url", "n_refs")
      .withColumn("robots_delay_ms", org.apache.spark.sql.functions
        .lit(1000L))
    val out = Web.frontierSchedule(frontier, "domain", "url",
      "n_refs", "robots_delay_ms")
      .orderBy("url").select("url", "fetch_slot").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(
      ("https://a.com/1", 0L),
      ("https://ck/x", 0L), // own queue, not behind github.io
      ("https://github.io/a", 0L),
      ("https://github.io/b", 1L)))
  }

  test("robotsPoliciesFromFetches: RELATIVE Location resolves against " +
    "the carrying url (RFC 9110); garbage urls never '' -join; " +
    "unresolvable relative chain maps to allow-all") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val fetches = Seq(
      // rel.com: 301 with a ROOT-RELATIVE Location — must resolve to
      // https://rel.com/real.txt and pick up its Disallow body
      ("rel.com", "https://rel.com/robots.txt", 301,
        Some("/real.txt"), None: Option[String], "2024-02-01T00:00:00Z"),
      ("rel.com", "https://rel.com/real.txt", 200, None,
        Some("User-agent: *\nDisallow: /r\n"), "2024-02-01T00:00:00Z"),
      // dot.com: relative-path Location with dot segments through a
      // TWO-hop chain ( ../v2/robots.txt from /a/robots.txt → /v2/… )
      ("dot.com", "https://dot.com/a/robots.txt", 302,
        Some("../v2/robots.txt"), None, "2024-02-01T00:00:00Z"),
      ("dot.com", "https://dot.com/v2/robots.txt", 200, None,
        Some("User-agent: *\nDisallow: /d\n"), "2024-02-01T00:00:00Z"),
      // lost.com: relative Location whose target was never fetched —
      // unavailable-by-redirect → allow-all (empty policy)
      ("lost.com", "https://lost.com/robots.txt", 301,
        Some("/nowhere.txt"), None, "2024-02-01T00:00:00Z"),
      // junk.com: a GARBAGE url row in the TARGET set (canon '');
      // junk2.com: a redirect whose base is garbage so resolution
      // yields '' — if either side '' -joins, junk2 would pick up
      // junk.com's 200 body instead of mapping to allow-all
      ("junk.com", "not a url at all", 200, None,
        Some("User-agent: *\nDisallow: /j\n"), "2024-02-01T00:00:00Z"),
      ("junk2.com", "also-not-a-url", 301, Some("/x.txt"),
        None, "2024-02-01T00:00:00Z"))
      .toDF("domain", "url", "status", "location", "body", "ts")
    val pol = Web.robotsPoliciesFromFetches(
      fetches.where(col("url").contains("robots.txt") ||
        col("url") === "also-not-a-url"),
      "domain", "url", "status", "location", "body", "ts",
      targets = Some(fetches))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(pol("rel.com") === "User-agent: *\nDisallow: /r\n")
    assert(pol("lost.com") === "")
    // garbage-base redirect: resolution is '' → never joins the ''
    // canon target → unavailable-by-redirect → allow-all
    assert(pol("junk2.com") === "")
    val dotPol = Web.robotsPoliciesFromFetches(
      fetches.where(col("url") === "https://dot.com/a/robots.txt"),
      "domain", "url", "status", "location", "body", "ts",
      targets = Some(fetches))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(dotPol("dot.com") === "User-agent: *\nDisallow: /d\n")
  }

  test("frontierSchedule: scheme-less urls with null domain get their " +
    "OWN queues (url fallback), never one shared '' catch-all") {
    import spark.implicits._
    val frontier = Seq(
      // no scheme → host regex extracts '' → must fall back to the
      // url itself: each is a queue of ONE (slot 0), not serialized
      // behind each other on a shared '' key
      (null: String, "mailto:x@example.com", 5L),
      (null: String, "garbage-no-scheme", 3L),
      (null: String, "another one", 9L),
      ("a.com", "https://a.com/1", 1L))
      .toDF("domain", "url", "n_refs")
      .withColumn("robots_delay_ms",
        org.apache.spark.sql.functions.lit(1000L))
    val out = Web.frontierSchedule(frontier, "domain", "url",
      "n_refs", "robots_delay_ms")
      .select("url", "fetch_slot").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out.values.forall(_ == 0L),
      s"every scheme-less url must head its own queue, got $out")
  }

  test("withRobotsAllowed: per-UA verdict columns over a DataFrame") {
    import spark.implicits._
    val df = Seq(
      (1L, "/public/a"), (2L, "/private/a"), (3L, "/private/ok/a"),
      (4L, "/data/a.json"), (5L, "/api/v1/docs"), (6L, "/api/v1/x"))
      .toDF("id", "path")
    val out = Web.withRobotsAllowed(
      Web.withRobotsAllowed(df, "path", policy, "GraftBot/1.0", "g"),
      "path", policy, "StrangerBot/2.0", "o")
      .orderBy("id")
      .select("g_allowed", "g_rule", "o_allowed")
      .collect()
    assert(out.map(_.getBoolean(0)).toSeq ===
      Seq(true, false, true, false, true, false))
    assert(out.map(r => Option(r.getString(1))).toSeq === Seq(None,
      Some("/private/"), Some("/private/ok/"), Some("/*.json$"),
      Some("/api/*/docs"), Some("/api/")))
    // the * group allows only /public/ for unknown agents
    assert(out.map(_.getBoolean(2)).toSeq ===
      Seq(true, false, false, false, false, false))
  }
}
