package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftvec.TextExprs

import graft.functions.{TextFunctions => T}

/** URL/host-level web curation — the CCNet/RefinedWeb front half: a
  * web-scale pipeline dedupes and filters by canonical URL and domain
  * BEFORE any content pass, because the URL key costs one codegen'd
  * string expression per row while every content key costs a tokenize.
  *
  * The canonicalization rules live in
  * [[org.apache.spark.sql.graftvec.TextExprs.canonicalizeUrl]] (one
  * codegen expression, SQL-registered as `url_canonicalize`); this object
  * holds the relational stages over the canonical key.
  */
object WebCuration {

  /** Canonical URL key (codegen; see TextExprs.canonicalizeUrl rules). */
  def canonicalUrl(url: Column): Column = TextExprs.canonicalizeUrlCol(url)

  /** The host/registered-domain of an already-canonical URL (the
    * canonicalizer has lowercased the authority and stripped `www.` and
    * default ports, so this is one anchored regex).
    */
  def domainOf(canonUrl: Column): Column =
    regexp_extract(canonUrl, "^[a-z0-9+.-]+://([^/?:]+)", 1)

  /** URL-KEYED EXACT DEDUP — step one of the web recipe: group on the
    * canonical URL, keep the smallest id as the representative. Emits one
    * row per distinct canonical URL: `(canon_url, keep_id, n_variants)`.
    *
    * Scale shape: one map-only codegen canonicalization + ONE hash
    * aggregation on the canonical key (map-side combine collapses
    * variant bursts before the exchange) — the cheapest dedup pass in
    * the ladder, which is exactly why the recipe runs it before any
    * shingle/MinHash content pass.
    */
  def urlKeyDedup(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.select(canonicalUrl(col(urlCol)).as("canon_url"),
        col(idCol).cast("bigint").as("id"))
      .groupBy(col("canon_url"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_variants"))

  /** PER-DOMAIN AGGREGATION — the curation ledger a web pipeline keeps
    * per registered domain: document count, total whitespace tokens, and
    * mean document length in exact micro chars
    * (`(10⁶·Σchars) DIV n_docs`, truncating — engine-portable).
    *
    * Scale shape: map-only canonicalize + domain extract, then ONE hash
    * aggregation keyed by domain — bounded by domain cardinality
    * (~10⁸ registered domains on the full web), never by document count.
    */
  def domainStats(
      df: DataFrame, urlCol: String, textCol: String,
      charsCol: String): DataFrame =
    df.select(domainOf(canonicalUrl(col(urlCol))).as("domain"),
        size(T.tokens(col(textCol))).cast("bigint").as("n_toks"),
        col(charsCol).cast("bigint").as("n_chars"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * sum(n_chars))" +
          " DIV count(1) AS BIGINT)").as("mean_chars_micro"))

  /** Blocklist flag join: left-join a (tiny, curated) domain blocklist
    * onto per-domain stats — `blocked` 1/0. The blocklist side is
    * list-sized by construction (human/md5-curated), so it broadcasts.
    */
  def withBlocklist(stats: DataFrame, blocklist: DataFrame): DataFrame =
    stats.join(
        broadcast(blocklist.select(col("domain"), lit(1L).as("blocked"))),
        Seq("domain"), "left")
      .withColumn("blocked", coalesce(col("blocked"), lit(0L)))

  // --------------------------------------------- main-content extraction

  /** HTML entity decode for the five core entities + nbsp — `&amp;`
    * LAST, so `&amp;lt;` decodes once to `&lt;` (the standard single-pass
    * order). Chained `replace`, identical in any engine. */
  private def entityDecode(c: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (from, to)) => replace(acc, lit(from), lit(to)) }
  }

  /** Visible text of an HTML fragment: strip tags, decode entities,
    * collapse whitespace runs, trim. */
  private def visibleText(c: Column): Column =
    trim(regexp_replace(entityDecode(regexp_replace(c, "<[^>]*>", "")),
      "\\s+", " "))

  /** MAIN-CONTENT EXTRACTION — markup-level boilerplate removal, the
    * first transform a web-crawl pipeline runs before ANY text operator
    * (the trafilatura/jusText-class heuristic at line granularity):
    *
    *  1. drop `<script>`/`<style>` blocks (alternation, no
    *     backreferences — the pattern must also run under RE2 engines);
    *  2. break the markup into CANDIDATE LINES at block-level tag
    *     boundaries (`p div br li tr h1-6 ul ol table section article
    *     header footer nav blockquote`);
    *  3. per line, compute the visible text (tags stripped, entities
    *     decoded, whitespace collapsed) and the LINK text (the visible
    *     text inside `<a>…</a>` anchors);
    *  4. keep lines that are long enough AND whose link share is low:
    *     `text_len >= minTextLen` and
    *     `10000·link_len <= maxLinkBps·text_len` (exact integer bps —
    *     a nav bar is all links, a paragraph is mostly prose).
    *
    * Emits one row per NON-EMPTY candidate line:
    * `(doc, line_no, text, text_len, link_len, link_bps, keep)` —
    * compose `filter(keep).groupBy(doc)` + `concat_ws` for the cleaned
    * document, or feed the kept lines straight into the text operators.
    *
    * Scale shape: map-only regex work + one generate per document — no
    * shuffle, runs at scan speed like the other gopher-class gates; the
    * per-line signals are exact integers, so the whole stage replays in
    * a SQL oracle (q292 synthesizes real HTML pages from expressions and
    * round-trips this extractor over them).
    */
  def extractMainContent(
      docs: DataFrame, htmlCol: String, idCol: String,
      minTextLen: Int = 25, maxLinkBps: Int = 3300): DataFrame = {
    require(minTextLen >= 1 && maxLinkBps >= 0 && maxLinkBps <= 10000,
      "need minTextLen >= 1 and maxLinkBps in [0, 10000]")
    val noScript = regexp_replace(col(htmlCol),
      "(?is)<script[^>]*>.*?</script\\s*>|<style[^>]*>.*?</style\\s*>", " ")
    val blocked = regexp_replace(noScript,
      "(?i)</?(?:p|div|br|li|tr|h[1-6]|ul|ol|table|section|article|header|footer|nav|blockquote)\\b[^>]*/?>",
      "\n")
    docs
      .select(col(idCol).as("doc"), posexplode(split(blocked, "\n", -1))
        .as(Seq("line_no", "raw")))
      .withColumn("text", visibleText(col("raw")))
      .withColumn("text_len", length(col("text")).cast("bigint"))
      .filter(col("text_len") >= 1)
      .withColumn("link_len", coalesce(aggregate(
        transform(
          regexp_extract_all(col("raw"), lit("(?is)<a\\b[^>]*>(.*?)</a\\s*>"), lit(1)),
          a => length(visibleText(a)).cast("bigint")),
        lit(0L), (acc, x) => acc + x), lit(0L)))
      .withColumn("link_bps", expr("(10000 * link_len) DIV text_len"))
      .withColumn("keep",
        col("text_len") >= minTextLen.toLong &&
          col("link_len") * 10000L <= col("text_len") * maxLinkBps.toLong)
      .select(col("doc"), col("line_no").cast("bigint").as("line_no"),
        col("text"), col("text_len"), col("link_len"), col("link_bps"),
        col("keep"))
  }

  /** The CRAWL FRONT DOOR's batch composition — the q296 ladder as one
    * operator, the literal body [[graft.streaming.StreamingCrawl]] runs
    * per micro-batch (shared so stream and batch cannot drift, the
    * CurationFunnel.decide discipline): WARC payloads → record walk
    * ([[Multimodal.warcRecords]], multi-member gunzip + header parse) →
    * response blocks → HTML main-content extraction
    * ([[extractMainContent]]) → kept-line reassembly in line order →
    * Gopher word gate over the reassembled text. One row per document
    * that produced at least one kept line:
    * `(doc, clean, n_kept_lines, gopher_pass)`.
    *
    * Scale shape: everything is map-only except the ONE doc-keyed
    * reassembly aggregation (partial-aggregated, key = the archive id —
    * no skew: a document's kept lines are bounded by its page size).
    * The crawl door is STATELESS across documents — no stored index, no
    * epoch — so any partition of the input processes independently:
    * exactly why the streaming twin needs no cross-batch state. */
  def crawlDocs(
      dumps: DataFrame, idCol: String, payloadCol: String,
      minWords: Int = 20, maxWords: Int = 100000,
      capBytes: Long = 64L << 20): DataFrame =
    crawlDocsFromRecords(
      Multimodal.warcRecords(dumps, idCol, payloadCol, capBytes),
      minWords, maxWords)

  /** [[crawlDocs]] with the archives STREAMED per record off storage
    * ([[Multimodal.warcRecordsFromFiles]] — (doc, path) rows opened
    * through Hadoop FS, peak memory one record): the real-Common-Crawl
    * front half (~1 GB members) wired to the same extraction ladder.
    * Downstream of the record walk the two variants share one body
    * ([[crawlDocsFromRecords]]), so they cannot drift (spec-pinned
    * equal on the same archives). */
  def crawlDocsFromFiles(
      files: DataFrame, idCol: String, pathCol: String,
      minWords: Int = 20, maxWords: Int = 100000,
      perRecordCap: Long = 64L << 20): DataFrame =
    crawlDocsFromRecords(
      Multimodal.warcRecordsFromFiles(files, idCol, pathCol, perRecordCap),
      minWords, maxWords)

  /** The ladder's shared tail from an exploded record frame (the
    * [[Multimodal.warcRecords]] schema) down: response blocks →
    * extraction → kept-line reassembly → gopher gate. */
  def crawlDocsFromRecords(
      recs: DataFrame, minWords: Int, maxWords: Int): DataFrame = {
    val lines = extractMainContent(
      recs.filter(col("warc_type") === "response")
        .select(col("doc"), col("content").cast("string").as("page")),
      "page", "doc")
    lines.filter(col("keep"))
      .groupBy(col("doc"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("line_no"), col("text")))),
          x => x.getField("text")), " ").as("clean"),
        count(lit(1)).as("n_kept_lines"))
      .withColumn("gopher_pass",
        Curation.gopherWordGate(col("clean"), minWords, maxWords))
  }

  /** Synthesize a REAL HTML page per row from a text column — the
    * [[graft.operators.Multimodal.wavBytes]] discipline applied to
    * markup, so [[extractMainContent]] is oracle-round-trippable: a
    * head with title/style/script noise, a nav bar of links, an h1, the
    * document text split across a `<div>` and a `<p>` (the main
    * content), a related-links list, and an entity-bearing footer —
    * every boilerplate class the extractor must drop and the one it
    * must keep, deterministic in `(id, text)`.
    */
  def htmlWrap(id: Column, text: Column): Column = {
    val half = (length(text) / 2).cast("int")
    concat(
      lit("<html><head><title>Doc "), id.cast("string"),
      lit("</title><style>body { color: #222; }</style>" +
        "<script>var page = "), id.cast("string"),
      lit("; if (page > 0) { track(page); }</script></head><body>" +
        "<nav><a href=\"/\">Home</a> <a href=\"/about\">About us</a> " +
        "<a href=\"/tag\">Tag "), (id % 7).cast("string"),
      lit("</a></nav><h1>Title "), id.cast("string"),
      lit("</h1><div>"), text.substr(lit(1), half),
      lit("</div><p>"), text.substr(half + 1, length(text) - half),
      lit("</p><ul><li><a href=\"/r1\">Related one</a></li>" +
        "<li><a href=\"/r2\">Related two</a></li></ul>" +
        "<footer>&copy; Site &amp; friends <a href=\"/tos\">Terms &amp; " +
        "conditions</a></footer></body></html>"))
  }

  // ------------------------------------------------ crawl politeness (REP)

  /** Synthesize a deterministic robots.txt per host id — the htmlWrap
    * discipline applied to the Robots Exclusion Protocol (RFC 9309):
    * comments, mixed-case field names, a `*` group with path rules and
    * a crawl-delay, a host-dependent bot-specific group (absent on some
    * hosts — the `*`-fallback case), consecutive user-agent lines
    * sharing one group, an EMPTY Disallow (the spec's allow-all
    * sentinel), and a stray rule before any group (invalid per spec,
    * must be dropped) — every parse class [[robotsRules]] must handle,
    * deterministic in `h`. */
  def robotsSynth(h: Column): Column =
    concat(
      lit("# graft robots, host "), h.cast("string"), lit("\n"),
      // invalid: a rule before any user-agent line (spec: no group, drop)
      when(h % 11 === 0, lit("Disallow: /orphan\n")).otherwise(lit("")),
      when(h % 5 === 0, lit("user-agent: *\n")).otherwise(lit("User-agent: *\n")),
      lit("Disallow: /private\n"),
      when(h % 3 === 0, lit("Allow: /private/pub\n")).otherwise(lit("")),
      when(h % 7 === 0, lit("Disallow:\n")).otherwise(lit("")), // allow-all sentinel
      lit("Crawl-delay: "), (h % 5 + 1).cast("string"), lit("\n"),
      when(h % 2 === 0,
        concat(
          lit("\n# bot group\nUser-agent: graftbot\n"),
          // consecutive user-agent lines: one group with two names
          when(h % 4 === 0, lit("User-agent: otherbot\n")).otherwise(lit("")),
          lit("Disallow: /tag\nAllow: /tag/ok\nCrawl-delay: "),
          (h % 3 + 1).cast("string"), lit("\n")))
        .otherwise(lit("")))

  /** Parse robots.txt content into its RULE TABLE (RFC 9309 group
    * semantics): one row per directive with its group id —
    * `(host, grp, line_no, directive, value)`. Comments stripped, field
    * names case-insensitive, a group = a maximal run of consecutive
    * `user-agent` lines plus the rules after it, rules BEFORE any group
    * dropped (no group to attach to, per spec). Map-only except the one
    * per-host window for group assignment (robots files are KB-sized —
    * the window partition is a single host's lines, never the corpus).
    */
  def robotsRules(robots: DataFrame, textCol: String, hostCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = robots
      .select(col(hostCol).as("host"),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("line_no", "raw")))
      .withColumn("clean", trim(regexp_replace(col("raw"), "#.*", "")))
      .withColumn("directive",
        lower(trim(regexp_extract(col("clean"), "^([A-Za-z-]+)\\s*:", 1))))
      .withColumn("value",
        trim(regexp_extract(col("clean"), "^[A-Za-z-]+\\s*:\\s*(.*)$", 1)))
      .filter(col("directive")
        .isin("user-agent", "allow", "disallow", "crawl-delay"))
    val w = Window.partitionBy("host").orderBy("line_no")
    lines
      .withColumn("prev", lag(col("directive"), 1).over(w))
      .withColumn("starts", (col("directive") === "user-agent" &&
        (col("prev").isNull || col("prev") =!= "user-agent")).cast("long"))
      .withColumn("grp", sum(col("starts")).over(w))
      .filter(col("grp") >= 1) // rules before any user-agent line: dropped
      .select(col("host"), col("grp"),
        col("line_no").cast("bigint").as("line_no"),
        col("directive"), col("value"))
  }

  /** Evaluate the Robots Exclusion Protocol for one crawler identity
    * over a URL frontier: `(…url cols…, allowed, crawl_delay_s)`.
    * Group selection per RFC 9309: the `userAgent`'s own group when the
    * host has one, else the `*` group. Rule matching: longest
    * path-prefix wins; on a length tie `allow` wins; no matching rule
    * (or an empty-value rule — the allow-all sentinel) means allowed.
    * `crawl_delay_s` comes from the chosen group (default 1).
    *
    * Scale shape: rules are KB-per-host control-plane data — the rule
    * side aggregates to host-bounded frames and BROADCASTS into the two
    * frontier joins; the longest-match pick is ONE `max_by`-style
    * aggregation keyed by the url (no per-url window over the corpus).
    */
  def robotsAllowed(
      urls: DataFrame, rules: DataFrame, userAgent: String,
      hostCol: String = "host", pathCol: String = "path"): DataFrame = {
    val uas = rules.filter(col("directive") === "user-agent")
      .select(col("host"), col("grp"), col("value").as("ua"))
    val hostHasExact = uas.filter(col("ua") === userAgent)
      .select(col("host")).distinct().withColumn("has_exact", lit(true))
    val chosen = uas.join(hostHasExact, Seq("host"), "left")
      .filter(when(coalesce(col("has_exact"), lit(false)),
        col("ua") === userAgent).otherwise(col("ua") === "*"))
      .select(col("host"), col("grp")).distinct()
    val pathRules = rules
      .filter(col("directive").isin("allow", "disallow") &&
        length(col("value")) > 0)
      .join(chosen, Seq("host", "grp"))
      .select(col("host"), col("value").as("rule_path"),
        (col("directive") === "allow").as("is_allow"))
    val delays = rules.filter(col("directive") === "crawl-delay")
      .join(chosen, Seq("host", "grp"))
      .groupBy(col("host"))
      .agg(max(col("value").cast("long")).as("crawl_delay_s"))
    val cand = urls
      .join(broadcast(pathRules),
        urls(hostCol) === pathRules("host") &&
          col(pathCol).startsWith(col("rule_path")), "left")
      .drop(pathRules("host"))
    val urlCols = urls.columns.map(col)
    cand
      .groupBy(urlCols: _*)
      .agg(max(when(col("rule_path").isNotNull,
        struct(length(col("rule_path")).as("l"), col("is_allow").as("a"))))
        .as("best"))
      .withColumn("allowed", coalesce(col("best.a"), lit(true)))
      .drop("best")
      .join(broadcast(delays), Seq(hostCol), "left")
      .withColumn("crawl_delay_s", coalesce(col("crawl_delay_s"), lit(1L)))
  }

  /** Synthesize a deterministic sitemap.xml per host (the Sitemaps 0.9
    * protocol shape): an `<urlset>` with `3 + h%4` `<url>` entries —
    * `<loc>` always present, `<lastmod>`/`<priority>` each OMITTED on a
    * host/entry-dependent subset (optional per protocol — the NULL
    * classes [[sitemapUrls]] must surface), paths rotating through the
    * same rule classes the robots probe uses so discovery composes with
    * the REP gate. */
  def sitemapSynth(h: Column): Column = {
    val entry = (i: Column) => {
      val path = when((h + i) % 4 === 0, concat(lit("/private/doc"), i.cast("string")))
        .when((h + i) % 4 === 1, concat(lit("/tag/ok/"), i.cast("string")))
        .when((h + i) % 4 === 2, concat(lit("/tag/"), i.cast("string")))
        .otherwise(concat(lit("/Articles/"), i.cast("string")))
      concat(
        lit("  <url><loc>http://host"), h.cast("string"),
        lit(".example.com"), path, lit("</loc>"),
        when((h + i) % 3 =!= 0,
          concat(lit("<lastmod>2026-01-"),
            lpad(((h + i) % 28 + 1).cast("string"), 2, "0"),
            lit("</lastmod>"))).otherwise(lit("")),
        when((h + i) % 5 =!= 0,
          concat(lit("<priority>0."), ((h + i) % 9 + 1).cast("string"),
            lit("</priority>"))).otherwise(lit("")),
        lit("</url>"))
    }
    concat(
      lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
        "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n"),
      array_join(transform(sequence(lit(0), (h % 4 + 2).cast("int")), entry),
        "\n"),
      lit("\n</urlset>\n"))
  }

  /** Parse sitemap.xml content into one row per discovered URL, in
    * document order — `(host, entry_no, loc, lastmod, priority)` —
    * through Spark's NATIVE `from_xml` (the Sitemaps protocol is plain
    * nested XML; the schema binds the root's `url` array, attributes
    * and the XML declaration ignored, absent optional elements NULL).
    * Map-only: one parse + one generate per sitemap, no shuffle. */
  def sitemapUrls(
      sitemaps: DataFrame, xmlCol: String, hostCol: String): DataFrame =
    sitemaps
      .select(col(hostCol).as("host"),
        from_xml(col(xmlCol),
          lit("STRUCT<url: ARRAY<STRUCT<loc: STRING, lastmod: STRING, " +
            "priority: STRING>>>"),
          new java.util.HashMap[String, String]()).as("s"))
      .select(col("host"),
        posexplode(col("s.url")).as(Seq("entry_no", "u")))
      .select(col("host"), col("entry_no").cast("bigint").as("entry_no"),
        col("u.loc").as("loc"), col("u.lastmod").as("lastmod"),
        col("u.priority").as("priority"))

  /** Politeness-scheduled crawl frontier: within each host, allowed
    * URLs fetch in `(priority desc, tiebreak)` order, one slot every
    * `crawl_delay_s` seconds — `(…, slot, fetch_offset_s)`. The window
    * partitions by host (per-host frontiers are the unit a fetcher
    * shards by; no global ordering exists or is wanted). */
  def frontierSchedule(
      gated: DataFrame, hostCol: String, priorityCol: String,
      tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(hostCol)
      .orderBy(col(priorityCol).desc, col(tieCol))
    gated.filter(col("allowed"))
      .withColumn("slot", row_number().over(w).cast("bigint"))
      .withColumn("fetch_offset_s", (col("slot") - 1) * col("crawl_delay_s"))
  }

  /** Deterministic redirect-map synthesizer over a numeric URL id — the
    * htmlWrap discipline applied to HTTP 3xx aliasing. Classes (CASE
    * precedence order): a 2-cycle pair (`id%50∈{0,1}` point at each
    * other), plain hops (`id%3=0` → `id+3`, chaining until `id%9=0`
    * exits to `id+1` — natural chains up to 3 hops), and terminals
    * (NULL). `id%9=0` exits can land ON the cycle class (99→100→101→100…
    * — a chain INTO a cycle, the class a bounded resolver must flag
    * unresolved). */
  def redirectSynth(id: Column): Column =
    when(id % 50 === 0, id + 1)
      .when(id % 50 === 1, id - 1)
      .when(id % 3 === 0, when(id % 9 === 0, id + 1).otherwise(id + 3))
      .otherwise(lit(null).cast("long"))

  /** Resolve each URL through a redirect map to its final destination,
    * bounded at `maxHops` — the canonical-alias stage a crawler runs
    * before URL dedup (two pages 301-ing to one target ARE one page).
    * Output: `(url, final_url, hops, resolved)`; `resolved = false`
    * means the walk still sat on a redirecting URL after `maxHops`
    * (a longer chain or a cycle — HTTP clients cap redirects the same
    * way rather than detect cycles exactly).
    *
    * The map is defensively collapsed to ONE target per source
    * (min dst) so a malformed multi-target map stays deterministic.
    *
    * Scale: `maxHops` hash equi-joins on the current-location key. The
    * hop count is a CONSTANT (real HTTP chains are client-capped at
    * ~5–20), so this is k linear shuffles, not an iterate-to-fixpoint.
    * The collapsed map is MATERIALIZED once ([[Materialize.checkpoint]],
    * the iterative-operator discipline) and consumed by all k+1 joins —
    * without the cut, each hop re-scans and re-aggregates the redirect
    * table (AQE's exchange reuse recovered only some of the five builds
    * in the measured plan). For functional graphs with genuinely long
    * chains the pointer-doubling construction ([[Graph.ancestorClosure]]'s
    * family) replaces k hops with log k doublings — not the web-redirect
    * shape, so not used here.
    */
  def resolveRedirects(
      urls: DataFrame, redirects: DataFrame, urlCol: String,
      srcCol: String, dstCol: String, maxHops: Int = 4): DataFrame = {
    require(maxHops >= 1, "resolveRedirects: maxHops >= 1")
    val r = Materialize.checkpoint(redirects
      .select(col(srcCol).as("__jk"), col(dstCol).as("__dst"))
      .filter(col("__jk").isNotNull && col("__dst").isNotNull)
      .groupBy(col("__jk")).agg(min(col("__dst")).as("__dst")))
    var cur = urls.select(col(urlCol).as("url"))
      .withColumn("final_url", col("url"))
      .withColumn("hops", lit(0L))
    for (_ <- 1 to maxHops) {
      cur = cur.withColumnRenamed("final_url", "__jk")
        .join(r, Seq("__jk"), "left")
        .select(col("url"),
          coalesce(col("__dst"), col("__jk")).as("final_url"),
          (col("hops") +
            when(col("__dst").isNotNull, 1L).otherwise(0L)).as("hops"))
    }
    cur.withColumnRenamed("final_url", "__jk")
      .join(r.select(col("__jk"), lit(true).as("__more")), Seq("__jk"), "left")
      .select(col("url"), col("__jk").as("final_url"), col("hops"),
        not(coalesce(col("__more"), lit(false))).as("resolved"))
  }

  /** Change-rate-driven recrawl scheduling (the Cho–Garcia-Molina
    * freshness problem, on the exact-rational estimator): from a fetch
    * HISTORY of `(url, obs_no, changed)` observations taken
    * `obsIntervalS` apart, estimate each URL's change interval as
    * `observed window DIV changes` and clamp it to
    * `[minIntervalS, maxIntervalS]` — a page that changed every probe
    * recrawls at the floor, a never-changed page (estimated rate 0)
    * backs off straight to the cap.
    * Output: `(url, n_obs, n_changed, change_ppm, recrawl_interval_s)`
    * — exact integers only (the float-MLE −n·ln(1−X/n) refinement buys
    * nothing at the clamp granularity and would cost the 1-ulp libm
    * caveat).
    *
    * Scale: ONE url-keyed aggregation over the fetch log with map-side
    * partial combine — the log is the big side, the output is
    * URL-bounded. */
  def recrawlSchedule(
      history: DataFrame, urlCol: String, changedCol: String,
      obsIntervalS: Long, minIntervalS: Long, maxIntervalS: Long)
      : DataFrame = {
    require(obsIntervalS >= 1 && minIntervalS >= 1 &&
      maxIntervalS >= minIntervalS,
      "recrawlSchedule: 1 <= obsIntervalS, 1 <= minIntervalS <= maxIntervalS")
    history
      .groupBy(col(urlCol).as("url"))
      .agg(count(lit(1)).as("n_obs"),
        sum(when(col(changedCol), 1L).otherwise(0L)).as("n_changed"))
      .withColumn("change_ppm", expr("(1000000 * n_changed) DIV n_obs"))
      .withColumn("recrawl_interval_s",
        when(col("n_changed") === 0L, lit(maxIntervalS))
          .otherwise(least(greatest(
            expr(s"(n_obs * ${obsIntervalS}L) DIV n_changed"),
            lit(minIntervalS)), lit(maxIntervalS))))
  }
}
