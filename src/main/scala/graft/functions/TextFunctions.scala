package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines.
  *
  * All are pure `org.apache.spark.sql.functions` compositions — they stay
  * inside whole-stage codegen (no UDFs), and every construct has an exact
  * ANSI-SQL equivalent so the DuckDB oracle can verify them bit-for-bit.
  */
object TextFunctions {

  /** Whitespace tokenization with empty tokens dropped (portable:
    * regexp split keeps leading/trailing empties differently across
    * engines, so we filter explicitly).
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= lit(""))

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-style pre-tokenization regex (GPT-2 family): contractions,
    * space-prefixed letter runs, digit runs, punctuation runs, whitespace
    * runs. Lookahead-free so the same pattern runs under Java regex
    * (Spark) and RE2 (DuckDB oracle) with identical matches.
    */
  val bpePattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** LLM-style token segmentation: the regex pre-tokenizer's pieces.
    * (The merge step of real BPE is vocabulary-dependent; piece counts
    * from the pre-tokenizer are the standard cheap proxy for token
    * budgeting at corpus scale.)
    */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpePattern), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text)).cast("long")

  /** Word n-gram shingles: join every n consecutive tokens with a space.
    * Documents shorter than n tokens produce an empty shingle set (the
    * guard also avoids `sequence(1, 0)` which Spark rejects).
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Row-form shingles: (doc_id, sh) with one row per n-gram — the hot-path
    * form for dedup operators. `shingles` (the array form) evaluates its
    * lambdas interpreted (HOFs are CodegenFallback), which dominates at
    * scale; this form is posexplode + window `lead`, fully codegen'd.
    * The window's shuffle is on doc_id — the same key the downstream
    * signature aggregation needs, so Catalyst elides the second exchange:
    * one shuffle total.
    */
  def explodedShingles(df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
                       n: Int): org.apache.spark.sql.DataFrame =
    explodedShinglesPos(df, id, text, n).drop("pos")

  /** [[explodedShingles]] keeping the shingle's 0-based start token
    * position: (doc_id, pos, sh) — the form span-level operators need
    * (a hit at `pos` covers tokens [pos, pos+n-1]). Same plan shape:
    * posexplode + window `lead` over doc_id, fully codegen'd, one
    * shuffle that downstream per-doc aggregations reuse.
    */
  def explodedShinglesPos(df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
                          n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = df.select(id.as("doc_id"), posexplode(tokens(text)).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val leadCols = (1 until n).map(j => lead(col("tok"), j).over(w).as(s"__t$j"))
    val withLeads = tok.select(
      (Seq(col("doc_id"), col("pos"), col("tok")) ++ leadCols): _*)
    withLeads.filter(col(s"__t${n - 1}").isNotNull)
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        concat_ws(" ", (col("tok") +: (1 until n).map(j => col(s"__t$j"))): _*).as("sh"))
  }

  /** Language-ID heuristic: score each candidate language by its stopword
    * hit count in the token stream; highest count wins (ties broken by
    * language code). N-gram/stopword heuristics are the standard cheap
    * first pass before a model-based classifier.
    */
  val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "fr" -> Seq("le", "la", "de", "et", "un"),
    "es" -> Seq("el", "la", "de", "y", "un"),
    "de" -> Seq("der", "die", "das", "und", "ein"),
    "zh" -> Seq("de", "le", "he", "shi", "zai"))

  def langScore(text: Column, lang: String): Column = {
    val toks = tokens(lower(text))
    langStopwords(lang).map(w => size(filter(toks, t => t === lit(w))).cast("long"))
      .reduce(_ + _)
  }

  /** Predicted language code (argmax of stopword score, ties → smaller
    * code alphabetically). Implemented as max over (score, negated-rank)
    * structs to stay codegen-friendly.
    */
  def langId(text: Column): Column = {
    val langs = langStopwords.keys.toSeq.sorted
    // max of struct(score, code) picks highest score; for equal scores it
    // would pick the LAST code, so invert: compare on (score, reverse rank).
    val scored = langs.zipWithIndex.map { case (l, i) =>
      struct(langScore(text, l).as("s"), lit(langs.size - i).as("r"), lit(l).as("code"))
    }
    greatest(scored: _*).getField("code")
  }

  /** Script-aware language ID — the multilingual widening of
    * [[langId]]: a non-Latin page matches ZERO stopwords of every
    * Latin-script list, so the stopword argmax scores it as noise;
    * the SCRIPT says what it is without any vocabulary. Code-point
    * ranges route first (dominant non-Latin script wins over latin by
    * count, fixed tie priority cyrillic > han > arabic > greek —
    * deterministic on any engine, [[scriptMix]]'s convention), mapped
    * to each script's dominant language (ru/zh/ar/el — honest
    * first-pass ROUTING, not lang-id within a script family: a
    * downstream per-script classifier refines); Latin-dominant text
    * falls back to [[langId]]'s stopword argmax; text with no letters
    * of any tracked script (digits, punctuation) reports 'und' —
    * never a fake language. Pure codegen'd regex-count chain, same
    * scan-stage cost shape as [[scriptMix]].
    */
  def langIdScript(text: Column): Column = {
    val lat = scriptCount(text, "IsLatin")
    val cyr = scriptCount(text, "IsCyrillic")
    val han = scriptCount(text, "IsHan")
    val gre = scriptCount(text, "IsGreek")
    val ara = scriptCount(text, "IsArabic")
    // null-in-null-out FIRST: null counts would skip every `when` and
    // fall through to the 'el' default — a null document must never
    // classify as Greek
    when(text.isNull, lit(null).cast("string"))
      .when(lat === 0 && cyr === 0 && han === 0 && gre === 0 && ara === 0,
        "und")
      .when(lat >= cyr && lat >= han && lat >= gre && lat >= ara,
        langId(text))
      .when(cyr >= han && cyr >= gre && cyr >= ara, "ru")
      .when(han >= gre && han >= ara, "zh")
      .when(ara >= gre, "ar")
      .otherwise("el")
  }

  /** Quality score in [0,1]: blends length, mean token length, stopword
    * ratio and non-alphanumeric ratio — the usual cheap quality gates for
    * web-scale corpus filtering.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nChar = length(text).cast("double")
    val meanTokLen = when(nTok > 0, nChar / nTok).otherwise(lit(0.0))
    val stopHits = langScore(text, "en").cast("double")
    val stopRatio = when(nTok > 0, stopHits / nTok).otherwise(lit(0.0))
    val alnum = length(regexp_replace(text, "[^a-zA-Z0-9 ]", "")).cast("double")
    val punctRatio = when(nChar > 0, (nChar - alnum) / nChar).otherwise(lit(0.0))
    val lenScore = least(nTok / lit(100.0), lit(1.0))
    val tokLenScore = when(meanTokLen >= 3 && meanTokLen <= 10, lit(1.0)).otherwise(lit(0.5))
    round(least(greatest(
      lenScore * 0.4 + tokLenScore * 0.2 + stopRatio * 0.2 + (lit(1.0) - punctRatio) * 0.2,
      lit(0.0)), lit(1.0)), 4)
  }

  /** Document fingerprint: md5 of the whitespace-normalized, lowercased
    * text — canonical exact-dedup key (differences in spacing/case do not
    * change the fingerprint). Implemented as a regex collapse rather than
    * tokenize-and-join: identical output string, but pure codegen'd
    * expressions instead of an interpreted HOF filter. Edge whitespace is
    * stripped by regex, not `trim()` — trim removes only ASCII spaces, so
    * leading tabs/newlines would survive the collapse as a leading space
    * and break the tokenize-and-join equivalence.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(regexp_replace(lower(text), "^\\s+|\\s+$", ""), "\\s+", " "))

  /** Count the code points of one Unicode SCRIPT in `text` — strip
    * everything else, measure what remains (both engines count code
    * points, so the dual is exact). `javaScript` is a Java regex
    * script class name ("IsLatin", "IsCyrillic", "IsHan", "IsGreek");
    * the oracle uses RE2's bare names ("Latin", ...). Digits,
    * punctuation, and whitespace are script Common — counted by none
    * of the classes, identically on both engines.
    */
  def scriptCount(text: Column, javaScript: String): Column =
    length(regexp_replace(text, s"[^\\p{$javaScript}]", "")).cast("long")

  /** Script mix per document — the multilingual ROUTING signal
    * (lang-id's [[langScore]] needs per-language stopword lists; the
    * script histogram needs nothing and catches what stopwords cannot:
    * a Cyrillic document matches zero English stopwords AND zero
    * French ones — the script says why). Returns the four major
    * script counts plus the dominant script, ties broken by the fixed
    * priority latin > cyrillic > han > greek > none (a CASE chain of
    * >= comparisons — deterministic on any engine).
    */
  def scriptMix(text: Column): Seq[Column] = {
    val lat = scriptCount(text, "IsLatin")
    val cyr = scriptCount(text, "IsCyrillic")
    val han = scriptCount(text, "IsHan")
    val gre = scriptCount(text, "IsGreek")
    Seq(lat.as("n_latin"), cyr.as("n_cyrillic"), han.as("n_han"),
      gre.as("n_greek"),
      when(lat === 0 && cyr === 0 && han === 0 && gre === 0, "none")
        .when(lat >= cyr && lat >= han && lat >= gre, "latin")
        .when(cyr >= han && cyr >= gre, "cyrillic")
        .when(han >= gre, "han")
        .otherwise("greek").as("dominant"))
  }

  /** Unicode NFC normalization — the multilingual-ingest prerequisite:
    * the same visible text arrives in composed (é) and decomposed
    * (e + U+0301) forms across crawls, and every downstream hash
    * (dedup fingerprints, shingles, URL keys) treats them as DIFFERENT
    * bytes unless ingest canonicalizes first. `java.text.Normalizer`
    * implements the same Unicode normalization the oracle's
    * `nfc_normalize` (utf8proc) does, so the canonical form is
    * engine-portable. Delegates to the codegen'd
    * [[UnicodeNormalize]] expression (one code path with the NFKC /
    * casefold variants; identity-returning on already-normalized
    * input, so the ASCII firehose allocates nothing); nulls pass
    * through.
    */
  def nfcNormalize(text: Column): Column = UnicodeNormalize.nfc(text)

  /** HTML boilerplate EXTRACTION — the first transform of every crawl
    * pipeline (the WET step: raw fetch → training text). In order:
    * drop `<script>`/`<style>` payloads (their content is code, and a
    * naive tag strip would leak it into the corpus), drop the
    * `<nav>`/`<footer>` boilerplate zones (menus and copyright lines
    * repeated across a site are exactly what chunk/span dedup later
    * fights — cheaper to never admit them), strip the remaining
    * markup, decode the five predefined character entities, collapse
    * whitespace. A pure codegen'd `regexp_replace` chain — no UDF, so
    * extraction rides inside whole-stage codegen at the scan, which
    * is where a 100 TB ingest needs it.
    *
    * Contract stated loudly: tag recognition is REGEX-based (`<[^>]*>`
    * after the zone removals), so a literal `'>'` inside an attribute
    * value truncates that tag — pre-escape upstream if your crawl
    * emits such markup. Zone removal is non-nesting (`.*?` to the
    * FIRST closer), matching flat real-world nav/footer usage; zone
    * tag names are matched whole (`<head(\s…)?>` — `<header>` is NOT
    * a `head` zone), backreference-free so the same pattern runs on
    * RE2 engines. `<head>` is removed wholesale (title/meta/script
    * payloads are not corpus text — [[htmlTitle]] reads the title
    * from the RAW markup instead). `&amp;` decodes LAST, so
    * author-written `&amp;lt;` yields the literal `&lt;` and never a
    * phantom `'<'`.
    */
  def htmlExtract(html: Column): Column = {
    // comments FIRST: '<[^>]*>' below stops at a comment payload's
    // first '>', so '<!-- promo > click -->' would otherwise leak
    // 'click -->' into the corpus bytes (and a commented-out zone tag
    // could derail the zone regexes)
    val noComments = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noZones = Seq("head", "script", "style", "nav", "footer")
      .foldLeft(noComments) { (c, tag) =>
        regexp_replace(c, s"(?is)<$tag(\\s[^>]*)?>.*?</$tag>", " ")
      }
    val noTags = regexp_replace(noZones, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => regexp_replace(c, ent, ch) }
    regexp_replace(regexp_replace(decoded, "^\\s+|\\s+$", ""), "\\s+", " ")
  }

  /** The page title — `regexp_extract` of the first `<title>` block
    * (empty string when absent, `regexp_extract`'s no-match value). */
  def htmlTitle(html: Column): Column =
    trim(regexp_extract(html, "(?is)<title>(.*?)</title>", 1))

  /** The three HTML attribute-value forms real markup carries —
    * double-quoted, single-quoted, bare — as one alternation group
    * (first char at the match site picks the branch, so extraction is
    * deterministic). Real pages mix all three, and an indexing-
    * directive gate that only reads `attr="…"` fails OPEN on
    * `<meta name='robots' content='noindex'>`.
    */
  private val attrValueAlt: String = "(\"[^\"]*\"|'[^']*'|[^\\s\"'>]+)"

  /** The attribute-NAME guard: a real attribute is preceded by
    * whitespace (after the tag name or the previous attribute) or by
    * the previous attribute's closing quote (`href="x"rel=…` — the
    * no-space form browsers accept). This is STRICTER than the old
    * `(?<![-\\w])`: with unquoted values in the grammar, `attr=tok`
    * TEXT inside another attribute's bare value
    * (`href=https://e.com/a?rel=nofollow` — '?' passed the old
    * guard) must not bind as an attribute, and it also subsumes the
    * data-/xlink:-prefix guard ('-' and ':' are not in the class).
    */
  private val attrNameGuard: String = "(?<=[\\s\"'])"

  /** First `attr=…` value inside `tag`, any quote form, quotes
    * stripped; empty string when the attribute is absent (the
    * regexp_extract no-match convention callers already filter on).
    */
  private[graft] def attrVal(tag: Column, attr: String): Column =
    regexp_replace(
      regexp_extract(tag,
        "(?i)" + attrNameGuard + attr + "\\s*=\\s*" + attrValueAlt, 1),
      "^[\"']|[\"']$", "")

  /** Regex (for `rlike`) asserting `attr`'s whole value IS `v`, any
    * quote form; `v` must be a regex-safe literal.
    */
  private[graft] def attrIs(attr: String, v: String): String =
    "(?i)" + attrNameGuard + attr + "\\s*=\\s*" +
      "(\"" + v + "\"|'" + v + "'|" + v + "(?=[\\s/>]|$))"

  /** Regex asserting `attr`'s value CONTAINS `tok` as a whole
    * space-delimited token (the rel-token grammar), any quote form.
    * `tok` may be a non-capturing alternation. Boundaries are
    * space/quote-anchored — `(?<![^\"\\s])`, not `\\b` — because '-'
    * is a word boundary and `rel="x-nofollow"` must NOT bind.
    */
  private[graft] def attrHasToken(attr: String, tok: String): String =
    "(?i)" + attrNameGuard + attr + "\\s*=\\s*" +
      "(\"[^\"]*(?<![^\"\\s])" + tok + "(?![^\"\\s])[^\"]*\"" +
      "|'[^']*(?<![^'\\s])" + tok + "(?![^'\\s])[^']*'" +
      "|" + tok + "(?=[\\s/>]|$))"

  /** All `href=…` targets in document order, raw (un-canonicalized —
    * the crawl frontier canonicalizes with
    * [[graft.functions.SourceFamily.canonicalizeUrl]] AFTER harvest,
    * so the dedup key policy lives in one place). Harvest runs over
    * the RAW markup minus script/style/comment PAYLOADS, not
    * [[htmlExtract]] output: nav/footer links are boilerplate as TEXT
    * but are real crawl edges — a site's menu is how a frontier
    * discovers its sections — while an `href="…"` literal inside a
    * script string or a commented-out block is NOT an edge the page
    * renders. The attribute match requires `href` not preceded by a
    * word/hyphen char, so `data-href`/`xlink:href`-style attributes
    * don't harvest as false edges; values bind in all three quote
    * forms ([[attrVal]]'s grammar).
    */
  def extractHrefs(html: Column): Column = {
    val live = Seq("script", "style").foldLeft(
        regexp_replace(html, "(?s)<!--.*?-->", " ")) { (c, tag) =>
      regexp_replace(c, s"(?is)<$tag(\\s[^>]*)?>.*?</$tag>", " ")
    }
    // harvest TAGS first, then the attribute inside each: running the
    // attribute grammar over the whole live text would let body PROSE
    // like 'set href=https://example.com/x' mint a false edge now that
    // bare (unquoted) values are in the grammar — an attribute only
    // exists inside a tag. <base> is excluded: its href is the page's
    // resolution DIRECTIVE ([[baseHref]]), not a link a browser
    // navigates — an edge minted from it would be a phantom
    val tags = filter(
      regexp_extract_all(live, lit("(?s)<[A-Za-z][^>]*>"), lit(0)),
      t => !t.rlike("(?is)^<base\\b"))
    filter(transform(tags, t => attrVal(t, "href")), h => h =!= "")
  }

  /** The document's `<base href>` — the HTML mechanism that rebases
    * every relative reference on the page (templated sites emit it
    * constantly, and a harvest that ignores it resolves their
    * relative links against the WRONG directory). First base wins
    * (the HTML spec's rule for the pathological multi-base page);
    * matching runs over the live text (comments/script/style payloads
    * stripped — a commented-out base must not rebase the page) with
    * the attribute-guarded grammar; null when the page carries none
    * (the try_element_at convention — consumers coalesce to the
    * document URL). The base
    * value may itself be relative — callers resolve it against the
    * document URL first (RFC 3986 §5.1.1).
    */
  def baseHref(html: Column): Column = {
    val live = Seq("script", "style").foldLeft(
        regexp_replace(html, "(?s)<!--.*?-->", " ")) { (c, tag) =>
      regexp_replace(c, s"(?is)<$tag(\\s[^>]*)?>.*?</$tag>", " ")
    }
    val bases = regexp_extract_all(live, lit("(?is)<base\\b[^>]*>"), lit(0))
    attrVal(try_element_at(bases, lit(1)), "href")
  }

  /** `<meta name="robots">` directive tokens — the PAGE half of the
    * indexing-directives gate (the robots.txt gate controls FETCH;
    * these control what a fetched page may feed: `noindex` bars the
    * retrieval index, `nofollow` bars the outlink harvest, `none` is
    * both). Case-insensitive, attribute-order-free (`content` before
    * `name` parses the same), several robots metas fold, tokens split
    * on commas and trim/lowercase; a `name="description"` meta whose
    * content happens to contain the words does NOT bind. Pure
    * codegen'd regex chain over the raw page.
    */
  def metaRobots(html: Column): Column = {
    // attrNameGuard, not \b: '-' IS a word boundary, so \bname would
    // match data-name="robots" and falsely gate the page (the same
    // reason extractHrefs guards href=); name/content bind in all
    // three quote forms (attrIs/attrVal) because a single-quoted
    // noindex that fails to parse fails OPEN into the index
    val metas = regexp_extract_all(html, lit("(?is)<meta\\b[^>]*>"), lit(0))
    val robots = filter(metas, m => m.rlike(attrIs("name", "robots")))
    val toks = flatten(transform(robots, m =>
      transform(split(attrVal(m, "content"), ","),
        t => lower(trim(t)))))
    array_distinct(filter(toks, t => t =!= ""))
  }

  /** `<meta http-equiv="refresh">` parse — the HTML sibling of the
    * Location header (a zero-delay refresh IS a redirect in every
    * crawler's book; a long-delay one is a reload hint, not an
    * edge). Returns struct(delay_s, target) from the FIRST refresh
    * meta (case/order-free, attribute-guarded like [[metaRobots]]),
    * null when the page carries none; `target` is null for the
    * bare-delay reload form ("content=\"30\""), verbatim otherwise
    * (the consumer canonicalizes). Pure codegen'd regex chain.
    */
  def metaRefresh(html: Column): Column = {
    val metas = regexp_extract_all(html, lit("(?is)<meta\\b[^>]*>"), lit(0))
    val refreshes = filter(metas, m => m.rlike(attrIs("http-equiv", "refresh")))
    val first = try_element_at(refreshes, lit(1))
    val content = attrVal(first, "content")
    val delay = regexp_extract(content, "^\\s*([0-9]+)", 1)
    val target = regexp_extract(content,
      "(?i);\\s*url\\s*=\\s*['\"]?([^'\" ]+)", 1)
    when(first.isNotNull && delay =!= "",
      struct(delay.cast("long").as("delay_s"),
        when(target =!= "", target).otherwise(lit(null).cast("string"))
          .as("target")))
  }

  /** [[extractHrefs]] restricted to FOLLOWED anchors — the harvest a
    * ranking crawl actually runs: hrefs come from `<a>` tags only,
    * and an anchor whose `rel` carries any of the no-weight tokens
    * (`nofollow`, `sponsored`, `ugc` — the Google triple, matched as
    * whole SPACE-DELIMITED tokens inside the attribute value, so a
    * hyphenated `rel="x-nofollow"` keeps its edge) contributes
    * nothing. `rel="noopener"` and friends pass; rel and href bind in
    * all three quote forms. Same comment/script/style stripping as
    * the full harvest.
    */
  def extractFollowHrefs(html: Column): Column = {
    val live = Seq("script", "style").foldLeft(
        regexp_replace(html, "(?s)<!--.*?-->", " ")) { (c, tag) =>
      regexp_replace(c, s"(?is)<$tag(\\s[^>]*)?>.*?</$tag>", " ")
    }
    val anchors = regexp_extract_all(live, lit("(?is)<a\\b[^>]*>"), lit(0))
    // attrNameGuard, not \brel: data-rel="nofollow" must not drop a
    // followed anchor ('-' is a word boundary), and rel=… text inside
    // another attribute's bare value must not bind at all
    val followed = filter(anchors, a => !a.rlike(
      attrHasToken("rel", "(?:nofollow|sponsored|ugc)")))
    filter(transform(followed, a => attrVal(a, "href")), h => h =!= "")
  }

  /** Accent folding: NFD-decompose, drop combining marks, NFC-compose
    * what remains — "café" → "cafe". The search-side companion to
    * [[nfcNormalize]] (match queries against accent-folded text); dual
    * of the oracle's `strip_accents`. Nulls pass through.
    */
  def stripAccents(text: Column): Column = {
    val f = udf((s: String) =>
      if (s == null) null
      else java.text.Normalizer.normalize(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
          .replaceAll("\\p{M}", ""),
        java.text.Normalizer.Form.NFC))
    f(text)
  }
}
