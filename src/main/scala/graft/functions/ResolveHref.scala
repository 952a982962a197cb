package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 §5 reference resolution for harvested link targets — the
  * step that turns the relative forms real markup actually carries
  * (`x/y`, `../y`, `/y`, `//host/y`, `?page=2`) into absolute frontier
  * keys against the linking page's URL. Real pages link relatively far
  * more often than absolutely, so a harvest that drops relatives loses
  * most of a site's internal edges.
  *
  * Resolution rules (each is the RFC's, with the crawl-side drop
  * policy stated loudly):
  *
  *   - a ref with a SCHEME keeps only the hierarchical form
  *     (`scheme://…` passes through verbatim — the downstream
  *     canonicalizer owns messy-URL policy); `mailto:`,
  *     `javascript:`, `data:`, `tel:` and every other
  *     non-`//` scheme form is DROPPED (null) — not an edge a
  *     frontier can fetch;
  *   - `//host/x` (protocol-relative) inherits the base's scheme;
  *   - `/x` (root-relative) inherits `scheme://authority`, with
  *     dot-segments in the ref removed;
  *   - `?q` (query-only) replaces the base's query (the pagination
  *     link form), keeping the base path;
  *   - `#frag` (fragment-only) is DROPPED — a self-reference, not an
  *     edge;
  *   - everything else is PATH-RELATIVE: merged with the base
  *     directory (base path up to its last `/`; `/` when the base has
  *     no path) and dot-segment-normalized per §5.2.4, so `../y` and
  *     `./y` land exactly where a browser would. Excess `..` above
  *     the root is removed (the RFC resolver's rule). Callers that
  *     must NOT trust path-relative declarations (alias maps, where a
  *     false edge wrongly collapses two pages) pass
  *     `allowPathRelative = false` and get null instead.
  *
  * A base that is not itself a hierarchical `scheme://…` URL cannot
  * anchor any relative form → null (never a garbage frontier key).
  * Scale shape: pure per-row string program inside whole-stage codegen
  * (the [[UnicodeNormalize]] pattern) — zero regex, zero shuffle, runs
  * at the scan.
  */
object ResolveHrefUtil {

  /** End index of a leading scheme (position of ':'), or -1 when the
    * ref has no scheme prefix.
    */
  private def schemeColon(s: String): Int = {
    if (s.isEmpty) return -1
    val c0 = s.charAt(0)
    if (!((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z'))) return -1
    var i = 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ':') return i
      val ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'
      if (!ok) return -1
      i += 1
    }
    -1
  }

  /** RFC 3986 §5.2.4 remove_dot_segments over a path string. */
  private[graft] def removeDotSegments(path: String): String = {
    val out = new java.lang.StringBuilder(path.length)
    var i = 0
    val n = path.length
    def startsWith(s: String): Boolean = path.regionMatches(i, s, 0, s.length)
    def popSegment(): Unit = {
      var j = out.length - 1
      while (j >= 0 && out.charAt(j) != '/') j -= 1
      out.setLength(if (j < 0) 0 else j)
    }
    while (i < n) {
      if (startsWith("../")) i += 3
      else if (startsWith("./")) i += 2
      else if (startsWith("/./")) i += 2 // keep the trailing '/'
      else if (startsWith("/.") && i + 2 == n) { out.append('/'); i = n }
      else if (startsWith("/../")) { popSegment(); i += 3 }
      else if (startsWith("/..") && i + 3 == n) {
        popSegment(); out.append('/'); i = n
      }
      else if ((startsWith(".") && i + 1 == n) ||
               (startsWith("..") && i + 2 == n)) i = n
      else {
        // move one segment (with its leading '/', if any) to output
        var j = if (path.charAt(i) == '/') i + 1 else i
        while (j < n && path.charAt(j) != '/') j += 1
        out.append(path, i, j)
        i = j
      }
    }
    out.toString
  }

  /** Resolve `ref` against `base`; null = drop (no edge). See the
    * object doc for the rule table.
    */
  def resolve(base: UTF8String, ref: UTF8String,
              allowPathRelative: Boolean): UTF8String = {
    if (ref == null) return null
    val r = ref.toString.trim
    if (r.isEmpty) return null
    val rc = schemeColon(r)
    if (rc >= 0) {
      // scheme'd ref: hierarchical keeps, non-hierarchical drops
      return if (r.regionMatches(rc + 1, "//", 0, 2)) {
        UTF8String.fromString(r)
      } else null
    }
    if (r.startsWith("#")) return null
    if (base == null) return null
    val b = base.toString.trim
    val bc = schemeColon(b)
    if (bc < 0 || !b.regionMatches(bc + 1, "//", 0, 2)) return null
    if (r.startsWith("//")) {
      // network-path reference: inherit the scheme, dot-normalize the
      // ref's own path (§5.3 applies remove_dot_segments to every
      // reference that carries an authority)
      var k = 2
      while (k < r.length && r.charAt(k) != '/' && r.charAt(k) != '?' &&
        r.charAt(k) != '#') k += 1
      val (p, tail) = splitPath(r.substring(k))
      return UTF8String.fromString(
        b.substring(0, bc + 1) + r.substring(0, k) + removeDotSegments(p) +
          tail)
    }
    // authority end: first of '/', '?', '#' after "scheme://"
    var ae = bc + 3
    while (ae < b.length && b.charAt(ae) != '/' && b.charAt(ae) != '?' &&
      b.charAt(ae) != '#') ae += 1
    if (ae == bc + 3) return null // empty authority: not a resolvable base
    if (r.startsWith("/")) {
      val (p, tail) = splitPath(r)
      return UTF8String.fromString(
        b.substring(0, ae) + removeDotSegments(p) + tail)
    }
    // base path end: first of '?', '#' after the authority
    var pe = ae
    while (pe < b.length && b.charAt(pe) != '?' && b.charAt(pe) != '#') pe += 1
    if (r.startsWith("?")) return UTF8String.fromString(b.substring(0, pe) + r)
    if (!allowPathRelative) return null
    // merge: base directory (path up to the last '/'; '/' when none)
    var ls = pe - 1
    while (ls >= ae && b.charAt(ls) != '/') ls -= 1
    val dir = if (ls < ae) "/" else b.substring(ae, ls + 1)
    val (p, tail) = splitPath(dir + r)
    UTF8String.fromString(b.substring(0, ae) + removeDotSegments(p) + tail)
  }

  /** Split "path[?query][#frag]" into (path, the rest verbatim). */
  private def splitPath(s: String): (String, String) = {
    var i = 0
    while (i < s.length && s.charAt(i) != '?' && s.charAt(i) != '#') i += 1
    (s.substring(0, i), s.substring(i))
  }
}

/** [[ResolveHrefUtil.resolve]] as a codegen'd binary expression, so
  * href resolution rides inside whole-stage codegen with the harvest
  * regexes and the canonicalizer it feeds.
  */
case class ResolveHref(base: Expression, ref: Expression,
                       allowPathRelative: Boolean)
  extends BinaryExpression {

  override def left: Expression = base
  override def right: Expression = ref
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (base.dataType != StringType || ref.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"resolve_href expects (string, string), got " +
          s"(${base.dataType.simpleString}, ${ref.dataType.simpleString})")
    else TypeCheckResult.TypeCheckSuccess

  // NOT nullSafeEval: BinaryExpression null-propagation would null the
  // result whenever BASE is null, but the rule table resolves a
  // scheme'd absolute ref WITHOUT consulting the base (the util's
  // scheme check runs first) — a null page_url must not lose absolute
  // edges. Only a null REF short-circuits; a null base passes through
  // to the util, which applies the documented base rules itself.
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val r = ref.eval(input)
    if (r == null) null
    else {
      val b = base.eval(input)
      ResolveHrefUtil.resolve(
        if (b == null) null else b.asInstanceOf[UTF8String],
        r.asInstanceOf[UTF8String], allowPathRelative)
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val bGen = base.genCode(ctx)
    val rGen = ref.genCode(ctx)
    ev.copy(code = code"""
      ${rGen.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.unsafe.types.UTF8String ${ev.value} = null;
      if (!${rGen.isNull}) {
        ${bGen.code}
        ${ev.value} = graft.functions.ResolveHrefUtil.resolve(
          ${bGen.isNull} ? null : ${bGen.value}, ${rGen.value},
          $allowPathRelative);
        ${ev.isNull} = (${ev.value} == null);
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(base = newLeft, ref = newRight)
}

object ResolveHref {

  /** Full resolution — the link-harvest form (path-relative binds). */
  def apply(base: Column, ref: Column): Column =
    ColumnBridge.column(ResolveHref(ColumnBridge.expression(base),
      ColumnBridge.expression(ref), allowPathRelative = true))

  /** Alias-declaration resolution — root-/protocol-relative bind,
    * PATH-relative returns null (a refresh/canonical that needs
    * directory context is rare, and a wrong guess wrongly collapses
    * two pages — callers default null to self/no-edge, the safe
    * failure).
    */
  def aliasTarget(base: Column, ref: Column): Column =
    ColumnBridge.column(ResolveHref(ColumnBridge.expression(base),
      ColumnBridge.expression(ref), allowPathRelative = false))
}
