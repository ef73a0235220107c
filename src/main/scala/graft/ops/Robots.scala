package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt (RFC 9309) evaluation — the crawl-politeness stage between
  * URL-frontier dedup and the fetcher. Built from the public RFC only;
  * the reference has no crawl surface at all (it ingests pre-extracted
  * CSV, reference `src/data_extract.py:62`).
  *
  * [[RobotsAllow]] is a codegen'd Catalyst expression
  * `robots_allow(robots_txt, product_token, path)` implementing the
  * RFC's access rule:
  *
  *  - GROUPS: consecutive `User-agent:` lines open a group that owns
  *    the following `Allow:`/`Disallow:` rules (a `User-agent` line
  *    after rules starts a NEW group, per RFC 9309 §2.2.1);
  *  - GROUP SELECTION: all groups whose user-agent token equals the
  *    crawler's product token case-insensitively are MERGED; only if
  *    none match do the `*` groups apply (RFC 9309 §2.2.1 "most
  *    specific match"); no group at all → allowed;
  *  - RULE MATCH: a rule applies when its path value is a byte prefix
  *    of the URL path; the LONGEST matching value wins; on a length
  *    tie, Allow wins (RFC 9309 §2.2.2); no matching rule → allowed;
  *  - an empty rule value matches nothing (`Disallow:` = allow all);
  *    `#` comments and unknown directives (Crawl-delay, Sitemap) are
  *    ignored; field names are case-insensitive; CR before LF is
  *    tolerated.
  *
  * (The RFC's `*`/`$` wildcards inside path values are out of scope and
  * documented so: values are treated as literal prefixes, which is the
  * subset the oracle replays; a value containing `*` or `$` simply
  * matches as the literal bytes, never as a wildcard.)
  *
  * Per-row work, no state, no shuffle: the expression evaluates inside
  * whole-stage codegen over (robots, path) pairs, so the politeness
  * filter costs one scan at any corpus size.
  */
object RobotsOps {

  private final case class Rule(allow: Boolean, value: String)

  /** RFC 9309 decision for one (robots.txt, token, path). */
  def allowed(robots: UTF8String, token: UTF8String, path: UTF8String): Boolean = {
    val txt = robots.toString
    val tok = token.toString.toLowerCase
    val p = path.toString
    // parse groups in one pass
    var exactRules = List.empty[Rule] // groups whose UA == token
    var starRules = List.empty[Rule] // groups whose UA == *
    var anyExactGroup = false
    var curExact = false
    var curStar = false
    var inAgentRun = false // consecutive User-agent lines extend the group
    txt.split("\n", -1).foreach { raw =>
      val noCr = if (raw.nonEmpty && raw.last == '\r') raw.dropRight(1) else raw
      val noComment = {
        val h = noCr.indexOf('#')
        if (h >= 0) noCr.substring(0, h) else noCr
      }
      val line = noComment.trim
      if (line.nonEmpty) {
        val c = line.indexOf(':')
        if (c > 0) {
          val field = line.substring(0, c).trim.toLowerCase
          val value = line.substring(c + 1).trim
          field match {
            case "user-agent" =>
              if (!inAgentRun) { curExact = false; curStar = false }
              inAgentRun = true
              val ua = value.toLowerCase
              if (ua == tok) { curExact = true; anyExactGroup = true }
              else if (ua == "*") curStar = true
            case "allow" | "disallow" =>
              inAgentRun = false
              if (value.nonEmpty) {
                val r = Rule(field == "allow", value)
                if (curExact) exactRules ::= r
                if (curStar) starRules ::= r
              }
            case _ => inAgentRun = false // Crawl-delay, Sitemap, unknown
          }
        }
      }
    }
    val rules = if (anyExactGroup) exactRules else starRules
    // longest matching value wins; tie -> Allow
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      if (p.startsWith(r.value)) {
        val l = r.value.length
        if (l > bestLen || (l == bestLen && r.allow)) {
          bestLen = l; bestAllow = r.allow
        }
      }
    }
    if (bestLen < 0) true else bestAllow
  }

  def allowedAny(robots: Any, token: Any, path: Any): Boolean =
    allowed(robots.asInstanceOf[UTF8String], token.asInstanceOf[UTF8String],
      path.asInstanceOf[UTF8String])
}

/** robots_allow(robots_txt, product_token, path): RFC 9309 decision. */
case class RobotsAllow(first: Expression, second: Expression,
                       third: Expression) extends TernaryExpression {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(r: Any, t: Any, p: Any): Any =
    RobotsOps.allowedAny(r, t, p)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (r, t, p) => s"graft.ops.RobotsOps.allowed($r, $t, $p)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): RobotsAllow =
    copy(f, s, t)
  override def prettyName: String = "robots_allow"
}

object Robots {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def robotsAllow(robots: Column, token: Column, path: Column): Column =
    ColumnBridge.column(RobotsAllow(ColumnBridge.expression(robots),
      ColumnBridge.expression(token), ColumnBridge.expression(path)))
}
