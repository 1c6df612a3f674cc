package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Prometheus label-matcher types (prompb.LabelMatcher_Type). */
sealed trait MatcherType
object MatcherType {
  case object Eq  extends MatcherType
  case object Neq extends MatcherType
  case object Re  extends MatcherType
  case object Nre extends MatcherType
}

/** One matcher from a remote-read request: `name op value`, where
  * name "__name__" targets the metric name. */
final case class LabelMatcher(mtype: MatcherType, name: String, value: String)

/** Compiles prompb matchers into a single Catalyst predicate `Column`
  * over the canonical samples schema — the Spark-side twin of the
  * reference's SQL matcher compiler
  * (reference: internal/clickhouse/read.go:105-141,
  * internal/clickhouse/sqlbuilder.go).
  *
  * Semantics preserved from the reference:
  *  - regexes are anchored `^…$` (read.go "concat() to anchor ...
  *    to match prometheus behavior");
  *  - label matchers operate on the whole "k=v" string
  *    (`has(labels, 'k=v')` ≙ `array_contains`,
  *    `arrayExists(x -> match(x, re))` ≙ `exists(labels, _.rlike(re))`);
  *  - an EQ matcher equal to `ignoreLabel` is dropped
  *    (read.go:128-130, default "remote=clickhouse").
  *
  * Everything compiles to native codegen'd expressions; equality
  * matchers on `metric` are plain `=` and reach the parquet scan as
  * pushed filters.
  */
object Matchers {
  val NameLabel = "__name__"

  import MatcherType._

  def eq(name: String, value: String): LabelMatcher  = LabelMatcher(Eq, name, value)
  def neq(name: String, value: String): LabelMatcher = LabelMatcher(Neq, name, value)
  def re(name: String, value: String): LabelMatcher  = LabelMatcher(Re, name, value)
  def nre(name: String, value: String): LabelMatcher = LabelMatcher(Nre, name, value)

  /** AND of all matcher clauses (sqlbuilder.go joins with " AND "). */
  def compile(matchers: Seq[LabelMatcher],
              ignoreLabel: Option[String] = Some("remote=clickhouse")): Column =
    matchers.flatMap(clause(_, ignoreLabel)).reduceOption(_ && _).getOrElse(lit(true))

  /** AND of all matcher clauses under PROMETHEUS ENGINE semantics
    * (prometheus/model/labels: `FastRegexMatcher` compiles
    * `^(?:re)$`, and a matcher reads the label's VALUE, with a
    * missing label treated as the empty string).
    *
    * This differs from [[compile]] — the reference's remote-read
    * compiler (read.go:105-141) — in two user-visible ways:
    *  - regexes anchor with a non-capturing GROUP, so alternation
    *    stays inside the anchors: `k=~"a|b"` means `^(?:a|b)$`, not
    *    `(^k=a)|(b$)` loose in the whole label array;
    *  - a matcher that accepts "" (e.g. `k=""`, `k=~".*"`, `k!~".+"`)
    *    matches series that LACK the label entirely.
    *
    * The remote-read path keeps [[compile]] bug-for-bug with the
    * reference; every PromQL / HTTP-API surface (evaluator, series /
    * labels / label-values metadata, /federate, exemplars, rollup
    * serving) uses this one. Equality on non-empty values still
    * compiles to `array_contains` — identical result on canonical
    * unique-per-name labels, and it reaches the scan as a pushable
    * predicate. */
  def compilePromQL(matchers: Seq[LabelMatcher],
                    ignoreLabel: Option[String] = Some("remote=clickhouse")): Column =
    matchers.flatMap(promClause(_, ignoreLabel)).reduceOption(_ && _).getOrElse(lit(true))

  private def anchor(re: String): String = "^" + re + "$"

  /** Prometheus's regex anchoring: the group keeps `|` inside. */
  private def anchorGroup(re: String): String = "^(?:" + re + ")$"

  /** The VALUE of label `name` on the canonical labels array — ""
    * when absent, exactly Prometheus's missing-label convention.
    * Labels are unique per name, so the filter yields ≤1 element and
    * array_join is that element (or "" on empty). */
  private def labelValue(name: String): Column = {
    val pfx = name + "="
    array_join(filter(col("labels"), _.startsWith(pfx)), "")
      .substr(lit(pfx.length + 1), lit(Int.MaxValue))
  }

  private def promClause(m: LabelMatcher, ignoreLabel: Option[String]): Option[Column] =
    if (m.name == NameLabel) {
      val c = col("metric")
      m.mtype match {
        case Eq  => Some(c === m.value)
        case Neq => Some(c =!= m.value)
        case Re  => Some(c.rlike(anchorGroup(m.value)))
        case Nre => Some(!c.rlike(anchorGroup(m.value)))
      }
    } else {
      val ls = col("labels")
      m.mtype match {
        case Eq if ignoreLabel.contains(s"${m.name}=${m.value}") => None
        // non-empty Eq/Neq: array_contains is value-equality on
        // canonical labels AND a better predicate for the scan
        case Eq if m.value.nonEmpty  => Some(array_contains(ls, s"${m.name}=${m.value}"))
        case Neq if m.value.nonEmpty => Some(!array_contains(ls, s"${m.name}=${m.value}"))
        case Eq  => Some(labelValue(m.name) === m.value)
        case Neq => Some(labelValue(m.name) =!= m.value)
        case Re  => Some(labelValue(m.name).rlike(anchorGroup(m.value)))
        case Nre => Some(!labelValue(m.name).rlike(anchorGroup(m.value)))
      }
    }

  private val SelName = "([a-zA-Z_:][a-zA-Z0-9_:]*)".r
  // a pair's label name is a bare ident OR (Prometheus 3.x UTF-8
  // names) a double-quoted string with the usual escapes
  private val SelPair =
    """\s*(?:([a-zA-Z_][a-zA-Z0-9_]*)|"((?:[^"\\]|\\.)*)")\s*(=~|!~|!=|=)\s*"((?:[^"\\]|\\.)*)"\s*(?:,|(?=\}))""".r
  // a BARE quoted string in the braces is the quoted METRIC name
  // ({"my.metric", ...} — Prometheus 3.x UTF-8 metric syntax)
  private val SelQuotedName =
    """\s*"((?:[^"\\]|\\.)*)"\s*(?:,|(?=\}))""".r

  private def unescape(v: String): String = {
    val sb = new StringBuilder(v.length)
    var i = 0
    while (i < v.length) {
      if (v.charAt(i) == '\\' && i + 1 < v.length) {
        sb.append(v.charAt(i + 1) match {
          case 'n' => '\n'
          case 't' => '\t'
          case c   => c // \" \\ and any other escaped char literally
        })
        i += 2
      } else { sb.append(v.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** Parses one PromQL instant-vector selector — `m{k="v",k2=~"re"}`,
    * `{k!="v"}`, or bare `m` — into prompb-style matchers (the shape
    * `/api/v1/series` receives in `match[]` params). Values are
    * double-quoted with `\"`, `\\`, `\n`, `\t` escapes. Returns None
    * on malformed input (the endpoint answers 400). */
  def parseSelector(s: String): Option[Seq[LabelMatcher]] = {
    val t = s.trim
    val (name, rest) = SelName.findPrefixOf(t) match {
      case Some(n) => (Some(n), t.substring(n.length).trim)
      case None    => (None, t)
    }
    val nameMatcher = name.map(LabelMatcher(MatcherType.Eq, NameLabel, _)).toSeq
    if (rest.isEmpty) {
      if (name.isEmpty) None else Some(nameMatcher)
    } else if (!(rest.startsWith("{") && rest.endsWith("}"))) None
    else {
      // the lookahead-terminated pair regex must consume the whole
      // braced body — anything left over is malformed
      val body = rest.substring(1, rest.length - 1) + "}"
      var idx = 0
      val pairs = Seq.newBuilder[LabelMatcher]
      val quotedNames = Seq.newBuilder[String]
      var ok = true
      while (ok && idx < body.length - 1) {
        SelPair.findPrefixMatchOf(body.substring(idx)) match {
          case Some(m) =>
            val op = m.group(3) match {
              case "="  => MatcherType.Eq
              case "!=" => MatcherType.Neq
              case "=~" => MatcherType.Re
              case "!~" => MatcherType.Nre
            }
            val key =
              if (m.group(1) != null) m.group(1) else unescape(m.group(2))
            // a label name holding '=' cannot round-trip the store's
            // canonical "k=v" label form — rejected, documented
            // deviation from the any-UTF-8 spec; empty names are
            // invalid in Prometheus too
            if (key.isEmpty || key.contains('=')) ok = false
            else { pairs += LabelMatcher(op, key, unescape(m.group(4))) }
            idx += m.end
          case None =>
            SelQuotedName.findPrefixMatchOf(body.substring(idx)) match {
              case Some(q) =>
                val nm = unescape(q.group(1))
                if (nm.isEmpty) ok = false
                else quotedNames += nm
                idx += q.end
              case None => ok = false
            }
        }
      }
      val qn = quotedNames.result()
      // the quoted metric name composes with pairs but not with a
      // prefix ident name or a second quoted name (Prometheus errors
      // on both)
      if (qn.size > 1 || (qn.nonEmpty && name.nonEmpty)) return None
      val all = nameMatcher ++
        qn.map(LabelMatcher(MatcherType.Eq, NameLabel, _)) ++ pairs.result()
      if (ok && all.nonEmpty) Some(all) else None
    }
  }

  private def clause(m: LabelMatcher, ignoreLabel: Option[String]): Option[Column] =
    if (m.name == NameLabel) {
      val c = col("metric")
      m.mtype match {
        case Eq  => Some(c === m.value)
        case Neq => Some(c =!= m.value)
        case Re  => Some(c.rlike(anchor(m.value)))
        case Nre => Some(!c.rlike(anchor(m.value)))
      }
    } else {
      val label = s"${m.name}=${m.value}"
      val ls = col("labels")
      m.mtype match {
        case Eq if ignoreLabel.contains(label) => None
        case Eq  => Some(array_contains(ls, label))
        case Neq => Some(!array_contains(ls, label))
        case Re  => Some(exists(ls, _.rlike(anchor(label))))
        case Nre => Some(!exists(ls, _.rlike(anchor(label))))
      }
    }
}
