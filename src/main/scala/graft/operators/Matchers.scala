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

  private def anchor(re: String): String = "^" + re + "$"

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
