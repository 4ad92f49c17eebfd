package graft.rules

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Typed rule model for tag conditions.
  *
  * Re-expresses the reference's JSON rule conditions (reference:
  * src/engine/rule_parser.py:35-168) as an ADT that compiles to a
  * Catalyst [[Column]]. The reference interpolates values into a SQL
  * WHERE string (injection-prone, uncacheable); compiling to Column
  * keeps the predicate inside WholeStageCodegen, lets Catalyst push it
  * into the scan, and is injection-proof by construction.
  *
  * Date-relative operators (`recent_days`, `days_ago`,
  * `days_ago_between`) are evaluated against an `anchor` date column —
  * `current_date()` in production (matching rule_parser.py:148), a
  * pinned literal in tests for determinism.
  */
sealed trait Rule {
  /** Compile to a boolean Column. */
  def compile(anchor: Column): Column
  def compile: Column = compile(current_date())
  /** All field names referenced, in first-appearance order (reference:
    * rule_parser.py:186-198 get_condition_fields). */
  def fields: Seq[String]
}

/** AND of children; empty ≡ true (reference: rule_parser.py:49-51). */
final case class And(children: Seq[Rule]) extends Rule {
  def compile(anchor: Column): Column =
    if (children.isEmpty) lit(true)
    else children.map(_.compile(anchor)).reduce(_ && _)
  def fields: Seq[String] = children.flatMap(_.fields).distinct
}

/** OR of children; empty ≡ true. */
final case class Or(children: Seq[Rule]) extends Rule {
  def compile(anchor: Column): Column =
    if (children.isEmpty) lit(true)
    else children.map(_.compile(anchor)).reduce(_ || _)
  def fields: Seq[String] = children.flatMap(_.fields).distinct
}

/** NOT of the conjunction of children — the reference's `NOT` logic is
  * `NOT (c1 AND c2 ...)` (rule_parser.py:65-66). */
final case class Not(children: Seq[Rule]) extends Rule {
  def compile(anchor: Column): Column = !And(children).compile(anchor)
  def fields: Seq[String] = children.flatMap(_.fields).distinct
}

/** A single leaf condition: `field op value`.
  *
  * Supported operators (superset-compatible with rule_parser.py):
  * `= != > < >= <=` · `in not_in` · `in_range not_in_range` ·
  * `contains not_contains starts_with ends_with` ·
  * `is_null is_not_null` ·
  * `recent_days days_ago days_ago_between date_between`.
  *
  * `value` holds a JSON scalar (String / Long / Double / Boolean) or a
  * Seq of scalars for the set/range operators; `null` for the null
  * tests.
  */
final case class Cond(field: String, op: String, value: Any = null) extends Rule {
  import Cond._

  def fields: Seq[String] = Seq(field)

  def compile(anchor: Column): Column = {
    val c = col(field)
    op match {
      case "="  | "eq" => c === litOf(value)
      case "!=" | "ne" => c =!= litOf(value)
      case ">"  | "gt" => c > litOf(value)
      case "<"  | "lt" => c < litOf(value)
      case ">=" | "ge" => c >= litOf(value)
      case "<=" | "le" => c <= litOf(value)
      case "in"           => c.isin(seqOf(value).map(normalize): _*)
      case "not_in"       => !c.isin(seqOf(value).map(normalize): _*)
      case "in_range"     => pair(value) match { case (lo, hi) => c.between(litOf(lo), litOf(hi)) }
      case "not_in_range" => pair(value) match { case (lo, hi) => !c.between(litOf(lo), litOf(hi)) }
      case "contains"     => c.contains(litOf(value))
      case "not_contains" => !c.contains(litOf(value))
      case "starts_with"  => c.startsWith(litOf(value))
      case "ends_with"    => c.endsWith(litOf(value))
      case "is_null"      => c.isNull
      case "is_not_null"  => c.isNotNull
      // reference rule_parser.py:147-155 — relative-date operators
      case "recent_days"  => c >= date_sub(anchor, intOf(value))
      case "days_ago"     => c <= date_sub(anchor, intOf(value))
      case "days_ago_between" => pair(value) match {
        case (lo, hi) => c.between(date_sub(anchor, intOf(hi)), date_sub(anchor, intOf(lo)))
      }
      case "date_between" => pair(value) match {
        case (lo, hi) => c.between(litOf(lo), litOf(hi))
      }
      case other => throw new IllegalArgumentException(s"unsupported operator: $other")
    }
  }
}

object Cond {
  private[rules] def normalize(v: Any): Any = v match {
    case bd: java.math.BigDecimal => bd.doubleValue()
    case bd: BigDecimal           => bd.toDouble
    case bi: java.math.BigInteger => bi.longValue()
    case i: java.lang.Integer     => i.longValue()
    case other                    => other
  }
  private[rules] def litOf(v: Any): Column = lit(normalize(v))
  private[rules] def seqOf(v: Any): Seq[Any] = v match {
    case s: Seq[_]                 => s
    case l: java.util.List[_]      => scala.jdk.CollectionConverters.ListHasAsScala(l).asScala.toSeq
    case a: Array[_]               => a.toSeq
    case single                    => Seq(single)
  }
  private[rules] def pair(v: Any): (Any, Any) = seqOf(v) match {
    case Seq(lo, hi) => (lo, hi)
    case other => throw new IllegalArgumentException(s"expected [lo, hi], got: $other")
  }
  private[rules] def intOf(v: Any): Int = v match {
    case n: Number => n.intValue()
    case s: String => s.toInt
    case other => throw new IllegalArgumentException(s"expected int, got: $other")
  }
}

object Rule {
  /** Convenience constructors mirroring the reference JSON shape. */
  def and(cs: Rule*): Rule = And(cs)
  def or(cs: Rule*): Rule = Or(cs)
  def not(cs: Rule*): Rule = Not(cs)
}
