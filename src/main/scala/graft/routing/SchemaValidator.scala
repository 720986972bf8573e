package graft.routing

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** JSON-Schema-style validation compiled to boolean Column expressions.
  *
  * The reference validates with AJV (draft-04) at two levels: the envelope
  * (`ajv.validate(eventSchemaId, event)`, reference lib/kinesisHandler.js:112)
  * and the selected payload (`ajv.validate(event.data.schema, event.data)`,
  * :115). We model the commonly used draft-04 constraint subset (required,
  * enum, numeric bounds, pattern, string length) as predicates over a struct
  * column, so validation is a single codegen'd filter — no per-row
  * interpretation, no UDFs, and Catalyst can reorder/push the conjuncts.
  *
  * Typed parsing via `from_json` already enforces the *structural* part
  * (types of present fields; corrupt JSON → NULL struct), so constraints
  * here are the value-level extras.
  */
sealed trait Constraint {
  /** Predicate over the event root struct column; true = valid. */
  def predicate(root: Column): Column
}

/** draft-04 `required` — the field must be present (non-null after parse). */
final case class Required(path: String) extends Constraint {
  def predicate(root: Column): Column =
    path.split('.').foldLeft(root)(_ getField _).isNotNull
}

/** draft-04 `enum` for string fields. */
final case class EnumIn(path: String, values: Seq[String]) extends Constraint {
  def predicate(root: Column): Column = {
    val f = path.split('.').foldLeft(root)(_ getField _)
    f.isNull || f.isin(values: _*)
  }
}

/** draft-04 `minimum`/`maximum` (inclusive) for numeric fields. */
final case class NumRange(path: String, min: Option[Double], max: Option[Double]) extends Constraint {
  def predicate(root: Column): Column = {
    val f = path.split('.').foldLeft(root)(_ getField _)
    val lo = min.map(m => f >= m).getOrElse(lit(true))
    val hi = max.map(m => f <= m).getOrElse(lit(true))
    f.isNull || (lo && hi)
  }
}

/** draft-04 `pattern` for string fields (Java regex, un-anchored like AJV). */
final case class Pattern(path: String, regex: String) extends Constraint {
  def predicate(root: Column): Column = {
    val f = path.split('.').foldLeft(root)(_ getField _)
    f.isNull || f.rlike(regex)
  }
}

/** draft-04 `minLength`/`maxLength` for string fields. */
final case class StrLength(path: String, min: Option[Int], max: Option[Int]) extends Constraint {
  def predicate(root: Column): Column = {
    val f = path.split('.').foldLeft(root)(_ getField _)
    val lo = min.map(m => length(f) >= m).getOrElse(lit(true))
    val hi = max.map(m => length(f) <= m).getOrElse(lit(true))
    f.isNull || (lo && hi)
  }
}

/** A registered schema: id + value constraints (structure enforced by the
  * `from_json` StructType in [[EventCodec]]).
  */
final case class RegisteredSchema(id: String, constraints: Seq[Constraint]) {
  /** Conjunction of all constraints; vacuously true when none. */
  def valid(root: Column): Column =
    constraints.foldLeft(lit(true))((acc, c) => acc && c.predicate(root))
}
