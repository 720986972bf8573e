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

  /** Dotted-path field access; "" resolves to the root itself, so element
    * constraints can apply to array elements directly (see [[ArrayAll]]).
    */
  protected def at(root: Column, path: String): Column =
    if (path.isEmpty) root else path.split('.').foldLeft(root)(_ getField _)
}

/** draft-04 `required` — the field must be present (non-null after parse). */
final case class Required(path: String) extends Constraint {
  def predicate(root: Column): Column =
    at(root, path).isNotNull
}

/** draft-04 `enum` for string fields. */
final case class EnumIn(path: String, values: Seq[String]) extends Constraint {
  def predicate(root: Column): Column = {
    val f = at(root, path)
    f.isNull || f.isin(values: _*)
  }
}

/** draft-04 `minimum`/`maximum` (inclusive) for numeric fields. */
final case class NumRange(path: String, min: Option[Double], max: Option[Double]) extends Constraint {
  def predicate(root: Column): Column = {
    val f = at(root, path)
    val lo = min.map(m => f >= m).getOrElse(lit(true))
    val hi = max.map(m => f <= m).getOrElse(lit(true))
    f.isNull || (lo && hi)
  }
}

/** draft-04 `pattern` for string fields (Java regex, un-anchored like AJV). */
final case class Pattern(path: String, regex: String) extends Constraint {
  def predicate(root: Column): Column = {
    val f = at(root, path)
    f.isNull || f.rlike(regex)
  }
}

/** draft-04 `minLength`/`maxLength` for string fields. */
final case class StrLength(path: String, min: Option[Int], max: Option[Int]) extends Constraint {
  def predicate(root: Column): Column = {
    val f = at(root, path)
    val lo = min.map(m => length(f) >= m).getOrElse(lit(true))
    val hi = max.map(m => length(f) <= m).getOrElse(lit(true))
    f.isNull || (lo && hi)
  }
}

/** draft-04 `anyOf` — at least one alternative constraint set fully holds.
  * Each alternative is a conjunction; the whole is their disjunction (an
  * empty alternative list is vacuously invalid, matching AJV's anyOf:[]).
  */
final case class AnyOf(alternatives: Seq[Seq[Constraint]]) extends Constraint {
  def predicate(root: Column): Column =
    alternatives
      .map(_.foldLeft(lit(true))((acc, c) => acc && c.predicate(root)))
      .foldLeft(lit(false))(_ || _)
}

/** draft-04 `minItems`/`maxItems` for array fields. */
final case class ArrayItems(path: String, min: Option[Int], max: Option[Int]) extends Constraint {
  def predicate(root: Column): Column = {
    val f = at(root, path)
    val lo = min.map(m => size(f) >= m).getOrElse(lit(true))
    val hi = max.map(m => size(f) <= m).getOrElse(lit(true))
    f.isNull || (lo && hi)
  }
}

/** draft-04 array `items` — every element satisfies the element constraint.
  * The element constraint's path is RELATIVE to the element ("" = the
  * element itself, "f" = struct field f of the element), so nested
  * object-array schemas compose: `ArrayAll("lines", NumRange("qty", ...))`.
  *
  * Validation runs per record over small arrays, so the interpreted `forall`
  * lambda is fine here — this is not the per-token hot path the HOF rule in
  * MinHash/SimHash is about.
  */
final case class ArrayAll(path: String, elem: Constraint) extends Constraint {
  def predicate(root: Column): Column = {
    val f = at(root, path)
    f.isNull || forall(f, x => elem.predicate(x))
  }
}

/** A registered schema: id + value constraints (structure enforced by the
  * `from_json` StructType in [[EventCodec]]).
  *
  * Not modeled from draft-04: `additionalProperties` — `from_json` parses
  * into a closed StructType, so unknown fields are dropped before
  * constraints run; rejecting them would need raw-JSON key introspection.
  */
final case class RegisteredSchema(id: String, constraints: Seq[Constraint]) {
  /** Conjunction of all constraints; vacuously true when none. */
  def valid(root: Column): Column =
    constraints.foldLeft(lit(true))((acc, c) => acc && c.predicate(root))
}
