package graft.routing

/** Schema identity triple `vendor/name/version`.
  *
  * Mirrors the reference's `makeSchemaId` which renders
  * `${schema.self.vendor}/${schema.self.name}/${schema.self.version}`
  * (reference: lib/kinesisHandler.js:15-17). Versioning is explicit and
  * value-embedded in every event, not catalog-managed.
  */
final case class SchemaId(vendor: String, name: String, version: String) {
  def render: String = s"$vendor/$name/$version"
  override def toString: String = render
}

object SchemaId {
  /** Parse `vendor/name/version`; names may themselves contain slashes in the
    * reference's examples (e.g. `com.nordstrom/product/create/1-0-0`), so we
    * split vendor off the front and version off the back and keep the middle
    * as the (possibly slashed) name.
    */
  def parse(s: String): Option[SchemaId] = {
    val parts = s.split("/")
    if (parts.length < 3) None
    else Some(SchemaId(parts.head, parts.slice(1, parts.length - 1).mkString("/"), parts.last))
  }
}
