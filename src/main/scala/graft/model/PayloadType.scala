package graft.model

/** The four value types the engine stores, one typed column each.
  *
  * Mirrors the reference's `PayloadType` enum
  * (`shared_code/timeseries.py:5-11`) and the typed-column EAV layout of the
  * `conditions` hypertable (`db/create_table_and_roles.sql:35-46`).
  */
sealed abstract class PayloadType(val tag: String) extends Serializable

object PayloadType {
  case object Number    extends PayloadType("number")
  case object Str       extends PayloadType("string")
  case object Bool      extends PayloadType("boolean")
  case object Geography extends PayloadType("geography")

  val all: Seq[PayloadType] = Seq(Number, Str, Bool, Geography)

  def fromTag(tag: String): PayloadType =
    all.find(_.tag == tag).getOrElse(
      throw new IllegalArgumentException(s"Unknown payload type tag: $tag"))
}
