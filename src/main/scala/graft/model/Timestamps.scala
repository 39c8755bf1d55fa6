package graft.model

import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder}
import java.time.temporal.ChronoField
import java.time.{Instant, LocalDate, LocalDateTime, LocalTime, OffsetDateTime, ZoneOffset}

/** Timestamp normalization to the wire format `%Y-%m-%dT%H:%M:%S.%fZ`
  * (always 6 fractional digits, literal `Z`).
  *
  * Mirrors `to_datetime_string` (reference `shared_code/helpers.py:78-95`):
  *  - numeric epoch seconds, range-checked to `[0, 253402300799]`;
  *  - parseable date strings (dateutil-style leniency: ISO 8601 with `T` or
  *    space separator, optional fraction, optional offset/`Z`).
  *
  * Semantics notes (deliberate parity with the reference):
  *  - The reference's `datetime.fromtimestamp` is local-time but the output
  *    is suffixed `Z`; that is only correct under TZ=UTC, which this engine
  *    pins (`spark.sql.session.timeZone=UTC`). We format epochs as true UTC.
  *  - Offset-aware input strings are formatted *without* converting to UTC
  *    (dateutil keeps the parsed wall-clock fields and `strftime` prints
  *    them as-is with a literal `Z`); we reproduce that.
  *  - Sub-second epochs round to the nearest microsecond.
  */
object Timestamps {

  val MaxEpochSeconds: Long = 253402300799L // 9999-12-31T23:59:59Z

  private val OutFmt: DateTimeFormatter =
    new DateTimeFormatterBuilder()
      .appendPattern("yyyy-MM-dd'T'HH:mm:ss")
      .appendLiteral('.')
      .appendFraction(ChronoField.MICRO_OF_SECOND, 6, 6, false)
      .appendLiteral('Z')
      .toFormatter

  /** Lenient ISO-ish parser: `T` or space separator, optional fraction. */
  private val LocalFmt: DateTimeFormatter =
    new DateTimeFormatterBuilder()
      .appendPattern("yyyy-MM-dd['T'][' ']HH:mm:ss")
      .optionalStart()
      .appendFraction(ChronoField.NANO_OF_SECOND, 1, 9, true)
      .optionalEnd()
      .toFormatter

  def fromEpochSeconds(ts: Double): String = {
    if (ts.isNaN || ts < 0 || ts > MaxEpochSeconds)
      throw new IllegalArgumentException(s"Timestamp out of range: $ts")
    val micros = Math.round(ts * 1e6)
    format(LocalDateTime.ofEpochSecond(
      Math.floorDiv(micros, 1000000L),
      (Math.floorMod(micros, 1000000L) * 1000L).toInt,
      ZoneOffset.UTC))
  }

  def fromString(s: String): String = format(parseToLocal(s))

  /** Offset-APPLYING variant (PostgreSQL timestamptz semantics): an input
    * with a UTC offset is converted to UTC before formatting; naive input
    * is taken as already-UTC. Used at boundaries where the reference's
    * parse is PG, not dateutil (see [[graft.convert.Bmw]]).
    */
  def fromStringUtc(raw: String): String = {
    val s = raw.trim
    val normalized = if (s.length > 10 && s.charAt(10) == ' ') s.updated(10, 'T') else s
    try {
      format(OffsetDateTime.parse(normalized)
        .withOffsetSameInstant(ZoneOffset.UTC).toLocalDateTime)
    } catch {
      case _: Exception => fromString(raw)
    }
  }

  /** PG timestamptz parity for sub-µs fractions: the reference hands the
    * raw string to PostgreSQL, whose parser ROUNDS the 7th+ fractional
    * digit into microseconds via rint() (half-even) — `…28.1234567` →
    * `.123457`, `…28.9999995` carries into the next second. Truncating
    * here would store every such value 1 µs early vs the reference DB.
    * Inputs already at ≤6 digits have nanos ≡ 0 (mod 1000), where rint
    * is exact — nothing else changes.
    */
  def format(dt: LocalDateTime): String = {
    val micros = Math.rint(dt.getNano / 1000.0).toLong
    val rounded =
      if (micros >= 1000000L) dt.withNano(0).plusSeconds(1)
      else dt.withNano((micros * 1000L).toInt)
    OutFmt.format(rounded)
  }

  /** Parse a date string to its wall-clock fields (offset discarded, not
    * applied — see class doc). Throws on unparseable input.
    */
  def parseToLocal(raw: String): LocalDateTime = {
    val s = raw.trim
    // Offset-aware forms first: 2022-12-26T14:02:28Z / +01:00 / space sep.
    val normalized = if (s.length > 10 && s.charAt(10) == ' ') s.updated(10, 'T') else s
    try {
      OffsetDateTime.parse(normalized).toLocalDateTime
    } catch {
      case _: Exception =>
        try {
          if (normalized.endsWith("Z"))
            LocalDateTime.parse(normalized.dropRight(1), LocalFmt)
          else
            LocalDateTime.parse(normalized, LocalFmt)
        } catch {
          case _: Exception =>
            // date-only ("2022-12-26") → midnight, dateutil-style
            try {
              LocalDateTime.of(LocalDate.parse(s), LocalTime.MIDNIGHT)
            } catch {
              case e: Exception =>
                throw new IllegalArgumentException(
                  s"Invalid string timestamp format: $raw", e)
            }
        }
    }
  }

  /** Wire string → Instant (the wire format is always UTC by construction). */
  def toInstant(wire: String): Instant =
    LocalDateTime.parse(wire.dropRight(1), LocalFmt).toInstant(ZoneOffset.UTC)
}
