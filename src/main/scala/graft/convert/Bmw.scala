package graft.convert

import com.fasterxml.jackson.databind.JsonNode
import graft.model.TimeseriesRecord

/** BMW ConnectedDrive vehicle-state converter.
  *
  * Re-expresses `construct_messages` + the field extractors (reference
  * `shared_code/bmw_to_timescale.py:71-133,193-326`): a deep nested
  * vehicle-state document is projected onto six EAV records — charging
  * level/range/connected/status, current mileage, and location — keyed by
  * `(vin, state.lastUpdatedAt)`. Fields absent from the message are skipped;
  * a field whose value fails validation is skipped (logged in the reference,
  * `bmw_to_timescale.py:186-188`) without failing the message.
  *
  * `correlation_id = lastUpdatedAt` (`bmw_to_timescale.py:183`) — it doubles
  * as the streaming dedup key (see [[graft.streaming.BmwDedup]]).
  */
object Bmw {

  final case class Key(vin: String, lastUpdatedAt: String)

  def key(body: JsonNode): Key =
    Key(body.get("vin").asText, body.get("state").get("lastUpdatedAt").asText)

  /** `shared_code/bmw_to_timescale.py:221-259` */
  def validLatLon(lat: Double, lon: Double): Boolean =
    lat >= -90 && lat <= 90 && lon >= -180 && lon <= 180

  def convert(body: JsonNode): Vector[TimeseriesRecord] = {
    val Key(vin, lastUpdatedAt) = key(body)
    // The reference stores lastUpdatedAt raw and relies on PostgreSQL's
    // flexible timestamptz parse (`bmw_to_timescale.py:178`); our storage
    // boundary expects the 6-digit wire format, so normalize here (BMW emits
    // 7 fractional digits). The RAW string stays the correlation/dedup key.
    val ts = graft.model.Timestamps.fromString(lastUpdatedAt)
    val cid = Some(lastUpdatedAt)
    val state = body.get("state")
    val charging = Option(state.get("electricChargingState")).filter(_.isObject)
    def chargingField(name: String): Option[JsonNode] =
      charging.flatMap(c => Option(c.get(name)))

    val out = Vector.newBuilder[TimeseriesRecord]

    chargingField("chargingLevelPercent").filter(_.isNumber).foreach { n =>
      out += TimeseriesRecord.number(ts, vin, "bmw", "chargingLevelPercent", n.asDouble, cid)
    }
    chargingField("range").filter(_.isNumber).foreach { n =>
      out += TimeseriesRecord.number(ts, vin, "bmw", "range", n.asDouble, cid)
    }
    chargingField("isChargerConnected").foreach { n =>
      // bool(x) coercion in the reference (`bmw_to_timescale.py:107`)
      val b =
        if (n.isBoolean) n.asBoolean
        else if (n.isNumber) n.asDouble != 0.0
        else if (n.isTextual) n.asText.nonEmpty
        else true
      out += TimeseriesRecord.boolean(ts, vin, "bmw", "isChargerConnected", b, cid)
    }
    chargingField("chargingStatus").filter(_.isTextual).foreach { n =>
      out += TimeseriesRecord.string(ts, vin, "bmw", "chargingStatus", n.asText, cid)
    }

    // currentMileage must be an integer (`bmw_to_timescale.py:289-326`)
    Option(state.get("currentMileage")).filter(_.isIntegralNumber).foreach { n =>
      out += TimeseriesRecord.number(ts, vin, "bmw", "currentMileage", n.asDouble, cid)
    }

    // location.coordinates → GEOGRAPHY [lat, lon], range-checked
    for {
      location <- Option(state.get("location")).filter(_.isObject)
      coords   <- Option(location.get("coordinates")).filter(_.isObject)
      latNode  <- Option(coords.get("latitude")).filter(_.isNumber)
      lonNode  <- Option(coords.get("longitude")).filter(_.isNumber)
      if validLatLon(latNode.asDouble, lonNode.asDouble)
    } out += TimeseriesRecord.geography(ts, vin, "bmw", "coordinates",
      Vector(latNode.asDouble, lonNode.asDouble), cid)

    out.result()
  }

  /** Parse + convert one raw BMW message; `None` on malformed input. */
  def convertMessage(raw: String): Option[Vector[TimeseriesRecord]] =
    try {
      val body = Converters.mapper.readTree(raw)
      require(body.hasNonNull("vin") && body.hasNonNull("state"), "missing vin/state")
      require(body.get("state").hasNonNull("lastUpdatedAt"), "missing lastUpdatedAt")
      Some(convert(body))
    } catch { case scala.util.control.NonFatal(_) => None }
}
