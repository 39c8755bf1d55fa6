package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** A3/A4: the timer-driven BMW ConnectedDrive poll
  * (`bmw_update/function.json:8` cron + `shared_code/bmw.py:19-111`) —
  * fetch vehicles, filter by VIN allowlist, serialize each vehicle state,
  * publish to the stream.
  *
  * The REST client is a seam ([[BmwPoller.ApiClient]]): this environment
  * has zero egress, so the shipped client reads a captured fixture; a real
  * HTTP client drops in without touching the dataflow. "Publish" = append
  * a uniquely-named file to the directory the Structured Streaming file
  * source watches ([[graft.streaming.IngestPipeline.startBmw]]), the local
  * stand-in for an Event Hub topic. Driver-side by design — the poll is
  * one API call per 10 minutes, not distributed work.
  */
object BmwPoller {

  trait ApiClient {
    /** Raw vehicle-state JSON documents, one per vehicle. */
    def fetchVehicles(): Seq[String]
  }

  /** Reads a captured JSON array of vehicle states (e.g. the reference's
    * `bmw_topic_messages.json`).
    */
  final class FixtureClient(path: String) extends ApiClient {
    private val mapper = new ObjectMapper()
    def fetchVehicles(): Seq[String] =
      mapper.readTree(Files.readString(Paths.get(path)))
        .elements.asScala.map(_.toString).toVector
  }

  /** One poll: fetch, VIN-filter (`shared_code/bmw.py:19-36`), publish.
    * Returns the number of messages published. `tick` names the drop file
    * (reference: each timer invocation is independent).
    */
  def poll(client: ApiClient, vins: Set[String], streamInDir: String,
           tick: Long): Int = {
    val mapper = new ObjectMapper()
    val msgs = client.fetchVehicles().filter { raw =>
      try {
        val vin = mapper.readTree(raw).path("vin").asText("")
        vins.isEmpty || vins.contains(vin)
      } catch { case scala.util.control.NonFatal(_) => false }
    }
    if (msgs.nonEmpty) {
      Files.createDirectories(Paths.get(streamInDir))
      // write-then-rename: the file source lists the directory between
      // micro-batches, and each filename is read exactly once — a file
      // that becomes visible before its content is fully flushed would be
      // read truncated (the cut-off tail message silently dropped) and
      // never re-read. The dot-prefixed temp name is invisible to Spark's
      // file listing; ATOMIC_MOVE makes the final name appear complete.
      val tmp = Paths.get(s"$streamInDir/.poll_$tick.txt.tmp")
      Files.write(tmp, msgs.mkString("\n").getBytes,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      Files.move(tmp, Paths.get(s"$streamInDir/poll_$tick.txt"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    msgs.size
  }
}
