package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** REST catalog→CSV ingestion — the in-engine realization of the
  * reference's S6 download step (`jobs/download_historical_data.py:5-33`):
  * collection metadata lists dataset ids, each dataset id is resolved
  * through a poll-download endpoint to a signed file URL, and the CSV
  * bytes land on shared storage where the multi-file CSV scan (S1,
  * `jobs/HistoricalJob`) picks them up. The reference runs this as a
  * non-Spark Python task; here it is a driver-side ingestion utility
  * with the same three-hop protocol, parameterized on the API base URL
  * so tests drive it against a loopback `com.sun.net.httpserver` fixture
  * (zero-egress container: no real endpoint is ever contacted).
  *
  * Observable parity with the reference, hop by hop:
  *  - metadata: GET `{base}/v2/public/api/collections/{id}/metadata
  *    ?withDatasetMetadata=true`, ids read in order from
  *    `data.datasetMetadata[].datasetId` (`download_historical_data.py:6-11`).
  *  - resolve: GET `{base}/v1/public/api/datasets/{id}/poll-download`
  *    with a `Content-Type: application/json` header (the reference
  *    sends one on its GET), file URL from `data.url`
  *    (`download_historical_data.py:18-21`).
  *  - filename: parsed from the URL-encoded content-disposition the
  *    API embeds in the query string — the text between `filename%3D`
  *    and the closing `%22` pair (`download_historical_data.py:24`).
  *    Where the marker is absent the reference would crash on a split
  *    index; this engine falls back to `{datasetId}.csv` and keeps
  *    going — a download driver must not lose a batch to one
  *    malformed header (divergence documented here, surfaced in the
  *    returned report, covered by RestIngestSpec).
  *
  * Hardening the reference lacks (it retries nothing and checks no
  * status): non-2xx responses and connect/read failures retry up to
  * `retries` times with a fixed deterministic backoff, then surface as
  * a failed entry in the returned report instead of a crash — at
  * 100 TB an ingestion sweep over thousands of files WILL see
  * transient 5xx, and one of them must cost one file, not the batch.
  *
  * Scale shape: this is control-plane work — one metadata call plus
  * two calls per dataset; bytes stream to disk via the BodyHandler
  * (never buffered whole in heap). The data plane stays in Spark: the
  * downloaded directory is read by the S1 multi-file CSV scan, so
  * corpus size only flows through the scan. For a 1000-file catalog
  * the loop is sequential like the reference's; parallelism belongs to
  * the scheduler layer (one task per collection), not to this driver. */
object RestIngest {

  /** One dataset's outcome: `file` is set on success, `error` carries
    * the terminal failure otherwise; `namedByFallback` marks the
    * filename-marker-missing path. */
  final case class Fetch(datasetId: String,
                         file: Option[Path],
                         namedByFallback: Boolean,
                         error: Option[String])

  private val mapper = new ObjectMapper()

  private def client(): HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10))
      .build()

  private def get(c: HttpClient, url: String,
                  retries: Int, backoffMs: Long): HttpResponse[Array[Byte]] = {
    var attempt = 0
    var last: Either[Throwable, HttpResponse[Array[Byte]]] = null
    while (attempt <= retries) {
      try {
        val req = HttpRequest.newBuilder(URI.create(url))
          .header("Content-Type", "application/json")
          .GET().build()
        val resp = c.send(req, HttpResponse.BodyHandlers.ofByteArray())
        if (resp.statusCode() / 100 == 2) return resp
        last = Right(resp)
      } catch { case e: java.io.IOException => last = Left(e) }
      attempt += 1
      if (attempt <= retries && backoffMs > 0) Thread.sleep(backoffMs)
    }
    last match {
      case Right(resp) => throw new java.io.IOException(
        s"GET $url failed with HTTP ${resp.statusCode()} " +
          s"after ${retries + 1} attempt(s)")
      case Left(e) => throw new java.io.IOException(
        s"GET $url failed after ${retries + 1} attempt(s): ${e.getMessage}", e)
    }
  }

  private def json(c: HttpClient, url: String,
                   retries: Int, backoffMs: Long): JsonNode =
    mapper.readTree(get(c, url, retries, backoffMs).body())

  /** The file-download hop STREAMS to `target` via
    * `BodyHandlers.ofFile` — a multi-GB catalog file must never be
    * buffered whole in driver heap (the small JSON hops keep
    * `ofByteArray`). `ofFile` writes the body regardless of status,
    * so a non-2xx attempt deletes the partial file before retrying —
    * `target` only survives this method on a 2xx. */
  private def getToFile(c: HttpClient, url: String, target: Path,
                        retries: Int, backoffMs: Long): Unit = {
    var attempt = 0
    var last: Either[Throwable, Int] = null
    while (attempt <= retries) {
      try {
        val req = HttpRequest.newBuilder(URI.create(url))
          .header("Content-Type", "application/json")
          .GET().build()
        val resp = c.send(req, HttpResponse.BodyHandlers.ofFile(target))
        if (resp.statusCode() / 100 == 2) return
        last = Right(resp.statusCode())
        Files.deleteIfExists(target)
      } catch { case e: java.io.IOException =>
        last = Left(e); Files.deleteIfExists(target)
      }
      attempt += 1
      if (attempt <= retries && backoffMs > 0) Thread.sleep(backoffMs)
    }
    last match {
      case Right(code) => throw new java.io.IOException(
        s"GET $url failed with HTTP $code after ${retries + 1} attempt(s)")
      case Left(e) => throw new java.io.IOException(
        s"GET $url failed after ${retries + 1} attempt(s): ${e.getMessage}", e)
    }
  }

  /** Dataset ids of a collection, in the catalog's order —
    * `data.datasetMetadata[].datasetId`. Entries missing the id field
    * are skipped (the reference would KeyError). */
  def datasetIds(base: String, collectionId: String,
                 retries: Int = 2, backoffMs: Long = 100): Seq[String] = {
    // a negative retries would skip the attempt loop entirely and
    // surface as an opaque MatchError(null) — reject it up front
    require(retries >= 0, s"retries must be >= 0, got $retries")
    val url = s"$base/v2/public/api/collections/$collectionId/metadata" +
      "?withDatasetMetadata=true"
    val meta = json(client(), url, retries, backoffMs)
    val arr = meta.path("data").path("datasetMetadata")
    (0 until arr.size()).flatMap { i =>
      val id = arr.get(i).path("datasetId")
      if (id.isTextual) Some(id.asText()) else None
    }
  }

  /** The reference's filename parse, null-safe: the token between
    * `filename%3D` and the following `%22`-delimited pair. */
  private[sources] def filenameFromUrl(url: String): Option[String] = {
    val marker = url.indexOf("filename%3D")
    if (marker < 0) None
    else {
      val rest = url.substring(marker + "filename%3D".length)
      val parts = rest.split("%22", -1)
      if (parts.length >= 2 && parts(1).nonEmpty) Some(parts(1)) else None
    }
  }

  /** Resolve + download every dataset of `collectionId` into `outDir`
    * (created if absent), returning the per-dataset report in catalog
    * order. Relative `data.url` values resolve against `base` so the
    * loopback fixture can hand out self-links. */
  def downloadAll(base: String, collectionId: String, outDir: String,
                  retries: Int = 2, backoffMs: Long = 100): Seq[Fetch] = {
    require(retries >= 0, s"retries must be >= 0, got $retries")
    val dir = Paths.get(outDir)
    Files.createDirectories(dir)
    val c = client()
    datasetIds(base, collectionId, retries, backoffMs).map { id =>
      try {
        val poll = json(c,
          s"$base/v1/public/api/datasets/$id/poll-download",
          retries, backoffMs)
        val rawUrl = poll.path("data").path("url").asText("")
        if (rawUrl.isEmpty)
          Fetch(id, None, namedByFallback = false,
            Some("poll-download response carried no data.url"))
        else {
          val fileUrl =
            if (rawUrl.startsWith("http")) rawUrl else base + rawUrl
          // the filename is SERVER-CONTROLLED input: a separator or a
          // dot-segment ("../x") would resolve outside outDir, and a
          // leading '_'/'.' name is invisible to Spark's file scans
          // (and could shadow a completion marker) — such names fall
          // back to the dataset id, counted as namedByFallback
          val named = filenameFromUrl(rawUrl).filter(n =>
            !n.contains('/') && !n.contains('\\') && n != ".." &&
              !n.startsWith("_") && !n.startsWith("."))
          // the dataset id is catalog-controlled input too
          val name = named.getOrElse(
            id.replaceAll("[^A-Za-z0-9._-]", "_") + ".csv")
          val target = dir.resolve(name)
          val tmp = Files.createTempFile(dir, s".$name.", ".part")
          try {
            getToFile(c, fileUrl, tmp, retries, backoffMs)
            // atomic publish: a concurrent scan never sees a torn file
            Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
              StandardCopyOption.REPLACE_EXISTING)
          } finally Files.deleteIfExists(tmp)
          Fetch(id, Some(target), namedByFallback = named.isEmpty, None)
        }
      } catch {
        // NonFatal, not just IOException: a malformed catalog id makes
        // URI.create throw IllegalArgumentException before any I/O —
        // one bad entry must cost one dataset, never the batch
        case scala.util.control.NonFatal(e) =>
          Fetch(id, None, namedByFallback = false,
            Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
      }
    }
  }
}
