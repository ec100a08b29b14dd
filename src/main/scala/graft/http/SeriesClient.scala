package graft.http

import com.fasterxml.jackson.databind.JsonNode
import graft.functions.JsonPointersExpr
import graft.operators.SeriesEngine.SeriesQuery

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URLEncoder
import java.nio.charset.StandardCharsets.UTF_8

/**
 * Client SDK for a graft/seriesly HTTP endpoint — the Scala
 * counterpart of the reference's `serieslyclient` package
 * (serieslyclient/client.go, db.go, query.go): list/create/delete
 * databases, per-db info/compact/dump, document writes, and the
 * `_query` analytical call built from the same [[SeriesQuery]] the
 * engine executes. Pure HTTP — usable against this library's
 * [[SeriesHttp]] or an original seriesly server.
 */
class SeriesClient(baseUrl: String,
    client: HttpClient = HttpClient.newHttpClient()) {

  case class HttpError(status: Int, body: String)
    extends RuntimeException(s"HTTP $status: $body")

  private val base = baseUrl.stripSuffix("/")

  private def request(method: String, path: String, body: Option[String] = None,
      expect: Int = 200): String = {
    val b = HttpRequest.newBuilder(URI.create(base + path))
    val req = (body match {
      case Some(s) => b.method(method, HttpRequest.BodyPublishers.ofString(s))
      case None => b.method(method, HttpRequest.BodyPublishers.noBody())
    }).build()
    val res = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (res.statusCode() != expect) throw HttpError(res.statusCode(), res.body())
    res.body()
  }

  private def parse(s: String): JsonNode = JsonPointersExpr.mapper.readTree(s)

  /** GET /_all_dbs (client.go:52-66). */
  def list(): Seq[String] = {
    val arr = parse(request("GET", "/_all_dbs"))
    (0 until arr.size()).map(arr.get(_).asText())
  }

  /** PUT /{db} (client.go:74-90). */
  def create(db: String): Unit = request("PUT", s"/$db", expect = 201)

  /** DELETE /{db} (client.go:93-109). */
  def delete(db: String): Unit = request("DELETE", s"/$db")

  def db(name: String): Db = new Db(name)

  /** Per-db operations (serieslyclient/db.go). */
  class Db private[SeriesClient] (val name: String) {

    case class Info(docCount: Long, spaceUsed: Long, lastSeq: Long)

    /** GET /{db} (db.go:32-46). */
    def info(): Info = {
      val n = parse(request("GET", s"/$name"))
      Info(n.get("doc_count").asLong(), n.get("space_used").asLong(),
        n.get("last_seq").asLong())
    }

    /** POST /{db}/_compact (db.go:48-64). */
    def compact(): Unit = request("POST", s"/$name/_compact")

    /** POST /{db}[?ts=] — returns the assigned canonical key. */
    def store(doc: String, ts: Option[String] = None): String = {
      val q = ts.fold("")(t => s"?ts=${URLEncoder.encode(t, UTF_8)}")
      parse(request("POST", s"/$name$q", Some(doc), expect = 201))
        .get("id").asText()
    }

    /** PUT /{db}/{key}. */
    def put(key: String, doc: String): Unit =
      request("PUT", s"/$name/${URLEncoder.encode(key, UTF_8)}", Some(doc),
        expect = 201)

    /** GET /{db}/{key} — None on 404. */
    def get(key: String): Option[String] = {
      val res = client.send(
        HttpRequest.newBuilder(
          URI.create(s"$base/$name/${URLEncoder.encode(key, UTF_8)}"))
          .GET().build(),
        HttpResponse.BodyHandlers.ofString())
      res.statusCode() match {
        case 200 => Some(res.body())
        case 404 => None
        case c => throw HttpError(c, res.body())
      }
    }

    /** GET /{db}/_dump — raw JSON lines (db.go:78-104). */
    def dump(from: Option[String] = None, to: Option[String] = None): String =
      request("GET", s"/$name/_dump${rangeQuery(from, to)}")

    /** GET /{db}/_query — parameters built from the same [[SeriesQuery]]
     * the engine runs (query.go:48-67's Params): one ptr+reducer pair
     * per field, f/fv filter pairs, group in ms. Returns the response
     * object keyed by bucket-start ms. */
    def query(q: SeriesQuery): JsonNode = {
      val params = Seq(s"group=${q.groupMs}") ++
        q.ptrs.map(p => s"ptr=${URLEncoder.encode(p, UTF_8)}") ++
        q.reducers.map(r => s"reducer=${URLEncoder.encode(r, UTF_8)}") ++
        q.filters.flatMap { case (f, v) =>
          Seq(s"f=${URLEncoder.encode(f, UTF_8)}",
            s"fv=${URLEncoder.encode(v, UTF_8)}") } ++
        q.from.map(f => s"from=${URLEncoder.encode(f, UTF_8)}") ++
        q.to.map(t => s"to=${URLEncoder.encode(t, UTF_8)}")
      parse(request("GET", s"/$name/_query?${params.mkString("&")}"))
    }

    private def rangeQuery(from: Option[String], to: Option[String]): String = {
      val ps = from.map(f => s"from=${URLEncoder.encode(f, UTF_8)}").toSeq ++
        to.map(t => s"to=${URLEncoder.encode(t, UTF_8)}")
      if (ps.isEmpty) "" else ps.mkString("?", "&", "")
    }
  }
}
