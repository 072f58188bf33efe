package graft.avro

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.io.InputStream
import java.net.{HttpURLConnection, InetSocketAddress, URL}
import java.nio.charset.StandardCharsets

/** HTTP transport for the schema repository — the reference's REST
  * client shape (`mypipe-avro/src/main/scala/mypipe/avro/schema/
  * GenericSchemaRepository.scala:10-35`, an AVRO-1124 repository
  * client) re-expressed as a thin JDK-http layer behind the SAME
  * [[SchemaRepo]] trait, so the in-memory registry, the HTTP client,
  * and the [[CachingSchemaRepoClient]] stale-cache wrapper compose in
  * any order. Wrapping [[HttpSchemaRepo]] in a CachingSchemaRepoClient
  * reproduces the reference's consumer retry dance over a real wire:
  * cache hit → zero HTTP traffic per record; miss → flush + one
  * re-fetch (`KafkaAvroDecoder.scala:61-64`).
  *
  * REST surface (one resource per trait operation):
  * {{{
  *   POST /subjects/{subject}          body=schema → 200 "<id>"   (register)
  *   POST /subjects/{subject}/lookup   body=schema → 200 "<id>" | 404 (idOf)
  *   GET  /subjects/{subject}/latest   → 200 "<id>\n<schema>" | 404
  *   GET  /ids/{id}                    → 200 schema | 404
  * }}}
  *
  * Deployment note: only the DRIVER talks to the repository (schemas
  * resolve into plan literals / broadcast state; executors never make
  * HTTP calls per record) — so client latency is per-ALTER, not
  * per-row, exactly like the reference's producer/consumer caches.
  * The in-process server exists for loopback tests and sandboxes; a
  * real deployment points [[HttpSchemaRepo]] at the fleet registry.
  */
object SchemaRepoHttp {

  /** Serve `backing` over loopback HTTP on an ephemeral port. Caller
    * owns the lifecycle (`stop(0)`). */
  def serve(backing: SchemaRepo): HttpServer = {
    val server = HttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => handle(backing, ex))
    server.setExecutor(null) // single dispatcher: registry ops are cheap
    server.start()
    server
  }

  def baseUrl(server: HttpServer): String =
    s"http://127.0.0.1:${server.getAddress.getPort}"

  private def readAll(in: InputStream): String = {
    val bytes = in.readAllBytes()
    new String(bytes, StandardCharsets.UTF_8)
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def handle(repo: SchemaRepo, ex: HttpExchange): Unit =
    try {
      val method = ex.getRequestMethod
      // raw path: subjects arrive URL-encoded from the client, so a
      // subject containing "/" stays one path segment until WE decode
      val parts = ex.getRequestURI.getRawPath.split("/").filter(_.nonEmpty)
        .map(java.net.URLDecoder.decode(_, "UTF-8"))
      (method, parts.toList) match {
        case ("GET", "ids" :: id :: Nil) =>
          repo.schemaById(id.toInt) match {
            case Some(s) => respond(ex, 200, s)
            case None => respond(ex, 404, "")
          }
        case ("GET", "subjects" :: subject :: "latest" :: Nil) =>
          repo.latest(subject) match {
            case Some((id, s)) => respond(ex, 200, s"$id\n$s")
            case None => respond(ex, 404, "")
          }
        case ("POST", "subjects" :: subject :: "lookup" :: Nil) =>
          val schema = readAll(ex.getRequestBody)
          repo.idOf(subject, schema) match {
            case Some(id) => respond(ex, 200, id.toString)
            case None => respond(ex, 404, "")
          }
        case ("POST", "subjects" :: subject :: Nil) =>
          val schema = readAll(ex.getRequestBody)
          respond(ex, 200, repo.register(subject, schema).toString)
        case _ =>
          respond(ex, 404, "")
      }
    } catch {
      case e: Exception => respond(ex, 500, String.valueOf(e.getMessage))
    }
}

/** [[SchemaRepo]] backed by a remote repository over HTTP — the
  * client half of [[SchemaRepoHttp]]'s surface. Lookups return None on
  * 404 (unknown id / subject / schema) and throw on transport errors,
  * mirroring the in-memory registry's Option contract so callers can't
  * tell the transports apart. */
class HttpSchemaRepo(baseUrl: String) extends SchemaRepo {

  private def request(method: String, path: String,
      body: Option[String]): Option[String] = {
    val conn = new URL(baseUrl + path).openConnection()
      .asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod(method)
      conn.setConnectTimeout(5000)
      conn.setReadTimeout(5000)
      body.foreach { b =>
        conn.setDoOutput(true)
        val out = conn.getOutputStream
        out.write(b.getBytes(StandardCharsets.UTF_8))
        out.close()
      }
      conn.getResponseCode match {
        case 200 =>
          val in = conn.getInputStream
          try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8))
          finally in.close()
        case 404 => None
        case other =>
          throw new java.io.IOException(
            s"schema repo $method $path -> HTTP $other")
      }
    } finally conn.disconnect()
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  override def register(subject: String, schemaJson: String): Int =
    request("POST", s"/subjects/${enc(subject)}", Some(schemaJson))
      .map(_.trim.toInt)
      .getOrElse(throw new java.io.IOException(
        s"register($subject) returned 404"))

  override def schemaById(id: Int): Option[String] =
    request("GET", s"/ids/$id", None)

  override def latest(subject: String): Option[(Int, String)] =
    request("GET", s"/subjects/${enc(subject)}/latest", None).map { s =>
      val nl = s.indexOf('\n')
      (s.substring(0, nl).toInt, s.substring(nl + 1))
    }

  override def idOf(subject: String, schemaJson: String): Option[Int] =
    request("POST", s"/subjects/${enc(subject)}/lookup", Some(schemaJson))
      .map(_.trim.toInt)
}
