package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpServer => JdkHttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftDB

/** HTTP surface parity with the reference's web handler
  * (/root/reference/web/handler.go:115-124):
  *
  *  - `POST /insert/{stream}` — body is JSON lines
  *    `{"ts": <epochMillis|RFC3339>, "dims": {..}, "vals": {..}}`
  *    (web/insert.go:22-47). Parsed by Spark's JSON reader, dims/vals
  *    flattened to columns, routed through [[GraftDB.insert]].
  *  - `GET/POST /run` — zenodb-dialect SQL (query param `sql` or body);
  *    responds with JSON rows plus approximate per-column cardinalities
  *    (the reference attaches HLL estimates, web/query.go:303-327 — here
  *    `approx_count_distinct`).
  *
  * Built on the JDK server: zero extra dependencies, good enough for an
  * embedded control plane (the data plane is Spark itself).
  */
final class HttpServer(spark: SparkSession, db: GraftDB, port: Int) {

  private val server = JdkHttpServer.create(new InetSocketAddress(port), 0)

  def start(): Int = {
    server.createContext("/insert/", (ex: HttpExchange) => handle(ex) {
      val stream = ex.getRequestURI.getPath.stripPrefix("/insert/")
      val body = new String(ex.getRequestBody.readAllBytes, StandardCharsets.UTF_8)
      val n = insertJsonLines(stream, body)
      s"""{"inserted":$n}"""
    })
    server.createContext("/run", (ex: HttpExchange) => handle(ex) {
      val q = Option(ex.getRequestURI.getQuery)
        .flatMap(_.split("&").find(_.startsWith("sql=")))
        .map(s => java.net.URLDecoder.decode(s.stripPrefix("sql="), "UTF-8"))
        .getOrElse(new String(ex.getRequestBody.readAllBytes, StandardCharsets.UTF_8))
      runToJson(q)
    })
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = server.stop(0)

  private def handle(ex: HttpExchange)(body: => String): Unit = {
    val (code, payload) =
      try (200, body)
      catch {
        case e: Exception =>
          (400, s"""{"error":${jsonStr(String.valueOf(e.getMessage))}}""")
      }
    val bytes = payload.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** Parse zenodb point JSON-lines and insert into `stream`. */
  def insertJsonLines(stream: String, jsonLines: String): Long =
    PointsJson.insert(spark, db, stream, jsonLines)

  /** Run dialect SQL, return rows + per-column approximate cardinalities. */
  def runToJson(sql: String): String = {
    val df = db.sql(sql)
    val rows = df.toJSON.collect().mkString("[", ",", "]")
    val cardCols = df.columns.map(c =>
      approx_count_distinct(col(s"`$c`")).cast("long").as(c))
    val cards =
      if (df.columns.isEmpty) "{}"
      else df.agg(cardCols.head, cardCols.tail: _*).toJSON.collect()
        .headOption.getOrElse("{}")
    s"""{"rows":$rows,"cardinalities":$cards}"""
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
}
