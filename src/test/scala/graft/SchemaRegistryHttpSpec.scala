package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{AvroConfluentFormat, HttpRegistryClient}

/** The avro-confluent HTTP hop, exercised for real: an in-process JDK
  * HttpServer speaks the PUBLIC Confluent Schema Registry REST API
  * (GET /schemas/ids/{id}, POST /subjects/{s}/versions with the
  * `{"schema": ...}` v1 envelope) and [[HttpRegistryClient]] talks to
  * it over an actual socket — the same client a production registry
  * url would get; only the url changes. This closes the deferred
  * "HTTP registry needs a reachable service" residue: the wire path
  * runs in this container.
  */
class SchemaRegistryHttpSpec extends SparkSpec {

  /** Minimal registry server: Confluent id semantics (global id per
    * distinct schema text, idempotent re-register).
    */
  private def withServer(f: String => Unit): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val byId = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val idBySchema = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val nextId = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/vnd.schemaregistry.v1+json")
      ex.sendResponseHeaders(code, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val path = ex.getRequestURI.getPath
      try path match {
        case p if p.startsWith("/schemas/ids/") =>
          val id = p.stripPrefix("/schemas/ids/").toInt
          Option(byId.get(id)) match {
            case Some(s) =>
              val node = mapper.createObjectNode(); node.put("schema", s)
              respond(ex, 200, mapper.writeValueAsString(node))
            case None =>
              respond(ex, 404, """{"error_code":40403,"message":"Schema not found"}""")
          }
        case p if p.startsWith("/subjects/") && p.endsWith("/versions") =>
          val body = new String(ex.getRequestBody.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8)
          val schema = mapper.readTree(body).get("schema").asText()
          val id = idBySchema.computeIfAbsent(schema,
            _ => Int.box(nextId.incrementAndGet()))
          byId.put(id, schema)
          val node = mapper.createObjectNode(); node.put("id", id.intValue())
          respond(ex, 200, mapper.writeValueAsString(node))
        case _ =>
          respond(ex, 404, """{"error_code":404,"message":"no such route"}""")
      } catch {
        case e: Exception =>
          respond(ex, 500, s"""{"error_code":500,"message":"${e.getMessage}"}""")
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("HTTP client register/resolve round-trip with Confluent id semantics") {
    withServer { url =>
      val c = HttpRegistryClient(url)
      // schema text with quotes + unicode exercises the JSON escaping
      val s1 = """{"type":"record","name":"r","doc":"café \"quoted\"","fields":[{"name":"a","type":"long"}]}"""
      val s2 = """{"type":"record","name":"r2","fields":[{"name":"b","type":"string"}]}"""
      val id1 = c.register("t-value", s1)
      val id2 = c.register("other-value", s2)
      assert(id1 != id2)
      // idempotent: same schema text -> same global id, any subject
      assert(c.register("third-value", s1) === id1)
      assert(c.schemaById(id1) === s1)
      assert(c.schemaById(id2) === s2)
      // unknown id fails loudly with the server's message
      val e = intercept[IllegalArgumentException](c.schemaById(999))
      assert(e.getMessage.contains("404"))
    }
  }

  test("avro-confluent encode/decode runs end-to-end over the HTTP wire") {
    withServer { url =>
      val schema = StructType(Seq(
        StructField("k", LongType), StructField("v", StringType)))
      val opts = Map("avro-confluent.url" -> url)
      import spark.implicits._
      val df = Seq((1L, "café"), (2L, "b")).toDF("k", "v")
      val out = df
        .select(AvroConfluentFormat.encode(
          struct(col("k"), col("v")), schema, opts, "", "events").as("payload"))
        .select(AvroConfluentFormat.decode(col("payload"), schema, opts).as("m"))
        .select(col("m.k").as("k"), col("m.v").as("v"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(out === Set((1L, "café"), (2L, "b")))
    }
  }
}
