package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.KafkaTableFactory
import graft.sources.KafkaTableFactory.SparkKafkaWire

/** Real-socket integration for [[SparkKafkaWire]] — the one seam of
  * the kafka stack that FakeWire cannot exercise (this container has
  * neither a broker nor the spark-sql-kafka-0-10 jar, the documented
  * environmental residue carried since round 4).
  *
  * The spec self-activates the day an environment provides both:
  * set `KAFKA_BOOTSTRAP=host:port` (and put the kafka connector jar
  * on the classpath) and it runs the full
  * translate → SparkKafkaWire.read → decode path against a live
  * broker; otherwise every test cancels with the reason, costing
  * nothing. Topic: set `KAFKA_IT_TOPIC` (default `graft_it`); the
  * topic may be empty — an empty read still proves socket, DSv2
  * source wiring, and the record schema.
  */
class KafkaWireIntegrationSpec extends SparkSpec {

  private val bootstrap = sys.env.get("KAFKA_BOOTSTRAP")
  private val topic = sys.env.getOrElse("KAFKA_IT_TOPIC", "graft_it")

  private def kafkaJarPresent: Boolean =
    try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
    catch { case _: ClassNotFoundException => false }

  private def requireEnv(): String = {
    assume(bootstrap.isDefined,
      "KAFKA_BOOTSTRAP not set — skipping live-broker integration")
    assume(kafkaJarPresent,
      "spark-sql-kafka-0-10 jar not on classpath — skipping live-broker integration")
    bootstrap.get
  }

  test("SparkKafkaWire batch read reaches the broker and yields the kafka record schema") {
    val bs = requireEnv()
    val t = KafkaTableFactory.translate(Map(
      "connector" -> "kafka",
      "topic" -> topic,
      "properties.bootstrap.servers" -> bs,
      "format" -> "json",
      "scan.startup.mode" -> "earliest-offset"))
    val records = SparkKafkaWire.read(spark, t)
    // Spark's kafka relation schema — the contract decode() consumes
    val names = records.schema.fieldNames.toSet
    assert(Set("key", "value", "topic", "partition", "offset",
      "timestamp").subsetOf(names), s"unexpected kafka schema: $names")
    assert(records.count() >= 0L) // executes the scan over the socket
  }

  test("translate -> read -> decode round-trips a produced record") {
    val bs = requireEnv()
    val physical = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val t = KafkaTableFactory.translate(Map(
      "connector" -> "kafka",
      "topic" -> topic,
      "properties.bootstrap.servers" -> bs,
      "format" -> "json",
      "scan.startup.mode" -> "earliest-offset"))
    // produce one record through Spark's kafka sink (same jar), then
    // read it back through the factory path
    spark.createDataFrame(java.util.List.of(
        org.apache.spark.sql.Row("""{"id":1,"v":"live"}""")),
      StructType(Seq(StructField("value", StringType))))
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bs)
      .option("topic", topic)
      .save()
    val decoded = KafkaTableFactory.decode(SparkKafkaWire.read(spark, t), physical, t)
    val hit = decoded.filter(col("v") === "live")
    assert(hit.count() >= 1L, "produced record must come back through the wire")
    assert(hit.select("id").head().getLong(0) === 1L)
  }
}
