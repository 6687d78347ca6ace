package graft.sources

import org.apache.hadoop.io.{BytesWritable, LongWritable, Text, Writable}
import org.apache.hadoop.mapred.SequenceFileOutputFormat
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Hadoop SequenceFile as a DDL format — the reference's
  * flink-formats/flink-sequence-file (SequenceFileWriterFactory.java
  * builds a bulk `SequenceFile.Writer<K extends Writable, V extends
  * Writable>` for the file sink; reading goes through Hadoop input
  * formats). Spark exposes SequenceFiles only through the RDD API, so
  * this format bridges: the declared schema must be exactly TWO
  * columns (key, value), each STRING (Text), BINARY (BytesWritable)
  * or BIGINT (LongWritable) — the same Writable pairs the reference's
  * factory is instantiated with in practice.
  *
  * Scale shape: reads parallelize per HDFS split like any Hadoop
  * input (SequenceFile sync markers make big files splittable), and
  * the write runs one writer per partition — both ends distributed,
  * nothing through the driver.
  */
object SequenceFileFormat {

  private def writableClass(dt: DataType, what: String): Class[_ <: Writable] =
    dt match {
      case StringType => classOf[Text]
      case BinaryType => classOf[BytesWritable]
      case LongType => classOf[LongWritable]
      case other => sys.error(
        s"sequence-file $what column type ${other.sql} is not a Writable " +
          "mapping (STRING=Text, BINARY=BytesWritable, BIGINT=LongWritable)")
    }

  def validate(schema: StructType): Unit = {
    require(schema.length == 2,
      s"sequence-file tables are (key, value) pairs — declare exactly 2 " +
        s"columns, got ${schema.length}")
    writableClass(schema.fields(0).dataType, "key")
    writableClass(schema.fields(1).dataType, "value")
  }

  private def fromWritable(w: Writable, dt: DataType): Any = dt match {
    case StringType => w.asInstanceOf[Text].toString
    // copyBytes, not getBytes: BytesWritable pads its backing buffer
    case BinaryType => w.asInstanceOf[BytesWritable].copyBytes()
    case LongType => w.asInstanceOf[LongWritable].get()
    case other => sys.error(s"sequence-file: unreadable type $other")
  }

  private def toWritable(v: Any, dt: DataType): Writable = dt match {
    case StringType => new Text(if (v == null) "" else v.asInstanceOf[String])
    case BinaryType => new BytesWritable(
      if (v == null) Array.emptyByteArray else v.asInstanceOf[Array[Byte]])
    case LongType => new LongWritable(if (v == null) 0L else v.asInstanceOf[Long])
    case other => sys.error(s"sequence-file: unwritable type $other")
  }

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    validate(schema)
    // Hadoop's FileInputFormat hides '_'/'.'-prefixed paths (its
    // hidden-file filter applies to the input directory itself), so a
    // table rooted at such a name would die with a misleading
    // "path does not exist" — reject it with the real reason
    val leaf = new org.apache.hadoop.fs.Path(path).getName
    require(!leaf.startsWith("_") && !leaf.startsWith("."),
      s"sequence-file path '$path': Hadoop input formats treat '_'/'.'-" +
        "prefixed paths as hidden — rename the directory")
    val kDt = schema.fields(0).dataType
    val vDt = schema.fields(1).dataType
    val rdd = spark.sparkContext.hadoopFile(path,
        classOf[org.apache.hadoop.mapred.SequenceFileInputFormat[Writable, Writable]],
        writableClass(kDt, "key").asInstanceOf[Class[Writable]],
        writableClass(vDt, "value").asInstanceOf[Class[Writable]])
      // Hadoop record readers REUSE writable instances — materialize
      // each record's values before the iterator advances
      .map { case (k, v) => Row(fromWritable(k, kDt), fromWritable(v, vDt)) }
    spark.createDataFrame(rdd, schema)
  }

  /** 'sequence-file.compression' → Hadoop codec (the reference's
    * SequenceFileWriterFactory takes the same codec-by-name).
    */
  private def codecFor(name: String): Class[_ <: org.apache.hadoop.io.compress.CompressionCodec] =
    name.toLowerCase(java.util.Locale.ROOT) match {
      case "gzip" => classOf[org.apache.hadoop.io.compress.GzipCodec]
      case "bzip2" => classOf[org.apache.hadoop.io.compress.BZip2Codec]
      case "deflate" => classOf[org.apache.hadoop.io.compress.DeflateCodec]
      case other => sys.error(
        s"sequence-file compression '$other' is not a bundled Hadoop codec " +
          "(gzip, bzip2, deflate are)")
    }

  def write(df: DataFrame, path: String, overwrite: Boolean,
      compression: Option[String] = None): Unit = {
    val schema = df.schema
    validate(schema)
    val kDt = schema.fields(0).dataType
    val vDt = schema.fields(1).dataType
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    if (overwrite && fs.exists(target)) fs.delete(target, true)
    require(overwrite || !fs.exists(target),
      s"sequence-file append is not supported (Hadoop output commit is " +
        s"whole-directory) — INSERT OVERWRITE $path instead")
    df.rdd.map(r => (toWritable(r.get(0), kDt), toWritable(r.get(1), vDt)))
      .saveAsHadoopFile(path,
        writableClass(kDt, "key"), writableClass(vDt, "value"),
        classOf[SequenceFileOutputFormat[Writable, Writable]],
        codec = compression.map(codecFor))
  }
}
