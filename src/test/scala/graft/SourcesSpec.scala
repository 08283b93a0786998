package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Generic source/sink round-trips beyond parquet + the lab text format:
  * CSV with header and JSON lines, schema preserved via explicit
  * StructType on read (schema-on-read, no inference at scale). */
class SourcesSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf0001)
    .select("doc_id", "lang", "source", "n_chars") // no free text: CSV-safe

  test("CSV round-trip with explicit schema") {
    val dir = Files.createTempDirectory("csv").toString + "/docs"
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(docs.schema).option("header", "true").csv(dir)
    assert(back.schema == docs.schema)
    assert(back.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
  }

  test("JSON-lines round-trip with explicit schema") {
    val dir = Files.createTempDirectory("json").toString + "/docs"
    docs.write.mode("overwrite").json(dir)
    val back = spark.read.schema(docs.schema).json(dir)
    assert(back.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
  }

  test("ORC round-trip preserves schema and rows") {
    val dir = Files.createTempDirectory("orc").toString + "/docs"
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == docs.schema)
    assert(back.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
  }

  test("text round-trip of the full documents text column") {
    val dir = Files.createTempDirectory("txt").toString + "/docs"
    val texts = Tables.documents(spark, sf0001).select("text")
    texts.write.mode("overwrite").text(dir)
    assert(spark.read.text(dir).count() == texts.count())
  }
}
