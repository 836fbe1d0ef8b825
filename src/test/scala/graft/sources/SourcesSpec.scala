package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-8 interchange additions: Avro (by class name — the runtime
  * bundles the format but not its registration), and the binaryFile
  * multimodal front door. XML's adversarial escaping is certified by
  * the xml_source gate over the full documents fixture; here the edge
  * shapes: nulls through Avro, glob pruning + downstream decode for
  * binary ingest. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val AvroFmt = "org.apache.spark.sql.avro.AvroFileFormat"

  test("avro roundtrip: nulls and mixed types survive value-exact") {
    val df = Seq(
      (1L, Option("a&<b>\nc"), Option(10L)),
      (2L, None, None),
      (3L, Option(""), Option(-5L))
    ).toDF("id", "s", "n")
    val dir = java.nio.file.Files.createTempDirectory("avro_spec_").toString
    df.write.mode("overwrite").format(AvroFmt).save(dir)
    val back = spark.read.schema(df.schema).format(AvroFmt).load(dir)
    assert(back.as[(Long, Option[String], Option[Long])].collect().toSet ===
      df.as[(Long, Option[String], Option[Long])].collect().toSet)
  }

  test("binaryFile ingest: glob prunes at listing, content decodes downstream") {
    val docs = Seq((7L, "seven µ ünïcode"), (42L, "forty-two")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bin_spec_").toString
    BinaryCorpus.writeTextFiles(docs, "doc_id", "text", dir)
    // a non-matching file the glob must exclude at LISTING time
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "999.bin"), Array[Byte](1, 2, 3))

    val got = BinaryCorpus.readBinaryDir(spark, dir)
    assert(got.count() === 2, "pathGlobFilter must exclude 999.bin")
    // the content column feeds Multimodal decode stages: utf-8 decode
    // reproduces the table text, and n_bytes counts BYTES not chars
    val back = got.select(col("doc_id"),
        decode(col("content"), "UTF-8").as("text"), col("n_bytes"))
      .as[(Long, String, Long)].collect()
      .map { case (k, t, n) => k -> ((t, n)) }.toMap
    assert(back(7L)._1 === "seven µ ünïcode")
    assert(back(7L)._2 === "seven µ ünïcode".getBytes("UTF-8").length.toLong)
    assert(back(7L)._2 > "seven µ ünïcode".length.toLong,
      "multi-byte chars must make n_bytes exceed char count")
    assert(back(42L) === (("forty-two", 9L)))
  }
}
