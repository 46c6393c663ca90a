package graft.sources

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema => ASchema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.config.YamlConfig
import graft.config.YamlConfig.ConfigError

/** AvroBridge: the no-connector avro path (binaryFile list/stream + serde
  * decode). The round-trip tests alone could hide a SYMMETRIC encode/decode
  * bug, so both directions are also pinned asymmetrically against the plain
  * Apache Avro library: files hand-built with GenericData must decode to the
  * expected Spark values, and bridge-written files must read back with a bare
  * GenericDatumReader showing the expected raw Avro values. */
class AvroBridgeSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  // ---------------------------------------------------------- hand-built read

  test("decodes a hand-built avro file: primitives, logical types, enum, fixed") {
    val schema = new ASchema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"i","type":"int"},
        |{"name":"l","type":"long"},
        |{"name":"s","type":["null","string"],"default":null},
        |{"name":"d","type":{"type":"int","logicalType":"date"}},
        |{"name":"ts","type":{"type":"long","logicalType":"timestamp-millis"}},
        |{"name":"dec","type":{"type":"bytes","logicalType":"decimal","precision":10,"scale":2}},
        |{"name":"e","type":{"type":"enum","name":"col","symbols":["RED","BLUE"]}},
        |{"name":"fx","type":{"type":"fixed","name":"f4","size":4}},
        |{"name":"tags","type":{"type":"array","items":"string"}},
        |{"name":"kv","type":{"type":"map","values":"long"}}
        |]}""".stripMargin)
    val dir = tmp("avro-hand")
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(s"$dir/a.avro"))
    val rec = new GenericData.Record(schema)
    rec.put("i", 7)
    rec.put("l", 123456789012L)
    rec.put("s", "hi")
    rec.put("d", 19000) // 2022-01-08
    rec.put("ts", 1700000000123L) // millis
    rec.put("dec", java.nio.ByteBuffer.wrap(
      java.math.BigDecimal.valueOf(1234, 2).unscaledValue().toByteArray))
    rec.put("e", new GenericData.EnumSymbol(schema.getField("e").schema(), "BLUE"))
    rec.put("fx", new GenericData.Fixed(schema.getField("fx").schema(),
      Array[Byte](1, 2, 3, 4)))
    rec.put("tags", java.util.List.of("a", "b"))
    rec.put("kv", java.util.Map.of("x", java.lang.Long.valueOf(9L)))
    w.append(rec)
    // second record exercises the null union branch
    val rec2 = new GenericData.Record(schema)
    rec2.put("i", 8); rec2.put("l", 1L); rec2.put("s", null)
    rec2.put("d", 0); rec2.put("ts", 0L)
    rec2.put("dec", java.nio.ByteBuffer.wrap(
      java.math.BigDecimal.valueOf(-50, 2).unscaledValue().toByteArray))
    rec2.put("e", new GenericData.EnumSymbol(schema.getField("e").schema(), "RED"))
    rec2.put("fx", new GenericData.Fixed(schema.getField("fx").schema(),
      Array[Byte](0, 0, 0, 0)))
    rec2.put("tags", java.util.List.of())
    rec2.put("kv", java.util.Map.of())
    w.append(rec2)
    w.close()

    val target = AvroBridge.inferSchema(spark, dir)
    assert(target("d").dataType == DateType)
    assert(target("ts").dataType == TimestampType)
    assert(target("dec").dataType == DecimalType(10, 2))
    assert(target("e").dataType == StringType)
    assert(target("fx").dataType == BinaryType)
    assert(target("s").nullable)

    val out = AvroBridge.decode(
      spark.read.format("binaryFile").load(dir), target)
      .orderBy("i").collect()
    assert(out.length == 2)
    val r0 = out(0)
    assert(r0.getAs[Int]("i") == 7)
    assert(r0.getAs[Long]("l") == 123456789012L)
    assert(r0.getAs[String]("s") == "hi")
    assert(r0.getAs[java.sql.Date]("d").toLocalDate ==
      java.time.LocalDate.ofEpochDay(19000))
    assert(r0.getAs[java.sql.Timestamp]("ts").getTime == 1700000000123L)
    assert(r0.getAs[java.math.BigDecimal]("dec") ==
      java.math.BigDecimal.valueOf(1234, 2))
    assert(r0.getAs[String]("e") == "BLUE")
    assert(r0.getAs[Array[Byte]]("fx").toSeq == Seq[Byte](1, 2, 3, 4))
    assert(r0.getSeq[String](r0.fieldIndex("tags")) == Seq("a", "b"))
    assert(r0.getMap[String, Long](r0.fieldIndex("kv")) == Map("x" -> 9L))
    assert(out(1).isNullAt(out(1).fieldIndex("s")))
    assert(out(1).getAs[java.math.BigDecimal]("dec") ==
      java.math.BigDecimal.valueOf(-50, 2))
  }

  // ------------------------------------------------------- asymmetric write

  test("bridge-written files are plain avro: bare GenericDatumReader sees raw values") {
    val dir = tmp("avro-raw")
    val df = Seq(
      (1, "a", java.sql.Date.valueOf("2024-03-01"),
        java.sql.Timestamp.valueOf("2024-03-01 12:30:45.123456")),
      (2, "b", java.sql.Date.valueOf("1970-01-02"),
        new java.sql.Timestamp(0L))
    ).toDF("id", "name", "d", "ts").coalesce(1)
    AvroBridge.write(df, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length == 1)
    val rd = new DataFileReader(files.head, new GenericDatumReader[GenericRecord]())
    val recs = rd.iterator().asScala.toList
    rd.close()
    assert(recs.map(_.get("id")) == List(1, 2))
    assert(recs.map(_.get("name").toString) == List("a", "b"))
    // date is raw epoch-day int with a date logical type
    assert(recs.head.get("d") ==
      java.sql.Date.valueOf("2024-03-01").toLocalDate.toEpochDay.toInt)
    // timestamp is raw MICROS (timestamp-micros logical type)
    val expectedUs = java.sql.Timestamp.valueOf("2024-03-01 12:30:45.123456")
    assert(recs.head.get("ts") ==
      expectedUs.getTime / 1000 * 1000000 + expectedUs.getNanos / 1000 % 1000000)
    val tsField = rd.getSchema.getField("ts").schema().getTypes.asScala
      .find(_.getType != ASchema.Type.NULL).get
    assert(tsField.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros])
  }

  // ------------------------------------------------------------- round trip

  test("write/decode round trip: nested struct, array, map, decimal, binary, nulls") {
    val dir = tmp("avro-rt")
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("dec", DecimalType(12, 3)),
      StructField("bin", BinaryType),
      StructField("arr", ArrayType(IntegerType)),
      StructField("kv", MapType(StringType, DoubleType)),
      StructField("nest", StructType(Seq(
        StructField("x", StringType), StructField("y", LongType))))))
    val rows = Seq(
      Row(1L, new java.math.BigDecimal("12.345"), Array[Byte](5, 6),
        Seq(1, 2, 3), Map("a" -> 1.5), Row("in", 9L)),
      Row(2L, null, null, null, null, Row(null, null)),
      Row(3L, new java.math.BigDecimal("-0.001"), Array[Byte](),
        Seq(), Map(), null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    AvroBridge.write(df, dir)
    val back = AvroBridge.decode(spark.read.format("binaryFile").load(dir),
      AvroBridge.inferSchema(spark, dir))
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val got = back.orderBy("id").collect()
    assert(got.length == 3)
    assert(got(0).getAs[java.math.BigDecimal]("dec") == new java.math.BigDecimal("12.345"))
    assert(got(0).getSeq[Int](got(0).fieldIndex("arr")) == Seq(1, 2, 3))
    assert(got(0).getMap[String, Double](got(0).fieldIndex("kv")) == Map("a" -> 1.5))
    assert(got(0).getAs[Row]("nest") == Row("in", 9L))
    assert(got(1).isNullAt(1) && got(1).isNullAt(2) && got(1).isNullAt(3))
    assert(got(1).getAs[Row]("nest") == Row(null, null))
    assert(got(2).isNullAt(got(2).fieldIndex("nest")))
    assert(got(2).getSeq[Int](got(2).fieldIndex("arr")) == Seq())
  }

  // ------------------------------------------- inference merge and evolution

  test("inferSchema merges schemas across files; missing fields go nullable") {
    val dir = tmp("avro-merge")
    AvroBridge.write(Seq((1, "a")).toDF("id", "name"), s"$dir/f1")
    AvroBridge.write(Seq((2, 3.5)).toDF("id", "score"), s"$dir/f2")
    // move both under one root
    new java.io.File(s"$dir/f1").listFiles().filter(_.getName.endsWith(".avro"))
      .foreach(f => f.renameTo(new java.io.File(dir, "a_" + f.getName)))
    new java.io.File(s"$dir/f2").listFiles().filter(_.getName.endsWith(".avro"))
      .foreach(f => f.renameTo(new java.io.File(dir, "b_" + f.getName)))
    val merged = AvroBridge.inferSchema(spark, dir)
    assert(merged.fieldNames.toSeq == Seq("id", "name", "score"))
    assert(merged("name").nullable && merged("score").nullable)
    val rows = AvroBridge.decode(spark.read.format("binaryFile").load(dir), merged)
      .orderBy("id").collect()
    assert(rows(0).getAs[String]("name") == "a" && rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).getAs[Double]("score") == 3.5)
  }

  test("inferSchema: same field with conflicting types is a loud error") {
    val dir = tmp("avro-conflict")
    AvroBridge.write(Seq((1, "a")).toDF("id", "v"), s"$dir/f1")
    AvroBridge.write(Seq((2, 2.0)).toDF("id", "v"), s"$dir/f2")
    new java.io.File(s"$dir/f1").listFiles().filter(_.getName.endsWith(".avro"))
      .foreach(f => f.renameTo(new java.io.File(dir, "a_" + f.getName)))
    new java.io.File(s"$dir/f2").listFiles().filter(_.getName.endsWith(".avro"))
      .foreach(f => f.renameTo(new java.io.File(dir, "b_" + f.getName)))
    val e = intercept[ConfigError](AvroBridge.inferSchema(spark, dir))
    assert(e.getMessage.contains("conflicting types"))
  }

  test("non-avro file in the directory errors naming the file") {
    val dir = tmp("avro-bad")
    Files.write(java.nio.file.Paths.get(dir, "junk.avro"),
      "not avro at all".getBytes)
    val e = intercept[ConfigError](AvroBridge.inferSchema(spark, dir))
    assert(e.getMessage.contains("junk.avro"))
  }

  test("decodes deflate- and snappy-compressed containers (wild-file codecs)") {
    // deflate rides the JDK zlib; snappy rides snappy-java, which ships with
    // Spark itself — both decode with zero extra deps
    for ((codec, name) <- Seq(
        (org.apache.avro.file.CodecFactory.deflateCodec(6), "deflate"),
        (org.apache.avro.file.CodecFactory.snappyCodec(), "snappy"))) {
      val dir = tmp(s"avro-$name")
      val schema = SchemaBuilder.record("r").fields()
        .requiredInt("id").requiredString("v").endRecord()
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      w.setCodec(codec)
      w.create(schema, new java.io.File(s"$dir/c.avro"))
      (1 to 100).foreach { i =>
        val r = new GenericData.Record(schema)
        r.put("id", i); r.put("v", s"val$i")
        w.append(r)
      }
      w.close()
      val out = AvroBridge.decode(spark.read.format("binaryFile").load(dir),
        AvroBridge.inferSchema(spark, dir))
      assert(out.count() == 100, s"codec $name")
      assert(out.orderBy("id").head().getString(1) == "val1", s"codec $name")
    }
  }

  test("complex unions (beyond [null, T]) are refused loudly") {
    val u = SchemaBuilder.record("r").fields()
      .name("v").`type`(ASchema.createUnion(java.util.List.of(
        ASchema.create(ASchema.Type.INT), ASchema.create(ASchema.Type.STRING))))
      .noDefault().endRecord()
    val e = intercept[ConfigError](AvroBridge.toStruct(u))
    assert(e.getMessage.contains("union"))
    // ...and on the DECODE path too: a declared table_schema bypasses
    // toStruct, so the per-file converter must refuse rather than pick a
    // branch and die in a nameless ClassCastException per record
    val dir = tmp("avro-union-decode")
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](u))
    w.create(u, new java.io.File(s"$dir/u.avro"))
    val rec = new GenericData.Record(u); rec.put("v", "str")
    w.append(rec); w.close()
    val target = StructType(Seq(StructField("v", IntegerType)))
    val e2 = intercept[Exception] {
      AvroBridge.decode(spark.read.format("binaryFile").load(dir), target).collect()
    }
    assert(e2.getMessage.contains("non-null branches"), e2.getMessage)
  }

  test("recursive record schemas are refused loudly, not StackOverflow") {
    val json =
      """{"type":"record","name":"node","fields":[
        |{"name":"v","type":"int"},
        |{"name":"next","type":["null","node"],"default":null}]}""".stripMargin
    val rec = new ASchema.Parser().parse(json)
    val e = intercept[ConfigError](AvroBridge.toStruct(rec))
    assert(e.getMessage.contains("recursive"), e.getMessage)
  }

  test("inference matches binaryFile's non-recursive default; recursiveFileLookup opts in") {
    val dir = tmp("avro-recurse")
    AvroBridge.write(Seq((1, "a")).toDF("id", "v"), dir)
    AvroBridge.write(Seq((2, 9.9)).toDF("id", "score"), s"$dir/nested")
    // default: nested subdir invisible (matches binaryFile decode listing)
    assert(AvroBridge.inferSchema(spark, dir).fieldNames.toSeq == Seq("id", "v"))
    // opt-in recursion sees the nested file's columns too
    val rec = AvroBridge.inferSchema(spark, dir,
      Map("recursiveFileLookup" -> "true"))
    // merge order follows path sort; the field SET is the contract here
    assert(rec.fieldNames.toSet == Set("id", "v", "score"))
  }

  test("inference prunes hidden directories like Spark's file index") {
    val dir = tmp("avro-hidden")
    AvroBridge.write(Seq((1, "a")).toDF("id", "v"), dir)
    // a file-sink metadata dir whose LEAF names are not underscore-prefixed
    Files.createDirectories(java.nio.file.Paths.get(dir, "_spark_metadata"))
    Files.write(java.nio.file.Paths.get(dir, "_spark_metadata", "0"),
      "{\"not\":\"avro\"}".getBytes)
    val st = AvroBridge.inferSchema(spark, dir)
    assert(st.fieldNames.toSeq == Seq("id", "v"))
  }

  test("an empty landing file decodes as zero rows, not a failed batch") {
    val dir = tmp("avro-empty")
    AvroBridge.write(Seq((1, "a")).toDF("id", "v"), dir)
    Files.write(java.nio.file.Paths.get(dir, "touched.avro"), Array[Byte]())
    // binaryFile lists the 0-byte file; decode must skip it
    val out = AvroBridge.decode(spark.read.format("binaryFile").load(dir),
      AvroBridge.inferSchema(spark, dir))
    assert(out.count() == 1)
  }

  test("case-distinct writer fields matching one target are a loud error") {
    val schema = new ASchema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"ID","type":"int"},{"name":"id","type":"string"}]}""".stripMargin)
    val dir = tmp("avro-case")
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(s"$dir/c.avro"))
    val rec = new GenericData.Record(schema)
    rec.put("ID", 1); rec.put("id", "x")
    w.append(rec); w.close()
    // exact-name resolution still works for both spellings
    val exact = AvroBridge.decode(spark.read.format("binaryFile").load(dir),
      StructType(Seq(StructField("ID", IntegerType), StructField("id", StringType))))
      .head()
    assert(exact.getInt(0) == 1 && exact.getString(1) == "x")
    // a third spelling matching both case-insensitively must refuse
    val e = intercept[Exception] {
      AvroBridge.decode(spark.read.format("binaryFile").load(dir),
        StructType(Seq(StructField("Id", LongType)))).collect()
    }
    assert(e.getMessage.contains("case-distinct"), e.getMessage)
  }

  test("timestamp unit detection is strict: NTZ-vs-TZ and bare-long mismatches are loud") {
    val dir = tmp("avro-tsstrict")
    // bridge writer emits local-timestamp-micros for NTZ columns
    val df = Seq(Tuple1(java.time.LocalDateTime.of(2024, 1, 1, 12, 0))).toDF("ts")
    assert(df.schema("ts").dataType == TimestampNTZType)
    AvroBridge.write(df, dir)
    // reading it back AS TIMESTAMP (tz) must fail, not be guessed as millis
    val e1 = intercept[Exception] {
      AvroBridge.decode(spark.read.format("binaryFile").load(dir),
        StructType(Seq(StructField("ts", TimestampType)))).collect()
    }
    assert(e1.getMessage.contains("cannot read"), e1.getMessage)
    // a bare long declared as timestamp must also fail
    val dir2 = tmp("avro-barelong")
    AvroBridge.write(Seq(Tuple1(1700000000L)).toDF("ts"), dir2)
    val e2 = intercept[Exception] {
      AvroBridge.decode(spark.read.format("binaryFile").load(dir2),
        StructType(Seq(StructField("ts", TimestampNTZType)))).collect()
    }
    assert(e2.getMessage.contains("cannot read"), e2.getMessage)
  }

  test("merge tolerates nested-nullability-only differences across files") {
    val dir = tmp("avro-nestnull")
    // file A: array items NON-null (external writers commonly do this)
    val sa = new ASchema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"id","type":"int"},
        |{"name":"tags","type":{"type":"array","items":"string"}}]}""".stripMargin)
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](sa))
    w.create(sa, new java.io.File(s"$dir/a.avro"))
    val ra = new GenericData.Record(sa)
    ra.put("id", 1); ra.put("tags", java.util.List.of("x"))
    w.append(ra); w.close()
    // file B: bridge-written (items are [null,string] -> containsNull=true)
    AvroBridge.write(Seq((2, Seq("y"))).toDF("id", "tags"), s"$dir/b")
    new java.io.File(s"$dir/b").listFiles().filter(_.getName.endsWith(".avro"))
      .foreach(f => f.renameTo(new java.io.File(dir, "b_" + f.getName)))
    val st = AvroBridge.inferSchema(spark, dir)
    assert(st("tags").dataType == ArrayType(StringType, containsNull = true))
    val rows = AvroBridge.decode(spark.read.format("binaryFile").load(dir), st)
      .orderBy("id").collect()
    assert(rows.map(r => r.getSeq[String](1).head).toSeq == Seq("x", "y"))
  }

  test("decode coerces int->long / float->double (merge-widened targets)") {
    val dir = tmp("avro-widen")
    AvroBridge.write(Seq((1, 2.0f)).toDF("id", "v"), dir)
    val target = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType)))
    val r = AvroBridge.decode(spark.read.format("binaryFile").load(dir), target).head()
    assert(r.getAs[Long]("id") == 1L && r.getAs[Double]("v") == 2.0)
  }

  test("decode with an un-coercible target is a loud per-field error") {
    val dir = tmp("avro-uncoerce")
    AvroBridge.write(Seq((1L, "x")).toDF("id", "v"), dir)
    val target = StructType(Seq(StructField("id", IntegerType),
      StructField("v", StringType)))
    val e = intercept[Exception] {
      AvroBridge.decode(spark.read.format("binaryFile").load(dir), target).collect()
    }
    assert(e.getMessage != null)
  }

  // --------------------------------------------------- runner E2E (streaming)

  test("cloudfiles avro stream ingests exactly-once across runs through the runner") {
    val dir = tmp("avro-e2e")
    val store = new graft.exec.TableStore(spark, s"$dir/wh")
    val runner = new graft.exec.PipelineRunner(spark, store, s"$dir/cp")
    val landing = s"$dir/landing"
    val yaml =
      s"""pipeline: p
         |flowgroup: fg
         |actions:
         |  - name: l
         |    type: load
         |    source:
         |      type: cloudfiles
         |      path: $landing
         |      format: avro
         |      readMode: stream
         |    target: v
         |  - name: w
         |    type: write
         |    source: v
         |    write_target: {type: streaming_table, table: avro_t}
         |""".stripMargin
    AvroBridge.write(Seq((1, "a"), (2, "b")).toDF("id", "v"), landing)
    runner.run(YamlConfig.parseFlowGroup(yaml))
    assert(store.read("avro_t").count() == 2)
    AvroBridge.write(Seq((3, "c")).toDF("id", "v"), s"$dir/stage2")
    new java.io.File(s"$dir/stage2").listFiles().filter(_.getName.endsWith(".avro"))
      .foreach(f => f.renameTo(new java.io.File(landing, "n_" + f.getName)))
    runner.run(YamlConfig.parseFlowGroup(yaml))
    // third run, no new files: no re-reads
    runner.run(YamlConfig.parseFlowGroup(yaml))
    val out = store.read("avro_t").orderBy("id").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    assert(out.map(_.getString(1)).toSeq == Seq("a", "b", "c"))
  }

  test("cloudfiles avro batch read honors declared schema with coercion") {
    val dir = tmp("avro-batch")
    val store = new graft.exec.TableStore(spark, s"$dir/wh")
    val runner = new graft.exec.PipelineRunner(spark, store, s"$dir/cp")
    val landing = s"$dir/landing"
    AvroBridge.write(Seq((1, "a"), (2, "b")).toDF("id", "v"), landing)
    val yaml =
      s"""pipeline: p
         |flowgroup: fg
         |actions:
         |  - name: l
         |    type: load
         |    source:
         |      type: cloudfiles
         |      path: $landing
         |      format: avro
         |      readMode: batch
         |      table_schema: "id BIGINT, v STRING"
         |    target: v
         |  - name: w
         |    type: write
         |    source: v
         |    write_target: {type: materialized_view, table: avro_mv}
         |""".stripMargin
    runner.run(YamlConfig.parseFlowGroup(yaml))
    val out = store.read("avro_mv")
    assert(out.schema("id").dataType == LongType)
    assert(out.count() == 2)
  }
}
