package graft.store

import java.io.File
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Deletion-vector decoding + application. The test side carries its OWN
  * portable-roaring encoder (written from RoaringFormatSpec, independently
  * of the reader's decoder) so agreement is evidence about the format, not
  * a round-trip of one implementation's misunderstanding; container-type
  * unit tests pin array, bitmap, run, and multi-high-key layouts. */
class DeletionVectorSpec extends SparkSuite {
  import spark.implicits._

  // ---- test-side encoder (RoaringFormatSpec, array/bitmap containers) ----
  private def serialize32(values: Seq[Int]): Array[Byte] = {
    val byKey = values.distinct.sorted.map(v => (v >>> 16, v & 0xffff))
      .groupBy(_._1).toSeq.sortBy(_._1)
    val n = byKey.size
    val containerBytes = byKey.map { case (_, vs) =>
      if (vs.size > 4096) 8192 else 2 * vs.size }
    val buf = ByteBuffer.allocate(8 + 4 * n + 4 * n + containerBytes.sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(12346) // SERIAL_COOKIE_NO_RUNCONTAINER
    buf.putInt(n)
    byKey.foreach { case (k, vs) =>
      buf.putShort(k.toShort); buf.putShort((vs.size - 1).toShort) }
    var off = 8 + 8 * n
    containerBytes.foreach { cb => buf.putInt(off); off += cb }
    byKey.foreach { case (_, vs) =>
      if (vs.size > 4096) {
        val words = new Array[Long](1024)
        vs.foreach { case (_, low) => words(low >>> 6) |= 1L << (low & 63) }
        words.foreach(buf.putLong)
      } else vs.foreach { case (_, low) => buf.putShort(low.toShort) }
    }
    buf.array()
  }

  private def dvData(rows: Seq[Long]): Array[Byte] = {
    val byHigh = rows.distinct.sorted.map(r => ((r >>> 32).toInt, r.toInt))
      .groupBy(_._1).toSeq.sortBy(_._1)
    val maxHigh = byHigh.map(_._1).max
    val bitmaps = (0 to maxHigh).map { h =>
      byHigh.find(_._1 == h).map(e => serialize32(e._2.map(_._2)))
        .getOrElse(serialize32(Nil))
    }
    val buf = ByteBuffer.allocate(4 + 8 + bitmaps.map(_.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(1681511377) // portable magic
    buf.putLong((maxHigh + 1).toLong)
    bitmaps.foreach(buf.put)
    buf.array()
  }

  private def z85Encode(bytes: Array[Byte]): String = {
    val chars =
      "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
    require(bytes.length % 4 == 0)
    bytes.grouped(4).map { g =>
      var v = 0L
      g.foreach(b => v = (v << 8) | (b & 0xffL))
      (0 until 5).map(i => chars((v / math.pow(85, 4 - i).toLong % 85).toInt)).mkString
    }.mkString
  }

  test("decode: array, bitmap, run containers; multi-high-key; magic guard") {
    // array container
    assert(DeletionVectors.decode(dvData(Seq(1L, 3L, 65536L + 7))).toSeq ==
      Seq(1L, 3L, 65543L))
    // bitmap container (>4096 values in one 16-bit key space)
    val many = (0 until 5000).map(_.toLong * 2)
    assert(DeletionVectors.decode(dvData(many)).toSeq == many)
    // rows above 2^32 land in a second 32-bit bitmap
    val high = Seq(5L, (1L << 32) + 9L)
    assert(DeletionVectors.decode(dvData(high)).toSeq == high)
    // run container: hand-encoded cookie 12347, 1 container, run bit set,
    // no offset table (n < 4), runs [10,13] and [20,20]
    val run = ByteBuffer.allocate(4 + 8 + 4 + 1 + 4 + 2 + 2 * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    run.putInt(1681511377).putLong(1L)
    run.putInt(12347 | (0 << 16)) // container count - 1 = 0 in upper bits
    run.put(1.toByte) // run bitset: container 0 is a run container
    run.putShort(0).putShort((5 - 1).toShort) // key 0, cardinality 5
    run.putShort(2) // 2 runs
    run.putShort(10).putShort(3) // 10..13
    run.putShort(20).putShort(0) // 20..20
    assert(DeletionVectors.decode(run.array()).toSeq == Seq(10L, 11L, 12L, 13L, 20L))
    // wrong magic refuses loudly
    val bad = dvData(Seq(1L)); bad(0) = 0
    intercept[IllegalArgumentException](DeletionVectors.decode(bad))
  }

  test("z85 decode inverts an independent encoder incl. uuid path form") {
    val bytes = Array[Byte](0x86.toByte, 0x4f, 0xd2.toByte, 0x6f,
      0xb5.toByte, 0x59, 0xf7.toByte, 0x5b)
    assert(DeletionVectors.z85Decode(z85Encode(bytes)).toSeq == bytes.toSeq)
    val uuid = java.util.UUID.fromString("12345678-9abc-def0-1234-56789abcdef0")
    val ub = ByteBuffer.allocate(16)
    ub.putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits)
    val enc = z85Encode(ub.array())
    val p = DeletionVectors.uuidPath(new org.apache.hadoop.fs.Path("/t"), enc)
    assert(p.toString == s"/t/deletion_vector_$uuid.bin")
    val pfx = DeletionVectors.uuidPath(new org.apache.hadoop.fs.Path("/t"), "ab" + enc)
    assert(pfx.toString == s"/t/ab/deletion_vector_$uuid.bin")
  }

  // ------------------------------- end to end through the Delta reader ----
  private def writeCommit(logDir: String, v: Long, lines: Seq[String]): Unit = {
    new File(logDir).mkdirs()
    Files.write(java.nio.file.Paths.get(f"$logDir/$v%020d.json"),
      lines.mkString("\n").getBytes("UTF-8")): Unit
  }

  private def onePart(dir: String, df: org.apache.spark.sql.DataFrame): (String, Long) = {
    val staging = tmpDir("dv-stage")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new File(staging).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val name = part.getName
    new File(dir).mkdirs()
    Files.move(part.toPath, java.nio.file.Paths.get(s"$dir/$name"))
    (name, new File(s"$dir/$name").length())
  }

  private def metaLine(schema: org.apache.spark.sql.types.StructType): String =
    s"""{"metaData":{"id":"dv-1","format":{"provider":"parquet","options":{}},
       |"schemaString":${com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
         .writeValueAsString(schema.json)},
       |"partitionColumns":[],"configuration":{},"createdTime":1}}"""
      .stripMargin.replaceAll("\n", "")

  test("inline + uuid-file deletion vectors drop exactly the marked row indexes") {
    val root = tmpDir("dv-e2e")
    val log = s"$root/_delta_log"
    // file A: 10 rows, inline DV deletes row indexes 1, 3, 7
    val (fa, sa) = onePart(root, (0L until 10L).map(i => (i, s"a$i")).toDF("id", "v"))
    val inlineData = dvData(Seq(1L, 3L, 7L))
    val inlinePadded = inlineData ++
      new Array[Byte]((4 - inlineData.length % 4) % 4) // z85 needs 4-byte groups
    val inlineZ = z85Encode(inlinePadded)
    // file B: 6000 rows, uuid-file DV deletes indexes 0..4999 (bitmap
    // container through the full file layout: version byte, BE length,
    // data, BE crc32)
    val (fb, sb) = onePart(root, (0L until 6000L).map(i => (10000L + i, s"b$i")).toDF("id", "v"))
    val fileData = dvData((0L until 5000L).toSeq)
    val uuid = java.util.UUID.randomUUID()
    val ub = ByteBuffer.allocate(16)
    ub.putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits)
    val dvFile = ByteBuffer.allocate(1 + 4 + fileData.length + 4)
      .order(ByteOrder.BIG_ENDIAN)
    dvFile.put(1.toByte).putInt(fileData.length).put(fileData)
    val crc = new java.util.zip.CRC32; crc.update(fileData)
    dvFile.putInt(crc.getValue.toInt)
    Files.write(java.nio.file.Paths.get(s"$root/deletion_vector_$uuid.bin"),
      dvFile.array())
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    writeCommit(log, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      metaLine(schema),
      s"""{"add":{"path":"$fa","partitionValues":{},"size":$sa,"modificationTime":1,"dataChange":true,"deletionVector":{"storageType":"i","pathOrInlineDv":"$inlineZ","sizeInBytes":${inlineData.length},"cardinality":3}}}""",
      s"""{"add":{"path":"$fb","partitionValues":{},"size":$sb,"modificationTime":1,"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":"${z85Encode(ub.array())}","offset":1,"sizeInBytes":${fileData.length},"cardinality":5000}}}"""))

    val got = DeltaTable.read(spark, root).select("id").as[Long].collect().sorted.toSeq
    val expectA = (0L until 10L).filterNot(Seq(1L, 3L, 7L).contains)
    val expectB = (5000L until 6000L).map(10000L + _)
    assert(got == (expectA ++ expectB))
    // snapshot still reports both physical files; filtering is row-level
    assert(DeltaTable.snapshot(spark, root).numFiles == 2)
  }

  test("deletion vectors compose with name-mode column mapping") {
    // the modern-Databricks default shape: name-mapped physical columns
    // AND row-level deletes in one table — the DV filter runs on the
    // physical scan (with _metadata), the rename select sits on top
    val root = tmpDir("dv-cm")
    val log = s"$root/_delta_log"
    def fmeta(id: Long, phys: String) =
      new org.apache.spark.sql.types.MetadataBuilder()
        .putLong("delta.columnMapping.id", id)
        .putString("delta.columnMapping.physicalName", phys).build()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = true, fmeta(1, "col-x")),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType, nullable = true, fmeta(2, "col-y"))))
    val (fa, sa) = onePart(root,
      (0L until 8L).map(i => (i, s"r$i")).toDF("col-x", "col-y"))
    val dv = dvData(Seq(2L, 5L))
    val padded = dv ++ new Array[Byte]((4 - dv.length % 4) % 4)
    val metaCm =
      s"""{"metaData":{"id":"dv-cm","format":{"provider":"parquet","options":{}},
         |"schemaString":${com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
           .writeValueAsString(schema.json)},
         |"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"2"},"createdTime":1}}"""
        .stripMargin.replaceAll("\n", "")
    writeCommit(log, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["columnMapping","deletionVectors"],"writerFeatures":["columnMapping","deletionVectors"]}}""",
      metaCm,
      s"""{"add":{"path":"$fa","partitionValues":{},"size":$sa,"modificationTime":1,"dataChange":true,"deletionVector":{"storageType":"i","pathOrInlineDv":"${z85Encode(padded)}","sizeInBytes":${dv.length},"cardinality":2}}}"""))
    val df = DeltaTable.read(spark, root)
    assert(df.schema.fieldNames.toSeq == Seq("id", "v"))
    assert(df.select("id").as[Long].collect().sorted.toSeq ==
      Seq(0L, 1L, 3L, 4L, 6L, 7L))
  }

  test("SCD2 sync ingests from a DV'd external Delta table (live rows only)") {
    val root = tmpDir("dv-sync-src")
    val log = s"$root/_delta_log"
    val (fa, sa) = onePart(root,
      (1L to 6L).map(i => (i, s"n$i", 1L)).toDF("id", "name", "ver"))
    val dv = dvData(Seq(1L, 4L)) // row indexes → ids 2 and 5 deleted
    val padded = dv ++ new Array[Byte]((4 - dv.length % 4) % 4)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ver", org.apache.spark.sql.types.LongType)))
    writeCommit(log, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      metaLine(schema),
      s"""{"add":{"path":"$fa","partitionValues":{},"size":$sa,"modificationTime":1,"dataChange":true,"deletionVector":{"storageType":"i","pathOrInlineDv":"${z85Encode(padded)}","sizeInBytes":${dv.length},"cardinality":2}}}"""))
    val dest = tmpDir("dv-sync-dest")
    val src = new graft.sources.DeltaTableSource(root, pks = Seq("id"))
    val cfg = graft.WriteConfig(deltaCol = Some("ver"))
    assert(graft.Graft.sync(spark, src, dest, cfg) == graft.LoadResult.FullLoad(4))
    val cur = graft.Graft.writer(spark, src, dest, cfg).currentState()
      .select("id").as[Long].collect().sorted.toSeq
    assert(cur == Seq(1L, 3L, 4L, 6L))
  }
}
