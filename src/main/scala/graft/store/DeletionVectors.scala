package graft.store

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.{Path => HPath}

/** Deletion-vector decoding for the external Delta reader (PROTOCOL.md
  * "Deletion Vectors"; reference interop surface: delta-spark/delta-rs
  * read these natively). A DV marks row INDEXES of one data file as
  * deleted; its binary form is a 4-byte little-endian magic (1681511377)
  * followed by the PORTABLE serialization of a 64-bit RoaringBitmapArray:
  * an 8-byte LE count of 32-bit roaring bitmaps (high 32-bit keys
  * 0..n-1), each in the standard roaring portable format
  * (RoaringFormatSpec: cookie 12346 "no run containers" with 4-byte
  * container count, or cookie 12347 with run-bitset; 2-byte key +
  * 2-byte cardinality-1 descriptors; optional offset table; then array /
  * bitmap / run containers). Everything here is decoded into a sorted
  * Array[Long] of deleted indexes — DVs are small (bounded by
  * `sizeInBytes` in the add action), so driver-side decode + broadcast is
  * the same shape delta-spark uses.
  *
  * Storage kinds (add.deletionVector.storageType):
  *  - "i": `pathOrInlineDv` is the Z85-encoded DV data itself;
  *  - "u": `pathOrInlineDv` is [optional random prefix] + Z85 of the
  *    16-byte UUID; the file is
  *    `<table>/[<prefix>/]deletion_vector_<uuid>.bin`, holding a 1-byte
  *    format version (1) and, at `offset`, a 4-byte BIG-endian length,
  *    the data, and a 4-byte BE CRC-32 of the data (verified);
  *  - "p": `pathOrInlineDv` is an absolute path to the same file layout.
  */
object DeletionVectors {

  final case class Descriptor(
      storageType: String,
      pathOrInlineDv: String,
      offset: Option[Int],
      sizeInBytes: Int,
      cardinality: Long)

  // ------------------------------------------------------------------- Z85
  private val Z85Chars =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Index: Array[Byte] = {
    val idx = Array.fill[Byte](128)(-1)
    Z85Chars.zipWithIndex.foreach { case (c, i) => idx(c.toInt) = i.toByte }
    idx
  }

  /** Z85 (ZeroMQ base-85): 5 chars → 4 bytes big-endian. The input length
    * must be a multiple of 5 — Delta pads the UUID form to 20 chars. */
  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 length ${s.length} not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    var o = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Index(c.toInt) else -1
        require(d >= 0, s"invalid z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      out(o) = ((v >> 24) & 0xff).toByte
      out(o + 1) = ((v >> 16) & 0xff).toByte
      out(o + 2) = ((v >> 8) & 0xff).toByte
      out(o + 3) = (v & 0xff).toByte
      i += 5
      o += 4
    }
    out
  }

  /** Z85 encode (inverse of [[z85Decode]]): 4 bytes → 5 chars. The input
    * length must be a multiple of 4 (a 16-byte UUID encodes to 20 chars —
    * the "u"-storage reference form). */
  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, s"z85 input length ${bytes.length} not a multiple of 4")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div >= 1) { sb.append(Z85Chars(((v / div) % 85).toInt)); div /= 85 }
      i += 4
    }
    sb.toString
  }

  /** "u"-storage reference (the 20-char Z85 of the UUID, no prefix) and the
    * on-disk file name for a fresh deletion-vector container file. */
  def newUuidRef(): (String, String) = {
    val uuid = java.util.UUID.randomUUID()
    val bb = ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    (z85Encode(bb.array()), s"deletion_vector_$uuid.bin")
  }

  /** "u"-storage path: [prefix]<20-char z85 uuid> →
    * `<table>/[prefix/]deletion_vector_<uuid>.bin`. */
  def uuidPath(tableRoot: HPath, pathOrInlineDv: String): HPath = {
    require(pathOrInlineDv.length >= 20,
      s"uuid deletion-vector reference too short: $pathOrInlineDv")
    val prefix = pathOrInlineDv.dropRight(20)
    val bytes = z85Decode(pathOrInlineDv.takeRight(20))
    val bb = ByteBuffer.wrap(bytes)
    val uuid = new java.util.UUID(bb.getLong, bb.getLong)
    val dir = if (prefix.isEmpty) tableRoot else new HPath(tableRoot, prefix)
    new HPath(dir, s"deletion_vector_$uuid.bin")
  }

  // -------------------------------------------------------------- roaring
  private val Magic = 1681511377
  private val SerialCookieNoRun = 12346
  private val SerialCookie = 12347

  /** DV data (magic + portable RoaringBitmapArray) → sorted deleted row
    * indexes. Refuses unknown magic LOUDLY (the "native" format is never
    * written into DVs per the protocol). */
  def decode(data: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == Magic, s"deletion vector magic $magic != $Magic")
    val nBitmaps = bb.getLong
    require(nBitmaps >= 0 && nBitmaps <= Int.MaxValue, s"bad bitmap count $nBitmaps")
    val out = Array.newBuilder[Long]
    var high = 0L
    while (high < nBitmaps) {
      readRoaring32(bb, value32 => out += (high << 32) | (value32 & 0xffffffffL))
      high += 1
    }
    out.result() // containers and keys are serialized in ascending order
  }

  /** One standard portable 32-bit roaring bitmap at the buffer's position;
    * emits its values through `emit` in ascending order. */
  private def readRoaring32(bb: ByteBuffer, emit: Int => Unit): Unit = {
    val cookie = bb.getInt
    val (nContainers, runBitset: Option[Array[Byte]]) =
      if ((cookie & 0xffff) == SerialCookie) {
        val n = (cookie >>> 16) + 1
        val bits = new Array[Byte]((n + 7) / 8)
        bb.get(bits)
        (n, Some(bits))
      } else if (cookie == SerialCookieNoRun) {
        (bb.getInt, None)
      } else throw new IllegalArgumentException(s"bad roaring cookie $cookie")
    val keys = new Array[Int](nContainers)
    val cards = new Array[Int](nContainers)
    var i = 0
    while (i < nContainers) {
      keys(i) = bb.getShort & 0xffff
      cards(i) = (bb.getShort & 0xffff) + 1
      i += 1
    }
    def isRun(i: Int): Boolean =
      runBitset.exists(bits => (bits(i / 8) & (1 << (i % 8))) != 0)
    // offset table present unless (run-cookie && n < 4); we read containers
    // sequentially in order, so offsets are skipped either way
    if (runBitset.isEmpty || nContainers >= 4) {
      var j = 0
      while (j < nContainers) { bb.getInt; j += 1 }
    }
    i = 0
    while (i < nContainers) {
      val base = keys(i) << 16
      if (isRun(i)) {
        val nRuns = bb.getShort & 0xffff
        var r = 0
        while (r < nRuns) {
          val start = bb.getShort & 0xffff
          val len = bb.getShort & 0xffff
          var v = start
          while (v <= start + len) { emit(base | v); v += 1 }
          r += 1
        }
      } else if (cards(i) > 4096) {
        // bitmap container: 1024 little-endian longs
        var w = 0
        while (w < 1024) {
          var word = bb.getLong
          val wordBase = base | (w << 6)
          while (word != 0L) {
            val bit = java.lang.Long.numberOfTrailingZeros(word)
            emit(wordBase | bit)
            word &= word - 1
          }
          w += 1
        }
      } else {
        var v = 0
        while (v < cards(i)) { emit(base | (bb.getShort & 0xffff)); v += 1 }
      }
      i += 1
    }
  }

  // ---------------------------------------------------------------- encode
  /** Sorted distinct row indexes → DV data (magic + portable 64-bit
    * RoaringBitmapArray), the exact inverse of [[decode]] and byte-level
    * interchangeable with delta-spark/delta-rs (RoaringFormatSpec cookie
    * 12346 "no run containers": descriptive header, offset header, then
    * array containers for cardinality ≤ 4096 and 8 KiB bitmap containers
    * above — offsets are measured from the start of each 32-bit bitmap's
    * serialization, which external roaring readers validate even though
    * [[decode]] reads sequentially). High 32-bit keys are dense 0..n-1 per
    * the RoaringBitmapArray portable form; empty intermediate keys
    * serialize as zero-container bitmaps. */
  def encode(indexes: Array[Long]): Array[Byte] = {
    require(indexes.nonEmpty, "refusing to encode an empty deletion vector")
    var i = 1
    while (i < indexes.length) {
      require(indexes(i - 1) < indexes(i),
        s"deletion-vector indexes must be sorted distinct at $i")
      i += 1
    }
    require(indexes.head >= 0, s"negative row index ${indexes.head}")
    val nBitmaps = (indexes.last >>> 32) + 1
    val parts = new Array[Array[Byte]](nBitmaps.toInt)
    var lo = 0
    var high = 0L
    while (high < nBitmaps) {
      var hi = lo
      while (hi < indexes.length && (indexes(hi) >>> 32) == high) hi += 1
      parts(high.toInt) = encodeRoaring32(indexes, lo, hi)
      lo = hi
      high += 1
    }
    val total = 4 + 8 + parts.map(_.length).sum
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(Magic)
    bb.putLong(nBitmaps)
    parts.foreach(bb.put)
    bb.array()
  }

  /** One portable 32-bit roaring bitmap over `indexes[lo, hi)` (whose low
    * 32 bits are the values; caller guarantees sorted distinct). */
  private def encodeRoaring32(indexes: Array[Long], lo: Int, hi: Int): Array[Byte] = {
    // split into 16-bit-key containers
    final case class Slice(key: Int, from: Int, until: Int) { def card: Int = until - from }
    val slices = scala.collection.mutable.ArrayBuffer[Slice]()
    var i = lo
    while (i < hi) {
      val key = ((indexes(i) >>> 16) & 0xffff).toInt
      var j = i
      while (j < hi && ((indexes(j) >>> 16) & 0xffff).toInt == key) j += 1
      slices += Slice(key, i, j)
      i = j
    }
    val n = slices.size
    val containerBytes = slices.map(s => if (s.card > 4096) 8192 else 2 * s.card)
    val total = 8 + 8 * n + containerBytes.sum
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(SerialCookieNoRun)
    bb.putInt(n)
    slices.foreach { s =>
      bb.putShort((s.key & 0xffff).toShort)
      bb.putShort(((s.card - 1) & 0xffff).toShort)
    }
    // offset header: byte offset of each container from this bitmap's start
    var off = 8 + 8 * n
    containerBytes.foreach { sz => bb.putInt(off); off += sz }
    slices.foreach { s =>
      if (s.card > 4096) {
        val words = new Array[Long](1024)
        var v = s.from
        while (v < s.until) {
          val low = (indexes(v) & 0xffff).toInt
          words(low >>> 6) |= 1L << (low & 63)
          v += 1
        }
        words.foreach(bb.putLong)
      } else {
        var v = s.from
        while (v < s.until) { bb.putShort((indexes(v) & 0xffff).toShort); v += 1 }
      }
    }
    bb.array()
  }

  /** Union of two sorted distinct index arrays (both stay sorted distinct). */
  def union(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](a.length + b.length)
    var i = 0; var j = 0; var o = 0
    while (i < a.length && j < b.length) {
      val v = if (a(i) <= b(j)) a(i) else b(j)
      if (i < a.length && a(i) == v) i += 1
      if (j < b.length && b(j) == v) j += 1
      out(o) = v; o += 1
    }
    while (i < a.length) { out(o) = a(i); o += 1; i += 1 }
    while (j < b.length) { out(o) = b(j); o += 1; j += 1 }
    java.util.Arrays.copyOf(out, o)
  }

  // ---------------------------------------------------- graft DV bin files
  /** Write several DVs into ONE `.bin` file with the protocol's on-disk
    * layout (1-byte format version, then per DV: 4-byte BE length, data,
    * 4-byte BE CRC-32) — the same layout [[load]]'s "u"/"p" storage reads,
    * so graft DV files double as valid Delta DV files for the log mirror.
    * Returns each DV's (offset, sizeInBytes). */
  def writeBin(
      fs: org.apache.hadoop.fs.FileSystem, p: HPath,
      datas: Seq[Array[Byte]]): Seq[(Int, Int)] = {
    val out = fs.create(p, false)
    try {
      out.write(1) // format version
      var off = 1
      datas.map { data =>
        val at = off
        val crc = new java.util.zip.CRC32
        crc.update(data)
        val bb = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
        out.write(bb.putInt(data.length).array())
        out.write(data)
        out.write(ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
          .putInt(crc.getValue.toInt).array())
        off += 4 + data.length + 4
        (at, data.length)
      }
    } finally out.close()
  }

  /** Read one DV from a graft `.bin` file (offset/size/cardinality as
    * recorded in the manifest). */
  def loadBin(
      fs: org.apache.hadoop.fs.FileSystem, p: HPath,
      offset: Int, size: Int, cardinality: Long): Array[Long] = {
    val idx = decode(readAt(fs, p,
      Descriptor("p", p.toString, Some(offset), size, cardinality)))
    require(idx.length == cardinality,
      s"deletion vector at $p:$offset decoded ${idx.length} rows, manifest says $cardinality")
    idx
  }

  /** Static probe for the codegen'd scan filter: is `rowIndex` of the file
    * keyed `key` marked deleted? (`map` values are sorted index arrays.) */
  def contains(
      map: java.util.HashMap[String, Array[Long]], key: String, rowIndex: Long): Boolean = {
    val arr = map.get(key)
    arr != null && java.util.Arrays.binarySearch(arr, rowIndex) >= 0
  }

  /** "<dataDir>/<fileName>" key of a scanned file's full `file_path` URI —
    * the manifest-side key of [[contains]]'s map. */
  def dirFileKey(path: String): String = {
    val p1 = path.lastIndexOf('/')
    if (p1 <= 0) return path
    val p2 = path.lastIndexOf('/', p1 - 1)
    path.substring(p2 + 1)
  }

  // ------------------------------------------------------------------ load
  /** Resolve + decode one descriptor into sorted deleted row indexes. */
  def load(fs: org.apache.hadoop.fs.FileSystem, tableRoot: HPath, d: Descriptor): Array[Long] = {
    val data: Array[Byte] = d.storageType match {
      case "i" => z85Decode(d.pathOrInlineDv).take(d.sizeInBytes)
      case "u" => readAt(fs, uuidPath(tableRoot, d.pathOrInlineDv), d)
      case "p" => readAt(fs, new HPath(d.pathOrInlineDv), d)
      case other =>
        throw new UnsupportedOperationException(s"deletion vector storage '$other'")
    }
    val idx = decode(data)
    require(idx.length == d.cardinality,
      s"deletion vector decoded ${idx.length} rows, descriptor says ${d.cardinality}")
    idx
  }

  /** File layout at `offset`: 4-byte BE length, data, 4-byte BE CRC-32. */
  private def readAt(
      fs: org.apache.hadoop.fs.FileSystem, p: HPath, d: Descriptor): Array[Byte] = {
    val in = fs.open(p)
    try {
      val off = d.offset.getOrElse(1) // after the 1-byte format version
      in.seek(off.toLong)
      val lenBuf = new Array[Byte](4)
      in.readFully(lenBuf)
      val len = ByteBuffer.wrap(lenBuf).order(ByteOrder.BIG_ENDIAN).getInt
      require(len == d.sizeInBytes,
        s"deletion vector at $p:$off has length $len, descriptor says ${d.sizeInBytes}")
      val data = new Array[Byte](len)
      in.readFully(data)
      val crcBuf = new Array[Byte](4)
      in.readFully(crcBuf)
      val expect = ByteBuffer.wrap(crcBuf).order(ByteOrder.BIG_ENDIAN).getInt
      val crc = new java.util.zip.CRC32
      crc.update(data)
      require(crc.getValue.toInt == expect,
        s"deletion vector checksum mismatch at $p:$off")
      data
    } finally in.close()
  }
}
