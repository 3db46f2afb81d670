package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd hash kernels for the dedup signatures.
  *
  * Spark's higher-order functions (`transform`/`aggregate`) are interpreted
  * per element — a 64-hash MinHash over a few hundred shingles costs tens
  * of thousands of interpreted expression-tree evaluations per row
  * (measured: 14 s for 5 000 docs). These custom Catalyst `Expression`s
  * keep whole-stage codegen intact by emitting a single static call into a
  * tight JVM loop (`HashKernels`); per-row cost drops to the raw hashing
  * work.
  *
  * Hash family: two xxhash64 passes per element, then the Carter-Wegman
  * combination h_j = h1 + j·h2 — one-pass over the data for any number of
  * hash functions. */
object HashKernels {
  private final val Seed1 = 0x9747b28cL
  private final val Seed2 = 0x8b44f8a1L

  private def xx(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  /** MinHash signature: per hash-family index j, the minimum of h_j over
    * all elements. Empty input yields Long.MaxValue slots. */
  def minhash(elems: ArrayData, numHashes: Int): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = elems.numElements()
    var i = 0
    while (i < n) {
      val s = elems.getUTF8String(i)
      if (s != null) {
        val h1 = xx(s, Seed1)
        val h2 = xx(s, Seed2) | 1L
        var j = 0
        var h = h1
        while (j < numHashes) {
          if (h < mins(j)) mins(j) = h
          h += h2
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 64-bit SimHash: per bit b, the sign of Σ(±1) over elements' hash bit
    * b; packed into one long. */
  def simhash(elems: ArrayData): Long = simhashImpl(elems, poly = false)

  /** [[simhash]] over the SQL-mirrorable [[poly61]] token hash instead of
    * xxhash64: bits 61–63 of every token hash are 0, so those signature
    * bits are 0 on all documents (a constant — hamming-neutral). */
  def simhashPoly(elems: ArrayData): Long = simhashImpl(elems, poly = true)

  /** Count of DISTINCT common values of two SORTED long arrays — a single
    * merge walk, no allocation, no boxing (array_intersect builds a boxed
    * hash set per pair; at candidate-pair volumes that was the dominant
    * verify cost). Duplicate values (64-bit hash collisions of distinct
    * shingles) count once, matching array_intersect's set semantics. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    var last = 0L
    var has = false
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        if (!has || x != last) { c += 1; last = x; has = true }
        i += 1; j += 1
      }
    }
    c
  }

  /** Weighted merge-walk dot product: Σ over common keys of wa·wb. Keys
    * are SORTED-ascending long arrays; `wa`/`wb` are weight arrays
    * parallel to their key arrays (callers build both with a single
    * struct-sort, so the pairing is positional by construction). Keys are
    * expected DISTINCT per side (one weight per term); a duplicated key
    * pairs positionally once per occurrence — callers that aggregate
    * weights per key before sorting never hit that case. No allocation,
    * no boxing — the pair-verify inner loop of the tf-idf cosine dedup,
    * same rationale as [[sortedIntersectCount]]. Overflow contract: exact
    * while Σ wa·wb fits a long — callers bound per-term weights (the
    * tf-idf family caps idf at 100 000, so ~10⁸ shared terms fit). */
  def sortedWeightedDot(ka: ArrayData, wa: ArrayData, kb: ArrayData, wb: ArrayData): Long = {
    val na = ka.numElements()
    val nb = kb.numElements()
    var i = 0
    var j = 0
    var dot = 0L
    while (i < na && j < nb) {
      val x = ka.getLong(i)
      val y = kb.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        dot += wa.getLong(i) * wb.getLong(j)
        i += 1; j += 1
      }
    }
    dot
  }

  private def simhashImpl(elems: ArrayData, poly: Boolean): Long = {
    val counts = new Array[Int](64)
    val n = elems.numElements()
    var i = 0
    while (i < n) {
      val s = elems.getUTF8String(i)
      if (s != null) {
        val h = if (poly) poly61(s) else xx(s, Seed1)
        var b = 0
        while (b < 64) {
          counts(b) += (((h >>> b) & 1L).toInt << 1) - 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** Per-position k-token-window xxhash64 over a single-space tokenized
    * string, hashed IN PLACE over the original bytes: consecutive tokens
    * are single-space separated, so window i's gram string
    * `concat_ws(" ", tokens[i..i+k-1])` IS the substring from token i's
    * first byte to token i+k−1's last byte (concat_ws keeps empty tokens,
    * so runs of spaces round-trip too). Each window hash therefore equals
    * Spark's `xxhash64(gram)` (XXH64, seed 42) with ZERO window-string or
    * token-array allocation — one byte scan for the 0x20 boundaries (a
    * space byte never occurs inside a multi-byte UTF-8 sequence), one
    * bounded hash per window. Fewer than k tokens → empty array. */
  def kgramWindowHashes(text: UTF8String, k: Int): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val nb = text.numBytes
    var nTok = 1
    var i = 0
    while (i < nb) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) nTok += 1
      i += 1
    }
    val nWin = nTok - k + 1
    if (nWin <= 0) return new GenericArrayData(Array.emptyLongArray)
    // starts(t) = first byte of token t; ends(t) = one past its last byte
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < nb) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) {
        ends(t) = i
        t += 1
        starts(t) = i + 1
      }
      i += 1
    }
    ends(t) = nb
    val out = new Array[Long](nWin)
    var w = 0
    while (w < nWin) {
      val s = starts(w)
      out(w) = XXH64.hashUnsafeBytes(base, off + s, ends(w + k - 1) - s, 42L)
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Count of tokens covered by DUPLICATED k-token windows — the Gopher
    * "fraction of characters inside duplicated n-grams" repetition
    * metric in token units (exact, union semantics: a token under ANY
    * occurrence of ANY within-doc ≥2× n-gram counts once). Window
    * identity is the in-place window hash of [[kgramWindowHashes]]
    * (collisions indistinguishable at any real doc size; oracles
    * recompute from raw gram strings). Per-row work: one boundary scan +
    * one sort of the window hashes + one marking pass — no boxing, no
    * map. Fewer than k tokens → 0. */
  def dupWindowCoverage(text: UTF8String, k: Int): Long = {
    val hs = kgramWindowHashes(text, k).toLongArray()
    val nWin = hs.length
    if (nWin == 0) return 0L
    val sorted = hs.clone()
    java.util.Arrays.sort(sorted)
    val covered = new Array[Boolean](nWin + k - 1)
    var w = 0
    while (w < nWin) {
      val idx = java.util.Arrays.binarySearch(sorted, hs(w))
      if ((idx > 0 && sorted(idx - 1) == hs(w)) ||
          (idx < nWin - 1 && sorted(idx + 1) == hs(w))) {
        var j = w
        while (j < w + k) { covered(j) = true; j += 1 }
      }
      w += 1
    }
    var c = 0L
    var j = 0
    while (j < covered.length) { if (covered(j)) c += 1; j += 1 }
    c
  }

  /** Count of tokens covered by the doc's TOP k-token window(s) — the
    * Gopher "fraction of characters in the most frequent n-gram" metric
    * in token units, made tie-robust: the union coverage of EVERY window
    * value achieving the maximal within-doc occurrence count (so no
    * arbitrary tie-break leaks into the result), 0 when the max count is
    * < 2 (an all-unique doc has no repetition to measure). Same kernel
    * discipline as [[dupWindowCoverage]]. */
  def topWindowCoverage(text: UTF8String, k: Int): Long = {
    val hs = kgramWindowHashes(text, k).toLongArray()
    val nWin = hs.length
    if (nWin == 0) return 0L
    val sorted = hs.clone()
    java.util.Arrays.sort(sorted)
    // maximal run length in the sorted hashes = the modal count
    var m = 1
    var run = 1
    var i = 1
    while (i < nWin) {
      if (sorted(i) == sorted(i - 1)) { run += 1; if (run > m) m = run }
      else run = 1
      i += 1
    }
    if (m < 2) return 0L
    val covered = new Array[Boolean](nWin + k - 1)
    var w = 0
    while (w < nWin) {
      // is hs(w)'s count exactly m? count its sorted run via two scans
      // from a binary-search hit (runs are short; windows are few per doc)
      val idx = java.util.Arrays.binarySearch(sorted, hs(w))
      var lo = idx
      while (lo > 0 && sorted(lo - 1) == hs(w)) lo -= 1
      var hi = idx
      while (hi < nWin - 1 && sorted(hi + 1) == hs(w)) hi += 1
      if (hi - lo + 1 == m) {
        var j = w
        while (j < w + k) { covered(j) = true; j += 1 }
      }
      w += 1
    }
    var c = 0L
    var j = 0
    while (j < covered.length) { if (covered(j)) c += 1; j += 1 }
    c
  }

  /** Linear text score: `bias + Σ weight(token)` over the single-space
    * tokens WITH multiplicity (absent tokens weigh 0) — a fasttext-style
    * linear classifier applied per row, integer-exact (weights are
    * milli-units as longs, so the sum is order-independent and SQL-
    * mirrorable). Tokens are zero-copy UTF8String views over the
    * document's bytes; the model rides as one hash map per executor, so
    * scoring is pure map-side work — no explode, no join, no shuffle. */
  def linearTextScore(
      text: UTF8String,
      weights: java.util.HashMap[UTF8String, java.lang.Long],
      bias: Long): Long = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val nb = text.numBytes
    var sum = bias
    var start = 0
    var i = 0
    while (i <= nb) {
      if (i == nb ||
          org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) {
        val w = weights.get(UTF8String.fromAddress(base, off + start, i - start))
        if (w != null) sum += w.longValue()
        start = i + 1
      }
      i += 1
    }
    sum
  }

  /** Real byte-pair-encoding APPLY (the GPT-2 `bpe()` greedy loop): per
    * whitespace-separated word, start from code-point tokens and repeatedly
    * merge ALL left-to-right occurrences of the lowest-RANK adjacent pair
    * until no ranked pair remains. Rank table keys are `"a b"` (tokens
    * never contain spaces — words are whitespace-split first). Returns the
    * concatenated token stream of the document. Merged tokens are eligible
    * for later (higher-rank) merges — chaining like (a,b)→ab, (ab,c)→abc
    * works exactly as in the reference implementation. */
  def bpeEncode(
      text: UTF8String,
      ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    val n = s.length
    while (i < n) {
      if (Character.isWhitespace(s.charAt(i))) i += 1
      else {
        var j = i
        while (j < n && !Character.isWhitespace(s.charAt(j))) j += 1
        bpeWord(s.substring(i, j), ranks, out)
        i = j
      }
    }
    new GenericArrayData(out.toArray(Array.empty[AnyRef]))
  }

  private def bpeWord(
      w: String,
      ranks: java.util.HashMap[String, Integer],
      out: java.util.ArrayList[UTF8String]): Unit = {
    var toks = new java.util.ArrayList[String]()
    var k = 0
    while (k < w.length) {
      val cp = w.codePointAt(k)
      toks.add(new String(Character.toChars(cp)))
      k += Character.charCount(cp)
    }
    var done = toks.size < 2
    while (!done) {
      var bestIdx = -1
      var bestRank = Int.MaxValue
      var x = 0
      while (x < toks.size - 1) {
        val r = ranks.get(toks.get(x) + " " + toks.get(x + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestIdx = x
        }
        x += 1
      }
      if (bestIdx < 0) done = true
      else {
        val a = toks.get(bestIdx)
        val b = toks.get(bestIdx + 1)
        val merged = new java.util.ArrayList[String](toks.size)
        var y = 0
        while (y < toks.size) {
          if (y < toks.size - 1 && toks.get(y) == a && toks.get(y + 1) == b) {
            merged.add(a + b); y += 2
          } else { merged.add(toks.get(y)); y += 1 }
        }
        toks = merged
        done = toks.size < 2
      }
    }
    var z = 0
    while (z < toks.size) { out.add(UTF8String.fromString(toks.get(z))); z += 1 }
  }

  /** Bloom membership probe over a string's UTF-8 bytes — the same bytes
    * `DataFrameStatFunctions.bloomFilter` inserts for a string column (it
    * puts the UTF-8 encoding via putBinary/putString, which hash
    * identically), so a driver-built batch bloom probes executor-side rows
    * consistently; pinned by BloomDedupSpec. */
  def bloomMightContain(
      bf: org.apache.spark.util.sketch.BloomFilter, s: UTF8String): Boolean =
    bf.mightContainBinary(s.getBytes)

  private final val PolyM = (1L << 61) - 1 // Mersenne prime 2^61 - 1
  private final val PolyB = 131L
  // SplitMix64's multiplier: the final WRAPPING multiply (mod 2^64 — Java's
  // native long multiply) spreads the 61-bit fold into all 64 output bits,
  // so no signature bit is structurally dead (a dead bit shrinks one
  // banding chunk's keyspace and inflates its buckets). < 2^62, so
  // fold · PolyC < 2^123 stays exact in a signed 128-bit HUGEINT SQL-side.
  private final val PolyC = 2685821657736338717L

  /** Polynomial codepoint hash: fold (h·131 + cp) mod 2^61−1 over the
    * token's unicode codepoints, then one wrapping multiply by [[PolyC]] —
    * chosen to be EXACTLY expressible in an oracle's SQL (DuckDB mirrors
    * the fold with list_reduce + HUGEINT and the finalize with
    * (fold·C) % 2^64 plus a signed conversion). Codepoints are decoded
    * straight from the UTF-8 bytes — no String allocation, no stream
    * boxing (this runs once per token corpus-wide). */
  def poly61(s: UTF8String): Long = {
    val n = s.numBytes
    var h = 0L
    var i = 0
    while (i < n) {
      val b0 = s.getByte(i) & 0xFF
      var cp = 0
      if (b0 < 0x80) { cp = b0; i += 1 }
      else if ((b0 & 0xE0) == 0xC0) {
        cp = ((b0 & 0x1F) << 6) | (s.getByte(i + 1) & 0x3F); i += 2
      } else if ((b0 & 0xF0) == 0xE0) {
        cp = ((b0 & 0x0F) << 12) | ((s.getByte(i + 1) & 0x3F) << 6) |
          (s.getByte(i + 2) & 0x3F); i += 3
      } else {
        cp = ((b0 & 0x07) << 18) | ((s.getByte(i + 1) & 0x3F) << 12) |
          ((s.getByte(i + 2) & 0x3F) << 6) | (s.getByte(i + 3) & 0x3F); i += 4
      }
      h = (mulMod61(h, PolyB) + cp) % PolyM
    }
    h * PolyC // wraps: ≡ (h·C) mod 2^64, matching the SQL mirror
  }

  /** (a*b) mod 2^61−1 for 0 ≤ a,b < 2^61, exact via the 128-bit product:
    * with M = 2^61−1, (hi·2^64 + lo) ≡ hi·8 + lo (mod M) after folding
    * 2^64 = 8·(M+1) ≡ 8; the fold terms are < 2^67, reduced stepwise. */
  private def mulMod61(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b) // a,b < 2^61 ⇒ non-negative
    val lo = a * b // low 64 bits (wrapped)
    // lo as unsigned: split into top 3 bits and low 61 bits
    val loLow = lo & PolyM
    val loHi = (lo >>> 61) & 0x7L
    // value ≡ hi*8 + loHi + loLow (mod M); hi < 2^58 so hi*8 < 2^61
    var r = (hi << 3) + loHi + loLow
    while (r >= PolyM) r -= PolyM
    r
  }
}

/** array<string> → array<long>: the MinHash signature (codegen'd). */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashKernels.minhash(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.minhash($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash"
}

/** string → array<long>: xxhash64 of every k-token window, hashed in place
  * over the original bytes (codegen'd; see [[HashKernels.kgramWindowHashes]]).
  * Element w equals `xxhash64(concat_ws(' ', slice(split(s,' '), w+1, k)))`. */
case class KGramWindowHashes(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_kgram_hashes expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashKernels.kgramWindowHashes(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.kgramWindowHashes($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): KGramWindowHashes =
    copy(child = newChild)
  override def prettyName: String = "graft_kgram_hashes"
}

/** string → bigint: tokens covered by duplicated k-token windows — the
  * Gopher repetition metric, per row, codegen'd
  * ([[HashKernels.dupWindowCoverage]]). */
case class DupNgramCoverage(child: Expression, k: Int, top: Boolean = false)
    extends UnaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")
  private val kernel = if (top) "topWindowCoverage" else "dupWindowCoverage"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    if (top) HashKernels.topWindowCoverage(input.asInstanceOf[UTF8String], k)
    else HashKernels.dupWindowCoverage(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.$kernel($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): DupNgramCoverage =
    copy(child = newChild)
  override def prettyName: String =
    if (top) "graft_top_ngram_coverage" else "graft_dup_ngram_coverage"
}

/** string → bigint: fasttext-style linear classifier score (codegen'd; the
  * weight table rides as one reference hash map, not an expression tree —
  * see [[HashKernels.linearTextScore]]). */
case class LinearTextScore(child: Expression, weights: Map[String, Long], bias: Long)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_linear_score expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  @transient private lazy val table: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](weights.size * 2)
    weights.foreach { case (k, v) => m.put(UTF8String.fromString(k), java.lang.Long.valueOf(v)) }
    m
  }
  override def nullSafeEval(input: Any): Any =
    HashKernels.linearTextScore(input.asInstanceOf[UTF8String], table, bias)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("weights", table, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.linearTextScore($c, $ref, ${bias}L)")
  }
  override protected def withNewChildInternal(newChild: Expression): LinearTextScore =
    copy(child = newChild)
  override def prettyName: String = "graft_linear_score"
}

/** string → array<string>: byte-pair-encoding apply over a ranked merge
  * table (codegen'd; the rank table rides as one reference hash map). The
  * greedy per-word loop is [[HashKernels.bpeEncode]] — the real GPT-2
  * `bpe()` algorithm, not the regex token-count proxy. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_encode expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  @transient private lazy val table: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      require(!a.contains(' ') && !b.contains(' '),
        s"merge tokens must not contain spaces: ('$a', '$b')")
      m.put(a + " " + b, Integer.valueOf(r))
    }
    m
  }
  override def nullSafeEval(input: Any): Any =
    HashKernels.bpeEncode(input.asInstanceOf[UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRanks", table, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.bpeEncode($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
  override def prettyName: String = "graft_bpe_encode"
}

/** string → boolean: membership probe against a driver-built bloom filter
  * (codegen'd; the sketch rides as ONE reference object, not a literal —
  * megabit bloom bits must never be embedded in the expression tree text).
  * False positives are the sketch's contract; callers that need exactness
  * re-check survivors exactly (see Dedup.exactIncremental's bloom
  * strategy, where the exact anti-join makes the result FP-independent). */
case class BloomMightContain(child: Expression,
    bloom: org.apache.spark.util.sketch.BloomFilter)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any =
    HashKernels.bloomMightContain(bloom, input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      "org.apache.spark.util.sketch.BloomFilter")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.bloomMightContain($ref, $c)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
  override def prettyName: String = "graft_bloom_might_contain"
}

/** array<string> → bigint: the 64-bit SimHash (codegen'd). */
case class SimHash64(child: Expression, poly: Boolean = false)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  private val kernel = if (poly) "simhashPoly" else "simhash"
  override def nullSafeEval(input: Any): Any =
    if (poly) HashKernels.simhashPoly(input.asInstanceOf[ArrayData])
    else HashKernels.simhash(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.$kernel($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = if (poly) "graft_simhash_poly" else "graft_simhash"
}

/** (array<long>, array<long>) → bigint: distinct-common-value count of two
  * SORTED long arrays (codegen'd merge walk). Contract: both inputs sorted
  * ascending (sort_array output). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_sorted_intersect expects two array<bigint>, got ${l.simpleString}, ${r.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashKernels.sortedIntersectCount($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_sorted_intersect"
}

/** (array<long>, array<long>, array<long>, array<long>) → bigint: weighted
  * merge-walk dot product over two (sorted keys, parallel weights) vector
  * encodings — [[HashKernels.sortedWeightedDot]], codegen'd. The
  * candidate-pair verify kernel of [[graft.operators.Dedup.tfidfCosinePairs]]. */
case class SortedWeightedDot(
    keysA: Expression, weightsA: Expression,
    keysB: Expression, weightsB: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
  override def first: Expression = keysA
  override def second: Expression = weightsA
  override def third: Expression = keysB
  override def fourth: Expression = weightsB
  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = children.map(_.dataType).zipWithIndex.collectFirst {
      case (dt, i) if dt != ArrayType(LongType, containsNull = false) &&
        dt != ArrayType(LongType, containsNull = true) => (dt, i)
    }
    bad match {
      case Some((dt, i)) => TypeCheckResult.TypeCheckFailure(
        s"graft_sorted_dot expects four array<bigint>, argument ${i + 1} is ${dt.simpleString}")
      case scala.None => TypeCheckResult.TypeCheckSuccess
    }
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def nullSafeEval(ka: Any, wa: Any, kb: Any, wb: Any): Any =
    HashKernels.sortedWeightedDot(ka.asInstanceOf[ArrayData], wa.asInstanceOf[ArrayData],
      kb.asInstanceOf[ArrayData], wb.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (ka, wa, kb, wb) =>
      s"graft.functions.HashKernels.sortedWeightedDot($ka, $wa, $kb, $wb)")
  override protected def withNewChildrenInternal(
      first: Expression, second: Expression, third: Expression,
      fourth: Expression): SortedWeightedDot =
    copy(keysA = first, weightsA = second, keysB = third, weightsB = fourth)
  override def prettyName: String = "graft_sorted_dot"
}

/** Vector kernels for the similarity operators (same rationale as
  * HashKernels: per-row loops belong in compiled code, not interpreted
  * higher-order functions — IVF assignment measured 12.8 s vs ~1 s). */
object VectorKernels {
  /** Integer dot of a code array against a fixed query's codes — the
    * [[IntDotToQuery]] body. Truncates to the shorter length; null
    * elements read as 0. */
  def intDotQ(codes: ArrayData, q: Array[Int]): Long = {
    val n = math.min(codes.numElements(), q.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!codes.isNullAt(i)) acc += codes.getInt(i).toLong * q(i)
      i += 1
    }
    acc
  }

  /** Double-array variant. */
  def nearestDouble(vec: ArrayData, centroids: Array[Array[Double]]): Int = {
    val xs = vec.toDoubleArray()
    if (xs.isEmpty) return -1
    var best = -1
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var d = 0.0
      var i = 0
      val dim = math.min(xs.length, cent.length)
      while (i < dim) {
        val diff = xs(i) - cent(i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** One primitive-double copy of the vector; null ELEMENTS read as 0.0 on
    * both paths. Only GenericArrayData (transform output, array literals,
    * …) takes the per-element null-checked getters — its boxed getFloat/
    * getDouble NPE on null elements, which would kill the task instead of
    * degrading like the zip_with form this kernel replaced. Every other
    * ArrayData (UnsafeArrayData, the vectorized reader's ColumnarArray)
    * keeps the bulk primitive copy — routing ColumnarArray through the
    * per-element path measured 6× slower on the ANN scan. */
  private def toDoubles(vec: ArrayData, isFloat: Boolean): Array[Double] = vec match {
    case g: GenericArrayData =>
      val n = g.numElements()
      val out = new Array[Double](n)
      var i = 0
      if (isFloat) while (i < n) { if (!g.isNullAt(i)) out(i) = g.getFloat(i).toDouble; i += 1 }
      else while (i < n) { if (!g.isNullAt(i)) out(i) = g.getDouble(i); i += 1 }
      out
    case _ =>
      if (isFloat) {
        val fs = vec.toFloatArray()
        val out = new Array[Double](fs.length)
        var i = 0
        while (i < fs.length) { out(i) = fs(i).toDouble; i += 1 }
        out
      } else vec.toDoubleArray()
  }

  /** Cosine similarity of a row vector against a fixed query vector whose
    * norm is precomputed driver-side. Accumulates left-to-right in double —
    * bit-identical to the zip_with/aggregate formulation it replaces (and
    * to DuckDB's list_cosine_similarity on the same data) for equal-dim,
    * null-free vectors; unequal lengths truncate to the shorter (callers
    * validate dims). 0.0 when either norm is zero. */
  def cosineQ(vec: ArrayData, q: Array[Double], qNorm: Double, isFloat: Boolean): Double = {
    val xs = toDoubles(vec, isFloat)
    val n = math.min(xs.length, q.length)
    var dot = 0.0
    var na = 0.0
    var i = 0
    while (i < n) {
      val x = xs(i)
      dot += x * q(i)
      na += x * x
      i += 1
    }
    val den = math.sqrt(na) * qNorm
    if (den > 0) dot / den else 0.0
  }

  /** Cosine similarity of two row vectors (same accumulation contract). */
  def cosinePair(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val xs = toDoubles(a, aFloat)
    val ys = toDoubles(b, bFloat)
    val n = math.min(xs.length, ys.length)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = xs(i)
      val y = ys(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den > 0) dot / den else 0.0
  }

  /** Random-hyperplane signatures: one bucket id per table — sign bits of
    * `planesPerTable` plane dot-products, offset by table index so tables
    * never collide in a join key. `planes` is indexed
    * [t * planesPerTable + p]; replaces tables×planes interpreted
    * aggregate/zip_with trees per row. The vector is copied to a primitive
    * array ONCE, not re-walked per plane. */
  def hyperplaneSig(
      vec: ArrayData, planes: Array[Array[Double]],
      planesPerTable: Int, tables: Int, isFloat: Boolean): ArrayData = {
    val xs = toDoubles(vec, isFloat)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var p = 0
      while (p < planesPerTable) {
        val plane = planes(t * planesPerTable + p)
        val n = math.min(xs.length, plane.length)
        var d = 0.0
        var i = 0
        while (i < n) {
          d += xs(i) * plane(i)
          i += 1
        }
        if (d >= 0) sig |= 1L << p
        p += 1
      }
      out(t) = sig + t.toLong * (1L << 32)
      t += 1
    }
    new GenericArrayData(out)
  }

  /** ONE table's signature from the [t·planesPerTable, (t+1)·planesPerTable)
    * slice of the plane matrix — for per-row table-dependent refinement
    * keys, where computing every table's signature and discarding all but
    * one would cost tables× the kernel work. Raw signature, no table
    * offset (callers key on it alongside a table-distinct column). */
  def hyperplaneSigOne(
      vec: ArrayData, planes: Array[Array[Double]],
      planesPerTable: Int, table: Int, isFloat: Boolean): Long = {
    val xs = toDoubles(vec, isFloat)
    var sig = 0L
    var p = 0
    while (p < planesPerTable) {
      val plane = planes(table * planesPerTable + p)
      val n = math.min(xs.length, plane.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        d += xs(i) * plane(i)
        i += 1
      }
      if (d >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  /** Product-quantization codes: the vector is cut into `m` contiguous
    * `subDim`-wide subspaces; each yields the index of its nearest codeword
    * (squared L2) in that subspace's codebook. `codebooks` is flat,
    * indexed [s·k + c]. Returns array<int> of length m. Vectors shorter
    * than a subspace's span compare only the overlapping prefix (callers
    * validate dims — same contract as [[nearestDouble]]). */
  def pqCodes(
      vec: ArrayData, codebooks: Array[Array[Double]],
      m: Int, k: Int, subDim: Int, isFloat: Boolean,
      normalize: Boolean): ArrayData = {
    val xs = toDoubles(vec, isFloat)
    if (normalize) {
      var n2 = 0.0
      var i = 0
      while (i < xs.length) { n2 += xs(i) * xs(i); i += 1 }
      if (n2 > 0) {
        val inv = 1.0 / math.sqrt(n2)
        i = 0
        while (i < xs.length) { xs(i) *= inv; i += 1 }
      }
    }
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val off = s * subDim
      var best = -1
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val cw = codebooks(s * k + c)
        var d = 0.0
        var i = 0
        val lim = math.min(cw.length, math.min(subDim, math.max(0, xs.length - off)))
        while (i < lim) {
          val diff = xs(off + i) - cw(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Binary sign quantization: bit (i mod 64) of word (i div 64) is set
    * iff component i ≥ 0 (IEEE `>=`, so −0.0 packs as 1 — the same rule a
    * SQL `x >= 0` mirror evaluates). ceil(dim/64) words per vector: the
    * 64×-compressed scan body for Hamming shortlisting. */
  def signBits(vec: ArrayData, isFloat: Boolean): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Long]((n + 63) >> 6)
    var i = 0
    while (i < n) {
      val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      if (x >= 0) out(i >> 6) |= 1L << (i & 63)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Hamming distance of a packed sign signature to the query's packed
    * signature (popcount over XOR; shorter side zero-extends). */
  def hammingToQuery(bits: ArrayData, q: Array[Long]): Long = {
    val nb = bits.numElements()
    val n = math.max(nb, q.length)
    var d = 0L
    var w = 0
    while (w < n) {
      val a = if (w < nb) bits.getLong(w) else 0L
      val b = if (w < q.length) q(w) else 0L
      d += java.lang.Long.bitCount(a ^ b)
      w += 1
    }
    d
  }

  /** L2 norm of a vector (one primitive pass). */
  def l2Norm(vec: ArrayData, isFloat: Boolean): Double = {
    val xs = toDoubles(vec, isFloat)
    var n2 = 0.0
    var i = 0
    while (i < xs.length) { n2 += xs(i) * xs(i); i += 1 }
    math.sqrt(n2)
  }

  /** Asymmetric-distance computation: Σ_s lut[s·k + codes(s)] — the
    * query's per-subspace distance table rides as one flat reference
    * array, so scoring a row touches m doubles, never the vector. */
  def adcDistance(codes: ArrayData, lut: Array[Double], k: Int): Double = {
    val n = codes.numElements()
    var s = 0
    var d = 0.0
    while (s < n) {
      val c = codes.getInt(s)
      if (c >= 0) d += lut(s * k + c)
      s += 1
    }
    d
  }

  /** Float-array fast path (the embeddings column's actual type). */
  def nearestFloat(vec: ArrayData, centroids: Array[Array[Double]]): Int = {
    val n = vec.numElements()
    if (n == 0) return -1
    val xs = vec.toFloatArray()
    var best = -1
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var d = 0.0
      var i = 0
      val dim = math.min(xs.length, cent.length)
      while (i < dim) {
        val diff = xs(i).toDouble - cent(i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }
}

/** array<float> → int: nearest-centroid index (codegen'd; the centroid
  * matrix rides as a codegen reference object, not an expression tree of
  * k×dim literals). */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects array<float|double>, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  private def isFloatArray: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def nullSafeEval(input: Any): Any =
    if (isFloatArray) VectorKernels.nearestFloat(input.asInstanceOf[ArrayData], centroids)
    else VectorKernels.nearestDouble(input.asInstanceOf[ArrayData], centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val kernel = if (isFloatArray) "nearestFloat" else "nearestDouble"
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorKernels.$kernel($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
  override def prettyName: String = "nearest_centroid"
}

private object VectorExprs {
  def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  def checkVec(name: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name expects array<float|double>, got ${other.simpleString}")
  }
  def checkIntVec(name: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name expects array<int>, got ${other.simpleString}")
  }
}

/** array<int> → long: integer dot product against a fixed quantized query
  * (codegen'd; the query codes ride as a reference object). The SQ8
  * shortlist scan body: pure integer ALU, exact in a long for any real
  * dimensionality (|code| ≤ 127 ⇒ |dot| ≤ dim·127² < 2⁶³ until
  * dim ~ 5.7e14). Null elements read as 0 (the codegen'd quantizer never
  * emits them; a hand-built array refusing would be noise). */
case class IntDotToQuery(child: Expression, q: Array[Int])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.checkIntVec(prettyName, child.dataType)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    VectorKernels.intDotQ(input.asInstanceOf[ArrayData], q)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("q", q, "int[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorKernels.intDotQ($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): IntDotToQuery =
    copy(child = newChild)
  override def prettyName: String = "int_dot_to_query"
}

/** array<float|double> → double: cosine against a fixed query (codegen'd;
  * query vector + its norm ride as reference objects). */
case class CosineToQuery(child: Expression, q: Array[Double], qNorm: Double)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.checkVec(prettyName, child.dataType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    VectorKernels.cosineQ(input.asInstanceOf[ArrayData], q, qNorm,
      VectorExprs.isFloatArray(child))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("q", q, "double[]")
    // qNorm rides as a reference object too: interpolating a Double into
    // source text produces uncompilable Java for Infinity/NaN norms
    val normRef = ctx.addReferenceObj("qNorm", java.lang.Double.valueOf(qNorm),
      "java.lang.Double")
    val fl = VectorExprs.isFloatArray(child)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.cosineQ($c, $ref, $normRef.doubleValue(), $fl)")
  }
  override protected def withNewChildInternal(newChild: Expression): CosineToQuery =
    copy(child = newChild)
  override def prettyName: String = "cosine_to_query"
}

/** (array, array) → double: pairwise cosine (codegen'd). */
case class CosinePair(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.checkVec(prettyName, left.dataType) match {
      case TypeCheckResult.TypeCheckSuccess => VectorExprs.checkVec(prettyName, right.dataType)
      case fail => fail
    }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosinePair(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      VectorExprs.isFloatArray(left), VectorExprs.isFloatArray(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (af, bf) = (VectorExprs.isFloatArray(left), VectorExprs.isFloatArray(right))
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.cosinePair($a, $b, $af, $bf)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosinePair =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_pair"
}

/** array<float|double> → array<long>: per-table hyperplane bucket ids
  * (codegen'd; the plane matrix rides as a reference object instead of
  * tables×planes×dim literal trees). */
case class HyperplaneSig(
    child: Expression, planes: Array[Array[Double]],
    planesPerTable: Int, tables: Int) extends UnaryExpression {
  // the signature packs into the low 32 bits (table offset is t·2^32);
  // 33+ planes would silently overflow into the table keyspace and
  // collide buckets ACROSS tables (silent recall loss)
  require(planesPerTable <= 32,
    s"planesPerTable ($planesPerTable) must be <= 32 (signature shares a long with the table offset)")
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.checkVec(prettyName, child.dataType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    VectorKernels.hyperplaneSig(input.asInstanceOf[ArrayData], planes,
      planesPerTable, tables, VectorExprs.isFloatArray(child))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    val fl = VectorExprs.isFloatArray(child)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.hyperplaneSig($c, $ref, $planesPerTable, $tables, $fl)")
  }
  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_sig"
}

/** (array<float|double>, int) → bigint: ONE table's hyperplane signature
  * selected per row by the table-index child (codegen'd). */
case class HyperplaneSigAt(
    left: Expression, right: Expression,
    planes: Array[Array[Double]], planesPerTable: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(planesPerTable <= 32,
    s"planesPerTable ($planesPerTable) must be <= 32")
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.checkVec(prettyName, left.dataType) match {
      case TypeCheckResult.TypeCheckSuccess =>
        if (right.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName table index must be int, got ${right.dataType.simpleString}")
      case fail => fail
    }
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any, t: Any): Any =
    VectorKernels.hyperplaneSigOne(v.asInstanceOf[ArrayData], planes,
      planesPerTable, t.asInstanceOf[Int], VectorExprs.isFloatArray(left))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    val fl = VectorExprs.isFloatArray(left)
    defineCodeGen(ctx, ev, (v, t) =>
      s"graft.functions.VectorKernels.hyperplaneSigOne($v, $ref, $planesPerTable, $t, $fl)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HyperplaneSigAt =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "hyperplane_sig_at"
}

/** array<float|double> → array<int>: product-quantization codes (codegen'd;
  * the flat [s·k + c] codebook rides as one reference object). */
case class PqCodes(
    child: Expression, codebooks: Array[Array[Double]],
    m: Int, k: Int, subDim: Int, normalize: Boolean)
    extends UnaryExpression {
  require(m > 0 && k > 0 && subDim > 0, s"bad PQ shape: m=$m k=$k subDim=$subDim")
  require(codebooks.length == m * k,
    s"codebooks length ${codebooks.length} != m*k = ${m * k}")
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.checkVec(prettyName, child.dataType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    VectorKernels.pqCodes(input.asInstanceOf[ArrayData], codebooks,
      m, k, subDim, VectorExprs.isFloatArray(child), normalize)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "double[][]")
    val fl = VectorExprs.isFloatArray(child)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.pqCodes($c, $ref, $m, $k, $subDim, $fl, $normalize)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
  override def prettyName: String = "graft_pq_codes"
}

/** array<float|double> → double: L2 norm (codegen'd; the train path's
  * normalized-mean aggregation divides slice elements by it without an
  * interpreted per-element lambda). */
case class VecL2Norm(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.checkVec(prettyName, child.dataType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    VectorKernels.l2Norm(input.asInstanceOf[ArrayData],
      VectorExprs.isFloatArray(child))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fl = VectorExprs.isFloatArray(child)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.l2Norm($c, $fl)")
  }
  override protected def withNewChildInternal(newChild: Expression): VecL2Norm =
    copy(child = newChild)
  override def prettyName: String = "graft_l2_norm"
}

/** array<int> → double: asymmetric PQ distance against a query's
  * per-subspace LUT (codegen'd; the flat [s·k + c] table is one reference
  * array — scoring never touches the original vector). */
case class AdcDistance(child: Expression, lut: Array[Double], k: Int)
    extends UnaryExpression {
  require(k > 0 && lut.length % k == 0, s"lut length ${lut.length} not a multiple of k=$k")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_adc_distance expects array<int>, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    VectorKernels.adcDistance(input.asInstanceOf[ArrayData], lut, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lut", lut, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.adcDistance($c, $ref, $k)")
  }
  override protected def withNewChildInternal(newChild: Expression): AdcDistance =
    copy(child = newChild)
  override def prettyName: String = "graft_adc_distance"
}

/** array<float|double> → array<long>: packed sign bits (codegen'd) — the
  * 1-bit-per-component binary quantization whose Hamming distance
  * approximates angular distance (Charikar 2002 SimHash bound applied to
  * the coordinate basis). */
case class SignBits(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.checkVec(prettyName, child.dataType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    VectorKernels.signBits(input.asInstanceOf[ArrayData],
      VectorExprs.isFloatArray(child))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fl = VectorExprs.isFloatArray(child)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.signBits($c, $fl)")
  }
  override protected def withNewChildInternal(newChild: Expression): SignBits =
    copy(child = newChild)
  override def prettyName: String = "graft_sign_bits"
}

/** array<long> → bigint: Hamming distance to a literal packed query
  * signature (codegen'd; the query words ride as one reference array —
  * scoring a row is ceil(dim/64) XOR+popcounts, never a float). */
case class HammingToQuery(child: Expression, q: Array[Long])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint> sign bits, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    VectorKernels.hammingToQuery(input.asInstanceOf[ArrayData], q)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qbits", q, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.hammingToQuery($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): HammingToQuery =
    copy(child = newChild)
  override def prettyName: String = "graft_hamming_to_query"
}

/** Byte-level Aho–Corasick automaton over a phrase blocklist — the
  * content-filter primitive (LDNOOBW-style phrase lists) where a regex
  * alternation explodes at thousands of patterns. Built ONCE on the driver,
  * shipped as a single reference object per executor; matching is one
  * amortized-O(1) transition per input byte. `endCount(s)` pre-folds the
  * number of phrases ending at state s or anywhere along its fail chain,
  * so EVERY occurrence end position is counted — overlapping matches
  * included (the oracle-replayable contract: count of (phrase, end
  * position) pairs). The blocklist is a SET: duplicate list entries are
  * deduplicated, so each occurrence counts once regardless of how many
  * times the phrase was listed. Matching is exact-bytes and
  * case-sensitive — normalize upstream; UTF-8 is self-synchronizing, so
  * byte-level equals character-level matching for valid UTF-8 phrases.
  *
  * After BFS construction the automaton is FROZEN into flat primitive
  * arrays: a dense 256-entry DFA row for the root (where the fail chain
  * always terminates) plus per-state unsigned-sorted byte/next edge
  * slices. The match loop is allocation-free — no boxing, no hashing —
  * because at 100 TB of text this per-byte constant factor IS the
  * operator. */
final class AcAutomaton(phrasesIn: Seq[String]) extends Serializable {
  require(phrasesIn.nonEmpty, "phrase blocklist must be non-empty")
  require(phrasesIn.forall(p => p != null && p.nonEmpty),
    "blocklist phrases must be non-empty, non-null strings")
  private val t = AcAutomaton.build(phrasesIn.distinct)

  /** Number of automaton states (diagnostics / scale probes). */
  def numStates: Int = t.fail.length

  /** Total occurrence count (every end position, overlaps included). */
  def count(text: UTF8String): Long = {
    val rootNext = t.rootNext
    val fail = t.fail
    val endCount = t.endCount
    val edgeOff = t.edgeOff
    val edgeByte = t.edgeByte
    val edgeTo = t.edgeTo
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val nb = text.numBytes
    var s = 0
    var total = 0L
    var i = 0
    while (i < nb) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0xFF
      var ns = -1
      while (ns < 0) {
        if (s == 0) ns = rootNext(b) // dense root row: 0 when no edge
        else {
          // unsigned-sorted binary search in this state's edge slice
          var lo = edgeOff(s)
          var hi = edgeOff(s + 1) - 1
          var found = -1
          while (found < 0 && lo <= hi) {
            val mid = (lo + hi) >>> 1
            val mb = edgeByte(mid) & 0xFF
            if (mb == b) found = edgeTo(mid)
            else if (mb < b) lo = mid + 1
            else hi = mid - 1
          }
          if (found >= 0) ns = found else s = fail(s)
        }
      }
      s = ns
      total += endCount(s)
      i += 1
    }
    total
  }
}

object AcAutomaton {
  /** Frozen transition tables: all primitive arrays, compact on the wire
    * (∝ total distinct phrase bytes) and allocation-free to probe. */
  private final case class Tables(
      rootNext: Array[Int], fail: Array[Int], endCount: Array[Int],
      edgeOff: Array[Int], edgeByte: Array[Byte], edgeTo: Array[Int])

  private def build(phrases: Seq[String]): Tables = {
    // trie via a single (state << 8 | byte) → next map: build-time only,
    // discarded after the freeze
    val trans = new java.util.HashMap[java.lang.Long, Integer]()
    def key(s: Int, b: Int): java.lang.Long =
      java.lang.Long.valueOf((s.toLong << 8) | (b & 0xFFL))
    var nStates = 1
    val endsAt = scala.collection.mutable.ArrayBuffer(0)
    phrases.foreach { p =>
      var s = 0
      p.getBytes("UTF-8").foreach { b =>
        val nxt = trans.get(key(s, b))
        s = if (nxt != null) nxt.intValue()
        else {
          endsAt += 0
          trans.put(key(s, b), Integer.valueOf(nStates)): Unit
          nStates += 1
          nStates - 1
        }
      }
      endsAt(s) += 1
    }
    val fail = new Array[Int](nStates)
    val endCount = new Array[Int](nStates)
    // per-state edge lists, unsigned-byte-sorted — built once, reused for
    // both the BFS and the frozen slices
    val childBytes = Array.fill(nStates)(List.empty[Int])
    trans.forEach { (k, v) =>
      val s = (k.longValue() >>> 8).toInt
      childBytes(s) = (k.longValue() & 0xFF).toInt :: childBytes(s)
      val _ = v
    }
    val sortedChildren: Array[Array[Int]] = childBytes.map(_.sorted.toArray)
    // BFS fail links; endCount folds the fail chain (shallower first)
    val queue = scala.collection.mutable.Queue[Int]()
    endCount(0) = endsAt(0)
    sortedChildren(0).foreach { b =>
      val v = trans.get(key(0, b)).intValue()
      fail(v) = 0
      queue.enqueue(v)
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      endCount(u) = endsAt(u) + endCount(fail(u))
      sortedChildren(u).foreach { b =>
        val v = trans.get(key(u, b)).intValue()
        var f = fail(u)
        var fn = trans.get(key(f, b))
        while (fn == null && f != 0) { f = fail(f); fn = trans.get(key(f, b)) }
        fail(v) = if (fn != null && fn.intValue() != v) fn.intValue() else 0
        queue.enqueue(v)
      }
    }
    // freeze: dense root row + flattened sorted edge slices
    val rootNext = new Array[Int](256)
    sortedChildren(0).foreach(b => rootNext(b) = trans.get(key(0, b)).intValue())
    val edgeOff = new Array[Int](nStates + 1)
    var off = 0
    var s = 0
    while (s < nStates) { edgeOff(s) = off; off += sortedChildren(s).length; s += 1 }
    edgeOff(nStates) = off
    val edgeByte = new Array[Byte](off)
    val edgeTo = new Array[Int](off)
    s = 0
    while (s < nStates) {
      var j = edgeOff(s)
      sortedChildren(s).foreach { b =>
        edgeByte(j) = b.toByte
        edgeTo(j) = trans.get(key(s, b)).intValue()
        j += 1
      }
      s += 1
    }
    Tables(rootNext, fail, endCount, edgeOff, edgeByte, edgeTo)
  }
}

/** string → bigint: total blocklist-phrase occurrences in the text via a
  * shared [[AcAutomaton]] (codegen'd: one static call per row). Phrase-list
  * validation is EAGER (construction = analysis time, on the driver):
  * the automaton itself is built lazily per executor, so a bad list must
  * not wait to fail per-task behind the `@transient lazy val`. */
case class PhraseMatchCount(child: Expression, phrases: Seq[String])
    extends UnaryExpression {
  require(phrases != null && phrases.nonEmpty,
    s"$prettyName: phrase blocklist must be non-empty")
  require(phrases.forall(p => p != null && p.nonEmpty),
    s"$prettyName: blocklist phrases must be non-empty, non-null strings")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  @transient private lazy val ac = new AcAutomaton(phrases)
  override def nullSafeEval(input: Any): Any =
    ac.count(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ac", ac, "graft.functions.AcAutomaton")
    defineCodeGen(ctx, ev, c => s"$ref.count($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): PhraseMatchCount =
    copy(child = newChild)
  override def prettyName: String = "graft_phrase_matches"
}

/** Column-API entry points. */
object NativeHash {
  def nearestCentroid(vec: Column, centroids: Seq[Array[Double]]): Column =
    Bridge.column(NearestCentroid(Bridge.expression(vec), centroids.toArray))
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingles), numHashes))
  def dupNgramCoverage(text: Column, k: Int): Column =
    Bridge.column(DupNgramCoverage(Bridge.expression(text), k))
  def topNgramCoverage(text: Column, k: Int): Column =
    Bridge.column(DupNgramCoverage(Bridge.expression(text), k, top = true))
  def kgramWindowHashes(text: Column, k: Int): Column =
    Bridge.column(KGramWindowHashes(Bridge.expression(text), k))
  def linearTextScore(text: Column, weights: Map[String, Long], bias: Long): Column =
    Bridge.column(LinearTextScore(Bridge.expression(text), weights, bias))
  def simhash64(tokens: Column, poly: Boolean = false): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens), poly))
  def bloomMightContain(c: Column,
      bf: org.apache.spark.util.sketch.BloomFilter): Column =
    Bridge.column(BloomMightContain(Bridge.expression(c), bf))
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeEncode(Bridge.expression(text), merges))
  def sortedIntersectCount(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))
  def sortedWeightedDot(ka: Column, wa: Column, kb: Column, wb: Column): Column =
    Bridge.column(SortedWeightedDot(Bridge.expression(ka), Bridge.expression(wa),
      Bridge.expression(kb), Bridge.expression(wb)))
  def cosineToQuery(vec: Column, q: Array[Double], qNorm: Double): Column =
    Bridge.column(CosineToQuery(Bridge.expression(vec), q, qNorm))
  def intDotToQuery(codes: Column, q: Array[Int]): Column =
    Bridge.column(IntDotToQuery(Bridge.expression(codes), q))
  def cosinePair(a: Column, b: Column): Column =
    Bridge.column(CosinePair(Bridge.expression(a), Bridge.expression(b)))
  def hyperplaneSig(vec: Column, planes: Array[Array[Double]],
      planesPerTable: Int, tables: Int): Column =
    Bridge.column(HyperplaneSig(Bridge.expression(vec), planes, planesPerTable, tables))
  def hyperplaneSigAt(vec: Column, tableIdx: Column,
      planes: Array[Array[Double]], planesPerTable: Int): Column =
    Bridge.column(HyperplaneSigAt(Bridge.expression(vec), Bridge.expression(tableIdx),
      planes, planesPerTable))
  def pqCodes(vec: Column, codebooks: Array[Array[Double]],
      m: Int, k: Int, subDim: Int, normalize: Boolean = true): Column =
    Bridge.column(PqCodes(Bridge.expression(vec), codebooks, m, k, subDim, normalize))
  def adcDistance(codes: Column, lut: Array[Double], k: Int): Column =
    Bridge.column(AdcDistance(Bridge.expression(codes), lut, k))
  def l2Norm(vec: Column): Column =
    Bridge.column(VecL2Norm(Bridge.expression(vec)))
  def signBits(vec: Column): Column =
    Bridge.column(SignBits(Bridge.expression(vec)))
  def hammingToQuery(bits: Column, q: Array[Long]): Column =
    Bridge.column(HammingToQuery(Bridge.expression(bits), q))
  def phraseMatchCount(text: Column, phrases: Seq[String]): Column =
    Bridge.column(PhraseMatchCount(Bridge.expression(text), phrases))
}
