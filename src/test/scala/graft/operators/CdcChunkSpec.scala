package graft.operators

import graft.SparkSuite

/** Content-defined chunking dedup ([[Dedup.cdcChunkStats]]): the operator's
  * hash-prefilter + raw-verify census must equal a direct reference
  * implementation chunk-for-chunk, and the chunking must be shift-resilient
  * (the property fixed windows lack — the reason CDC exists). */
class CdcChunkSpec extends SparkSuite {
  import spark.implicits._

  /** Reference: md5-gear chunking + exact-content duplicate census, all
    * driver-side. A token CUTS (ends its chunk) iff the first hex digit of
    * its md5 is '0' (cutBelow = "1"). */
  private def md5Hex1(s: String): Char = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    "%02x".format(d(0)).charAt(0)
  }
  private def chunksOf(text: String): Seq[String] = {
    val toks = text.split(" ", -1).toSeq
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    var cur = scala.collection.mutable.ArrayBuffer.empty[String]
    toks.foreach { t =>
      cur += t
      if (md5Hex1(t) < '1') { out += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer.empty }
    }
    if (cur.nonEmpty) out += cur.toSeq
    out.map(_.mkString(" ")).toSeq
  }
  private def referenceStats(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    val slots = docs.flatMap { case (id, text) =>
      chunksOf(text).map(c => (id, c, c.split(" ", -1).length.toLong))
    }
    val occ = slots.groupBy(_._2).map { case (c, xs) => c -> xs.size }
    docs.map { case (id, _) =>
      val mine = slots.filter(_._1 == id)
      val dup = mine.filter(s => occ(s._2) > 1)
      id -> (mine.size.toLong, dup.size.toLong, dup.map(_._3).sum)
    }.toMap
  }

  private def runOp(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    val out = Dedup.cdcChunkStats(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    Dedup.releaseIntermediates()
    out
  }

  private val rnd = new scala.util.Random(42)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi",
    "omicron", "pi", "rho", "sigma", "tau", "upsilon")
  private def sentence(n: Int): String =
    Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  test("randomized corpus with injected shared passages matches the reference") {
    val shared = sentence(40)
    val docs = (0L until 60L).map { i =>
      val own = sentence(20 + rnd.nextInt(60))
      val text =
        if (i % 3 == 0) s"$own $shared ${sentence(10)}"
        else if (i % 7 == 0) s"$shared $own"
        else own
      (i, text)
    }
    assert(runOp(docs) == referenceStats(docs))
  }

  test("shift resilience: a prefix edit leaves downstream chunks shared") {
    // the CDC selling point — prepending tokens to a copy must NOT re-chunk
    // the shared tail, so the two docs still report duplicated chunks past
    // the first boundary after the edit (a fixed-stride chunker would lose
    // every chunk to the offset shift)
    val tail = sentence(300)
    val docs = Seq((1L, tail), (2L, s"${sentence(7)} $tail"))
    val got = runOp(docs)
    val tailChunks = chunksOf(tail)
    // every tail chunk except possibly the first (absorbed into the edited
    // prefix until the first cut) must be duplicated in BOTH docs
    assert(tailChunks.size > 3, s"need a multi-chunk tail, got ${tailChunks.size}")
    val minShared = tailChunks.size - 1L
    assert(got(1L)._2 >= minShared, s"doc1 dup_chunks ${got(1L)._2} < $minShared")
    assert(got(2L)._2 >= minShared, s"doc2 dup_chunks ${got(2L)._2} < $minShared")
    assert(got == referenceStats(docs))
  }

  test("within-doc repetition counts every slot; empty text is one chunk") {
    val rep = sentence(30)
    val docs = Seq((1L, s"$rep $rep"), (2L, ""), (3L, sentence(5)))
    val got = runOp(docs)
    assert(got == referenceStats(docs))
    // doc 2: the empty string is one single-token chunk, never duplicated
    // unless another doc contains an empty token chunk
    assert(got(2L)._1 == 1L)
  }
}
