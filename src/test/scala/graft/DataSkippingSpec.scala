package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.store.VersionedTable

/** Manifest-level data skipping + OPTIMIZE clustering:
  * - every commit records per-dir min/max/nullCount stats with zero extra
  *   scan, and `readWhere` drops refuted dirs before listing;
  * - pruning is SOUND: readWhere ≡ read().filter for randomized predicates;
  * - optimize compacts to the requested dir count, preserves content
  *   exactly, and clustering makes the per-dir stats disjoint so range
  *   predicates scan ~1/targetDirs of the dirs;
  * - z-order interleaving keeps BOTH clustered columns prunable;
  * - the Delta mirror stays consistent across an optimize commit. */
class DataSkippingSpec extends SparkSuite {
  import spark.implicits._

  /** Optimize chunk dirs are `v<10 digits>-<8 hex uuid chars>-c<chunk>`;
    * plain append dirs are `v<10 digits>-<8 hex>`. Matching on a loose
    * "-c\d+" (or worse, contains("-c")) can catch an append dir whose
    * uuid prefix happens to be 'c' + digits — a real 1-in-40ish flake. */
  private val ChunkDirRe = """v\d{10}-[0-9a-f]{8}-c\d+"""

  test("append stats prune dirs for range/point/null predicates") {
    val root = tmpDir("skip-basic")
    val t = new VersionedTable(spark, root)
    // 4 appends with disjoint key ranges — like 4 engine syncs
    (0 until 4).foreach { k =>
      t.append((k * 100 until (k + 1) * 100)
        .map(i => (i.toLong, s"s$i", Date.valueOf(s"2024-0${k + 1}-01"),
          new Timestamp(1700000000000L + k * 86400000L)))
        .toDF("id", "s", "d", "ts"))
    }
    assert(t.dirCount == 4)
    // point: one dir
    assert(t.scannedDirCount($"id" === 150L) == 1)
    assert(t.readWhere($"id" === 150L).count() == 1)
    // range [150, 350): dirs 1, 2 and 3 (rows 300..349 live in dir 3)
    assert(t.scannedDirCount($"id" >= 150L && $"id" < 350L) == 3)
    assert(t.readWhere($"id" >= 150L && $"id" < 350L).count() == 200)
    assert(t.scannedDirCount($"id" >= 150L && $"id" < 300L) == 2)
    // date + timestamp typed literals prune too
    assert(t.scannedDirCount($"d" === lit(Date.valueOf("2024-03-01"))) == 1)
    assert(t.scannedDirCount($"ts" > lit(new Timestamp(1700000000000L + 2 * 86400000L))) == 1)
    // string prunes
    assert(t.scannedDirCount($"s" === "s0") == 1)
    // no non-null id is ever null → IS NULL prunes everything
    assert(t.scannedDirCount($"id".isNull) == 0)
    assert(t.readWhere($"id".isNull).count() == 0)
    // IN-list
    assert(t.scannedDirCount($"id".isin(10L, 210L)) == 2)
    // unsupported shapes keep every dir (sound, no pruning)
    assert(t.scannedDirCount(abs($"id") === 150L) == 4)
  }

  test("plain read().filter prunes dirs transparently via the file index") {
    val root = tmpDir("skip-transparent")
    val t = new VersionedTable(spark, root)
    (0 until 4).foreach { k =>
      t.append((k * 100 until (k + 1) * 100).map(i => (i.toLong, s"s$i")).toDF("id", "s"))
    }
    // NO readWhere — an ordinary filter must reach the index as a pushed
    // dataFilter and keep exactly one of the four dirs
    val df = t.read().filter($"id" === 150L)
    assert(df.count() == 1)
    val idx = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f.relation.location
    }.collectFirst { case g: org.apache.spark.sql.graft.GraftFileIndex => g }
    assert(idx.isDefined, "scan must be backed by GraftFileIndex")
    assert(idx.get.lastPruning.contains((1, 4)), s"got ${idx.get.lastPruning}")
    // planner sees exact byte sizes (all dirs carry byte stats)
    assert(idx.get.sizeInBytes > 0 && idx.get.sizeInBytes < Long.MaxValue / 8)
  }

  test("readWhere ≡ read().filter on randomized predicates (soundness)") {
    val root = tmpDir("skip-rand")
    val t = new VersionedTable(spark, root)
    val rnd = new scala.util.Random(42)
    (0 until 5).foreach { _ =>
      t.append(Seq.fill(200)((rnd.nextInt(1000).toLong, rnd.nextInt(50),
        if (rnd.nextBoolean()) null else s"v${rnd.nextInt(100)}"))
        .toDF("k", "g", "s"))
    }
    val preds = Seq(
      $"k" > 500L, $"k" === 17L, $"k" <= 3L, $"g" === 49,
      $"s".isNull, $"s".isNotNull && $"k" < 100L,
      $"k" > 200L && $"k" < 210L && $"g" >= 25)
    preds.foreach { p =>
      val expected = t.read().filter(p).groupBy().agg(count(lit(1)), sum($"k")).collect().toSeq
      val got = t.readWhere(p).groupBy().agg(count(lit(1)), sum($"k")).collect().toSeq
      assert(got == expected, s"readWhere mismatch for $p")
    }
  }

  test("string pruning follows UTF8 binary order for supplementary-plane text") {
    val root = tmpDir("skip-utf8")
    val t = new VersionedTable(spark, root)
    val supp = new String(Character.toChars(0x10000)) // 𐀀, surrogate pair
    val bmpHigh = "￿" // BMP char ABOVE the pair's high surrogate in UTF-16
    // Java compareTo: supp < bmpHigh (surrogate D800 < FFFF).
    // UTF8 binary (what Spark's min/max uses): supp > bmpHigh.
    t.append(Seq((1L, supp)).toDF("id", "s"))
    t.append(Seq((2L, "ascii")).toDF("id", "s"))
    // the supp dir must be KEPT for s >= bmpHigh (UTF-16 order would prune it)
    assert(t.readWhere($"s" >= bmpHigh).count() == 1)
    assert(t.readWhere($"s" >= bmpHigh).collect().head.getLong(0) == 1L)
    assert(t.readWhere($"s" === supp).count() == 1)
    // and the converse direction: a BMP-high row must survive s <= supp
    val root2 = tmpDir("skip-utf8-b")
    val t2 = new VersionedTable(spark, root2)
    t2.append(Seq((1L, bmpHigh)).toDF("id", "s"))
    assert(t2.readWhere($"s" <= supp).count() == 1)
    // randomized ≡ over a mixed supplementary/BMP-high/ascii corpus
    val alphabet = Vector(supp, bmpHigh, "", "z", "a", "é", "😀")
    val rnd = new scala.util.Random(99)
    val root3 = tmpDir("skip-utf8-rand")
    val t3 = new VersionedTable(spark, root3)
    (0 until 4).foreach { _ =>
      t3.append(Seq.fill(50)((rnd.nextInt(100).toLong,
        Seq.fill(1 + rnd.nextInt(3))(alphabet(rnd.nextInt(alphabet.size))).mkString))
        .toDF("id", "s"))
    }
    val lits = alphabet ++ alphabet.map(_ * 2)
    lits.foreach { l =>
      Seq($"s" === l, $"s" >= l, $"s" < l, $"s" > l && $"s" <= (l + "z")).foreach { p =>
        val expected = t3.read().filter(p).count()
        assert(t3.readWhere(p).count() == expected, s"readWhere mismatch for $p lit=$l")
      }
    }
  }

  test("lossy casts on the column side never prune") {
    val root = tmpDir("skip-losscast")
    val t = new VersionedTable(spark, root)
    // 2^53 + 1: representable as Long, NOT as Double (rounds to 2^53)
    val big = 9007199254740993L
    t.append(Seq((big, 1)).toDF("k", "g"))
    t.append(Seq((5L, 2)).toDF("k", "g"))
    // cast(k as double) === 9007199254740993d: the cast rounds k onto the
    // literal, so the dir MUST be kept even though exact Long-vs-Double
    // comparison refutes equality
    val p = $"k".cast("double") === lit(big.toDouble)
    assert(t.readWhere(p).count() == t.read().filter(p).count())
    assert(t.readWhere(p).count() == 1)
    // exact widening casts still prune (int col, long literal via cast)
    val root2 = tmpDir("skip-okcast")
    val t2 = new VersionedTable(spark, root2)
    t2.append(Seq((1, "a")).toDF("k", "s"))
    t2.append(Seq((100, "b")).toDF("k", "s"))
    assert(t2.scannedDirCount($"k".cast("long") === 100L) == 1)
  }

  test("all-null column prunes comparisons but keeps IS NULL") {
    val root = tmpDir("skip-nulls")
    val t = new VersionedTable(spark, root)
    t.append(Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "s"))
    t.append(Seq((3L, Option("x"))).toDF("id", "s"))
    assert(t.scannedDirCount($"s" === "x") == 1) // all-null dir pruned
    assert(t.scannedDirCount($"s".isNull) == 1) // no-null dir pruned
    assert(t.readWhere($"s" === "x").count() == 1)
  }

  test("oversized string stats are dropped, not wrong") {
    val root = tmpDir("skip-bigstr")
    val t = new VersionedTable(spark, root)
    t.append(Seq((1L, "a" * 5000)).toDF("id", "doc"))
    t.append(Seq((2L, "b")).toDF("id", "doc"))
    // the 5000-char dir has no doc stats → never pruned on doc; the "b" dir
    // HAS stats and is correctly pruned for an "aaa…" equality
    assert(t.scannedDirCount($"doc" === ("a" * 5000)) == 1)
    assert(t.readWhere($"doc" === ("a" * 5000)).count() == 1)
    // no doc predicate can ever prune the stats-dropped dir
    assert(t.scannedDirCount($"doc" > "zzz") == 1)
    assert(t.readWhere($"doc" > "zzz").count() == 0)
    // but id stats still prune
    assert(t.scannedDirCount($"id" === 2L) == 1)
  }

  test("optimize compacts, preserves content, and makes range stats disjoint") {
    val root = tmpDir("opt-range")
    val t = new VersionedTable(spark, root)
    val rnd = new scala.util.Random(7)
    (0 until 8).foreach { _ =>
      t.append(Seq.fill(250)((rnd.nextInt(10000).toLong, rnd.nextDouble()))
        .toDF("k", "v"))
    }
    val before = t.read().collect().map(_.toSeq).sortBy(_.toString())
    // every dir spans the whole key range → nothing prunes
    assert(t.scannedDirCount($"k" < 1000L) == 8)

    t.optimize(clusterBy = Seq("k"), targetDirs = 4)
    assert(t.dirCount == 4)
    val after = t.read().collect().map(_.toSeq).sortBy(_.toString())
    assert(after.toSeq == before.toSeq, "optimize must preserve content exactly")
    // clustered dirs have disjoint ranges → a 10% range hits 1 of 4 dirs
    assert(t.scannedDirCount($"k" < 1000L) == 1)
    assert(t.readWhere($"k" < 1000L).collect().toSeq.sortBy(_.getLong(0)) ==
      t.read().filter($"k" < 1000L).collect().toSeq.sortBy(_.getLong(0)))
    // time travel to the pre-optimize version still works
    assert(t.readVersion(t.requireVersion - 1).count() == 2000)
  }

  test("optimize zorder keeps both clustered columns prunable") {
    val root = tmpDir("opt-z")
    val t = new VersionedTable(spark, root)
    val rnd = new scala.util.Random(11)
    (0 until 4).foreach { _ =>
      t.append(Seq.fill(1000)((rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong,
        rnd.nextInt(10))).toDF("x", "y", "p"))
    }
    val total = t.read().count()
    t.optimize(clusterBy = Seq("x", "y"), targetDirs = 8, zorder = true)
    assert(t.read().count() == total)
    // a tight predicate on EITHER axis must skip dirs (chunk boundaries are
    // data quantiles, not bit-aligned, so allow straddling chunks)
    val xHit = t.scannedDirCount($"x" < 100L)
    val yHit = t.scannedDirCount($"y" < 100L)
    assert(xHit <= 6, s"x-slice scanned $xHit of 8 dirs")
    assert(yHit <= 6, s"y-slice scanned $yHit of 8 dirs")
    // and results stay exact
    assert(t.readWhere($"x" < 100L && $"y" < 100L).count() ==
      t.read().filter($"x" < 100L && $"y" < 100L).count())
  }

  test("optimize zorder with 4 columns keeps every axis prunable") {
    // 16 chunks ⇒ the top four interleaved bits all participate — one per
    // column — so a half-range slice on ANY axis must rule out chunks
    // (with 8 chunks only three columns reach the chunk split and the
    // fourth axis legitimately cannot prune). The 15-bit-per-column cap
    // keeps the 4-column interleave out of the sign bit, so z reads as a
    // plain unsigned curve position
    val root = tmpDir("opt-z4")
    val t = new VersionedTable(spark, root)
    val rnd = new scala.util.Random(13)
    (0 until 4).foreach { _ =>
      t.append(Seq.fill(1000)((rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong,
        rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong)).toDF("a", "b", "c", "d"))
    }
    t.optimize(clusterBy = Seq("a", "b", "c", "d"), targetDirs = 16, zorder = true)
    assert(t.read().count() == 4000)
    // pruning power tracks bit significance: d owns the top interleaved
    // bit (contiguous prefix block, ~half the chunks + one straddle), c the
    // next (two runs), b the third (four runs); a's bit alternates every
    // prefix so nearly every chunk straddles it — no guarantee, only
    // correctness. These bounds hold for any quantile-cut of uniform z
    val hits = Seq("a", "b", "c", "d")
      .map(c => c -> t.scannedDirCount(col(c) < 150L)).toMap
    assert(hits("d") <= 10, s"d-slice scanned ${hits("d")} of 16 dirs")
    assert(hits("c") <= 11, s"c-slice scanned ${hits("c")} of 16 dirs")
    assert(hits("b") <= 13, s"b-slice scanned ${hits("b")} of 16 dirs")
    Seq("a", "b", "c", "d").foreach { c =>
      assert(t.readWhere(col(c) < 150L).count() ==
        t.read().filter(col(c) < 150L).count())
    }
  }

  test("optimize zorder layout is deterministic across identical runs") {
    // chunk boundaries come from a full-pass quantile sketch, not a
    // sampled RangePartitioner (whose reservoir seed varies with RDD id):
    // two tables built identically must optimize to IDENTICAL dir contents
    def build(tag: String): String = {
      val root = tmpDir(s"opt-det-$tag")
      val t = new VersionedTable(spark, root)
      val rnd = new scala.util.Random(21)
      (0 until 3).foreach { _ =>
        t.append(Seq.fill(500)((rnd.nextInt(5000).toLong, rnd.nextDouble()))
          .toDF("k", "v"))
      }
      t.optimize(clusterBy = Seq("k"), targetDirs = 4, zorder = true)
      root
    }
    // per-chunk row contents, keyed by the chunk index in the dir name
    def layout(root: String): Map[Int, Seq[Long]] =
      new java.io.File(s"$root/data").listFiles()
        .filter(f => f.isDirectory && f.getName.matches(ChunkDirRe))
        .map { d =>
          d.getName.replaceAll(".*-c", "").toInt ->
            spark.read.parquet(d.getAbsolutePath)
              .select("k").collect().map(_.getLong(0)).toSeq.sorted
        }.toMap
    assert(layout(build("a")) == layout(build("b")))
  }

  test("optimize zorder writes files sorted by z within each dir") {
    val root = tmpDir("opt-zsort")
    val t = new VersionedTable(spark, root)
    t.append((0 until 4096).map(i => ((i * 2654435761L) % 4096, i.toLong)).toDF("x", "y"))
    t.optimize(clusterBy = Seq("x"), targetDirs = 2, zorder = true)
    // single-column zorder ⇒ z monotone in x ⇒ each written FILE must be
    // x-sorted (this is what drives parquet row-group pruning inside a dir)
    val dataDirs = new java.io.File(s"$root/data").listFiles()
      .filter(f => f.isDirectory && f.getName.matches(ChunkDirRe)).sortBy(_.getName)
    assert(dataDirs.length == 2)
    dataDirs.foreach { d =>
      d.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        val xs = spark.read.parquet(f.getAbsolutePath).select("x")
          .collect().map(_.getLong(0)).toSeq
        assert(xs == xs.sorted, s"file ${f.getName} not x-sorted after zorder")
      }
    }
  }

  test("readChanges slices commits by version with correct tagging") {
    val root = tmpDir("cdf")
    val t = new VersionedTable(spark, root)
    t.append(Seq((1L, "a")).toDF("id", "s")) // v0
    t.append(Seq((2L, "b"), (3L, "c")).toDF("id", "s")) // v1
    t.append(Seq((4L, "d")).toDF("id", "s")) // v2
    val all = t.readChanges(0L, 2L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Long]("__commit_version"))).sortBy(_._1)
    assert(all.toSeq == Seq((1L, "a", 0L), (2L, "b", 1L), (3L, "c", 1L), (4L, "d", 2L)))
    // tail slice
    val tail = t.readChanges(1L, 2L).select("id").collect().map(_.getLong(0)).sorted
    assert(tail.toSeq == Seq(2L, 3L, 4L))
    // historic slice against an older toVersion
    assert(t.readChanges(1L, 1L).count() == 2)
    // schema drift: new column reads as NULL for pre-drift commits
    t.append(Seq((5L, "e", 9L)).toDF("id", "s", "extra")) // v3
    val drifted = t.readChanges(0L, 3L)
    assert(drifted.columns.contains("extra"))
    assert(drifted.filter($"extra".isNull).count() == 4)
    assert(drifted.filter($"extra" === 9L).select("__commit_version").head().getLong(0) == 3L)
  }

  test("merge probe skips dirs whose pk range cannot match the batch") {
    val root = tmpDir("merge-prune")
    val t = new VersionedTable(spark, root)
    (0 until 4).foreach { k =>
      t.append((k * 100 until (k + 1) * 100).map(i => (i.toLong, s"v$i")).toDF("id", "s"))
    }
    val dirsBefore = new java.io.File(s"$root/data").listFiles().map(_.getName).toSet
    // batch touches only the [300, 400) range → dirs 0-2 must carry over
    // by reference (byte-identical, untouched on disk)
    val mtimes = dirsBefore.map(d => d -> new java.io.File(s"$root/data/$d").lastModified()).toMap
    t.merge(Seq((350L, "UPDATED"), (999L, "NEW")).toDF("id", "s"), Seq("id"))
    val out = t.read().filter($"id" === 350L || $"id" === 999L)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(out.toSeq == Seq((350L, "UPDATED"), (999L, "NEW")))
    assert(t.read().count() == 401)
    // the three out-of-range dirs still exist untouched
    val survived = dirsBefore.filter(d => new java.io.File(s"$root/data/$d").exists())
    assert(survived.size >= 3)
    survived.foreach(d =>
      assert(new java.io.File(s"$root/data/$d").lastModified() == mtimes(d)))
  }

  test("optimize writes parquet bloom filters for requested columns") {
    val root = tmpDir("opt-bloom")
    val t = new VersionedTable(spark, root)
    t.append((0 until 2000).map(i => (i.toLong, s"uuid-${i * 2654435761L}")).toDF("k", "pk"))
    t.optimize(clusterBy = Seq("k"), targetDirs = 1, bloomFilterFor = Seq("pk"))
    val dir = new java.io.File(s"$root/data").listFiles()
      .filter(f => f.isDirectory && f.getName.matches(ChunkDirRe)).head
    val pf = dir.listFiles().filter(_.getName.endsWith(".parquet")).head
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(pf.getAbsolutePath),
      spark.sparkContext.hadoopConfiguration)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val cols = reader.getFooter.getBlocks.get(0).getColumns
      val byPath = (0 until cols.size()).map(i => cols.get(i))
        .map(c => c.getPath.toDotString -> c).toMap
      assert(byPath("pk").getBloomFilterOffset > 0, "pk must carry a bloom filter")
      assert(byPath("k").getBloomFilterOffset <= 0, "k was not requested")
    } finally reader.close()
  }

  test("readAsOf and history expose the commit timeline") {
    val root = tmpDir("history")
    val t = new VersionedTable(spark, root)
    t.append(Seq((1, "a")).toDF("id", "s"))
    val afterV0 = System.currentTimeMillis()
    Thread.sleep(5)
    t.append(Seq((2, "b")).toDF("id", "s"))
    t.merge(Seq((2, "B")).toDF("id", "s"), Seq("id"))
    // timestampAsOf: a clock between v0 and v1 resolves to v0
    assert(t.readAsOf(afterV0).count() == 1)
    assert(t.readAsOf(System.currentTimeMillis()).count() == 2)
    intercept[IllegalArgumentException](t.readAsOf(0L))
    // history: newest first, operations tagged, exact row counts from stats
    val h = t.history().collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(2L, 1L, 0L))
    assert(h.map(_.getString(2)).toSeq == Seq("merge", "append", "append"))
    assert(h.map(_.getLong(4)).toSeq == Seq(2L, 2L, 1L)) // rows per version
    assert(h.forall(r => r.getLong(5) > 0L)) // bytes known everywhere
  }

  test("appendIdempotent applies each batch version exactly once") {
    val root = tmpDir("txn")
    val t = new VersionedTable(spark, root)
    assert(t.appendIdempotent(Seq((1, "a")).toDF("id", "s"), "streamA", 0L) == 0L)
    assert(t.appendIdempotent(Seq((2, "b")).toDF("id", "s"), "streamA", 1L) == 1L)
    // a retried batch (same or older version) is a no-op
    assert(t.appendIdempotent(Seq((2, "dup")).toDF("id", "s"), "streamA", 1L) == 1L)
    assert(t.appendIdempotent(Seq((0, "old")).toDF("id", "s"), "streamA", 0L) == 1L)
    assert(t.read().count() == 2)
    // independent apps have independent watermarks
    assert(t.appendIdempotent(Seq((3, "c")).toDF("id", "s"), "streamB", 0L) == 2L)
    assert(t.read().count() == 3)
    // the watermark survives restarts (it lives in the manifest)
    val t2 = new VersionedTable(spark, root)
    assert(t2.appendIdempotent(Seq((9, "x")).toDF("id", "s"), "streamA", 1L) == 2L)
    assert(t2.read().count() == 3)
  }

  test("delta mirror stays consistent across optimize") {
    val root = tmpDir("opt-mirror")
    val t = new VersionedTable(spark, root)
    (0 until 3).foreach(k => t.append(Seq((k, s"r$k")).toDF("id", "s")))
    t.optimize(targetDirs = 1)
    // replay the delta log like a client and compare with the manifest set
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    var files = Set.empty[String]
    new java.io.File(s"$root/_delta_log").listFiles()
      .filter(_.getName.matches("""\d{20}\.json""")).sortBy(_.getName)
      .foreach { f =>
        scala.io.Source.fromFile(f).getLines().filter(_.nonEmpty).foreach { l =>
          val n = mapper.readTree(l)
          if (n.has("add")) files += n.get("add").get("path").asText()
          if (n.has("remove")) files -= n.get("remove").get("path").asText()
        }
      }
    val live = {
      val logDir = new java.io.File(s"$root/_graft_log")
      val latest = logDir.listFiles().map(_.getName)
        .collect { case s if s.matches("""v\d{10}\.json""") => s.drop(1).take(10).toLong }.max
      val node = mapper.readTree(new java.io.File(s"$root/_graft_log/v${"%010d".format(latest)}.json"))
      val it = node.get("dirs").elements()
      var out = Set.empty[String]
      while (it.hasNext) {
        val d = it.next().get("dir").asText()
        new java.io.File(s"$root/data/$d").listFiles()
          .filter(f => f.isFile && f.getName.endsWith(".parquet"))
          .foreach(f => out += s"data/$d/${f.getName}")
      }
      out
    }
    assert(files == live, "delta-log replay must equal the post-optimize manifest file set")
  }
}
