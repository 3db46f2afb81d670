package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Ad-hoc profiling drive for the simhash guard (not a test — run with
  * `Test/runMain graft.SimhashProbe`). */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()

    // bucket census under the gate config
    val sigs = Dedup.simhashed(docs, "doc_id", "text")
    val w = 8
    val banded = sigs.select(col("id"),
      explode(transform(sequence(lit(0), lit(7)), c =>
        call_function("shiftright", col("sig"), c * w).bitwiseAND(lit(255L)))).as("key"))
    val census = banded.groupBy("key").count()
      .agg(count(lit(1)), max("count"), sum(when(col("count") > 100, col("count") * col("count") / 2).otherwise(col("count") * col("count") / 2)))
    println("census(distinct keys, max bucket, sum c^2/2): " + census.collect().mkString)
    val over = banded.groupBy("key").count().filter(col("count") > 100).count()
    println(s"buckets over 100: $over")

    def time(tag: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = f
        Dedup.releaseIntermediates()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$tag: min ${ts.map(_._1).min}%.2f s of ${ts.map(t => f"${t._1}%.2f").mkString("/")}, ${ts.head._2} rows")
    }
    time(s"simhashVerifiedPairs mbs=100") {
      Dedup.simhashVerifiedPairs(docs, "doc_id", "text",
        maxHamming = 7, threshold = 0.9, numChunks = 8, maxBucketSize = 100).count()
    }
    // structural cost: jobs/stages/task-time for one cold run
    locally {
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      val stages = new java.util.concurrent.atomic.AtomicInteger
      val taskMs = new java.util.concurrent.atomic.AtomicLong
      val jobT0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          jobT0.put(j.jobId, System.nanoTime())
        }
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val ms = (System.nanoTime() - jobT0.getOrDefault(j.jobId, System.nanoTime())) / 1000000
          println(s"  job ${j.jobId}: ${ms}ms")
        }
        override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          taskMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
          println(s"    stage ${s.stageInfo.stageId} [${s.stageInfo.numTasks} tasks]: ${s.stageInfo.name.take(60)}")
        }
      }
      spark.sparkContext.addSparkListener(l)
      spark.catalog.clearCache()
      Dedup.simhashVerifiedPairs(docs, "doc_id", "text",
        maxHamming = 7, threshold = 0.9, numChunks = 8, maxBucketSize = 100).count()
      spark.sparkContext.removeSparkListener(l)
      Dedup.releaseIntermediates()
      println(s"structure: jobs=${jobs.get} stages=${stages.get} taskTimeMs=${taskMs.get}")
    }
    // isolate verify: candidates warm in cache, then verified total
    locally {
      spark.catalog.clearCache()
      val cand = Dedup.simhashPairs(docs, "doc_id", "text",
        maxHamming = 7, numChunks = 8, maxBucketSize = 100).count()
      val t0 = System.nanoTime()
      val n = Dedup.simhashVerifiedPairs(docs, "doc_id", "text",
        maxHamming = 7, threshold = 0.9, numChunks = 8, maxBucketSize = 100).count()
      println(f"verify-with-warm-banded: ${(System.nanoTime() - t0) / 1e9}%.2f s ($cand cands -> $n)")
      Dedup.releaseIntermediates()
    }
    // stage decomposition
    time("tokenize+simhash only") { Dedup.simhashed(docs, "doc_id", "text").count() }
    // doc length distribution + size-filter selectivity at t=0.9
    locally {
      import graft.functions.TextFunctions
      val sh = TextFunctions.shingleSets(docs.select(col("doc_id").as("id"), col("text")), "id", "text", 3)
        .select(col("id"), size(col("sh")).as("n"))
      println("shingle count stats: " + sh.agg(min("n"), expr("percentile(n, 0.5)"), max("n"), avg("n")).collect().mkString)
      val cand = Dedup.simhashPairs(docs, "doc_id", "text", 7, 8, 100).select("id_a", "id_b")
      val j = cand.join(sh.select(col("id").as("id_a"), col("n").as("na")), "id_a")
        .join(sh.select(col("id").as("id_b"), col("n").as("nb")), "id_b")
      val surv = j.filter(least(col("na"), col("nb")) * 1000L >= greatest(col("na"), col("nb")) * 900L).count()
      println(s"size-filter survivors at t=0.9: $surv of 19832")
      Dedup.releaseIntermediates()
    }
    time("candidates only (no verify)") {
      Dedup.simhashPairs(docs, "doc_id", "text",
        maxHamming = 7, numChunks = 8, maxBucketSize = 100).count()
    }
    Dedup.releaseIntermediates()
    time("candidates unguarded") {
      Dedup.simhashPairs(docs, "doc_id", "text",
        maxHamming = 7, numChunks = 8, maxBucketSize = Int.MaxValue).count()
    }
    Dedup.releaseIntermediates()
    // always-two-level variant: every row gets (chunk, sub) keys — no
    // census, no broadcasts, one shuffle join on 15-bit keys
    def twoLevel(maxHamming: Int, numChunks: Int): Long = {
      val w = 64 / numChunks
      val numSub = maxHamming + 1
      val subW = (64 - w) / numSub
      val mask = (1L << w) - 1L
      val subMask = (1L << subW) - 1L
      val sigs2 = Dedup.simhashed(docs, "doc_id", "text")
      val banded = sigs2.select(col("id"), col("sig"),
        explode(transform(sequence(lit(0), lit(numChunks - 1)), c => {
          val cw = c * w
          val key = call_function("shiftright", col("sig"), cw).bitwiseAND(lit(mask))
          val high = when((c + 1) * w >= 64, lit(0L))
            .otherwise(call_function("shiftrightunsigned", col("sig"), (c + 1) * w))
          val low = col("sig").bitwiseAND(call_function("shiftleft", lit(1L), cw) - 1)
          val rem = call_function("shiftleft", high, cw).bitwiseOR(low)
          struct(c.as("chunk"), key.as("key"), rem.as("rem"))
        })).as("b"))
        .select(col("id"), col("sig"), col("b.chunk").as("chunk"), col("b.key").as("key"), col("b.rem").as("rem"))
        .select(col("id"), col("sig"), col("chunk"), col("key"),
          explode(transform(sequence(lit(0), lit(numSub - 1)), j =>
            struct(j.as("sub"), when(j === numSub - 1,
                call_function("shiftrightunsigned", col("rem"), j * subW))
              .otherwise(call_function("shiftrightunsigned", col("rem"), j * subW)
                .bitwiseAND(lit(subMask))).as("skey")))).as("s"))
        .select(col("id"), col("sig"), col("chunk"), col("key"),
          col("s.sub").as("sub"), col("s.skey").as("skey"))
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val a = banded.select(col("chunk"), col("key"), col("sub"), col("skey"),
        col("id").as("id_a"), col("sig").as("sig_a"))
      val bb = banded.select(col("chunk"), col("key"), col("sub"), col("skey"),
        col("id").as("id_b"), col("sig").as("sig_b"))
      val n = a.join(bb, Seq("chunk", "key", "sub", "skey"))
        .filter(col("id_a") < col("id_b"))
        .filter(bit_count(col("sig_a").bitwiseXOR(col("sig_b"))) <= maxHamming)
        .dropDuplicates("id_a", "id_b").count()
      banded.unpersist()
      n
    }
    time("candidates two-level-always") { twoLevel(7, 8) }
    time("candidates two-level-always (again)") { twoLevel(7, 8) }
    spark.stop()
  }
}
