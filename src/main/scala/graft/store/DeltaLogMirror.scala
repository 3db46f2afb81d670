package graft.store

import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.store.VersionedTable.Manifest

/** Delta-transaction-protocol mirror of the graft manifest log.
  *
  * The reference writes real Delta tables any Delta client can open
  * (reference reader/spark_reader.py:307-324, reader/odbc_reader.py:42-60
  * via delta-rs); graft's `VersionedTable` keeps its O(1)-resolution
  * manifest as the engine's source of truth and THIS class mirrors every
  * commit into a protocol-compatible `_delta_log/` — the public
  * JSON-actions-per-commit format (delta.io PROTOCOL.md): version `v` is
  * `_delta_log/%020d.json` holding newline-separated `commitInfo` /
  * `protocol` / `metaData` / `add` / `remove` actions with paths relative
  * to the table root. A downstream Delta reader (delta-rs, delta-spark,
  * DuckDB delta) can then open `<path>` directly; no Delta jar is needed
  * on THIS side because emission is plain JSON over the already-written
  * parquet files.
  *
  * Emission is a pure function of the manifest chain: the mirror replays
  * its own log to the live file set, lists ONLY data dirs it has not seen
  * before (data dirs are immutable once committed — each is written
  * exactly once by its commit), diffs against the manifest's dir list,
  * and emits the add/remove delta. One shape covers every operation:
  * append (adds only), overwrite (remove-all + adds), merge (removes of
  * rewritten dirs + adds), restore (diff back to the old file set),
  * empty-overwrite (removes only), setProperties (metaData-only commit).
  *
  * Healing: Delta versions must be CONTIGUOUS, so if mirroring ever falls
  * behind (a crash between manifest publish and mirror publish), the next
  * sync emits the missing versions — from the still-present intermediate
  * manifests when possible, as no-op `commitInfo` commits when vacuum
  * already dropped them — and lands the full state diff on the newest
  * version. Mirror files are published with the same temp+rename the
  * manifests use, and vacuumed data files correspond to versions a Delta
  * client also considers vacuumed (their files were `remove`d logically
  * versions ago).
  */
final class DeltaLogMirror(
    spark: SparkSession, tablePath: String,
    lookupManifest: Long => Option[Manifest]) {
  import DeltaLogMirror._
  import VersionedTable.mapper

  private val fsu = new Fs(spark, tablePath)
  private val logDir = new HPath(tablePath, "_delta_log")
  private def logPath(v: Long) = new HPath(logDir, f"$v%020d.json")

  /** Live mirror state after version `version`: table id + last-emitted
    * schema/config + live (relative path → size/DV) file set + whether the
    * deletion-vectors protocol upgrade has been emitted. */
  // (case class nested in a final class: the unchecked-outer warning is moot,
  // State never crosses instances)
  private case class State(
      version: Long, tableId: String, schemaJson: String,
      config: Map[String, String], files: Map[String, FileEntry],
      dvProtocol: Boolean = false, cdfProtocol: Boolean = false,
      twProtocol: Boolean = false)

  // one cold replay per instance, then incremental
  private var cached: Option[State] = None

  private def lastVersion: Option[Long] = {
    val vs = fsu.list(logDir).map(_.getName).collect { case LogName(v) => v.toLong }
    if (vs.isEmpty) None else Some(vs.max)
  }

  private def freshState: State =
    State(-1L, java.util.UUID.randomUUID().toString, "", Map.empty, Map.empty)

  /** Replay own emitted actions — driver-side, tiny JSON files. */
  private def replay(upTo: Long): State = {
    var s = freshState
    var dvProto = false
    var cdfProto = false
    var twProto = false
    val files = scala.collection.mutable.LinkedHashMap[String, FileEntry]()
    (0L to upTo).foreach { v =>
      val p = logPath(v)
      if (fsu.exists(p)) fsu.readString(p).split('\n').filter(_.nonEmpty).foreach { line =>
        val node = mapper.readTree(line)
        if (node.has("metaData")) {
          val md = node.get("metaData")
          s = s.copy(tableId = md.get("id").asText(),
            schemaJson = md.get("schemaString").asText(),
            config = Option(md.get("configuration")).map(_.fields().asScala
              .map(e => e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty))
        }
        if (node.has("protocol")) {
          val pn = node.get("protocol")
          val rf = Option(pn.get("readerFeatures"))
          if (rf.exists(_.elements().asScala.exists(_.asText() == "deletionVectors")))
            dvProto = true
          if (rf.exists(_.elements().asScala.exists(_.asText() == TypeWidening.Feature)))
            twProto = true
          val wf = Option(pn.get("writerFeatures"))
          if (Option(pn.get("minWriterVersion")).exists(w => w.asInt() >= 4 && w.asInt() < 7) ||
              wf.exists(_.elements().asScala.exists(_.asText() == "changeDataFeed")))
            cdfProto = true
        }
        if (node.has("add")) {
          val a = node.get("add")
          val dv = Option(a.get("deletionVector")).filterNot(_.isNull).map { d =>
            DvDesc(d.get("pathOrInlineDv").asText(),
              Option(d.get("offset")).map(_.asInt()).getOrElse(1),
              d.get("sizeInBytes").asInt(), d.get("cardinality").asLong())
          }
          files(a.get("path").asText()) = FileEntry(a.get("size").asLong(), dv)
        }
        if (node.has("remove")) files.remove(node.get("remove").get("path").asText())
      }
    }
    s.copy(version = upTo, files = files.toMap,
      dvProtocol = dvProto, cdfProtocol = cdfProto, twProtocol = twProto)
  }

  /** Mirror everything up to (and including) manifest `m`. Called after
    * each manifest publish; normally emits exactly one version. Every
    * [[DeltaLogMirror.CheckpointInterval]] versions the full state is also
    * written as a protocol parquet checkpoint + `_last_checkpoint`
    * pointer, so a Delta client opens the table from the checkpoint plus
    * the JSON tail instead of replaying every commit since version 0 —
    * the log-scaling requirement for long-lived tables (a year of hourly
    * syncs is ~9k commits; linear JSON replay per read is the first thing
    * a real deployment hits). */
  def sync(m: Manifest): Unit = {
    val last = lastVersion
    if (last.exists(_ >= m.version)) return // already mirrored
    var state = cached.filter(s => last.contains(s.version))
      .orElse(last.map(replay))
      .getOrElse(freshState)
    // Healed-v0 schema source: every Delta snapshot must carry metaData
    // (protocol requirement — time travel to versions before the first
    // surviving manifest fails without it), so a vacuumed v0 borrows the
    // earliest still-present manifest's schema.
    lazy val earliest: Manifest =
      (state.version + 1 until m.version).iterator
        .flatMap(lookupManifest(_).iterator).nextOption().getOrElse(m)
    (state.version + 1 to m.version).foreach { v =>
      val target = if (v == m.version) Some(m) else lookupManifest(v)
      state = emit(v, state, target, earliest)
      // cadence: the table's delta.checkpointInterval property when set
      // (rides graft table properties into the mirrored configuration,
      // same key delta-spark reads), else the protocol default 10.
      // Tolerant parse — a junk property value must not fail the mirror
      // of an already-committed graft write
      val every = state.config.get("delta.checkpointInterval")
        .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
        .filter(_ > 0).getOrElse(CheckpointInterval)
      if (v > 0 && v % every == 0) writeCheckpoint(v, state)
      writeCrc(v, state)
    }
    cached = Some(state)
  }

  /** Version-checksum sidecar ([[VersionChecksum]]) for a mirrored commit —
    * counts come from the INCREMENTAL state (no log replay on the hot
    * graft write path), and the embedded protocol/metadata are derived by
    * the same rules [[emit]] uses (cumulative feature booleans →
    * featureLists; graft CdfProp → delta.enableChangeDataFeed), so the crc
    * agrees with the emitted actions. Skipped only while no metaData has
    * ever been emitted (cannot happen past v0 — emit heals v0 with a
    * fallback metaData). */
  private def writeCrc(v: Long, st: State): Unit = {
    if (st.schemaJson.isEmpty) return
    val (minR, minW, rf, wf) =
      if (st.dvProtocol || st.twProtocol) {
        val (rs, ws) = DeltaLogMirror.featureLists(
          st.dvProtocol, st.cdfProtocol, st.twProtocol)
        (3, 7, rs, ws)
      } else if (st.cdfProtocol) (1, 4, Seq.empty[String], Seq.empty[String])
      else (1, 2, Seq.empty[String], Seq.empty[String])
    val cfg = st.config ++
      (if (st.config.get(VersionedTable.CdfProp).contains("true"))
        Map("delta.enableChangeDataFeed" -> "true")
      else Map.empty[String, String])
    val adds = st.files.toSeq.map { case (p, fe) =>
      DeltaTable.Add(p, fe.size, 0L, Map.empty, None,
        fe.dv.map(d => DeletionVectors.Descriptor(
          "p", d.path, Some(d.offset), d.size, d.card)))
    }
    val snap = DeltaTable.Snapshot(v,
      DataType.fromJson(st.schemaJson).asInstanceOf[StructType],
      Nil, cfg, adds, st.tableId, minW, wf, minR, rf)
    VersionChecksum.write(fsu, logDir, snap, None)
  }

  /** Protocol parquet checkpoint of the full state at version `v`: one row
    * per action (protocol, metaData, one add per live file — dataChange
    * false per the checkpoint spec), published as
    * `_delta_log/%020d.checkpoint.parquet` + the `_last_checkpoint`
    * pointer. The per-commit JSON files stay — internal replay and older
    * readers keep working; checkpoints are purely additive. */
  private def writeCheckpoint(v: Long, state: State): Unit = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    val now = System.currentTimeMillis()
    val protoRow =
      if (state.dvProtocol || state.twProtocol) {
        val (rs, ws) = DeltaLogMirror.featureLists(
          state.dvProtocol, state.cdfProtocol, state.twProtocol)
        Row(Row(3, 7, rs, ws), null, null, null)
      }
      else if (state.cdfProtocol) Row(Row(1, 4, null, null), null, null, null)
      else Row(Row(1, 2, null, null), null, null, null)
    // same config translation emitMetaData applies to the JSON commits:
    // external CDF readers resolve configuration from the checkpoint once
    // no later metaData action is in the tail, so the delta key must be
    // present here too or table_changes dies every CheckpointInterval
    val ckptConfig = state.config ++
      (if (state.config.get(VersionedTable.CdfProp).contains("true"))
        Map("delta.enableChangeDataFeed" -> "true")
      else Map.empty[String, String])
    val metaRow = Row(null,
      Row(state.tableId, null, null, Row("parquet", Map.empty[String, String]),
        state.schemaJson, Seq.empty[String], ckptConfig, now),
      null, null)
    val addRows = state.files.toSeq.sortBy(_._1).map { case (p, fe) =>
      Row(null, null, Row(p, Map.empty[String, String], fe.size, now, false,
        fe.dv.map(d => Row("p", d.path, d.offset, d.size, d.card)).orNull),
        null)
    }
    // graft.txn.* idempotency watermarks as protocol SetTransaction rows:
    // an external delta-spark txnVersion(appId) keeps working from the
    // checkpoint alone (same retention rule as the JSON translation)
    val txnRows = state.config.toSeq
      .collect { case (k, value) if k.startsWith("graft.txn.") =>
        Row(null, null, null, Row(k.stripPrefix("graft.txn."), value.toLong, null))
      }.sortBy(_.getStruct(3).getString(0))
    val rows: Seq[Row] = Seq(protoRow, metaRow) ++ addRows ++ txnRows
    DeltaLogMirror.publishCheckpoint(spark, fsu, logDir, v, rows,
      DeltaLogMirror.checkpointSchema,
      partSize = state.config.get("delta.checkpoint.partSize")
        .flatMap(x => scala.util.Try(x.trim.toLong).toOption))
  }

  /** (relative path → (size, mtime)) of one data dir, listed from disk. */
  private def listDir(dir: String): Seq[(String, Long, Long)] =
    fsu.fs.listStatus(new HPath(tablePath, s"data/$dir")).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet") &&
        !st.getPath.getName.startsWith(".") && !st.getPath.getName.startsWith("_"))
      .map(st => (s"data/$dir/${st.getPath.getName}", st.getLen, st.getModificationTime))

  private def emit(
      v: Long, state: State, target: Option[Manifest],
      metaFallback: => Manifest): State = {
    val now = System.currentTimeMillis()
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    def obj() = mapper.createObjectNode()

    def emitMetaData(schemaJson: String, props: Map[String, String]): Unit = {
      val md = obj()
      val mdn = md.putObject("metaData")
      mdn.put("id", state.tableId)
      val fmt = mdn.putObject("format")
      fmt.put("provider", "parquet")
      fmt.putObject("options")
      mdn.put("schemaString", schemaJson)
      mdn.putArray("partitionColumns")
      val cfg = mdn.putObject("configuration")
      props.foreach { case (k, value) => cfg.put(k, value) }
      // Delta clients discover the feed through their own config key
      if (props.get(VersionedTable.CdfProp).contains("true"))
        cfg.put("delta.enableChangeDataFeed", "true")
      mdn.put("createdTime", now)
      lines += mapper.writeValueAsString(md)
    }

    val ci = obj()
    val cin = ci.putObject("commitInfo")
    cin.put("timestamp", now)
    cin.put("operation", if (target.isEmpty) "HEAL" else if (v == 0L) "CREATE TABLE AS SELECT" else "WRITE")
    cin.putObject("operationParameters")
    cin.put("engineInfo", "graft-versioned-table")
    lines += mapper.writeValueAsString(ci)

    // Protocol: (1,2) at table creation; the FIRST commit whose manifest
    // carries deletion vectors upgrades in place to the table-features form
    // (3,7) listing deletionVectors — exactly how delta-spark upgrades when
    // `delta.enableDeletionVectors` first bites; the FIRST commit under the
    // change-data-feed property upgrades to the legacy CDF writer (1,4) —
    // or joins the (3,7) feature list when DVs are also in play. Legacy
    // writer features stay listed so the set is complete after upgrades.
    val targetHasDv = target.exists(_.dirs.exists(_.dv.nonEmpty))
    val targetCdf = target.exists(
      _.properties.get(VersionedTable.CdfProp).contains("true"))
    // graft-store schema drift that WIDENED an existing column (drift=Full,
    // SchemaEvolution.widen): the pre-change mirrored files keep their
    // narrow parquet type, so the mirrored metaData must carry the
    // protocol's delta.typeChanges trail and the log must list the
    // typeWidening feature — or external engines refuse/misread the old
    // files. Changes OUTSIDE the Delta lattice (date→timestamp is
    // graft-legal) emit unstamped: not representable, best-effort.
    // The stamped schema is what `state.schemaJson` stores, so trails
    // accumulate across commits and survive replay.
    val (mirSchemaJson, targetTw) = target match {
      case Some(man) if state.schemaJson.nonEmpty =>
        val prev = DataType.fromJson(state.schemaJson).asInstanceOf[StructType]
        val nw = DataType.fromJson(man.schemaJson).asInstanceOf[StructType]
        val (stamped, ch) = TypeWidening.stamp(prev, nw)
        (stamped.json, ch.exists(_.legalForDelta))
      case Some(man) => (man.schemaJson, false)
      case None => (state.schemaJson, false)
    }
    val upgradeDv = targetHasDv && !state.dvProtocol
    val upgradeCdf = targetCdf && !state.cdfProtocol
    val upgradeTw = targetTw && !state.twProtocol
    val needDv = targetHasDv || state.dvProtocol
    val needCdf = targetCdf || state.cdfProtocol
    val needTw = targetTw || state.twProtocol
    if (v == 0L || upgradeDv || upgradeCdf || upgradeTw) {
      val pr = obj()
      val prn = pr.putObject("protocol")
      if (needDv || needTw) {
        prn.put("minReaderVersion", 3)
        prn.put("minWriterVersion", 7)
        val rf = prn.putArray("readerFeatures")
        val wf = prn.putArray("writerFeatures")
        DeltaLogMirror.featureLists(needDv, needCdf, needTw) match {
          case (rs, ws) => rs.foreach(rf.add); ws.foreach(wf.add)
        }
      } else if (needCdf) {
        prn.put("minReaderVersion", 1)
        prn.put("minWriterVersion", 4)
      } else {
        prn.put("minReaderVersion", 1)
        prn.put("minWriterVersion", 2)
      }
      lines += mapper.writeValueAsString(pr)
    }

    val next = target match {
      case None if v == 0L =>
        // heal a vacuumed v0: still a no-op for files, but emit metaData
        // from the earliest surviving manifest so EVERY snapshot in the
        // log satisfies the protocol's metaData requirement
        val fb = metaFallback
        emitMetaData(fb.schemaJson, fb.properties)
        state.copy(version = v, schemaJson = fb.schemaJson, config = fb.properties)
      case None => state.copy(version = v) // heal gap: no-op commit
      case Some(man) =>
        if (v == 0L || mirSchemaJson != state.schemaJson || man.properties != state.config)
          emitMetaData(mirSchemaJson, man.properties)
        // manifest DV entries → Delta descriptors ("p" storage: graft DV
        // container files use the protocol's exact on-disk block layout, so
        // an absolute path + offset is all an external reader needs)
        val dvByPath: Map[String, DvDesc] = man.dirs.flatMap { d =>
          d.dv.map { e =>
            s"data/${d.dir}/${e.file}" -> DvDesc(
              fsu.fs.makeQualified(
                new HPath(tablePath, s"deletion_vectors/${e.bin}")).toString,
              e.offset, e.size, e.cardinality)
          }
        }.toMap
        // target live set: reuse replayed entries for dirs already live
        // (immutable), list only unseen dirs from disk
        val targetFiles = scala.collection.mutable.LinkedHashMap[String, (Long, Long, Option[DvDesc])]()
        man.dirs.foreach { d =>
          val prefix = s"data/${d.dir}/"
          val known = state.files.collect { case (p, fe) if p.startsWith(prefix) => (p, fe.size, 0L) }
          (if (known.nonEmpty) known.toSeq else listDir(d.dir)).foreach {
            case (p, sz, mt) => targetFiles(p) = (sz, mt, dvByPath.get(p))
          }
        }
        // a file whose DV changed is logically replaced: remove + re-add
        // with the new descriptor (the Delta DV-commit shape)
        state.files.foreach { case (p, fe) =>
          val gone = !targetFiles.contains(p)
          val dvChanged = targetFiles.get(p).exists(_._3 != fe.dv)
          if (gone || dvChanged) {
            val rm = obj()
            val rmn = rm.putObject("remove")
            rmn.put("path", p)
            rmn.put("deletionTimestamp", now)
            rmn.put("dataChange", true)
            lines += mapper.writeValueAsString(rm)
          }
        }
        targetFiles.foreach { case (p, (sz, mt, dv)) =>
          val prev = state.files.get(p)
          if (prev.isEmpty || prev.exists(_.dv != dv)) {
            val ad = obj()
            val adn = ad.putObject("add")
            adn.put("path", p)
            adn.putObject("partitionValues")
            adn.put("size", sz)
            adn.put("modificationTime", if (mt > 0) mt else now)
            adn.put("dataChange", true)
            dv.foreach { d =>
              val dvn = adn.putObject("deletionVector")
              dvn.put("storageType", "p")
              dvn.put("pathOrInlineDv", d.path)
              dvn.put("offset", d.offset)
              dvn.put("sizeInBytes", d.size)
              dvn.put("cardinality", d.card)
            }
            lines += mapper.writeValueAsString(ad)
          }
        }
        // graft.txn.* watermarks that moved in THIS commit become protocol
        // SetTransaction actions — an external engine's txnVersion(appId)
        // sees graft's exactly-once state natively
        man.properties.foreach { case (k, value) =>
          if (k.startsWith("graft.txn.") && !state.config.get(k).contains(value)) {
            val tx = obj()
            val txn = tx.putObject("txn")
            txn.put("appId", k.stripPrefix("graft.txn."))
            txn.put("version", value.toLong)
            txn.put("lastUpdated", now)
            lines += mapper.writeValueAsString(tx)
          }
        }
        // real Delta cdc actions over the graft-materialized change files:
        // a CDF-enabled merge/delete commit points `table_changes` readers
        // at its exact row-level changes (commits carrying cdc actions are
        // read from those ALONE; others derive from dataChange add/remove)
        if (targetCdf) man.changeDir.foreach { cd =>
          val cdDir = new HPath(tablePath, s"_change_data/$cd")
          if (fsu.isDir(cdDir)) fsu.fs.listStatus(cdDir).toSeq
            .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet") &&
              !st.getPath.getName.startsWith(".") && !st.getPath.getName.startsWith("_"))
            .foreach { st =>
              val cdc = obj()
              val cn = cdc.putObject("cdc")
              cn.put("path", new java.net.URI(null, null,
                s"_change_data/$cd/${st.getPath.getName}", null).toASCIIString)
              cn.putObject("partitionValues")
              cn.put("size", st.getLen)
              cn.put("dataChange", false)
              lines += mapper.writeValueAsString(cdc)
            }
        }
        state.copy(version = v, schemaJson = mirSchemaJson,
          config = man.properties,
          files = targetFiles.map { case (p, (sz, _, dv)) => p -> FileEntry(sz, dv) }.toMap,
          dvProtocol = state.dvProtocol || upgradeDv,
          cdfProtocol = state.cdfProtocol || upgradeCdf,
          twProtocol = state.twProtocol || upgradeTw)
    }
    fsu.mkdirs(logDir)
    // put-if-absent: a published Delta commit JSON is immutable — a
    // duplicate or racing emit must never silently replace it. Two racers
    // mirroring the SAME graft manifest write byte-identical lines, so a
    // lost race with identical content is a benign no-op; differing
    // content is a real conflict and fails loudly.
    val body = lines.mkString("\n")
    try fsu.writeStringAtomicNew(logPath(v), body)
    catch {
      case e @ (_: org.apache.hadoop.fs.FileAlreadyExistsException |
                _: java.nio.file.FileAlreadyExistsException) =>
        if (fsu.readString(logPath(v)) != body) throw new java.io.IOException(
          s"mirror commit ${logPath(v)} already exists with DIFFERENT " +
            "content — refusing to replace a published Delta commit", e)
    }
    next
  }
}

object DeltaLogMirror {
  private val LogName = """(\d{20})\.json""".r

  /** Delta's default checkpoint cadence. */
  val CheckpointInterval = 10L

  /** (readerFeatures, writerFeatures) for the mirror's (3,7) protocol —
    * one builder so the JSON commits and the checkpoint rows agree. */
  private[store] def featureLists(
      dv: Boolean, cdf: Boolean, tw: Boolean): (Seq[String], Seq[String]) = {
    val rs = (if (dv) Seq("deletionVectors") else Nil) ++
      (if (tw) Seq(TypeWidening.Feature) else Nil)
    val ws = Seq("appendOnly", "invariants") ++
      (if (dv) Seq("deletionVectors") else Nil) ++
      (if (cdf) Seq("changeDataFeed") else Nil) ++
      (if (tw) Seq(TypeWidening.Feature) else Nil)
    (rs, ws)
  }

  /** Publish `rows` as the classic parquet checkpoint for version `v`
    * plus the `_last_checkpoint` pointer — single-file, or MULTI-PART
    * when the table sets `delta.checkpoint.partSize` and the action count
    * exceeds it (the protocol's
    * `%020d.checkpoint.%010d.%010d.parquet` form, 1-based part over
    * total). At 100 TB a legacy-protocol table (no v2Checkpoint feature
    * available) can hold millions of add actions; partSize bounds each
    * checkpoint file so no single write or read materializes the whole
    * state in one task. Spark writes a directory; the protocol wants
    * plain FILES — write to a temp sibling dir and rename into place.
    * Shared by the graft-manifest mirror and the foreign-Delta writer. */
  private[store] def publishCheckpoint(
      spark: SparkSession, fsu: Fs, logDir: HPath, v: Long,
      rows: Seq[org.apache.spark.sql.Row], schema: StructType,
      partSize: Option[Long] = None): Unit = {
    import scala.jdk.CollectionConverters._
    import VersionedTable.mapper
    def writeOne(slice: Seq[org.apache.spark.sql.Row], destName: String): Unit = {
      val df = spark.createDataFrame(slice.asJava, schema).coalesce(1)
      val tmp = new HPath(logDir, s".cptmp-${UUID.randomUUID()}")
      df.write.mode("overwrite").parquet(tmp.toString)
      val part = fsu.fs.listStatus(tmp).map(_.getPath)
        .find(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no part file under $tmp"))
      val dest = new HPath(logDir, destName)
      fsu.deleteIfExists(dest)
      if (!fsu.fs.rename(part, dest))
        throw new java.io.IOException(s"rename $part -> $dest failed")
      fsu.delete(tmp, recursive = true)
    }
    val nParts = partSize.filter(ps => ps > 0 && rows.size > ps)
      .map(ps => math.ceil(rows.size.toDouble / ps).toInt)
    nParts match {
      case None =>
        writeOne(rows, f"$v%020d.checkpoint.parquet")
      case Some(p) =>
        val per = math.ceil(rows.size.toDouble / p).toInt
        rows.grouped(per).zipWithIndex.foreach { case (slice, i) =>
          writeOne(slice, f"$v%020d.checkpoint.${i + 1}%010d.$p%010d.parquet")
        }
    }
    val lc = mapper.createObjectNode()
    lc.put("version", v)
    lc.put("size", rows.size.toLong)
    nParts.foreach(p => lc.put("parts", p): Unit)
    fsu.writeStringAtomic(new HPath(logDir, "_last_checkpoint"),
      mapper.writeValueAsString(lc))
  }

  /** Publish a V2-spec checkpoint for version `v` (PROTOCOL.md "V2 Spec
    * Checkpoints" — what `delta.checkpointPolicy = v2` obliges writers to
    * produce): the FILE actions (add/remove) land in one parquet sidecar
    * under `_delta_log/_sidecars/`, and the manifest
    * `<v>.checkpoint.<uuid>.parquet` carries the non-file actions plus the
    * required `checkpointMetadata` row and the `sidecar` pointer. At scale
    * this is the point of the v2 layout: the (large) file listing is
    * referenced, not rewritten into every engine's manifest variant. */
  private[store] def publishCheckpointV2(
      spark: SparkSession, fsu: Fs, logDir: HPath, v: Long,
      manifestRows: Seq[org.apache.spark.sql.Row],
      fileRows: Seq[org.apache.spark.sql.Row],
      baseSchema: StructType): Unit = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import VersionedTable.mapper
    def writeOnePart(df: org.apache.spark.sql.DataFrame, dest: HPath): Unit = {
      val tmp = new HPath(logDir, s".cptmp-${UUID.randomUUID()}")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = fsu.fs.listStatus(tmp).map(_.getPath)
        .find(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no part file under $tmp"))
      fsu.deleteIfExists(dest)
      if (!fsu.fs.rename(part, dest))
        throw new java.io.IOException(s"rename $part -> $dest failed")
      fsu.delete(tmp, recursive = true)
    }
    val sidecarDir = new HPath(logDir, "_sidecars")
    fsu.mkdirs(sidecarDir)
    val sideName = s"${UUID.randomUUID()}.parquet"
    val sideDest = new HPath(sidecarDir, sideName)
    writeOnePart(spark.createDataFrame(fileRows.asJava, baseSchema), sideDest)
    val sideStat = fsu.fs.getFileStatus(sideDest)
    val cmT = StructType(Seq(
      StructField("version", LongType),
      StructField("tags", MapType(StringType, StringType))))
    val scT = StructType(Seq(
      StructField("path", StringType),
      StructField("sizeInBytes", LongType),
      StructField("modificationTime", LongType),
      StructField("tags", MapType(StringType, StringType))))
    val schema = StructType(baseSchema.fields ++ Seq(
      StructField("checkpointMetadata", cmT), StructField("sidecar", scT)))
    val pad = Seq(null, null)
    val blank = Seq.fill[Any](baseSchema.size)(null)
    val rows: Seq[Row] = manifestRows.map(r => Row.fromSeq(r.toSeq ++ pad)) ++ Seq(
      Row.fromSeq(blank ++ Seq(Row(v, Map.empty[String, String]), null)),
      Row.fromSeq(blank ++ Seq(null,
        Row(sideName, sideStat.getLen, sideStat.getModificationTime,
          Map.empty[String, String]))))
    writeOnePart(spark.createDataFrame(rows.asJava, schema),
      new HPath(logDir, f"$v%020d.checkpoint.${UUID.randomUUID()}.parquet"))
    val lc = mapper.createObjectNode()
    lc.put("version", v)
    lc.put("size", (rows.size + fileRows.size).toLong)
    fsu.writeStringAtomic(new HPath(logDir, "_last_checkpoint"),
      mapper.writeValueAsString(lc))
  }

  /** The protocol checkpoint row schema (public Delta transaction protocol;
    * optional action columns omitted stay absent — readers treat missing
    * nullable columns as null). */
  /** One live file of the mirrored state: size + optional DV descriptor. */
  private[store] final case class FileEntry(size: Long, dv: Option[DvDesc])
  /** A Delta deletion-vector descriptor as the mirror emits it ("p"
    * storage: absolute container path + block offset/size/cardinality). */
  private[store] final case class DvDesc(
      path: String, offset: Int, size: Int, card: Long)

  private[store] val checkpointSchema: StructType = StructType(Seq(
    StructField("protocol", StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType),
      StructField("readerFeatures", ArrayType(StringType)),
      StructField("writerFeatures", ArrayType(StringType))))),
    StructField("metaData", StructType(Seq(
      StructField("id", StringType),
      StructField("name", StringType),
      StructField("description", StringType),
      StructField("format", StructType(Seq(
        StructField("provider", StringType),
        StructField("options", MapType(StringType, StringType))))),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType)),
      StructField("createdTime", LongType)))),
    StructField("add", StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("deletionVector", StructType(Seq(
        StructField("storageType", StringType),
        StructField("pathOrInlineDv", StringType),
        StructField("offset", IntegerType),
        StructField("sizeInBytes", IntegerType),
        StructField("cardinality", LongType))))))),
    StructField("txn", StructType(Seq(
      StructField("appId", StringType),
      StructField("version", LongType),
      StructField("lastUpdated", LongType))))))
}
