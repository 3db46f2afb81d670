package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Scratch drive (verify): non-ASCII string pks through the live-JDBC
  * strange-update path. On an unknown dialect the literal renderer must
  * REFUSE (fallback to the engine's broadcast join) rather than ship a
  * possibly-corrupting literal — and the sync must still be correct. */
object PushdownDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").appName("pushdown-drive")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val dbDir = Files.createTempDirectory("pushdown-derby").toFile
      dbDir.delete()
      val url = s"jdbc:derby:${dbDir.getAbsolutePath};create=true"
      val conn = java.sql.DriverManager.getConnection(url)
      val st0 = conn.createStatement()
      st0.executeUpdate("""CREATE TABLE APP.USTRANGE (
        NAME VARCHAR(50) NOT NULL PRIMARY KEY, NOTE VARCHAR(50), VER BIGINT NOT NULL)""")
      val ps = conn.prepareStatement("INSERT INTO APP.USTRANGE VALUES (?, ?, ?)")
      val names = (1 to 40).map(i => s"müller-$i") // non-ASCII pk values
      names.foreach { n => ps.setString(1, n); ps.setString(2, "base"); ps.setLong(3, 5L)
        ps.executeUpdate() }
      ps.close(); st0.close()

      val dest = Files.createTempDirectory("pushdown-dest").toString
      var pushed = 0; var fellBack = 0
      val inner = new sources.JdbcSource(url, Left("APP.USTRANGE"), pks = Seq("NAME"))
      val src = new sources.Source with sources.PkPushdown {
        def read(s: SparkSession) = inner.read(s)
        def columns(s: SparkSession) = inner.columns(s)
        def primaryKeys(s: SparkSession) = inner.primaryKeys(s)
        def readForPks(s: SparkSession, pkCols: Seq[ColInfo], cfg: WriteConfig,
            conv: Set[String], tuples: Seq[org.apache.spark.sql.Row]) = {
          val r = inner.readForPks(s, pkCols, cfg, conv, tuples)
          if (r.isDefined) pushed += 1 else fellBack += 1
          r
        }
      }
      val cfg = WriteConfig(deltaCol = Some("VER"))
      val full = Graft.sync(spark, src, dest, cfg)
      require(full == LoadResult.FullLoad(40), s"full: $full")

      // restore-from-backup shape on non-ASCII pks: VER moves BACKWARDS
      val st = conn.createStatement()
      st.executeUpdate("UPDATE APP.USTRANGE SET NOTE = 'weird', VER = 3 WHERE NAME = 'müller-7'")
      st.executeUpdate("INSERT INTO APP.USTRANGE VALUES ('müller-41', 'weird', 3)")
      st.close()
      Graft.sync(spark, src, dest, cfg) match {
        case LoadResult.DeltaLoad(_, strange, _, _) => require(strange == 2, s"strange=$strange")
        case other => sys.error(s"expected DeltaLoad, got $other")
      }
      require(fellBack == 1 && pushed == 0,
        s"expected literal-render refusal (fallback), got pushed=$pushed fellBack=$fellBack")
      val cur = Graft.writer(spark, src, dest, cfg).currentState()
      require(cur.count() == 41, s"count=${cur.count()}")
      require(cur.filter(col("NAME") === "müller-7").head().getAs[String]("NOTE") == "weird")
      require(cur.filter(col("NAME") === "müller-41").head().getAs[String]("NOTE") == "weird")

      // ASCII string pks on the same unknown dialect: literal path must
      // still render and fetch exactly the requested rows, multi-chunk
      val st2 = conn.createStatement()
      st2.executeUpdate("""CREATE TABLE APP.APKF (
        NAME VARCHAR(60) NOT NULL PRIMARY KEY, VER BIGINT NOT NULL)""")
      val ps2 = conn.prepareStatement("INSERT INTO APP.APKF VALUES (?, ?)")
      val anames = (1 to 800).map(i => s"plain-ascii-name-$i")
      anames.foreach { n => ps2.setString(1, n); ps2.setLong(2, 1L); ps2.executeUpdate() }
      ps2.close(); st2.close()
      val asrc = new sources.JdbcSource(url, Left("APP.APKF"), pks = Seq("NAME"))
      val pkCols = Seq(ColInfo("NAME", org.apache.spark.sql.types.StringType,
        sourceType = Some("varchar")))
      val want = anames.filter(_.hashCode % 3 == 0)
      val got = asrc.readForPks(spark, pkCols, WriteConfig(), Set.empty,
        want.map(org.apache.spark.sql.Row(_))).get
      val gotNames = got.select("NAME").collect().map(_.getString(0)).toSet
      require(gotNames == want.toSet, s"got ${gotNames.size} want ${want.size}")
      conn.close()
      println("PUSHDOWN-DRIVE OK: fallback=" + fellBack + " ascii-fetch=" + gotNames.size)
    } finally spark.stop()
  }
}
