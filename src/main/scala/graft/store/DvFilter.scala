package graft.store

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row deletion-vector probe for the scan filter (the executor side of
  * merge-on-read): `deleted(file_path, row_index)` against a broadcast-sized
  * map of per-file sorted deleted-index arrays. Consecutive rows of a scan
  * share their file path, so the map+key work runs once per file chunk via a
  * thread-local memo; the per-row cost is one UTF8String byte-compare plus a
  * binary search over that file's (small) DV. */
final class DvProbe(
    map: java.util.HashMap[String, Array[Long]],
    uriKeys: Boolean) extends Serializable {
  // (path, resolved array) of the previous row, per thread — UTF8String from
  // the scan may wrap a reused buffer, so the memo key is a defensive copy
  @transient private lazy val last: ThreadLocal[Array[AnyRef]] =
    ThreadLocal.withInitial(() => new Array[AnyRef](2))

  def deleted(path: UTF8String, rowIndex: Long): Boolean = {
    val l = last.get()
    val arr: Array[Long] =
      if (l(0) != null && l(0).asInstanceOf[UTF8String].equals(path))
        l(1).asInstanceOf[Array[Long]]
      else {
        // graft-native tables key by "<dir>/<file>"; external Delta tables
        // key by the decoded URI path (scheme-insensitive — log rawPaths
        // are percent-encoded URIs, scan paths carry the fs scheme)
        val key =
          if (uriKeys)
            new org.apache.hadoop.fs.Path(path.toString).toUri.getPath
          else DeletionVectors.dirFileKey(path.toString)
        val a = map.get(key)
        l(0) = path.clone()
        l(1) = a
        a
      }
    arr != null && java.util.Arrays.binarySearch(arr, rowIndex) >= 0
  }
}

/** `(file_path, row_index) → row is DV-deleted` as a codegen'd Catalyst
  * predicate: the scan filter stays inside whole-stage codegen (one static
  * call per row), unlike a Scala UDF which would box both inputs and break
  * the codegen span around every DV'd table read. */
/** Per-file long attribute lookup for the scan projection (the executor
  * side of row tracking): `lookup(file_path) → Long` against a
  * broadcast-sized map keyed by decoded URI path — one entry per live
  * file, the same driver-side footprint as the file index itself.
  * Consecutive rows share their file path, so the map probe runs once per
  * file chunk via the [[DvProbe]]-style thread-local memo; absent files
  * yield the -1 sentinel (surfaced as NULL by [[FileAttrLookup]]). */
final class FileLongProbe(map: java.util.HashMap[String, java.lang.Long])
    extends Serializable {
  @transient private lazy val last: ThreadLocal[Array[AnyRef]] =
    ThreadLocal.withInitial(() => new Array[AnyRef](2))

  def lookup(path: UTF8String): Long = {
    val l = last.get()
    if (l(0) != null && l(0).asInstanceOf[UTF8String].equals(path))
      l(1).asInstanceOf[java.lang.Long].longValue()
    else {
      val key = new org.apache.hadoop.fs.Path(path.toString).toUri.getPath
      val v = map.get(key)
      val r: java.lang.Long = if (v == null) java.lang.Long.valueOf(-1L) else v
      l(0) = path.clone()
      l(1) = r
      r.longValue()
    }
  }
}

/** `file_path → per-file long` as a codegen'd Catalyst expression (NULL
  * when the file carries no value) — keeps row-id derivation inside
  * whole-stage codegen next to the DV probe. */
case class FileAttrLookup(child: Expression, attrs: Map[String, Long])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_file_attr expects string, got ${t.simpleString}")
  }

  @transient private lazy val probe: FileLongProbe = {
    val m = new java.util.HashMap[String, java.lang.Long](attrs.size * 2)
    attrs.foreach { case (k, v) => m.put(k, java.lang.Long.valueOf(v)) }
    new FileLongProbe(m)
  }

  override def nullSafeEval(p: Any): Any = {
    val v = probe.lookup(p.asInstanceOf[UTF8String])
    if (v < 0L) null else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fileAttrProbe", probe, "graft.store.FileLongProbe")
    nullSafeCodeGen(ctx, ev, p => s"""
      ${ev.value} = $ref.lookup($p);
      if (${ev.value} < 0L) ${ev.isNull} = true;
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): FileAttrLookup =
    copy(child = newChild)
  override def prettyName: String = "graft_file_attr"
}

case class DvRowDeleted(
    left: Expression, right: Expression,
    dvs: Map[String, Array[Long]],
    uriKeys: Boolean = false) extends BinaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_dv_deleted expects (string, bigint), got (${l.simpleString}, ${r.simpleString})")
  }
  override def nullable: Boolean = false

  @transient private lazy val probe: DvProbe = {
    val m = new java.util.HashMap[String, Array[Long]](dvs.size * 2)
    dvs.foreach { case (k, v) => m.put(k, v) }
    new DvProbe(m, uriKeys)
  }

  override def nullSafeEval(p: Any, i: Any): Any =
    probe.deleted(p.asInstanceOf[UTF8String], i.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvProbe", probe, "graft.store.DvProbe")
    defineCodeGen(ctx, ev, (p, i) => s"$ref.deleted($p, $i)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DvRowDeleted =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_dv_deleted"
}
