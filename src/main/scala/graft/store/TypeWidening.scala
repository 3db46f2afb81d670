package graft.store

import org.apache.spark.sql.types._

/** Delta-protocol Type Widening (delta.io PROTOCOL.md "Type Widening"): a
  * table feature letting the declared schema hold a WIDER type than the
  * parquet type of data files written before the change — readers promote
  * at scan time (graft's reader does, [[DeltaTable]] `SupportedReaderFeatures`;
  * Spark's parquet readers perform the whole promotion lattice natively).
  *
  * This object is the WRITER side: which type changes the protocol
  * licenses, and the `delta.typeChanges` field-metadata trail every applied
  * change must leave behind so other engines know which files may be
  * narrow. Used by [[ForeignDeltaTable]] (drift=Full appends widening a
  * foreign table's column) and [[DeltaLogMirror]] (graft-store drift
  * mirrored into the `_delta_log`).
  *
  * Reference context: the reference delegates schema drift to delta-rs /
  * delta-spark (odbc2deltalake db_to_delta.py, test_11_schema_drift.py);
  * graft writes the protocol actions itself, so the widening bookkeeping
  * lives here.
  */
object TypeWidening {
  /** Stable reader+writer table-feature name. */
  val Feature = "typeWidening"
  /** Preview variant (entries additionally carry `tableVersion`). */
  val PreviewFeature = "typeWidening-preview"
  /** Owner opt-in table property gating NEW type changes. */
  val EnableProp = "delta.enableTypeWidening"
  /** StructField metadata key holding the change trail. */
  val MetaKey = "delta.typeChanges"

  /** Is `from` → `to` inside the protocol's widening lattice? STRICTER than
    * [[SchemaEvolution.widen]] (the graft store's own lattice): notably
    * date → timestamp-with-timezone is graft-legal but NOT Delta-legal
    * (only date → timestamp_ntz is), and the int → decimal promotions the
    * protocol allows carry minimum-precision floors. */
  def legal(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case (ByteType | ShortType | IntegerType, DoubleType) => true
    case (DateType, TimestampNTZType) => true
    // decimal → decimal: scale may not shrink, integral digits may not shrink
    case (a: DecimalType, b: DecimalType) =>
      b.scale >= a.scale && b.precision - b.scale >= a.precision - a.scale
    // integer → decimal: the target must hold every value of the source
    case (ByteType | ShortType | IntegerType, b: DecimalType) =>
      b.precision - b.scale >= 10
    case (LongType, b: DecimalType) => b.precision - b.scale >= 20
    case _ => false
  }

  /** One type change between two schema generations. `column` is the
    * dotted logical path of the nearest StructField (the one that carries
    * the metadata entry); `fieldPath` is the protocol's path INSIDE that
    * field for changes nested in array/map types ("element", "key",
    * "value", dotted chains) — empty when the field's own type changed. */
  final case class Change(
      column: String, fieldPath: String, from: DataType, to: DataType) {
    def legalForDelta: Boolean = legal(from, to)
    override def toString: String = {
      val at = if (fieldPath.isEmpty) column else s"$column.$fieldPath"
      s"$at: ${from.simpleString} -> ${to.simpleString}"
    }
  }

  /** Diff `old` → `nw` (post-merge shapes: every surviving old field is
    * present in `nw`, possibly widened; `nw` may append new fields) and
    * stamp a `delta.typeChanges` entry onto each changed field, CARRYING
    * `old`'s existing trails where `nw` lost them (the mirror path:
    * graft manifests never persist the stamps, only the emitted Delta
    * metaData does). Only Delta-legal changes are stamped; every change is
    * reported so callers can refuse illegal ones. `tableVersion` is
    * recorded per entry only for the PREVIEW feature variant (the stable
    * spec dropped it). */
  def stamp(old: StructType, nw: StructType,
      tableVersion: Option[Long] = None): (StructType, Seq[Change]) = {
    val found = scala.collection.mutable.ArrayBuffer[Change]()

    def walkStruct(o: StructType, n: StructType, prefix: String): StructType = {
      val oldBy = o.fields.map(f => f.name.toLowerCase -> f).toMap
      StructType(n.fields.map { nf =>
        oldBy.get(nf.name.toLowerCase) match {
          case None => nf // added column — nothing narrow exists on disk
          case Some(of) =>
            val colPath = if (prefix.isEmpty) nf.name else s"$prefix.${nf.name}"
            val local = scala.collection.mutable.ArrayBuffer[(String, DataType, DataType)]()
            def walk(od: DataType, nd: DataType, p: Seq[String]): DataType =
              (od, nd) match {
                case (a, b) if a == b => b
                case (a: StructType, b: StructType) =>
                  // nested struct fields are StructFields: they absorb
                  // their own entries (the protocol's nearest-ancestor rule)
                  walkStruct(a, b, colPath + p.map("." + _).mkString)
                case (ArrayType(ae, _), ArrayType(be, cn)) =>
                  ArrayType(walk(ae, be, p :+ "element"), cn)
                case (MapType(ak, av, _), MapType(bk, bv, cn)) =>
                  MapType(walk(ak, bk, p :+ "key"), walk(av, bv, p :+ "value"), cn)
                case (a, b) =>
                  local += ((p.mkString("."), a, b)); b
              }
            val dt2 = walk(of.dataType, nf.dataType, Nil)
            local.foreach { case (fp, f, t) => found += Change(colPath, fp, f, t) }
            val carried: Seq[Metadata] =
              if (nf.metadata.contains(MetaKey)) nf.metadata.getMetadataArray(MetaKey).toSeq
              else if (of.metadata.contains(MetaKey)) of.metadata.getMetadataArray(MetaKey).toSeq
              else Nil
            val fresh = local.toSeq.collect { case (fp, f, t) if legal(f, t) =>
              val b = new MetadataBuilder()
              b.putString("fromType", deltaName(f))
              b.putString("toType", deltaName(t))
              if (fp.nonEmpty) b.putString("fieldPath", fp)
              tableVersion.foreach(v => b.putLong("tableVersion", v))
              b.build()
            }
            val trail = carried ++ fresh
            val meta =
              if (trail.isEmpty) nf.metadata
              else new MetadataBuilder().withMetadata(nf.metadata)
                .putMetadataArray(MetaKey, trail.toArray).build()
            nf.copy(dataType = dt2, metadata = meta)
        }
      })
    }
    val out = walkStruct(old, nw, "")
    (out, found.toSeq)
  }

  /** Just the change list — the cheap pre-check before any commit work. */
  def changes(old: StructType, nw: StructType): Seq[Change] = stamp(old, nw)._2

  /** The protocol's type-name spelling (matches Delta schema-string
    * primitive names: "integer", "long", "decimal(p,s)", "timestamp_ntz"). */
  private def deltaName(dt: DataType): String = dt.typeName
}
