package graft

import org.apache.spark.sql.types._

/** Core data model for the graft SCD2 sync engine.
  *
  * Mirrors the reference's abstractions (see SURVEY.md §1):
  *  - ColInfo        ≈ InformationSchemaColInfo (reference metadata.py:54-71)
  *  - WriteConfig    ≈ WriteConfig dataclass (reference write_init.py:64-104)
  *  - LoadMode       ≈ the six load modes (reference db_to_delta.py:220-260)
  *  - LoadResult     ≈ load_result.py:4-40 ADT
  */

/** Column metadata. Spark's StructField has no identity/generated bits, so we
  * wrap it (reference metadata.py:54-71).
  *
  * @param sourceType the SOURCE catalog's declared SQL type name (e.g. tsql
  *   "rowversion", "timestamp", "tinyint"), when known — this, not the Spark
  *   type, is what `WriteConfig.dataTypeMap` keys on (reference
  *   write_init.py:29-38 applies the map to T-SQL type names, where
  *   "timestamp" is a rowversion alias — NOT a datetime). Sources without a
  *   SQL catalog (parquet) leave it None.
  */
final case class ColInfo(
    name: String,
    dataType: DataType,
    nullable: Boolean = true,
    isIdentity: Boolean = false,
    isRowStart: Boolean = false,
    sourceType: Option[String] = None) {
  def field: StructField = StructField(name, dataType, nullable)
  /** Key used against WriteConfig.dataTypeMap. */
  def typeKey: String = sourceType.getOrElse(dataType.simpleString).toLowerCase
}

object ColInfo {
  def fromSchema(schema: StructType): Seq[ColInfo] =
    schema.fields.toSeq.map(f => ColInfo(f.name, f.dataType, f.nullable))
}

/** The six load strategies (reference db_to_delta.py:220-260). */
sealed trait LoadMode
object LoadMode {
  case object Overwrite extends LoadMode // always full load, overwrite target
  case object Append extends LoadMode // default: full first, then delta algorithm
  case object ForceFull extends LoadMode // full load appended
  case object AppendInserts extends LoadMode // insert-only sources (log tables)
  case object SimpleDelta extends LoadMode // delta w/o delete & strange-update handling
  case object SimpleDeltaCheck extends LoadMode // SimpleDelta + count check → full delta
}

/** Schema drift policy (reference write_init.py:101, allow_schema_drift). */
sealed trait SchemaDrift
object SchemaDrift {
  case object None extends SchemaDrift
  case object NewOnly extends SchemaDrift // default: append brand-new cols only
  case object Full extends SchemaDrift // mergeSchema + type widening
}

/** Sync configuration (reference write_init.py:64-104).
  *
  * @param primaryKeys    explicit pk column names (source names); empty ⇒
  *                       discovered from source metadata, or no-pk ⇒ always full
  * @param deltaCol       monotonic watermark column (source name); None ⇒
  *                       auto-detect (identity / row-start), else full loads only
  * @param dataTypeMap    per-source-type cast map applied at ingest
  *                       (reference write_init.py:29-38 defaults)
  * @param getTargetName  rename policy (reference write_init.py:95-99)
  * @param inlineJoinThreshold  max "strange update" pks fetched via broadcast
  *                       join before falling back to watermark re-scan
  *                       (reference db_to_delta.py:1105-1107, default 1000)
  * @param maxTextSize    ingest-side cap on string values, in characters
  *                       (reference odbc_reader.py:235,273-275 caps at 20,000);
  *                       None = uncapped
  * @param maxBinarySize  same for binary values, in bytes
  * @param transformationHook  (df, stage) => df applied to every source read,
  *                       with the reference's stage vocabulary
  *                       (spark_reader.py:97,111-113: "sql2delta" for table
  *                       loads, "source2py" for driver-side scalar probes) —
  *                       enables per-stage transforms, e.g. delta-read-only
  */
final case class WriteConfig(
    loadMode: LoadMode = LoadMode.Append,
    primaryKeys: Seq[String] = Nil,
    deltaCol: Option[String] = None,
    dataTypeMap: Map[String, DataType] = WriteConfig.defaultTypeMap,
    noTrim: Boolean = false,
    allowSchemaDrift: SchemaDrift = SchemaDrift.NewOnly,
    noComplexEntriesLoad: Boolean = false,
    inlineJoinThreshold: Long = 1000L,
    getTargetName: ColInfo => String = Naming.compatName,
    maxTextSize: Option[Int] = None,
    maxBinarySize: Option[Int] = None,
    transformationHook: (org.apache.spark.sql.DataFrame, String) => org.apache.spark.sql.DataFrame =
      WriteConfig.noHook,
    // run the P1 cast/trim/cap select list IN the source DB for sources
    // that can (JDBC): a live sync then ships trimmed/capped bytes over
    // the wire instead of raw varchar(max) (reference generates dialect
    // SQL for the same reason, db_to_delta.py:54-164). The Spark-side
    // projection still applies afterwards (idempotent), so disabling this
    // never changes results — only wire volume.
    sourceSideProjection: Boolean = true)

object WriteConfig {
  /** Reference default map (write_init.py:29-38): rowversion→BIGINT,
    * tinyint→SMALLINT ("tinyint is unsigned in T-SQL"). Keyed by lower-case
    * SOURCE type name (ColInfo.typeKey). The tsql "timestamp" (= rowversion
    * alias) entry lives only in [[tsqlTypeMap]]: putting it here would match
    * Spark's TimestampType.simpleString for catalog-less sources and lossily
    * cast genuine timestamps to epoch BIGINT. */
  val defaultTypeMap: Map[String, DataType] = Map(
    "rowversion" -> LongType,
    "tinyint" -> ShortType)

  /** Extension for T-SQL-cataloged sources, where "timestamp" is the
    * rowversion alias (reference write_init.py:29-38). Use with sources that
    * populate ColInfo.sourceType from the DB catalog. */
  val tsqlTypeMap: Map[String, DataType] = defaultTypeMap + ("timestamp" -> LongType)

  val noHook: (org.apache.spark.sql.DataFrame, String) => org.apache.spark.sql.DataFrame =
    (d, _) => d
}

/** System columns the engine appends to every SCD2 row
  * (reference write_init.py:22-24). */
object SystemCols {
  val timestamp = "__timestamp"
  val isDeleted = "__is_deleted"
  val isFullLoad = "__is_full_load"
  val all: Seq[String] = Seq(timestamp, isDeleted, isFullLoad)
}

/** Result ADT (reference load_result.py:4-40). */
sealed trait LoadResult
object LoadResult {
  final case class FullLoad(rows: Long) extends LoadResult
  final case class DeltaLoad(inserts: Long, strange: Long, deletes: Long, dirty: Boolean)
      extends LoadResult
  final case class AppendOnly(rows: Long) extends LoadResult
  case object NoLoad extends LoadResult
}

/** Name mangling: characters Spark dislikes in column names → '_'
  * (reference write_init.py:41-46). */
object Naming {
  private val bad = Set(' ', ',', ';', '{', '}', '(', ')', '\n', '\t', '=')
  def compatName(c: ColInfo): String = compat(c.name)
  def compat(name: String): String = name.map(ch => if (bad(ch)) '_' else ch)
}
