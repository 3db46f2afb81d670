package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level write policies a Delta table declares and every writer is
  * obliged to honor: CHECK constraints (`delta.constraints.*` table
  * properties), legacy column invariants (`delta.invariants` field
  * metadata), NOT NULL fields, generated columns
  * (`delta.generationExpression`), and identity columns (`delta.identity.*`
  * — reference writer/sql_schema.py models the source-side identity/
  * computed flags these carry over; db_to_delta.py:331 maps them through
  * the projection).
  *
  * Enforcement is IN-PLAN, not a separate validation pass: the violation
  * predicate wraps one written column as
  * `when(violated, raise_error(detail)).otherwise(col)`, so the check runs
  * inside the same distributed write job (codegen'd, zero extra scans of
  * the incoming batch) and a violating row fails the write loudly with the
  * constraint name and the row's JSON — the staged files become
  * vacuum-reclaimable orphans, the table is untouched. This is the
  * delta-spark `CheckDeltaInvariant` contract: a CHECK result of false OR
  * null is a violation (stricter than ANSI, matching delta-spark).
  *
  * 100 TB: all checks are row-local column expressions riding the write's
  * own scan — no shuffle, no extra pass, no driver involvement. */
private[store] object ColumnPolicies {

  /** One enforced rule: `violated` TRUE (never null) means the row fails;
    * `label` names the rule in the error. */
  final case class Rule(label: String, violated: Column)

  final case class Identity(
      name: String, dataType: DataType,
      start: Long, step: Long, highWaterMark: Option[Long],
      allowExplicit: Boolean) {
    /** Lattice point one `step` BEFORE the next assignable value: the
      * first assigned value (`base + step`) is then strictly past the
      * high-water mark in step direction and on the `start + k*step`
      * lattice — even when explicit inserts (allowExplicitInsert) left an
      * off-lattice mark. `start - step` for a never-assigned column, so
      * the first value is exactly `start`. */
    def base: Long = highWaterMark match {
      case None => start - step
      case Some(h) =>
        // largest lattice point not past h in step direction (BigInt: the
        // diff can overflow Long for extreme start/mark pairs)
        val (q, r) = (BigInt(h) - BigInt(start)) /% BigInt(step)
        val k = if (r != 0 && ((r < 0) != (step < 0))) q - 1 else q
        val b = BigInt(start) + BigInt(step) * k
        if (!b.isValidLong) throw new IllegalStateException(
          s"identity base for column $name falls outside Long range")
        b.toLong
    }
  }

  private val InvariantsKey = "delta.invariants"
  private val GenerationKey = "delta.generationExpression"
  private val IdentityStart = "delta.identity.start"
  private val IdentityStep = "delta.identity.step"
  private val IdentityHwm = "delta.identity.highWaterMark"
  private val IdentityExplicit = "delta.identity.allowExplicitInsert"
  private val ConstraintPrefix = "delta.constraints."

  /** CHECK constraints from the table configuration. */
  def checkConstraints(config: Map[String, String]): Seq[(String, String)] =
    config.toSeq.collect {
      case (k, sql) if k.startsWith(ConstraintPrefix) =>
        k.stripPrefix(ConstraintPrefix) -> sql
    }.sortBy(_._1)

  /** Legacy per-column invariants: field metadata
    * `{"expression": {"expression": "<sql>"}}`. */
  def invariants(schema: StructType): Seq[(String, String)] =
    schema.fields.toSeq.flatMap { f =>
      if (!f.metadata.contains(InvariantsKey)) None
      else {
        val node = VersionedTable.mapper.readTree(f.metadata.getString(InvariantsKey))
        Option(node.get("expression")).flatMap(e => Option(e.get("expression")))
          .map(e => s"invariant(${f.name})" -> e.asText())
      }
    }

  /** Generated columns: (field, generation SQL). */
  def generated(schema: StructType): Seq[(StructField, String)] =
    schema.fields.toSeq.collect {
      case f if f.metadata.contains(GenerationKey) =>
        f -> f.metadata.getString(GenerationKey)
    }

  private val DefaultKey = "CURRENT_DEFAULT"

  /** Declared column DEFAULTS (the allowColumnDefaults writer feature):
    * (field, default SQL) from the spec's `CURRENT_DEFAULT` field
    * metadata. The obligation is write-side only — a column omitted from
    * an INSERT takes its default instead of NULL; provided values always
    * win. (Delta disallows adding a default WITH a new column, so the
    * read-side `EXISTS_DEFAULT` back-fill key cannot legally occur.) */
  def defaults(schema: StructType): Seq[(StructField, String)] =
    schema.fields.toSeq.collect {
      case f if f.metadata.contains(DefaultKey) =>
        f -> f.metadata.getString(DefaultKey)
    }

  /** The identity column, when one is declared. Delta allows at most one
    * identity column per table; a metadata mishap declaring several is
    * refused by the caller. */
  def identity(schema: StructType): Seq[Identity] =
    schema.fields.toSeq.collect {
      case f if f.metadata.contains(IdentityStart) ||
          f.metadata.contains(IdentityStep) =>
        Identity(
          f.name, f.dataType,
          start = if (f.metadata.contains(IdentityStart))
            f.metadata.getLong(IdentityStart) else 1L,
          step = if (f.metadata.contains(IdentityStep))
            f.metadata.getLong(IdentityStep) else 1L,
          highWaterMark = if (f.metadata.contains(IdentityHwm))
            Some(f.metadata.getLong(IdentityHwm)) else None,
          allowExplicit = f.metadata.contains(IdentityExplicit) &&
            f.metadata.getBoolean(IdentityExplicit))
    }

  /** All rules a batch of NEW rows must satisfy, resolved against the
    * LOGICAL schema (constraint SQL references logical column names):
    * CHECK constraints + invariants (false-or-null = violation), NOT NULL
    * for the table's non-nullable fields, and `col <=> genExpr` equality
    * for generated columns the batch PROVIDED (delta-spark enforces
    * provided values match the generation expression; computed ones are
    * equal by construction and skip the probe). */
  def rules(
      tableSchema: StructType, config: Map[String, String],
      providedGenerated: Set[String]): Seq[Rule] = {
    val checks = (checkConstraints(config) ++ invariants(tableSchema)).map {
      case (name, sql) =>
        Rule(s"CHECK constraint $name ($sql)", !coalesce(expr(sql), lit(false)))
    }
    val notNulls = tableSchema.fields.toSeq.flatMap { f =>
      val top =
        if (!f.nullable)
          Some(Rule(s"NOT NULL constraint on column ${f.name}",
            col(s"`${f.name}`").isNull))
        else None
      val nested = nestedNullPred(f.dataType).map(p =>
        Rule(s"NOT NULL constraint on a nested field under column ${f.name}",
          col(s"`${f.name}`").isNotNull && p(col(s"`${f.name}`"))))
      top.toSeq ++ nested.toSeq
    }
    val gens = generated(tableSchema).collect {
      case (f, sql) if providedGenerated.contains(f.name.toLowerCase) =>
        Rule(
          s"generated column ${f.name} must equal $sql",
          !(col(s"`${f.name}`") <=> expr(sql).cast(f.dataType)))
    }
    checks ++ notNulls ++ gens
  }

  /** Predicate builder for NESTED non-nullable positions: given a
    * NON-NULL value of type `dt`, does it contain a null somewhere a
    * non-nullable field forbids one? Struct chains guard each step on the
    * parent being non-null (a NULL parent is the parent's own rule's
    * concern); array elements and map values are probed in-plan with
    * `exists()` (higher-order, codegen'd — no UDF). delta-spark rejects
    * such rows too; writing them silently would publish data its readers
    * refuse. None ⟺ the type declares no nested non-nullable position. */
  private def nestedNullPred(dt: DataType): Option[Column => Column] = dt match {
    case st: StructType =>
      val per: Seq[Column => Column] = st.fields.toSeq.flatMap { f =>
        val own: Option[Column => Column] =
          if (!f.nullable) Some((c: Column) => c.getField(f.name).isNull)
          else None
        val deeper: Option[Column => Column] =
          nestedNullPred(f.dataType).map(p => (c: Column) => {
            val fc = c.getField(f.name)
            fc.isNotNull && p(fc)
          })
        own.toSeq ++ deeper.toSeq
      }
      if (per.isEmpty) None
      else Some((c: Column) => per.map(_(c)).reduce(_ || _))
    case at: ArrayType =>
      val elemNull: Option[Column => Column] =
        if (!at.containsNull) Some((x: Column) => x.isNull) else None
      val deeper: Option[Column => Column] =
        nestedNullPred(at.elementType).map(p => (x: Column) => x.isNotNull && p(x))
      val per = elemNull.toSeq ++ deeper.toSeq
      if (per.isEmpty) None
      else Some((c: Column) => exists(c, x => per.map(_(x)).reduce(_ || _)))
    case mt: MapType =>
      val valNull: Option[Column => Column] =
        if (!mt.valueContainsNull) Some((x: Column) => x.isNull) else None
      val deeper: Option[Column => Column] =
        nestedNullPred(mt.valueType).map(p => (x: Column) => x.isNotNull && p(x))
      val per = valNull.toSeq ++ deeper.toSeq
      if (per.isEmpty) None
      else Some((c: Column) =>
        exists(map_values(c), x => per.map(_(x)).reduce(_ || _)))
    case _ => None
  }

  /** Wrap `anchor` (one column of the aligned batch, by name) so that any
    * rule violation raises in the write tasks; non-violating rows pass the
    * anchor value through untouched. The error carries the first violated
    * rule's label and the offending row as JSON (both evaluated LAZILY —
    * CaseWhen branches only run on violation). */
  def enforce(df: DataFrame, schema: StructType, ruleSeq: Seq[Rule]): DataFrame = {
    if (ruleSeq.isEmpty) return df
    val anchor = schema.fields.head
    val rowJson = to_json(struct(schema.fieldNames.toSeq.map(n => col(s"`$n`")): _*))
    val guarded = ruleSeq.foldRight(col(s"`${anchor.name}`")) { (r, acc) =>
      when(coalesce(r.violated, lit(false)),
        raise_error(concat(
          lit(s"graft foreign-delta write rejected: ${r.label} violated by row "),
          rowJson)).cast(anchor.dataType))
        .otherwise(acc)
    }
    df.select(schema.fields.toSeq.map { f =>
      if (f.name == anchor.name) guarded.as(f.name, f.metadata)
      else col(s"`${f.name}`")
    }: _*)
  }

  /** Schema with the identity column's high-water mark advanced — the
    * field-metadata update the commit's metaData action must carry so the
    * NEXT writer (any engine) allocates above this batch. */
  def withHighWaterMark(schema: StructType, name: String, hwm: Long): StructType =
    StructType(schema.fields.map { f =>
      if (!f.name.equalsIgnoreCase(name)) f
      else f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
        .putLong(IdentityHwm, hwm).build())
    })
}
