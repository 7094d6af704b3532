package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Materialization: committed messages ⋈ dictionary → filtered, projected,
  * envelope-ready rows (SURVEY.md §2.4/§2.5 — J2 + F1-F7).
  *
  * Plan shape (scale rationale): the dictionary side is always tiny →
  * broadcast hash join on obj with an scn-validity range predicate (as-of
  * versioned lookup); table selection falls out of the inner join (events
  * for unselected tables are dropped before any value work — the same
  * "filter before decode" ordering the reference uses); the per-table
  * condition (F2) and column-format projection (F3/F4) are pure Catalyst
  * expressions, fully codegen'd.
  */
object Materialize {

  /** COLUMN_FORMAT policy (Format.h:48-52). */
  sealed trait ColumnFormat
  case object Changed extends ColumnFormat // drop unchanged non-key cols on update
  case object FullInsDec extends ColumnFormat // full image on ins/del too
  case object FullUpd extends ColumnFormat // everything, always

  case class Options(
      columnFormat: ColumnFormat = Changed,
      showSystemTransactions: Boolean = false, // F5
      schemaless: Boolean = false, // §1.2 SCHEMALESS/ADAPTIVE mode
      // F4 visibility flags (≙ SHOW_HIDDEN/NESTED/UNUSED_COLUMNS,
      // Builder.cpp:102-113; hidden PK columns always stay — key semantics)
      showHiddenColumns: Boolean = false,
      showNestedColumns: Boolean = false,
      showUnusedColumns: Boolean = false,
      // CHAR_FORMAT::HEX (Format.h:42-46, Builder.h:1129-1184): string
      // values render as uppercase hex of their UTF-8 bytes
      charFormatHex: Boolean = false,
      // UNKNOWN_TYPE (Format.h:182-185): columns whose dictionary type is
      // outside the builder's value dispatch. false = HIDE (the
      // reference's default — dropped from the images), true = SHOW
      // (rendered as columnUnknown's "?" QUESTION_MARK form; the DUMP
      // form is OracleCodecs.unknownDump, composable sink-side)
      unknownTypeShow: Boolean = false,
      // EXPERIMENTAL_JSON (Builder.cpp:154-158): type-119 JSON columns are
      // DROPPED by default; under the flag the assembled LOB emits as raw
      // hex (columnRaw)
      experimentalJson: Boolean = false,
      // EXPERIMENTAL_XMLTYPE (Builder.cpp:143-150): XMLTYPE-backed BLOBs
      // emit raw hex by default; under the flag the XML decodes to text
      // (parseXml → columnString — the pre-decoded feed carries the text,
      // per the same contract as every charset/LOB decode in SURVEY §7.5)
      experimentalXmlType: Boolean = false)

  /** messages ⋈ dictionary with scn-validity (J2 temporal broadcast join).
    * Unmatched obj# → dropped (dict filter) unless schemaless, where they
    * pass through with a null table name (COL_n raw output downstream). */
  def enrich(messages: Dataset[ChangeMessage], dict: Dictionary,
      opts: Options = Options())(implicit spark: SparkSession): DataFrame = {
    val dictDF = dict.toDF(spark, opts.showHiddenColumns,
        opts.showNestedColumns, opts.showUnusedColumns)
      .withColumnRenamed("obj", "d_obj")
    val joinType = if (opts.schemaless) "left_outer" else "inner"
    val joined = messages.toDF().join(
      broadcast(dictDF),
      col("obj") === col("d_obj") &&
        col("scn") >= col("valid_from_scn") && col("scn") < col("valid_to_scn"),
      joinType)
      .drop("d_obj", "valid_from_scn", "valid_to_scn")
    // F5: system transactions (dict-owner SYS) suppressed unless shown
    if (opts.showSystemTransactions) joined
    else joined.filter(col("owner").isNull || col("owner") =!= "SYS")
  }

  /** F2: apply each table's row condition; rows of tables without a
    * condition pass. Conditions evaluate over (op, attrs), with [op] seen
    * as the reference's DML char 'i'/'u'/'d' (Builder.cpp:773/1632 passes
    * 'i' for inserts) — NOT the wire code 'c' the output column carries. */
  def applyConditions(enriched: DataFrame, dict: Dictionary): DataFrame = {
    val conditioned = dict.selected.filter(_.conditionExpr.nonEmpty)
    if (conditioned.isEmpty) enriched
    else {
      val opChar =
        when(col("op") === MsgOp.Insert, lit("i")).otherwise(col("op"))
      // one disjunction-free Column per table: (obj != t.obj) OR cond(t)
      val pred = conditioned.map { t =>
        (col("obj") =!= lit(t.obj)) ||
          Condition.compile(t.conditionExpr, opChar, col("attrs"))
      }.reduce(_ && _)
      enriched.filter(pred)
    }
  }

  /** Guard-column bitmap resurrection (Builder.cpp:1323-1372): a table
    * may carry a hidden guard column (SYS_NC...$, a RAW bitmap — hex in
    * the pre-decoded feed) where bit `guardSeg(c)` set means column c was
    * explicitly NULL in the row version. For every declared guarded
    * column ABSENT from an image whose guard bitmap is present AND whose
    * byte index is inside the bitmap (the reference's column2/8 < size
    * bound), the column is resurrected as an explicit NULL map entry —
    * the map analogue of the reference's present-with-size-0 sentinel.
    * Unconditional like the reference: active exactly when the dictionary
    * declares guard metadata; pure per-row map surgery, no exchange. */
  def applyGuardResurrection(df: DataFrame): DataFrame = {
    val masks = array((0 until 8).map(b => lit(1 << b)): _*)
    def fix(imgName: String): Column = {
      val img = col(imgName)
      val gv = element_at(img, col("guard_col"))
      val adds = filter(col("guarded_cols"), g => {
        val seg = g.getField("seg")
        val bytePos = floor(seg / 8).cast("int")
        val byteVal = conv(gv.substr(bytePos * 2 + 1, lit(2)), 16, 10)
          .cast("int")
        !array_contains(map_keys(img), g.getField("name")) &&
          length(gv) >= (bytePos + 1) * 2 &&
          byteVal.bitwiseAND(
            element_at(masks, pmod(seg, lit(8)).cast("int") + 1)) > 0
      })
      when(col("guard_col").isNull || img.isNull || gv.isNull ||
          size(adds) === 0, img)
        .otherwise(map_concat(img, map_from_arrays(
          transform(adds, g => g.getField("name")),
          transform(adds, _ => lit(null).cast("string")))))
    }
    df.withColumn("before", fix("before"))
      .withColumn("after", fix("after"))
  }

  /** F4: suppress hidden/nested/unused columns from the images — the
    * dictionary row carries the table's visible set (per the Options
    * flags); unknown tables (schemaless passthrough, visible_cols null)
    * keep everything. */
  def applyVisibility(df: DataFrame): DataFrame = {
    def visible(img: Column): Column =
      when(col("invisible_cols").isNull || size(col("invisible_cols")) === 0,
        img)
        .otherwise(map_filter(img, (k, _) =>
          !array_contains(col("invisible_cols"), k)))
    df.withColumn("before", visible(col("before")))
      .withColumn("after", visible(col("after")))
  }

  /** F3/F6: column-format projection on the before/after maps.
    * keyCols come from the joined dictionary row (array column). */
  def applyColumnFormat(df: DataFrame, opts: Options = Options()): DataFrame = {
    val isKey: (Column, Column) => Column =
      (k, keys) => array_contains(coalesce(keys, array().cast("array<string>")), k)
    opts.columnFormat match {
      case FullUpd | FullInsDec => df // images already full in the feed
      case Changed =>
        // updates: keep key cols + cols whose value actually changed.
        // Both projections must read the ORIGINAL images — compute them in
        // one select, not chained withColumns (the second would see the
        // already-filtered first).
        val changedAfter = map_filter(col("after"), (k, v) =>
          isKey(k, col("key_cols")) || !(element_at(col("before"), k) <=> v))
        val changedBefore = map_filter(col("before"), (k, v) =>
          isKey(k, col("key_cols")) || !(element_at(col("after"), k) <=> v))
        df.withColumn("before_chg",
            when(col("op") === MsgOp.Update, changedBefore).otherwise(col("before")))
          .withColumn("after_chg",
            when(col("op") === MsgOp.Update, changedAfter).otherwise(col("after")))
          .drop("before", "after")
          .withColumnRenamed("before_chg", "before")
          .withColumnRenamed("after_chg", "after")
    }
  }

  /** UNKNOWN_TYPE (Builder.cpp:605-612 default branch): HIDE drops the
    * unknown-typed columns from both images; SHOW keeps them with the
    * reference's QUESTION_MARK rendering. Tables without unknown columns
    * (and schemaless passthrough rows, unknown_cols null) short-circuit. */
  def applyUnknownType(df: DataFrame, show: Boolean): DataFrame = {
    def fix(img: Column): Column =
      when(col("unknown_cols").isNull || size(col("unknown_cols")) === 0, img)
        .otherwise(
          if (show)
            transform_values(img, (k, v) =>
              when(array_contains(col("unknown_cols"), k), lit("?"))
                .otherwise(v))
          else
            map_filter(img, (k, _) =>
              !array_contains(col("unknown_cols"), k)))
    df.withColumn("before", fix(col("before")))
      .withColumn("after", fix(col("after")))
  }

  /** Experimental type handling (Builder.cpp:143-158): JSON (type 119)
    * columns drop from the images unless `experimentalJson`, where the
    * assembled LOB renders as raw hex; XMLTYPE-backed BLOB columns render
    * raw hex unless `experimentalXmlType`, where the decoded XML text
    * passes through. Tables with neither (json_cols/xml_cols empty or the
    * schemaless null passthrough) short-circuit. */
  /** The per-image Column form of the experimental-type surgery —
    * exposed so a query can evaluate BOTH flag settings over one scan
    * (q96) instead of materializing twice and joining. */
  private[graft] def experimentalImage(img: Column,
      experimentalJson: Boolean, experimentalXmlType: Boolean): Column = {
    val j = when(col("json_cols").isNull || size(col("json_cols")) === 0,
      img).otherwise(
      if (experimentalJson)
        transform_values(img, (k, v) =>
          when(array_contains(col("json_cols"), k),
            hex(encode(v, "UTF-8"))).otherwise(v))
      else
        map_filter(img, (k, _) => !array_contains(col("json_cols"), k)))
    when(col("xml_cols").isNull || size(col("xml_cols")) === 0, j)
      .otherwise(
        if (experimentalXmlType) j
        else transform_values(j, (k, v) =>
          when(array_contains(col("xml_cols"), k),
            hex(encode(v, "UTF-8"))).otherwise(v)))
  }

  def applyExperimentalTypes(df: DataFrame, opts: Options): DataFrame =
    df.withColumn("before", experimentalImage(col("before"),
        opts.experimentalJson, opts.experimentalXmlType))
      .withColumn("after", experimentalImage(col("after"),
        opts.experimentalJson, opts.experimentalXmlType))

  /** CHAR_FORMAT::HEX: every image value as uppercase hex of its UTF-8
    * bytes (Builder.h:1129-1184 valueBufferAppendHex path — byte-level,
    * after charset mapping; the pre-decoded feed is already UTF-8). */
  def applyCharFormatHex(df: DataFrame): DataFrame = {
    def hx(img: Column): Column =
      when(img.isNull, img)
        .otherwise(transform_values(img, (_, v) => hex(encode(v, "UTF-8"))))
    df.withColumn("before", hx(col("before")))
      .withColumn("after", hx(col("after")))
  }

  /** Schemaless COL_<n> naming (Builder.cpp:96-99): a row whose obj# has
    * no dictionary match renders its raw columns as COL_0..COL_n-1. The
    * reference numbers by the redo record's physical column index; the
    * pre-decoded feed carries no indices, so the deterministic stand-in
    * is the image's sorted key order (documented contract — both sides
    * of the gate derive the same numbering). Matched rows pass through
    * untouched. */
  def applySchemalessNaming(df: DataFrame): DataFrame = {
    def colN(img: Column): Column = {
      val ks = array_sort(map_keys(img))
      when(col("table_name").isNotNull || img.isNull, img)
        .otherwise(map_from_arrays(
          transform(ks, (_, i) => concat(lit("COL_"), i.cast("string"))),
          transform(ks, k => element_at(img, k))))
    }
    df.withColumn("before", colN(col("before")))
      .withColumn("after", colN(col("after")))
  }

  /** F7: message key = tag columns from the after (else before) image. */
  def withTag(df: DataFrame): DataFrame =
    df.withColumn("tag",
      when(col("tag_cols").isNull || size(col("tag_cols")) === 0, lit(null))
        .otherwise(concat_ws("|",
          transform(col("tag_cols"), c =>
            coalesce(element_at(col("after"), c), element_at(col("before"), c),
              lit(""))))))

  /** Charset decode (§2.7; Builder.cpp:131 parseString(data, size,
    * column->charsetId, ...) over the Locales.cpp:648-800 id space): a
    * column declared with a non-UTF-8 `charsetId` arrives as hex of its
    * RAW bytes (the feed can't pre-decode what the dictionary owns) and
    * decodes here, value-side, before any projection policy — exactly
    * where the reference decodes, between redo extraction and the
    * column-format diff. Tables without charset columns short-circuit on
    * the null/empty map; the per-row id makes one codegen'd projection
    * serve a feed mixing charsets. */
  def applyCharsetDecode(df: DataFrame): DataFrame = {
    import graft.functions.CharsetExpressions.charsetDecode
    def dec(img: Column): Column =
      when(col("charset_cols").isNull || size(col("charset_cols")) === 0,
        img).otherwise(
        transform_values(img, (k, v) =>
          when(v.isNotNull && map_contains_key(col("charset_cols"), k),
            charsetDecode(unhex(v), element_at(col("charset_cols"), k)))
            .otherwise(v)))
    df.withColumn("before", dec(col("before")))
      .withColumn("after", dec(col("after")))
  }

  /** Full path: enrich → charset decode → conditions → visibility →
    * column format → unknown-type → schemaless COL_n naming → tag. */
  def apply(messages: Dataset[ChangeMessage], dict: Dictionary,
      opts: Options = Options())(implicit spark: SparkSession): DataFrame = {
    // unknown-type AFTER column format: the reference diffs raw redo
    // values, so a changed unknown column stays in a CHANGED update and
    // only then renders as "?" (SHOW) or disappears (HIDE — same final
    // images as filtering before the diff, since the column is dropped
    // either way)
    // guard resurrection BEFORE visibility: the guard bitmap is read off
    // the raw image (the guard column itself is hidden and is stripped by
    // the visibility pass right after, like the reference's output)
    val formatted = applyExperimentalTypes(
      applyUnknownType(
        applyColumnFormat(
          applyVisibility(applyGuardResurrection(
            applyConditions(
              applyCharsetDecode(enrich(messages, dict, opts)), dict))),
          opts),
        opts.unknownTypeShow),
      opts)
    val named =
      if (opts.schemaless) applySchemalessNaming(formatted) else formatted
    // tag BEFORE hex rendering: the message key derives from the logical
    // values (Builder computes tags on decoded columns, rendering is a
    // sink-side concern)
    val tagged = withTag(named)
    if (opts.charFormatHex) applyCharFormatHex(tagged) else tagged
  }
}
