package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Web-ingest hygiene operators: URL canonicalization (the crawl-dedup
  * prerequisite — the same page under `HTTP://WWW.Example.COM:80/a?utm_x=1#f`
  * and `http://www.example.com/a` must hash identically before any exact
  * or fuzzy dedup can see it) and semi-structured JSON profiling (the
  * schema-discovery report a pipeline runs before trusting a props blob).
  *
  * Portability discipline (the piiScrub rule): regexes stay in the
  * construct subset Java regex and RE2/DuckDB share; JSON values are
  * compared as EXTRACTED STRINGS with shape-based type classification,
  * never engine-specific JSON type introspection, so the DuckDB oracle
  * classifies with literally the same predicates.
  */
object WebOps {

  /** One capture-group parse of an absolute URL:
    * scheme :// host [:port] [path] [?query] [#fragment].
    * Groups: 1=scheme 2=host 3=:port 4=path 5=?query 6=#fragment.
    */
  /** Group 4 requires the path to be EMPTY or '/'-anchored: without it,
    * a malformed port like `http://h:80x/` full-matches with port `:80`
    * and path `x/`, and default-port stripping then MERGES host and
    * path into `http://hx/` — a canonicalizer feeding dedup must fail
    * such rows into passthrough, never fuse two different resources.
    */
  private val UrlRe =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#:]+)(:[0-9]+)?((?:/[^?#]*)?)(\\?[^#]*)?(#.*)?$"

  /** Canonicalize an absolute-URL column. Rules (the conservative,
    * loss-bounded subset of RFC 3986 §6 normalization plus the utm strip
    * every crawl pipeline applies):
    *   1. scheme and host lowercased (case-insensitive by spec);
    *   2. default port stripped (:80 for http, :443 for https);
    *   3. fragment dropped (never sent to the server);
    *   4. `utm_*` tracking params dropped, remaining params kept in
    *      ORIGINAL order (sorting would merge URLs whose servers are
    *      order-sensitive); an emptied query drops its `?`;
    *   5. path preserved byte-for-byte (dot-segment and percent-encoding
    *      normalization are deliberately out of scope — they can change
    *      which resource is addressed on non-conforming servers).
    * Rows that do not parse as absolute URLs pass through unchanged with
    * all flags 0 (a canonicalizer must never destroy what it cannot
    * parse).
    *
    * Emits the original, the canonical form, and per-rule observability
    * flags so the gate proves every rule fires. Pure projection — zero
    * exchanges, whole-stage codegen; at 100 TB this runs at scan speed
    * ahead of the dedup hash.
    */
  def urlCanonical(df: DataFrame, urlCol: String, keyCols: Seq[String]): DataFrame = {
    // regexp_extract via the function API: the pattern is passed as a
    // plain string literal, not re-parsed as a SQL string, so the \?
    // escape needs no dialect-specific double-escaping here
    val parse = Seq(
      regexp_extract(col(urlCol), UrlRe, 1).as("u_scheme"),
      regexp_extract(col(urlCol), UrlRe, 2).as("u_host"),
      regexp_extract(col(urlCol), UrlRe, 3).as("u_port"),
      regexp_extract(col(urlCol), UrlRe, 4).as("u_path"),
      regexp_extract(col(urlCol), UrlRe, 5).as("u_query"),
      regexp_extract(col(urlCol), UrlRe, 6).as("u_frag"))
    df.select((keyCols :+ urlCol).map(col) ++ parse: _*)
      .selectExpr(
        (keyCols :+ urlCol) ++ Seq(
          "u_scheme", "u_host", "u_port", "u_path", "u_query", "u_frag",
          // kept query params: split the non-'?' remainder, drop utm_*
          """CASE WHEN u_query = '' THEN array()
            |     ELSE filter(split(substring(u_query, 2), '&'),
            |                 p -> substring(p, 1, 4) <> 'utm_') END AS kept""".stripMargin): _*)
      .selectExpr(
        (keyCols ++ Seq(
          urlCol,
          s"""CASE WHEN u_scheme = '' THEN $urlCol
             |     ELSE lower(u_scheme) || '://' || lower(u_host)
             |          || (CASE WHEN (lower(u_scheme) = 'http'  AND u_port = ':80')
             |                     OR (lower(u_scheme) = 'https' AND u_port = ':443')
             |              THEN '' ELSE u_port END)
             |          || u_path
             |          || (CASE WHEN u_query = '' OR size(kept) = 0 THEN ''
             |              ELSE '?' || array_join(kept, '&') END)
             |END AS canon_url""".stripMargin,
          """CASE WHEN u_query = ''
            |     THEN 0
            |     ELSE size(split(substring(u_query, 2), '&')) - size(kept)
            |END AS dropped_utm""".stripMargin,
          "CAST(u_frag <> '' AS INT) AS had_fragment",
          """CAST((lower(u_scheme) = 'http' AND u_port = ':80')
            |  OR (lower(u_scheme) = 'https' AND u_port = ':443') AS INT) AS port_stripped""".stripMargin,
          "CAST(u_scheme = '' AS INT) AS unparsed")): _*)
      .orderBy(keyCols.map(col): _*)
  }

  /** Key/type profile of a JSON string column — the report that answers
    * "what keys exist, how often, and holding what" before anyone writes
    * `props.user_id` into a join. One row per TOP-LEVEL key: presence
    * count, and value-shape counts (null / number / boolean / array-or-
    * object / string) plus the distinct-value cardinality.
    *
    * Values are compared as strings from the engine's JSON-to-string-map
    * conversion; a value's TYPE is classified by its string SHAPE
    * (castable-to-double ⇒ number, literal true/false ⇒ boolean, leading
    * '[' / '{' ⇒ nested, else string) — identical predicates in both
    * engines, where native JSON type introspection differs. A string
    * value that LOOKS like a number (`"69"`) therefore counts as a
    * number: this is the documented trade for a portable profile, and it
    * is the answer a CSV-roundtripped consumer would experience anyway.
    *
    * Scale shape: one explode to (row, key) pairs — linear in total keys
    * — then one map-side-combined groupBy on the key (distinct values
    * via a per-key count_distinct; at pathological per-key cardinality
    * swap in approx_count_distinct). Malformed JSON rows yield no keys
    * and simply do not profile (from_json returns NULL).
    */
  def jsonProfile(df: DataFrame, jsonCol: String): DataFrame =
    df
      .select(explode(expr(s"from_json($jsonCol, 'map<string,string>')")).as(Seq("k", "v")))
      .groupBy(col("k"))
      .agg(
        count(lit(1)).as("n_present"),
        sum(expr("CAST(v IS NULL AS INT)")).as("n_null"),
        sum(expr("CAST(v IS NOT NULL AND try_cast(v AS DOUBLE) IS NOT NULL AS INT)")).as("n_number"),
        sum(expr("CAST(v IS NOT NULL AND v IN ('true', 'false') AS INT)")).as("n_bool"),
        sum(expr("CAST(v IS NOT NULL AND substring(v, 1, 1) IN ('[', '{') AS INT)")).as("n_nested"),
        sum(expr(
          """CAST(v IS NOT NULL AND try_cast(v AS DOUBLE) IS NULL
            |     AND v NOT IN ('true', 'false')
            |     AND substring(v, 1, 1) NOT IN ('[', '{') AS INT)""".stripMargin)).as("n_string"),
        count_distinct(col("v")).as("n_distinct"))
      .orderBy(col("k"))

  /** Corrupt-record routing for a JSON ingest — the dead-letter split
    * every schema-on-read boundary needs: rows whose JSON column fails
    * to parse must be COUNTED and quarantined, never silently nulled
    * into the clean stream (the classic ingest bug: a truncated upload
    * turns into a column of NULLs and the pipeline "succeeds").
    *
    * Validity predicate: `from_json(col, map) IS NOT NULL` — Spark's
    * PERMISSIVE parser yields NULL for malformed input, which is the
    * engine-portable subset (the oracle's `json_valid` agrees on
    * clearly-broken documents; exotic edge cases like trailing garbage
    * are pinned by test, not assumed). Emits one row per route with
    * exact counts and min/max id witnesses — enough to locate the bad
    * byte range in the source without shipping the payloads anywhere.
    *
    * Shape: one projection + one 2-key aggregate. Scan-bound; the
    * dead-letter WRITE (ids + raw payloads) is the caller's second
    * consumer of the same flagged frame.
    */
  /** Streaming twin of [[jsonIngest]] — the dead-letter split as a
    * long-running ingest: each micro-batch routes its rows and writes
    * BOTH legs as per-batch stores (`clean/batch_N` carries the parsed
    * map, `dead/batch_N` carries id + raw payload for replay after the
    * producer is fixed). Whole-dir overwrite keyed by batch id — the
    * [[graft.io.Sinks]] idempotent-redelivery contract; a reader folds
    * committed batches only (both-`_SUCCESS` torn-overwrite rule via
    * the shared committedBatchDirs).
    */
  def jsonIngestSink(
      df: DataFrame,
      idCol: String,
      jsonCol: String,
      outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        jsonIngestBatch(batch.toDF(), idCol, jsonCol, outDir, batchId)
      }
      .start()

  /** One micro-batch's routing — factored out so redelivery (same batch
    * id, same rows) is directly testable: the whole-dir overwrite makes
    * a replay converge to the same stores.
    */
  def jsonIngestBatch(
      df: DataFrame,
      idCol: String,
      jsonCol: String,
      outDir: String,
      batchId: Long): Unit = {
    val flagged = df
      .select(col(idCol).cast("bigint").as("id"), col(jsonCol).as("raw"),
        expr(s"from_json($jsonCol, 'map<string,string>')").as("parsed"))
      .persist()
    try {
      flagged.where(col("parsed").isNotNull)
        .select(col("id"), col("parsed"))
        .write.mode("overwrite").parquet(s"$outDir/clean/batch_$batchId")
      flagged.where(col("parsed").isNull)
        .select(col("id"), col("raw"))
        .write.mode("overwrite").parquet(s"$outDir/dead/batch_$batchId")
    } finally {
      flagged.unpersist()
      ()
    }
  }

  /** [[jsonIngest]]'s report over everything [[jsonIngestSink]]
    * committed: fold both per-batch stores into the same
    * status/count/witness rows the batch operator emits. Only batches
    * with BOTH legs committed count (a crash between the two writes
    * must not let a half-routed batch skew the report); an empty store
    * reports nothing rather than erroring.
    */
  def jsonIngestFrom(
      spark: org.apache.spark.sql.SparkSession,
      outDir: String): DataFrame = {
    import graft.ext.TextOps.committedBatchDirs
    val both = committedBatchDirs(spark, s"$outDir/clean")
      .intersect(committedBatchDirs(spark, s"$outDir/dead"))
    if (both.isEmpty) {
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "status string, n_rows bigint, n_ids bigint, min_id bigint, max_id bigint"))
    } else {
      val dirs = both.toSeq.sorted
      val clean = spark.read.parquet(dirs.map(b => s"$outDir/clean/$b"): _*)
        .select(col("id"), lit(true).as("ok"))
      val dead = spark.read.parquet(dirs.map(b => s"$outDir/dead/$b"): _*)
        .select(col("id"), lit(false).as("ok"))
      clean.unionByName(dead)
        .groupBy(col("ok"))
        .agg(count(lit(1)).as("n_rows"),
          count_distinct(col("id")).as("n_ids"),
          min(col("id")).as("min_id"), max(col("id")).as("max_id"))
        .select(
          when(col("ok"), lit("clean")).otherwise(lit("corrupt")).as("status"),
          col("n_rows").cast("bigint").as("n_rows"),
          col("n_ids").cast("bigint").as("n_ids"),
          col("min_id"), col("max_id"))
    }
  }

  def jsonIngest(df: DataFrame, idCol: String, jsonCol: String): DataFrame =
    df
      .select(col(idCol).cast("bigint").as("id"),
        expr(s"from_json($jsonCol, 'map<string,string>') IS NOT NULL").as("ok"))
      .groupBy(col("ok"))
      .agg(
        count(lit(1)).as("n_rows"),
        count_distinct(col("id")).as("n_ids"),
        min(col("id")).as("min_id"),
        max(col("id")).as("max_id"))
      .select(
        when(col("ok"), lit("clean")).otherwise(lit("corrupt")).as("status"),
        col("n_rows").cast("bigint").as("n_rows"),
        col("n_ids").cast("bigint").as("n_ids"),
        col("min_id"), col("max_id"))

  /** CSV ingest with dead-letter routing — the delimited-file twin of
    * the JSON dead-letter pipeline: each line parses under PERMISSIVE
    * mode with a corrupt-record column, so a malformed row (here: a
    * type-conversion failure) becomes a ROUTED row, never a dropped one
    * and never a job death. Identity and row accounting key on the
    * caller's OUTER id column, deliberately not on parsed fields — how
    * much of a corrupt row the parser salvages is a parser detail the
    * audit must not depend on. One parse projection + one 2-group
    * aggregate; nothing shuffles but the 2-row rollup.
    */
  def csvDeadLetter(
      df: DataFrame,
      idCol: String,
      lineCol: String,
      schemaDdl: String,
      priceField: String): DataFrame =
    df
      .select(col(idCol).cast("bigint").as("id"),
        expr(s"""from_csv($lineCol, '$schemaDdl, _corrupt STRING',
                 map('mode', 'PERMISSIVE', 'columnNameOfCorruptRecord', '_corrupt'))""")
          .as("p"))
      .groupBy(col("p._corrupt").isNull.as("ok"))
      .agg(
        count(lit(1)).as("n_rows"),
        count_distinct(col("id")).as("n_ids"),
        min(col("id")).as("min_id"),
        max(col("id")).as("max_id"),
        sum(col(s"p.$priceField").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .select(
        when(col("ok"), lit("clean")).otherwise(lit("corrupt")).as("status"),
        col("n_rows").cast("bigint").as("n_rows"),
        col("n_ids").cast("bigint").as("n_ids"),
        col("min_id"), col("max_id"), col("sum_price"))

  /** Hierarchical path rollup: every row contributes one count to EVERY
    * prefix of its path — `/a/b/c` increments `/a`, `/a/b`, and
    * `/a/b/c` — the "traffic by site subtree" report a flat groupBy on
    * the full path cannot produce (a parent's total must include all
    * descendants, not just exact hits). Emits each prefix with its
    * depth, total row count, and exact-hit count (rows whose FULL path
    * is that prefix).
    *
    * Shapes: one in-row prefix expansion (a row of depth d explodes to
    * d rows — bounded by the path depth cap, guarded loudly) and one
    * aggregate keyed on the prefix string. The explosion factor is the
    * mean path depth, not a join; counts combine map-side. Rows with
    * no '/'-segments (empty path) are dropped.
    */
  def pathRollup(df: DataFrame, pathCol: String, maxDepth: Int = 16): DataFrame = {
    require(maxDepth >= 1 && maxDepth <= 64, s"maxDepth must be in [1,64], got $maxDepth")
    df
      .where(col(pathCol).isNotNull)
      .select(expr(s"filter(split($pathCol, '/'), s -> s != '')").as("segs"))
      .where(size(col("segs")) > 0)
      .withColumn("segs",
        when(size(col("segs")) <= maxDepth, col("segs"))
          .otherwise(expr(
            s"raise_error('pathRollup: path deeper than maxDepth=$maxDepth')")))
      .select(
        posexplode(expr(
          "transform(sequence(1, size(segs)), i -> concat('/', array_join(slice(segs, 1, i), '/')))"))
          .as(Seq("p0", "prefix")),
        size(col("segs")).as("full_depth"))
      .groupBy(col("prefix"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(when(col("p0") + 1 === col("full_depth"), 1)).as("n_exact"))
      .withColumn("depth",
        (size(split(col("prefix"), "/")) - 1).cast("int"))
      .select(col("prefix"), col("depth"), col("n_rows"), col("n_exact"))
  }
}
