package graft.catalog

import java.time.Instant

import org.apache.spark.sql.types._

/** Engine-authored metadata-catalog fixtures (FIXTURES.md §B; SURVEY.md §5.5).
  *
  * The reference defines the checks over *metadata the platform should hold*
  * (descriptions, declared keys, SLAs, lineage, licenses — see citations per
  * check in SURVEY.md §2.A); it ships no data. These catalogs are our
  * deterministic stand-in, sized broadcast-small ON PURPOSE: at 100 TB scale
  * these stay metadata-small (a metastore dump), so every join against them
  * is a broadcast join — no shuffle of the big fact tables.
  *
  * All timestamps are UTC Instants; `AsOf` is the assessment timestamp
  * parameter (never `now()` — determinism for the DuckDB oracle).
  */
object Fixtures {

  val AsOf: Instant = Instant.parse("2024-01-31T00:00:00Z")
  val AsOfSql = "TIMESTAMP '2024-01-31 00:00:00'"
  /** Context-window token budget for chunk_readiness (#16). */
  val CtxWindowTokens = 512
  /** Embedding dim the consuming model expects (#20). */
  val ModelDim = 64

  private def ts(s: String): Instant = Instant.parse(s)
  private val S = StringType; private val L = LongType; private val D = DoubleType
  private val B = BooleanType; private val T = TimestampType; private val I = IntegerType
  private def st(fs: (String, DataType)*): StructType =
    StructType(fs.map { case (n, t) => StructField(n, t, nullable = true) })

  // ── assets ────────────────────────────────────────────────────────────
  // 13 assets: the 10 driver tables + online_features (row store) +
  // doc_chunks (index artifact) + extra_vectors (second embedding
  // collection, deliberately mixed-dim).
  val assets = Fixture("assets",
    st("asset" -> S, "kind" -> S, "format" -> S, "owner" -> S,
      "description" -> S, "origin" -> S, "origin_system" -> S,
      "collection_method" -> S, "row_count" -> L, "bytes" -> L,
      "layout_keys" -> ArrayType(S), "text_bearing" -> B,
      "search_index" -> B, "cdc_enabled" -> B, "key_addressable" -> B,
      "version_id" -> S, "immutable" -> B, "valid_from" -> T,
      "valid_to" -> T, "upstream_enumerated" -> B,
      "downstream_enumerated" -> B, "last_modified" -> T,
      "training_data" -> B),
    Seq(
      Seq("region", "table", "parquet", "core", "Sales regions", "internal",
        "erp", "batch_export", 5L, 1000L, Seq.empty[String], false, false,
        false, false, "v1", true, null, null, true, true,
        ts("2024-01-10T00:00:00Z"), false),
      Seq("nation", "table", "parquet", "core", "Nations by region",
        "internal", "erp", "batch_export", 25L, 2000L, Seq.empty[String],
        false, false, false, false, "v1", true, null, null, true, true,
        ts("2024-01-10T00:00:00Z"), false),
      Seq("customer", "table", "parquet", "crm-team", "Customer master",
        "internal", "crm", "cdc", 1500L, 300000L, Seq.empty[String], false,
        false, true, true, "v3", true, null, null, true, true,
        ts("2024-01-28T00:00:00Z"), false),
      Seq("supplier", "table", "csv", "core", "Supplier master", "internal",
        null, "batch_export", 100L, 20000L, Seq.empty[String], false, false,
        false, false, null, false, null, null, false, false,
        ts("2024-01-15T00:00:00Z"), false),
      Seq("part", "table", "parquet", "core", null, "internal", "erp", null,
        2000L, 200000L, Seq.empty[String], false, false, false, false, null,
        false, null, null, false, false, ts("2024-01-15T00:00:00Z"), false),
      Seq("orders", "table", "parquet", "sales", "Order headers", "internal",
        "erp", "cdc", 15000L, 2000000L, Seq("o_orderdate"), false, false,
        true, false, "v7", true, ts("1995-01-01T00:00:00Z"),
        ts("2001-08-01T00:00:00Z"), true, true,
        ts("2024-01-30T00:00:00Z"), true),
      Seq("lineitem", "table", "parquet", "sales", "Order line items",
        "internal", "erp", "cdc", 60000L, 6000000L, Seq("l_shipdate"),
        false, false, true, false, "v7", true, ts("1995-01-01T00:00:00Z"),
        ts("2001-11-04T00:00:00Z"), true, true,
        ts("2024-01-30T00:00:00Z"), true),
      Seq("events", "table", "parquet", "platform", "Product event stream",
        "external", "web_sdk", "streaming", 10000L, 1500000L,
        Seq.empty[String], true, false, true, false, "v2", true,
        ts("2024-01-01T00:00:00Z"), ts("2024-01-31T00:00:00Z"), true, true,
        ts("2024-01-30T00:00:00Z"), true),
      Seq("documents", "collection", "parquet", "ml-team", "Crawled docs",
        "external", "web_crawl", "scrape", 500L, 1200000L,
        Seq.empty[String], true, true, false, false, "v1", true, null, null,
        true, false, ts("2024-01-25T00:00:00Z"), true),
      Seq("embeddings", "collection", "vector", "ml-team", null, "external",
        "embedding_service", "model_inference", 500L, 130000L,
        Seq.empty[String], false, false, false, false, null, false, null,
        null, false, true, ts("2024-01-26T00:00:00Z"), true),
      Seq("online_features", "table", "kv", "ml-team", null, "internal",
        "feature_store", "streaming", 20L, 4000L, Seq.empty[String], false,
        false, true, true, null, false, ts("2024-01-01T00:00:00Z"), null,
        false, false, ts("2024-01-30T00:00:00Z"), false),
      Seq("doc_chunks", "index", "parquet", "ml-team", "Chunked documents",
        "internal", "chunker", null, 25L, 8000L, Seq("doc_id"), false,
        false, false, false, null, false, null, null, false, false,
        ts("2024-01-29T00:00:00Z"), false),
      Seq("extra_vectors", "collection", "vector", "ml-team", null,
        "internal", "embedding_service", "model_inference", 3L, 1000L,
        Seq.empty[String], false, false, false, false, null, false, null,
        null, false, false, ts("2024-01-27T00:00:00Z"), false)))

  // ── columns ───────────────────────────────────────────────────────────
  // All 51 real columns of the 10 driver tables + 4 online_features cols.
  // (asset, column, data_type, declared, description, glossary_term_id,
  //  unit, is_numeric, pii_declared, masking_policy)
  private def c(asset: String, col: String, dt: String,
      declared: Boolean = true, desc: String = null, gloss: String = null,
      unit: String = null, num: Boolean = false, pii: Boolean = false,
      mask: String = null): Seq[Any] =
    Seq(asset, col, dt, declared, desc, gloss, unit, num, pii, mask)

  val columns = Fixture("columns",
    st("asset" -> S, "column_name" -> S, "data_type" -> S, "declared" -> B,
      "description" -> S, "glossary_term_id" -> S, "unit" -> S,
      "is_numeric" -> B, "pii_declared" -> B, "masking_policy" -> S),
    Seq(
      c("region", "r_regionkey", "int", desc = "Region key"),
      c("region", "r_name", "string", desc = "Region name"),
      c("nation", "n_nationkey", "int", desc = "Nation key"),
      c("nation", "n_name", "string", desc = "Nation name"),
      c("nation", "n_regionkey", "int", desc = "FK to region"),
      c("customer", "c_custkey", "bigint", desc = "Customer key", gloss = "t01"),
      c("customer", "c_name", "string", desc = "Customer name", gloss = "t02",
        pii = true, mask = "sha2_256"),
      c("customer", "c_nationkey", "int", desc = "FK to nation", gloss = "t03"),
      c("customer", "c_acctbal", "double", desc = "Account balance",
        gloss = "t04", unit = "usd", num = true),
      c("customer", "c_mktsegment", "string", desc = "Market segment", gloss = "t05"),
      c("supplier", "s_suppkey", "bigint", desc = "Supplier key"),
      c("supplier", "s_name", "string", desc = "Supplier name", pii = true),
      c("supplier", "s_nationkey", "int", desc = "FK to nation"),
      c("supplier", "s_acctbal", "double", desc = "Account balance",
        unit = "usd", num = true),
      c("part", "p_partkey", "bigint", desc = "Part key"),
      c("part", "p_name", "string", desc = "Part name"),
      c("part", "p_brand", "string", desc = "Brand"),
      c("part", "p_type", "string", desc = "Part type"),
      c("part", "p_size", "int", desc = "Size", unit = "cm", num = true),
      c("part", "p_retailprice", "double", desc = "Retail price",
        unit = "usd", num = true),
      c("orders", "o_orderkey", "bigint", desc = "Order key", gloss = "t06"),
      c("orders", "o_custkey", "bigint", desc = "FK to customer", gloss = "t07"),
      c("orders", "o_orderstatus", "string", desc = "Status", gloss = "t08"),
      c("orders", "o_totalprice", "double", desc = "Total price",
        gloss = "t09", unit = "usd", num = true),
      c("orders", "o_orderdate", "timestamp", desc = "Order date", gloss = "t10"),
      c("orders", "o_orderpriority", "string", desc = "Priority", gloss = "t11"),
      c("lineitem", "l_orderkey", "bigint", desc = "FK to orders", gloss = "t12"),
      c("lineitem", "l_partkey", "bigint", desc = "FK to part", gloss = "t13"),
      c("lineitem", "l_suppkey", "bigint", desc = "FK to supplier", gloss = "t14"),
      c("lineitem", "l_linenumber", "int", desc = "Line number", gloss = "t15"),
      c("lineitem", "l_quantity", "double", desc = "Quantity", gloss = "t16",
        unit = "count", num = true),
      c("lineitem", "l_extendedprice", "double", desc = "Extended price",
        gloss = "t17", unit = "usd", num = true),
      c("lineitem", "l_discount", "double", desc = "Discount", gloss = "t18",
        num = true),
      c("lineitem", "l_tax", "double", desc = "Tax", num = true),
      c("lineitem", "l_returnflag", "string", desc = "Return flag"),
      c("lineitem", "l_linestatus", "string", desc = "Line status"),
      c("lineitem", "l_shipdate", "timestamp", desc = "Ship date"),
      c("events", "event_id", "bigint", desc = "Event id"),
      c("events", "ts", "timestamp", desc = "Event time"),
      c("events", "user_id", "bigint", desc = "Acting user", pii = true,
        mask = "tokenize"),
      c("events", "event_type", "string"),
      c("events", "value", "double", gloss = "t98", num = true), // dangling term
      c("events", "props", "string", declared = false),
      c("documents", "doc_id", "bigint"),
      c("documents", "text", "string", declared = false),
      c("documents", "lang", "string", gloss = "t99"), // dangling term
      c("documents", "source", "string", declared = false),
      c("documents", "n_chars", "bigint", num = false),
      c("embeddings", "vec_id", "bigint"),
      c("embeddings", "embedding", "array<float>"),
      c("embeddings", "label", "int", declared = false),
      c("online_features", "entity_id", "bigint"),
      c("online_features", "feature", "string"),
      c("online_features", "value", "double", declared = false, num = true),
      c("online_features", "last_refresh_ts", "timestamp")))

  // ── keys / relationships / constraints / glossary ─────────────────────
  val keyDeclarations = Fixture("key_declarations",
    st("asset" -> S, "key_column" -> S, "kind" -> S),
    Seq(
      Seq("region", "r_regionkey", "primary"),
      Seq("nation", "n_nationkey", "primary"),
      Seq("customer", "c_custkey", "primary"),
      Seq("supplier", "s_suppkey", "primary"),
      Seq("part", "p_partkey", "primary"),
      Seq("orders", "o_orderkey", "primary"),
      Seq("events", "event_id", "primary"),
      Seq("embeddings", "vec_id", "primary")))

  val relationships = Fixture("relationships",
    st("src_asset" -> S, "src_column" -> S, "dst_asset" -> S, "dst_column" -> S),
    Seq(
      Seq("nation", "n_regionkey", "region", "r_regionkey"),
      Seq("customer", "c_nationkey", "nation", "n_nationkey"),
      Seq("orders", "o_custkey", "customer", "c_custkey"),
      Seq("lineitem", "l_orderkey", "orders", "o_orderkey"),
      Seq("lineitem", "l_partkey", "part", "p_partkey")))
      // s_nationkey and l_suppkey deliberately undeclared → 5/7

  /** kind ∈ {not_null, unique, range, pattern}. Ranges/patterns chosen so
    * some are violated by the real data (constraint *validation* is a
    * data-probing extension query).
    */
  val constraints = Fixture("constraints",
    st("asset" -> S, "column_name" -> S, "kind" -> S, "lo" -> D, "hi" -> D,
      "pattern" -> S),
    Seq(
      Seq("region", "r_regionkey", "not_null", null, null, null),
      Seq("nation", "n_nationkey", "not_null", null, null, null),
      Seq("customer", "c_custkey", "not_null", null, null, null),
      Seq("supplier", "s_suppkey", "not_null", null, null, null),
      Seq("part", "p_partkey", "not_null", null, null, null),
      Seq("orders", "o_orderkey", "not_null", null, null, null),
      Seq("events", "event_id", "not_null", null, null, null),
      Seq("embeddings", "vec_id", "not_null", null, null, null),
      Seq("customer", "c_custkey", "unique", null, null, null),
      Seq("orders", "o_orderkey", "unique", null, null, null),
      Seq("events", "event_id", "unique", null, null, null),
      Seq("embeddings", "vec_id", "unique", null, null, null),
      Seq("lineitem", "l_discount", "range", 0.0, 0.1, null),
      Seq("lineitem", "l_quantity", "range", 1.0, 30.0, null), // data goes to 50 → violations
      Seq("lineitem", "l_tax", "range", 0.0, 0.08, null),
      Seq("orders", "o_totalprice", "range", 0.0, 1000000.0, null),
      Seq("customer", "c_acctbal", "range", -1000.0, 10000.0, null),
      Seq("part", "p_size", "range", 1.0, 50.0, null),
      Seq("events", "value", "range", 0.0, 1000.0, null),
      Seq("customer", "c_name", "pattern", null, null, "^Customer#[0-9]+$"),
      Seq("orders", "o_orderstatus", "pattern", null, null, "^[OFP]$"),
      Seq("lineitem", "l_returnflag", "pattern", null, null, "^[ARN]$"),
      Seq("events", "event_type", "pattern", null, null,
        "^(signup|error|click|view|purchase)$"),
      Seq("documents", "lang", "pattern", null, null, "^(en|zh|es|de|fr)$")))

  val glossary = Fixture("glossary",
    st("term_id" -> S, "term" -> S, "definition" -> S),
    (1 to 18).map(i => Seq(f"t$i%02d", s"term_$i", s"Definition of term $i")))

  // ── SLAs / latency / features ─────────────────────────────────────────
  /** sla_kind ∈ {freshness(hours), latency(ms), staleness(hours),
    * recall(fraction), throughput(mbps)}.
    */
  val sla = Fixture("sla",
    st("asset" -> S, "sla_kind" -> S, "threshold" -> D, "unit" -> S),
    Seq(
      Seq("events", "freshness", 24.0, "hours"),
      Seq("orders", "freshness", 720.0, "hours"),
      Seq("lineitem", "freshness", 720.0, "hours"),
      Seq("online_features", "staleness", 24.0, "hours"),
      Seq("embeddings", "recall", 0.8, "fraction")))

  /** Per-request latency log, 25 requests per endpoint; e2 breaches its
    * p99 SLA (one 500ms spike in 25 → p99 = 500).
    */
  val endpointsLatency = Fixture("endpoints_latency", {
    st("endpoint" -> S, "req_id" -> I, "latency_ms" -> D)},
    (1 to 25).flatMap { i =>
      Seq(
        Seq("e1", i, 10.0 + 3 * i),                       // max 85 ≤ 100 ✓
        Seq("e2", i, if (i == 25) 500.0 else 40.0 + i),   // p99 500 > 100 ✗
        Seq("e3", i, 5.0 + 2 * i),                        // max 55 ✓
        Seq("e4", i, 20.0 + i))                           // max 45 ✓
    })

  val endpointSla = Fixture("endpoint_sla",
    st("endpoint" -> S, "sla_ms" -> D),
    Seq(Seq("e1", 100.0), Seq("e2", 100.0), Seq("e3", 100.0), Seq("e4", 100.0)))

  /** Feature registry across stores. f1,f2,f3,f6 in both stores (#13 → 4/6);
    * of online features f1,f3,f5 fresh within 24h of AsOf (#26 → 3/5).
    */
  val featureCatalog = Fixture("feature_catalog",
    st("feature" -> S, "entity" -> S, "store" -> S, "last_refresh_ts" -> T,
      "logic_hash" -> S),
    Seq(
      Seq("f1", "customer", "online", ts("2024-01-30T23:00:00Z"), "h1"),
      Seq("f1", "customer", "offline", ts("2024-01-30T00:00:00Z"), "h1"),
      Seq("f2", "customer", "online", ts("2024-01-20T00:00:00Z"), "h2"),
      Seq("f2", "customer", "offline", ts("2024-01-30T00:00:00Z"), "h2"),
      Seq("f3", "user", "online", ts("2024-01-30T12:00:00Z"), "h3"),
      Seq("f3", "user", "offline", ts("2024-01-30T00:00:00Z"), "h3"),
      Seq("f4", "user", "offline", ts("2024-01-30T00:00:00Z"), "h4"),
      Seq("f5", "order", "online", ts("2024-01-30T06:00:00Z"), "h5"),
      Seq("f6", "order", "online", ts("2024-01-25T00:00:00Z"), "h6"),
      Seq("f6", "order", "offline", ts("2024-01-30T00:00:00Z"), "h6")))

  /** Point-in-time fixture (#24): entities 1-8 have a pre-label feature;
    * 7,8,9 also have a post-label (leaky) one; 10 has none.
    * Naive latest-value join leaks for 7,8,9 → score 7/10.
    */
  val labels = Fixture("labels",
    st("entity_id" -> L, "label_ts" -> T, "label" -> D),
    (1 to 10).map(i => Seq(i.toLong, ts("2024-01-15T00:00:00Z"), i * 1.0)))

  val featureValues = Fixture("feature_values",
    st("entity_id" -> L, "feature" -> S, "feature_ts" -> T, "value" -> D),
    (1 to 8).map(i =>
      Seq(i.toLong, "fx", ts("2024-01-10T00:00:00Z"), i * 10.0)) ++
    Seq(7, 8, 9).map(i =>
      Seq(i.toLong, "fx", ts("2024-01-20T00:00:00Z"), i * 20.0)))

  /** Batch-vs-realtime parity (#25): f4 diverges for entity 3 → 3/4. */
  val featureParity = Fixture("feature_parity",
    st("entity_id" -> L, "feature" -> S, "path" -> S, "value" -> D),
    (for {
      f <- Seq("f1", "f2", "f3", "f4"); e <- 1 to 5
      p <- Seq("batch", "realtime")
    } yield {
      val base = e * 1.0 + f.last.asDigit
      val v = if (f == "f4" && e == 3 && p == "realtime") base + 0.5 else base
      Seq(e.toLong, f, p, v)
    }))

  /** Chunk table (#16): docs 0-7 well-chunked, doc 8 oversize, others unchunked. */
  val chunks = Fixture("chunks",
    st("doc_id" -> L, "chunk_id" -> I, "chunk_tokens" -> I),
    // Seq[Any] is load-bearing: an all-numeric Seq(8L, 0, 900) would widen
    // to Seq[Long], handing Longs to the IntegerType columns' encoder.
    (0 to 7).flatMap(d =>
      Seq(Seq[Any](d.toLong, 0, 120), Seq[Any](d.toLong, 1, 80))) ++
      Seq(Seq[Any](8L, 0, 900)))

  // ── pipelines / runs / lineage / transformations ──────────────────────
  val pipelines = Fixture("pipelines",
    st("pipeline" -> S, "kind" -> S, "mode" -> S, "required_mbps" -> D,
      "latency_sla_sec" -> D),
    Seq(
      Seq("p1", "etl", "cdc", null, 3600.0),
      Seq("p2", "training", "streaming", 200.0, 600.0),
      Seq("p3", "training", "incremental", 400.0, 7200.0),
      Seq("p4", "etl", "full_reload", null, 1800.0),
      Seq("p5", "training", "full_reload", 100.0, 3600.0)))

  private def run(id: String, p: String, start: String, durSec: Long,
      inputs: Seq[String], params: String, outputs: Seq[String],
      status: String, mbps: Any, agent: String): Seq[Any] =
    Seq(id, p, ts(start), ts(start).plusSeconds(durSec), inputs, params,
      outputs, status, mbps, agent)

  /** 10 runs. Incomplete audit: r05/r09 (null params), r06 (no inputs) → 7/10.
    * Agent attribution: r05, r09 null → 8/10. Latest-run throughput:
    * p2→250 ✓, p3→100 ✗, p5→150 ✓. p95 duration vs SLA: p2, p5 breach.
    */
  val pipelineRuns = Fixture("pipeline_runs",
    st("run_id" -> S, "pipeline" -> S, "start_ts" -> T, "end_ts" -> T,
      "inputs" -> ArrayType(S), "params" -> S, "outputs" -> ArrayType(S),
      "status" -> S, "measured_mbps" -> D, "agent" -> S),
    Seq(
      run("r01", "p1", "2024-01-29T00:00:00Z", 1200, Seq("orders"), "{}",
        Seq("online_features"), "success", 50.0, "airflow"),
      run("r02", "p1", "2024-01-29T06:00:00Z", 1800, Seq("orders"), "{}",
        Seq("online_features"), "success", 55.0, "airflow"),
      run("r03", "p2", "2024-01-29T01:00:00Z", 300, Seq("events"), "{}",
        Seq("documents"), "success", 220.0, "flink"),
      run("r04", "p2", "2024-01-30T01:00:00Z", 900, Seq("events"), "{}",
        Seq("documents"), "success", 250.0, "flink"),
      run("r05", "p3", "2024-01-30T02:00:00Z", 3600, Seq("documents"), null,
        Seq("embeddings"), "success", 100.0, null),
      run("r06", "p4", "2024-01-30T03:00:00Z", 600, Seq.empty[String], "{}",
        Seq("part"), "success", 30.0, "cron"),
      run("r07", "p5", "2024-01-29T04:00:00Z", 1200, Seq("lineitem"), "{}",
        Seq("doc_chunks"), "success", 120.0, "spark"),
      run("r08", "p5", "2024-01-30T04:00:00Z", 5400, Seq("lineitem"), "{}",
        Seq("doc_chunks"), "success", 150.0, "spark"),
      run("r09", "p4", "2024-01-29T03:00:00Z", 900, Seq("customer"), null,
        Seq("part"), "failed", 25.0, null),
      run("r10", "p1", "2024-01-30T00:00:00Z", 2400, Seq("orders"), "{}",
        Seq("online_features"), "success", 60.0, "airflow")))

  /** Lineage graph. Dataset-grain edges + field-grain edges; includes a
    * 2-cycle (tmp_a ↔ tmp_b) to exercise closure termination and leaves
    * region/nation/part/supplier/extra_vectors as orphans.
    */
  val lineageEdges = Fixture("lineage_edges",
    st("src" -> S, "dst" -> S, "grain" -> S, "src_field" -> S, "dst_field" -> S),
    Seq(
      Seq("src_crm", "customer", "dataset", null, null),
      Seq("src_erp", "orders", "dataset", null, null),
      Seq("src_erp", "lineitem", "dataset", null, null),
      Seq("src_web", "events", "dataset", null, null),
      Seq("events", "documents", "dataset", null, null),
      Seq("documents", "embeddings", "dataset", null, null),
      Seq("documents", "doc_chunks", "dataset", null, null),
      Seq("customer", "online_features", "dataset", null, null),
      Seq("tmp_a", "tmp_b", "dataset", null, null),
      Seq("tmp_b", "tmp_a", "dataset", null, null),
      Seq("src_crm", "customer", "field", "id", "c_custkey"),
      Seq("src_erp", "orders", "field", "order_id", "o_orderkey"),
      Seq("src_web", "events", "field", "evt_id", "event_id"),
      Seq("events", "documents", "field", "props", "text")))

  /** Source-system node names (lineage roots). */
  val lineageSources = Fixture("lineage_sources",
    st("node" -> S), Seq(Seq("src_crm"), Seq("src_erp"), Seq("src_web")))

  val transformations = Fixture("transformations",
    st("transform_id" -> S, "logic_doc" -> S, "inputs" -> ArrayType(S),
      "outputs" -> ArrayType(S)),
    Seq(
      Seq("t1", "join orders to customer", Seq("orders", "customer"),
        Seq("online_features")),
      Seq("t2", "chunk documents", Seq("documents"), Seq("doc_chunks")),
      Seq("t3", "embed documents", Seq("documents"), Seq("embeddings")),
      Seq("t4", null, Seq("events"), Seq("documents")),
      Seq("t5", "aggregate lineitem", Seq("lineitem"), Seq.empty[String])))

  // ── governance ────────────────────────────────────────────────────────
  /** Tags: all 13 assets + the 28 columns of customer/orders/lineitem/events. */
  val tags = Fixture("tags",
    st("object" -> S, "tag" -> S),
    assets.rows.map(r => Seq(r.head.toString, "domain:core")) ++
      columns.rows.collect {
        case r if Set("customer", "orders", "lineitem", "events")(r.head.toString) =>
          Seq(s"${r.head}.${r(1)}", "governed")
      })

  /** 20 access events; audit_log captures 16 immutably (→ 0.8). */
  val accessEvents = Fixture("access_events",
    st("event_id" -> L, "principal" -> S, "asset" -> S, "purpose" -> S, "ts" -> T),
    (1 to 20).map { i =>
      Seq(i.toLong, s"svc_${i % 3}", Seq("documents", "embeddings", "customer")(i % 3),
        "rag_serving", ts("2024-01-30T00:00:00Z").plusSeconds(i * 60L))
    })

  val auditLog = Fixture("audit_log",
    st("event_id" -> L, "immutable" -> B),
    (1 to 18).map(i => Seq(i.toLong, i <= 16)))

  /** Access paths (#43): 6 of 10 with declared purposes AND enforcement. */
  val accessPaths = Fixture("access_paths",
    st("path" -> S, "asset" -> S, "purposes" -> ArrayType(S), "enforced" -> B),
    (1 to 10).map { i =>
      val purposes = if (i <= 8) Seq("ai_training", "rag_serving") else Seq.empty[String]
      Seq(s"path_$i", Seq("documents", "embeddings")(i % 2), purposes, i <= 6)
    })

  val biasTests = Fixture("bias_tests",
    st("dataset" -> S, "test" -> S, "group_col" -> S, "outcome_col" -> S,
      "p_value" -> D, "tested_ts" -> T),
    Seq(
      Seq("documents", "chi_square", "lang", "source", 0.2, ts("2024-01-29T00:00:00Z")),
      Seq("events", "chi_square", "event_type", "user_bucket", 0.01,
        ts("2024-01-29T00:00:00Z"))))

  /** Target language distribution for documents (#45). Close to observed →
    * TVD well under tolerance 0.1.
    */
  val populationDist = Fixture("population_dist",
    st("dataset" -> S, "demographic" -> S, "category" -> S, "target_share" -> D),
    Seq(
      Seq("documents", "lang", "en", 0.44),
      Seq("documents", "lang", "zh", 0.15),
      Seq("documents", "lang", "es", 0.15),
      Seq("documents", "lang", "de", 0.14),
      Seq("documents", "lang", "fr", 0.12)))

  val licenses = Fixture("licenses",
    st("asset" -> S, "license" -> S, "permits_training" -> B, "expires" -> T),
    Seq(
      Seq("documents", "CC-BY-4.0", true, ts("2030-01-01T00:00:00Z")),
      Seq("events", "vendor_tos", false, ts("2030-01-01T00:00:00Z"))))

  /** Consent by cohort (subject_id % 10): cohorts 0-7 valid AI basis,
    * 8 expired, 9 absent → ≈0.8 of customer records.
    */
  val consent = Fixture("consent",
    st("cohort" -> L, "basis" -> S, "scope_ai" -> B, "expires_ts" -> T),
    (0 to 8).map { i =>
      val exp = if (i == 8) ts("2023-01-01T00:00:00Z") else ts("2025-01-01T00:00:00Z")
      Seq(i.toLong, "contract", true, exp)
    })

  val retention = Fixture("retention",
    st("asset" -> S, "retention_days" -> I, "enforced" -> B),
    Seq(
      Seq("events", 60, true),     // probe: oldest ~30d ≤ 60 ✓
      Seq("orders", 2000, true),   // probe: oldest ~10600d ✗
      Seq("lineitem", 4000, true), // probe ✗
      Seq("customer", 365, true))) // no ts column → trust flag ✓

  /** k-anonymity configs (#48); one row per (dataset, qi column list). */
  val anonConfig = Fixture("anon_config",
    st("dataset" -> S, "k" -> I, "risk_threshold" -> D),
    Seq(Seq("customer", 5, 0.05), Seq("events", 5, 0.05)))

  val schemaVersions = Fixture("schema_versions",
    st("asset" -> S, "version_id" -> S, "captured_at" -> T),
    Seq(
      Seq("customer", "v1", ts("2023-06-01T00:00:00Z")),
      Seq("customer", "v3", ts("2024-01-01T00:00:00Z")),
      Seq("orders", "v7", ts("2024-01-01T00:00:00Z")),
      Seq("lineitem", "v7", ts("2024-01-01T00:00:00Z")),
      Seq("events", "v1", ts("2023-12-01T00:00:00Z")),
      Seq("events", "v2", ts("2024-01-10T00:00:00Z")),
      Seq("documents", "v1", ts("2024-01-05T00:00:00Z")),
      Seq("embeddings", "v1", ts("2024-01-05T00:00:00Z"))))

  /** Registered vector-index artifacts (#15): embeddings has a fresh one. */
  val vectorIndexes = Fixture("vector_indexes",
    st("collection" -> S, "built_at" -> T, "dim" -> I),
    Seq(Seq("embeddings", ts("2024-01-28T00:00:00Z"), 64)))

  /** Registered search-index artifacts (#10) — the catalog face of the
    * InvertedIndex companion (vector_indexes' precedent for #15):
    * `documents` carries an index built AFTER its last_modified
    * (2024-01-25), so the flag + fresh-artifact conjunction scores it;
    * a flag with a missing or stale artifact row would no longer count.
    */
  val searchIndexes = Fixture("search_indexes",
    st("collection" -> S, "built_at" -> T, "vocab" -> L),
    Seq(Seq("documents", ts("2024-01-28T00:00:00Z"), 31L)))

  /** Second (deliberately mixed-dim) embedding collection for #20. */
  val extraVectors = Fixture("extra_vectors",
    st("vec_id" -> L, "embedding" -> ArrayType(FloatType)),
    Seq(
      Seq(0L, Seq.tabulate(64)(i => (i % 7).toFloat / 7f)),
      Seq(1L, Seq.tabulate(64)(i => (i % 5).toFloat / 5f)),
      Seq(2L, Seq.tabulate(32)(i => (i % 3).toFloat / 3f))))

  /** Online feature store snapshot (#18): one duplicate key (5,f1) → 18/20
    * point-lookup-safe rows.
    */
  val onlineFeatures = Fixture("online_features",
    st("entity_id" -> L, "feature" -> S, "value" -> D, "last_refresh_ts" -> T),
    (1 to 10).map(i =>
      Seq(i.toLong, "f1", i * 1.0, ts("2024-01-30T12:00:00Z"))) ++
      (1 to 9).map(i =>
        Seq(i.toLong, "f2", i * 2.0, ts("2024-01-30T12:00:00Z"))) :+
      Seq(5L, "f1", 99.0, ts("2024-01-30T13:00:00Z")))

  /** Declared data products ("a named, bounded set of data assets
    * maintained by a defined owner… the primary unit of assessment",
    * reference `definitions.md:23-25`). Assets NOT listed here fall into
    * the default unnamed product per `definitions.md:25`.
    */
  val dataProducts = Fixture("data_products",
    st("product" -> S, "owner" -> S, "asset" -> S, "workload" -> S),
    Seq(
      Seq("sales_mart", "sales", "orders", "training"),
      Seq("sales_mart", "sales", "lineitem", "training"),
      Seq("sales_mart", "sales", "customer", "training"),
      Seq("rag_corpus", "ml-team", "documents", "serving"),
      Seq("rag_corpus", "ml-team", "embeddings", "serving"),
      Seq("rag_corpus", "ml-team", "doc_chunks", "serving")))

  /** Function words per language for the stopword-vote language-ID operator
    * and text-quality stopword ratio (ext tier).
    */
  val langStopwords = Fixture("lang_stopwords",
    st("lang" -> S, "word" -> S),
    Seq(
      "en" -> Seq("the", "a", "and", "of", "to", "is", "in", "it"),
      "es" -> Seq("el", "la", "de", "y", "que", "en", "los", "se"),
      "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den"),
      "fr" -> Seq("le", "la", "et", "les", "des", "en", "une", "que"),
      "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不"))
      .flatMap { case (l, ws) => ws.map(w => Seq[Any](l, w)) })

  /** All fixtures by name (for tests / docs). */
  val all: Seq[Fixture] = Seq(assets, columns, keyDeclarations, relationships,
    constraints, glossary, sla, endpointsLatency, endpointSla, featureCatalog,
    labels, featureValues, featureParity, chunks, pipelines, pipelineRuns,
    lineageEdges, lineageSources, transformations, tags, accessEvents,
    auditLog, accessPaths, biasTests, populationDist, licenses, consent,
    retention, anonConfig, schemaVersions, vectorIndexes, searchIndexes,
    extraVectors, onlineFeatures, langStopwords, dataProducts)
}
