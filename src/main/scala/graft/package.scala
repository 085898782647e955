/** graft — a Spark-native (Scala) analytics engine with the query and
  * data-processing capabilities of `romdata404/Bitcoin-OLAP`, rebuilt
  * idiomatically on DataFrames + Catalyst rather than ported (see
  * SURVEY.md for the blueprint, README.md for the operator coverage
  * map).
  *
  * Layout:
  *   - [[graft.Tables]] / [[graft.io.Writers]] — sources and sinks
  *     (parquet/NDJSON readers, CTAS-style, partitioned, bucketed)
  *   - [[graft.model.Schemas]] — the blockchain data contract
  *   - `graft.ops` — relational operators: dedup strategies, lateral
  *     explodes, signed flow construction, dimension enrichment, daily
  *     aggregation, skew salting
  *   - `graft.analytics` — closed-form OLS + diagnostics, stratified
  *     sampling, cohort analysis (the reference's Python read path)
  *   - `graft.pipeline` — the staged CTAS chain (btcolap.sql) end to end
  *   - `graft.operators` — training-data extensions: text/embedding
  *     dedup (exact, MinHash+LSH, SimHash, n-gram Jaccard, cosine),
  *     similarity search (brute-force / hyperplane-LSH / IVF), text
  *     analysis, multimodal binary columns
  *   - `graft.functions` — native Catalyst expressions (codegen'd
  *     cosine/dot, hyperplane signatures, SimHash, rolling hash)
  *   - `graft.plans` — SparkSessionExtensions (broadcast-hint rule)
  *   - `graft.streaming` — Structured Streaming ingest: watermarked
  *     windows, within-watermark dedup, stateful per-key balances
  *   - [[graft.SparkEntry]] — the driver contract: every operator as a
  *     named, DuckDB-oracle-checked query
  */
package object graft
