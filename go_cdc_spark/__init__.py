"""go_cdc_spark — a PySpark-native analytics + CDC engine.

A from-scratch re-expression of the capabilities of the reference
``raito-cn/go-cdc`` (a MySQL change-data-capture pipeline; see SURVEY.md)
as an idiomatic Spark engine:

- **capture** (:mod:`go_cdc_spark.sources`) — snapshot + streaming
  change-event ingestion producing a unified change-event DataFrame
  (the Debezium-style envelope of ``internal/model/event.go:3-12``).
- **materialize** (:mod:`go_cdc_spark.operators.cdc`,
  :mod:`go_cdc_spark.streaming`) — CDC collapse / MERGE into queryable
  tables, with the per-table GTID handoff rule of the reference design
  doc (``docs/全量抓取逻辑.md:44-52``).
- **query** (:mod:`go_cdc_spark.plans.queries`) — the analytic operator
  surface (SURVEY.md §2.B) plus LLM-data-pipeline operators (dedup,
  similarity search, text analysis, multimodal columns), each registered
  as a named query with a DuckDB oracle for correctness checking.

Everything is DataFrame/SQL-first: Catalyst handles pushdown, pruning,
join selection and AQE; custom logic (GTID algebra, rule compiler,
MERGE-without-Delta) is plain Python over DataFrames.
"""

__version__ = "0.1.0"
