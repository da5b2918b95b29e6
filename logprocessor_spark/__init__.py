"""logprocessor_spark — a PySpark-native log/web-page ETL analytics engine.

A from-scratch reimplementation of the capabilities of
``rmuslimov/logprocessor`` (batch parse -> enrich -> route -> index pipeline,
see ``/root/reference``) re-expressed Spark-first:

* DataFrame/SQL end-to-end, zero RDDs, zero custom Catalyst rules;
* vectorized field extraction (native ``regexp_extract`` fast path plus an
  Arrow-batched ``mapInPandas`` parity path — never per-row Python);
* broadcast-join dictionary enrichment;
* rule-driven fan-out routing to partitioned Parquet sinks (Iceberg-shaped
  semantics; Parquet fallback because no Iceberg jars ship in this sandbox);
* salted two-phase aggregation for skewed keys;
* partition-granular checkpoint ledger + metrics (resumable, idempotent).

Reference parity map lives in ``SURVEY.md §2``; every operator cites the
reference file:line it covers in its docstring.
"""

__version__ = "0.1.0"
