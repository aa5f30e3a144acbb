"""cosmos_xenna_spark — a PySpark-native analytics/pipeline engine.

A from-scratch reimplementation of the *capabilities* of
nvidia-cosmos/cosmos-xenna (a Ray-based pipeline orchestrator,
see /root/reference) re-expressed Spark-first:

- the reference's single data operator — a stateful batched map
  (``Stage.process_data``, reference ``cosmos_xenna/pipelines/private/
  specs.py:285-299``) — becomes an Arrow-batched ``mapInPandas`` stage
  with per-executor model lifecycle (``operators.stage``);
- the reference's ~18k LoC of scheduling machinery (autoscaler, GPU
  bin-packing, actor pools, work stealing) is *replaced by the Spark
  scheduler*, not ported;
- on top, the full relational operator surface (joins, aggregations,
  windows, set ops, scalar functions) is pure DataFrame/Catalyst
  delegation (``queries``), plus LLM-data-pipeline operators
  (dedup, similarity search, text analysis, multimodal columns).

Everything is designed for 100 TB scale: declarative plans so Catalyst
pushes filters into parquet scans, broadcast joins for dimensions,
decimal-exact aggregation (map-side partial agg), no driver-side
``collect()`` in any operator.
"""

from cosmos_xenna_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
