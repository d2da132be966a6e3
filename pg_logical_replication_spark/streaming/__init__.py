"""Structured Streaming layer — the reference's live surface, Spark-first.

Mapping (SURVEY §2.1 → here):

* ``subscribe(plugin, slot)``      → ``LogicalReplicationService.subscribe``
  (readStream over an event-log directory + decode transform + sink)
* acknowledge / auto-ack (#17-18)  → the checkpoint commit log (offsets
  commit after each successful micro-batch — at-least-once at the source,
  exactly-once end-to-end with an idempotent sink, strictly stronger than
  the reference's manual ack)
* resume-from-LSN / replay (#22)   → restart with the same
  ``checkpointLocation`` (uncommitted offsets replay); delete the
  checkpoint ≙ re-subscribe from ``0/00000000``
* flow control / backpressure (#21)→ ``maxFilesPerTrigger`` micro-batch
  sizing (pull-based, no pause/resume machinery needed)
* stop()/destroy() (#23)           → ``StreamingQuery.stop()``
* apply-changes materialization    → ``foreachBatch`` merge-on-read log
  (``streaming/apply.py``)
"""

from pg_logical_replication_spark.streaming.service import (  # noqa: F401
    LogicalReplicationService,
)
from pg_logical_replication_spark.streaming.apply import (  # noqa: F401
    MergeOnReadTable,
)
from pg_logical_replication_spark.streaming.stateful import (  # noqa: F401
    TXN_GATE_LISTSTATE_CROSSOVER_ROWS,
    assemble_transactions_stream,
    resolve_streamed_gate,
    resolve_streamed_stream,
    resolve_transactions_gate,
    resolve_transactions_stream,
    toast_fill_stream,
)
from pg_logical_replication_spark.streaming.dedup import (  # noqa: F401
    near_dup_gate_rollup,
    stream_exact_dedup,
    stream_near_dup_gate,
)
from pg_logical_replication_spark.streaming.monitor import (  # noqa: F401
    cusum_stream,
)
from pg_logical_replication_spark.streaming.packing import (  # noqa: F401
    pack_sequences_stream,
)
