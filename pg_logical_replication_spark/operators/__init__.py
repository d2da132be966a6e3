"""Engine operators: CDC materialization + large-scale pipeline ops.

``apply_changes`` is the correctness kernel — everything the reference's
consumers do with the change stream (maintain a replica table) reduces to
it. The rest are the 100 TB-scale data-pipeline operators mandated by
BASELINE.json: dedup, similarity search, text analysis, as-of joins.
"""

from pg_logical_replication_spark.operators.apply_changes import (  # noqa: F401
    apply_changes,
    latest_image,
)
from pg_logical_replication_spark.operators.transactions import (  # noqa: F401
    assign_transactions,
    resolve_prepared,
    resolve_streamed,
    resolve_transactions,
)
