"""Python worker daemon with preloaded scientific imports.

Spark launches one Python daemon per executor (``python -m
<spark.python.daemon.module>``) and forks a worker from it per task;
with ``spark.python.worker.reuse`` the fork survives across tasks, but
the FIRST task on each of N executor threads still pays the worker's
import of pandas + numpy + pyarrow after the fork. On local[32] that
is 32 concurrent cold imports (~5 s wall measured; the dominant term
of q_image_phash_pairs' cold-start, VERDICT r11 #3), and on a real
cluster it recurs per executor × per worker.

Importing the heavy modules HERE — in the daemon, before any fork —
makes every worker inherit them copy-on-write: first-task import cost
drops to ~0 and the resident memory is shared across all workers of an
executor. Wired via ``spark.python.daemon.module`` in
``session.get_spark`` (fork-capable platforms only; Spark falls back
to plain workers where fork is unavailable).
"""

# Preload the Arrow serialization stack so forked workers never import
# it cold. Order matters only for readability; failures fall through —
# a missing optional module must not take down the daemon.
try:  # noqa: SIM105
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
    import pyspark.sql.pandas.serializers  # noqa: F401
    import pyspark.worker  # noqa: F401
except Exception:  # noqa: BLE001 — preloading is best-effort
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
