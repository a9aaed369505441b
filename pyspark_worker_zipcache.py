"""Worker-module alias for ``jsoup_spark.spark_worker``.

pyspark's daemon guard (daemon.py: ``sys.argv[1].startswith("pyspark")``)
silently falls back to the stock worker for any custom
``spark.python.worker.module`` whose importable NAME doesn't start with
"pyspark" — so the zipimport-cache shim must be reachable under this
top-level name. All logic lives in jsoup_spark/spark_worker.py; this
module only triggers its import side effects and re-exports ``main``.
"""

try:
    from jsoup_spark.spark_worker import main  # noqa: F401
except Exception:  # pragma: no cover - degraded PYTHONPATH
    # fail-soft: a worker daemon that can import THIS module but not the
    # package must behave like the stock worker, not die
    from pyspark.worker import main  # noqa: F401
