"""PySpark-native analytics engine with the query capabilities of
ABigdataer/AnalysisOfUserBehavior, rebuilt Spark-first.

The reference (read-only at /root/reference) is a Spark-1.5 Java
RDD/DStream codebase with four modules: user-visit session analysis,
page single-hop conversion, area top-3 products, and ad-click
real-time stats.  This package re-expresses every operator in that
inventory (SURVEY.md §2) as declarative DataFrame/SQL plans that
Catalyst + Tungsten can optimize, plus the large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) the reference lacks.

Layout:
  sources/    parquet loaders, jdbc/kafka adapters, schemas
  operators/  batch operators (sessionize, session stats, funnel,
              area top-k, ad stats, sampling, dedup, ann, text)
  functions/  scalar/aggregate column-expression helpers
  streaming/  Structured Streaming rebuilds of module 4
  plans/      plan-inspection helpers (explain audits)
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level conveniences: the query registry, the module
    runner, and the session factory — imported on first use so that
    `import analysisofuserbehavior_spark` stays cheap."""
    if name == "QUERIES":
        from .registry import QUERIES

        return QUERIES
    if name == "run_task":
        from .modules import run_task

        return run_task
    if name == "get_spark":
        from .session import get_spark

        return get_spark
    raise AttributeError(name)
