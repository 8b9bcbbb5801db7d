"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ETL tool (chefsplate/groove-to-helpscout-migration-tool),
re-expressed Spark-first.

Layout:
    session     - SparkSession factory, runtime config, table loading
    functions/  - pure Column transform library (SURVEY.md section 2.3)
    operators/  - joins/dedup/similarity/group-back/error side-channel
    sources/    - paginated & point-lookup sources, rate limiter (section 2.1)
    plans/      - end-to-end pipelines (customer / ticket, section 3)
    streaming/  - structured-streaming shaped behaviors (section 2.7)
    multimodal/ - binary-column plumbing with stubbed decoders
    catalog/    - the query catalog: name -> (spark fn, duckdb oracle SQL)
"""

from .session import get_session, configure, load_tables

__all__ = ["get_session", "configure", "load_tables"]
__version__ = "0.1.0"
