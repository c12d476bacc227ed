"""etl_covid19_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query & data-processing
capabilities of the reference repo ``Bambik-git/ETL_covid19``
(surveyed in SURVEY.md), built Spark-first:

- storage is columnar Parquet partitioned by date (``ds``), not
  row-oriented Postgres heaps;
- every transform is a lazy Catalyst logical plan (DataFrame / SQL),
  never an eager driver-side loop;
- the three reference pipeline flavors (pandas / spark-submit /
  PLpgSQL — see SURVEY.md §3) collapse into one in-process
  DataFrame program (`plans.covid`);
- plus the large-scale extension operators (dedup, similarity
  search, text analysis, windows) a 100 TB training-data pipeline
  needs (`operators.dedup`, `operators.similarity`,
  `functions.text`, `streaming.windows`).
"""

from etl_covid19_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
