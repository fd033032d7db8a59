from crick_spark.plans.registry import QUERIES, QuerySpec, oracle_sql_map, query_map  # noqa: F401
