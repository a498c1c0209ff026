"""SQL-entry surface (SURVEY §2.8): authored SQL with temp views, CTEs and
UNION — the reference's ``DatesSummary`` pattern (``dataSummaries1.scala:72-92``
registers temp views, then runs a WITH … UNION … aggregate statement through
``spark.sql``). Lifecycle: SQL text → parser → analyzer (resolves views) →
Catalyst → same physical plans as the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from azure_medicine_data_engineering_spark.queries.registry import register, table as _t


@register(
    "sql_cte_dates_summary",
    """
    WITH spans AS (
      SELECT 'orders' AS source, year(o_orderdate) AS y, o_totalprice AS amount
      FROM orders
      UNION ALL
      SELECT 'lineitem' AS source, year(l_shipdate) AS y, l_extendedprice AS amount
      FROM lineitem
    )
    SELECT source, y,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(MIN(amount) AS DOUBLE), 4) AS min_amount,
           ROUND(CAST(MAX(amount) AS DOUBLE), 4) AS max_amount,
           ROUND(CAST(SUM(CAST(ROUND(amount * 100) AS BIGINT)) AS DOUBLE) / 100,
                 4) AS total_amount
    FROM spans
    GROUP BY source, y
    """,
)
def q_sql_cte_dates_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Authored-SQL entry: temp views + CTE + UNION ALL + aggregate, executed
    via ``spark.sql`` (parity: the DatesSummary temp view)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        WITH spans AS (
          SELECT 'orders' AS source, year(o_orderdate) AS y, o_totalprice AS amount
          FROM orders_v
          UNION ALL
          SELECT 'lineitem' AS source, year(l_shipdate) AS y, l_extendedprice AS amount
          FROM lineitem_v
        )
        SELECT source, y,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(CAST(MIN(amount) AS DOUBLE), 4) AS min_amount,
               ROUND(CAST(MAX(amount) AS DOUBLE), 4) AS max_amount,
               ROUND(CAST(SUM(CAST(ROUND(amount * 100) AS BIGINT)) AS DOUBLE) / 100,
                     4) AS total_amount
        FROM spans
        GROUP BY source, y
        """
    )


@register(
    "sql_generated_boolean_cast",
    """
    SELECT CAST(SUM(CASE WHEN is_urgent THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
           CAST(SUM(CASE WHEN NOT is_urgent THEN 1 ELSE 0 END) AS BIGINT) AS n_other,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT lower(o_orderpriority) = '1-urgent' AS is_urgent FROM orders) t
    """,
)
def q_sql_generated_boolean_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated-SQL entry (parity: ``booleanCastingIfString`` builds SELECT
    strings over a temp view, ``utils.scala:104-108``). The statement is
    assembled programmatically with quoted identifiers, like the reference."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gen_v")
    col, true_string = "o_orderpriority", "1-urgent"
    sql = (
        f"SELECT CAST(SUM(CASE WHEN is_urgent THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent, "
        f"CAST(SUM(CASE WHEN NOT is_urgent THEN 1 ELSE 0 END) AS BIGINT) AS n_other, "
        f"CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM (SELECT lower(`{col}`) = '{true_string}' AS is_urgent FROM orders_gen_v) t"
    )
    return spark.sql(sql)
