"""Dual-surface parity: the SQL face must equal the DataFrame face,
CTAS must persist catalog tables, temp views must resolve.
"""

from __future__ import annotations

from instacart_medallion_lakehouse_spark import sql_api
from instacart_medallion_lakehouse_spark.plans import marts


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


class TestDualSurface:
    def test_sql_face_equals_dataframe_face(self, spark, sf_dir):
        sql_api.register_star_views(spark, sf_dir)
        sql_df = sql_api.run_sql(spark, sql_api.REGION_PERFORMANCE_SQL)
        t = lambda n: spark.read.parquet(f"{sf_dir}/{n}.parquet")  # noqa: E731
        df_df = marts.region_performance(
            t("lineitem"), t("orders"), t("customer"), t("nation"), t("region")
        )
        assert sorted(sql_df.columns) == sorted(df_df.columns)
        assert _rows(sql_df) == _rows(df_df)

    def test_temp_views_resolve(self, spark, sf_dir):
        sql_api.register_star_views(spark, sf_dir)
        n = spark.sql("SELECT count(*) AS n FROM lineitem").first()["n"]
        assert n == spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    def test_ctas_persists_and_replaces(self, spark, sf_dir):
        sql_api.register_star_views(spark, sf_dir)
        out = sql_api.create_table_as(
            spark, "t_region_kpi", sql_api.REGION_PERFORMANCE_SQL
        )
        first = _rows(out)  # snapshot BEFORE replace invalidates the files
        assert len(first) > 0
        # CREATE OR REPLACE is idempotent (reference serverless CTAS shape)
        out2 = sql_api.create_table_as(
            spark, "t_region_kpi", sql_api.REGION_PERFORMANCE_SQL
        )
        assert _rows(out2) == first
        spark.sql("DROP TABLE t_region_kpi")

    def test_approx_distinct_mart_close_to_exact(self, spark, sf_dir):
        t = lambda n: spark.read.parquet(f"{sf_dir}/{n}.parquet")  # noqa: E731
        args = (t("lineitem"), t("orders"), t("customer"), t("nation"), t("region"))
        exact = {
            (r["region_name"], r["nation_name"]): r["unique_orders"]
            for r in marts.region_performance(*args).collect()
        }
        approx = {
            (r["region_name"], r["nation_name"]): r["unique_orders"]
            for r in marts.region_performance(*args, approx_distinct=True).collect()
        }
        assert exact.keys() == approx.keys()
        # rsd=0.05 is one sigma; allow 3 sigma so the deterministic
        # sketch stays comfortably inside (HLL++ is deterministic for a
        # fixed input, so this cannot flake run-to-run — the margin is
        # for dataset regeneration between rounds)
        for key, n in exact.items():
            assert abs(approx[key] - n) <= max(3, 0.15 * n)
