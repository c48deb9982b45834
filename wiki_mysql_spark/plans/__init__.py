from wiki_mysql_spark.plans.wiki_pipeline import build_wiki_tables

__all__ = ["build_wiki_tables"]
