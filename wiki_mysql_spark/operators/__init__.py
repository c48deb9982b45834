from wiki_mysql_spark.operators.ids import dense_ids
from wiki_mysql_spark.operators.redirects import resolve_redirects

__all__ = ["dense_ids", "resolve_redirects"]
