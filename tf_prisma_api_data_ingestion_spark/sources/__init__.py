"""Source connectors: REST client with auth/backoff/pagination and the
Spark 4 Python DataSource that parallelizes page fetches across executors."""

from .rest import RestClient, fetch_all_pages, register_alerts_source  # noqa: F401
