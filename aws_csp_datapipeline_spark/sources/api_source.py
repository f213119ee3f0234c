"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource``):
the reference's paginated API fetch re-expressed as a first-class
SOURCE instead of a driver-side loop.

The reference walks a paginated result set with a NextToken loop on
the client (lambda/lambda_function.py:65-91 — fetch page, append,
repeat). ``sinks.paginate`` reproduces that READ side; this module is
the dual: when the upstream system itself is a paged API (an export
endpoint, a scan-with-cursor store), each page becomes an
InputPartition, so the fetch runs ON THE EXECUTORS, N pages in
parallel, composing with every DataFrame operator downstream — the
landing-zone ingest shape for API-backed corpora at scale.

The demo endpoint here is deterministic and in-process (this sandbox
has no network): page i yields ``page_size`` records derived from
(i, j) alone. The partition-planning, option-passing, and
executor-side iteration — the parts that ARE the Data Source API —
are real and tested (tests/test_api_source.py); swapping the record
generator for an HTTP client changes no Spark-facing code.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class PagedApiDataSource(DataSource):
    """``spark.read.format("paged_api").option("pages", N)`` source.

    Options: ``pages`` (number of pages / partitions, default 4),
    ``page_size`` (records per page, default 100)."""

    @classmethod
    def name(cls) -> str:
        return "paged_api"

    def schema(self) -> str:
        return "page int, rec_id bigint, payload string"

    def reader(self, schema) -> "PagedApiReader":
        return PagedApiReader(self.options)


class PagedApiReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_pages = int(options.get("pages", 4))
        self.page_size = int(options.get("page_size", 100))

    def partitions(self):
        # one InputPartition per API page: Spark schedules each page
        # fetch as its own task — the NextToken loop, parallelized
        return [InputPartition(i) for i in range(self.n_pages)]

    def read(self, partition):
        page = partition.value
        for j in range(self.page_size):
            rec_id = page * self.page_size + j
            yield (page, rec_id, f"rec-{rec_id:08d}")


def register_paged_api(spark) -> None:
    """Idempotent registration of the custom format."""
    spark.dataSource.register(PagedApiDataSource)
