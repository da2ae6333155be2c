"""Batch-iterative crawl loop (reference: udata_hydra/crawl/*).

One reference loop iteration == one Spark round: a single declarative
DAG from frontier scan to snapshot commit (SURVEY.md §3.1 Spark mapping).
"""

from hydra_spark.crawl.select_batch import eligible_frontier, select_batch  # noqa: F401
from hydra_spark.crawl.fetch import simulate_fetch  # noqa: F401
from hydra_spark.crawl.backoff import domain_backoff  # noqa: F401
from hydra_spark.crawl.next_check import next_check_expr  # noqa: F401
from hydra_spark.crawl.change import detect_changes, has_check_changed_expr  # noqa: F401
from hydra_spark.crawl.round import run_round  # noqa: F401
from hydra_spark.crawl.loop import run_crawl  # noqa: F401
