from __future__ import annotations

import pytest

from dedup.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="dedup-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def tiny_pages():
    """1,000-row deterministic web_pages fixture + ground truth (FIXTURES.md §1)."""
    from dedup.datagen import gen_pages_pdf

    return gen_pages_pdf(1000, seed=42)


@pytest.fixture(scope="session")
def tiny_pages_df(spark, tiny_pages):
    from dedup.schema import PAGES

    pages, _ = tiny_pages
    return spark.createDataFrame(pages, schema=PAGES)
