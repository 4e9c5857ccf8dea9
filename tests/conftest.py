"""Shared pytest fixtures: one session-scoped SparkSession."""

from __future__ import annotations

import pytest

from linkgraph.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="linkgraph-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.driver.memory": "4g",
            # managed tables (the table: write-dispatch tests) go to
            # /tmp, not a spark-warehouse/ dir inside the repo
            "spark.sql.warehouse.dir": "/tmp/linkgraph-test-warehouse",
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
