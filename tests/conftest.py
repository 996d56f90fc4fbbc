from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def spark():
    from bathyscaphe_spark.session import build_session

    s = build_session(
        app_name="bathyscaphe-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield s
    s.stop()


@pytest.fixture()
def tmp_catalog(spark, tmp_path):
    from bathyscaphe_spark.state.tables import TableCatalog

    return TableCatalog(spark, str(tmp_path / "state"))
