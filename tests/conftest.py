from __future__ import annotations

import pytest

from kgpipe.resources import (
    Gazetteer,
    builtin_blacklist_terms,
    builtin_gazetteer_rows,
)
from kgpipe.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "kgpipe-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def gazetteer():
    return Gazetteer.from_rows(builtin_gazetteer_rows())


@pytest.fixture(scope="session")
def blacklist():
    return builtin_blacklist_terms()
