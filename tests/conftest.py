from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from web_crawler_spark.session import get_spark

    s = get_spark(app="wcs-tests", cores=8)
    yield s


@pytest.fixture(scope="session")
def fix_dir(tmp_path_factory):
    from fixtures.gen import generate

    d = str(tmp_path_factory.mktemp("fix"))
    generate(d, n=100, n_hosts=12)
    return d
