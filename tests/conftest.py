import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webextract.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    sp = get_spark("webextract-tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield sp
    sp.stop()
