import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from atra_spark.session import get_spark

    s = get_spark("atra-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_set():
    from atra_spark.sources.fixtures import generate_fixtures

    return generate_fixtures(n_pages=200, n_hosts=6)


@pytest.fixture(scope="session")
def fixture_paths(fixture_set, tmp_path_factory):
    from atra_spark.sources.fixtures import write_fixtures

    out = tmp_path_factory.mktemp("fx")
    return write_fixtures(fixture_set, str(out))
