import pytest

from kgner.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kgner-tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def fx():
    from kgner.fixtures import build_fixtures

    return build_fixtures(n_entities=40, n_pages=80, giant_pages=1)


@pytest.fixture(scope="session")
def tables(spark, fx):
    from kgner.fixtures import to_spark

    return to_spark(spark, fx)
