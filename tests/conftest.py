import pytest

from kg_obo_spark.datagen import build_ontology
from kg_obo_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="kg_obo_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def onto():
    return build_ontology()
