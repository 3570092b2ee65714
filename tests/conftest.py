import pytest


@pytest.fixture(scope="session")
def spark():
    from ocaml_rdf_spark.session import get_spark

    s = get_spark(app="ords-tests", cpus=8, shuffle_partitions=8)
    yield s
