import pytest

from graph_mining_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cpus=8, shuffle_partitions=8, app_name="gms-tests", driver_memory="8g")
    yield s


def make_edges(spark, triples, symmetric_input=False):
    """Edge DataFrame from (u, v, w) triples (directed as given)."""
    rows = [(int(u), int(v), float(w)) for u, v, w in triples]
    return spark.createDataFrame(rows, "src long, dst long, weight double")
