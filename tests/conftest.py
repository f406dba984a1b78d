import pytest

from linkgraph import datagen
from linkgraph.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("linkgraph-tests", cores=4, shuffle_partitions=8,
                  driver_memory="4g")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages30(spark):
    return datagen.synth_pages(spark, 30).persist()


@pytest.fixture(scope="session")
def edges30(spark):
    """Ground-truth edge table for V=30 (generator ids) as a DataFrame."""
    rows = datagen.expected_edges(30)
    return spark.createDataFrame(rows, "src long, dst long").persist()


@pytest.fixture(scope="session")
def graph30(pages30):
    from linkgraph.graph import LinkGraph

    return LinkGraph.from_pages(pages30, partitions=8)
