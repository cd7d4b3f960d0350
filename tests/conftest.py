import pytest

from pdf_parser_spark.engine.session import build_session

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="pdf_parser_spark-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield s
    s.stop()
