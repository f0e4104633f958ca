import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from tsc_spark.session import get_spark

    s = get_spark("tsc_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tokens_df(spark):
    from tsc_spark.sources import synth_tokens_table

    df = synth_tokens_table(spark, n_docs=48, include_edges=True)
    df.cache().count()
    return df


@pytest.fixture(scope="session")
def tokens_rows():
    from tsc_spark.sources import synth_tokens

    return synth_tokens(48, include_edges=True)
