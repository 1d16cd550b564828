from __future__ import annotations

import pytest

from ts_pymfe_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ts_pymfe_spark_tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def turns(spark):
    from ts_pymfe_spark.synth import gen_turns

    df = gen_turns(spark, 0.001).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def turns_pdf():
    from ts_pymfe_spark.synth import gen_turns_pandas

    return gen_turns_pandas(0.001)
