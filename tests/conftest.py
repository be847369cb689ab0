import pytest

from opengauss_tools_datachecker_performance_spark import get_spark
from opengauss_tools_datachecker_performance_spark.synth import synth_corpus

N_DOCS = 1500
N_ASSETS = 80
N_PARTS = 8


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus(spark):
    c = synth_corpus(spark, n_docs=N_DOCS, n_assets=N_ASSETS, n_partitions=N_PARTS)
    # cache: every test file reuses these frames
    for df in c.values():
        df.cache().count()
    return c


@pytest.fixture(scope="session")
def expected_by_class(corpus):
    rows = corpus["violations_expected"].collect()
    out: dict[str, set[str]] = {}
    for r in rows:
        out.setdefault(r["vclass"], set()).add(r["doc_id"])
    return out
