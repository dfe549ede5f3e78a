import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from filda_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("filda-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    # parity tests run at the driver's correctness scale by default
    return os.environ.get("FILDA_TEST_SF_DIR", SF_CORRECT)


@pytest.fixture(scope="session")
def sf_correct():
    return SF_CORRECT


@pytest.fixture(scope="session")
def corpus(tmp_path_factory):
    from filda_spark import fixtures

    d = tmp_path_factory.mktemp("corpus")
    c = fixtures.build_corpus(str(d), n_docs=8)
    c["dir"] = str(d)
    return c


@pytest.fixture(scope="session")
def nl():
    from filda_spark.namelist import make_namelist

    # dyn window scaled to the 128x160 I-grid test rasters (full scale: 501)
    return make_namelist(dyn_win_dim=31)


@pytest.fixture(scope="session")
def oracle_res(corpus, nl):
    from filda_spark import oracle

    return oracle.run_corpus(corpus, nl)
