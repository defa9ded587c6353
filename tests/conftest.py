import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from moonlink_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    extra = {"spark.sql.shuffle.partitions": "8"}
    # scaled-corpus runs (SPARK_GRAFT_SF_DIR_TEST at 10x) need a bigger
    # local-mode heap; the default stays small for the normal suite
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if mem:
        extra["spark.driver.memory"] = mem
    s = get_spark("moonlink-tests", extra_conf=extra)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def wire_tls(tmp_path_factory):
    """One CA + leaf pair for the whole run (minting is cheap but not
    free; every TLS-parametrized transport suite shares these files)."""
    from moonlink_spark.tlsutil import mint_test_tls

    return mint_test_tls(str(tmp_path_factory.mktemp("wire-tls")))
