from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from synth_transform_spark.session import get_spark

    s = get_spark("synth-transform-tests")
    yield s


@pytest.fixture(autouse=True)
def _release_tracked_caches():
    """Unpersist operator-tracked caches after every test (caching.py)."""
    yield
    from synth_transform_spark.caching import release_cached

    release_cached()


@pytest.fixture(scope="session")
def oracle_con():
    from synth_transform_spark.testing import duckdb_connection

    con = duckdb_connection(SF_DIR)
    yield con
    con.close()
