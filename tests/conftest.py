import sys
import tempfile
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from crypto_etl_airflow_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="crypto_etl_airflow_spark_tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={
            "spark.driver.memory": "4g",
            # catalog tables (bucketing tests) land in a tempdir, not the repo
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark_wh_"),
        },
    )
    yield s
