import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Fixed S3 test credentials, exported at COLLECTION time — i.e. before
# the session-scoped SparkSession (and therefore its JVM and python
# workers, which inherit this environment) exists. test_s3_store.py's
# executor-side signed PUT/GET requests depend on this ordering.
os.environ.setdefault("AWS_ACCESS_KEY_ID", "azs-test-access")
os.environ.setdefault("AWS_SECRET_ACCESS_KEY", "azs-test-secret")


@pytest.fixture(scope="session")
def spark():
    from arrow_zarr_spark import register
    from arrow_zarr_spark.session import get_spark

    spark = get_spark(app_name="arrow_zarr_spark_tests", cpus=8)
    register(spark)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
