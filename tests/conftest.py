import shutil
import tempfile

import pytest

from tinyetl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tinyetl-tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def tmpdir_path():
    d = tempfile.mkdtemp(prefix="tinyetl_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
