from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lk_data_test_spark.session import get_spark  # noqa: E402
from lk_data_test_spark.datagen import GenConfig, generate  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("lk-validate-tests", cores=8, shuffle_partitions=16,
                  driver_memory="8g")
    yield s


# small config for fast tests: 10 parts covers every role twice
TEST_CFG = GenConfig(n_parts=10, rows_per_part=1200)


@pytest.fixture(scope="session")
def corpus_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus"))
    generate(spark, d, TEST_CFG)
    return d
