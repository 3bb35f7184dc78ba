from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from ksana_corpus_builder_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cpus=8, shuffle_partitions=8)
    yield s
