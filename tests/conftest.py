from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multilingual_wiki_event_pipeline_spark import datagen
from multilingual_wiki_event_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="mwep-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    datagen.generate_to_dir(str(d), n_incidents=30, seed=42)
    return str(d)


@pytest.fixture(scope="session")
def corpus(corpus_dir):
    return datagen.generate(n_incidents=30, seed=42)
