from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openlogreplicator_spark.datagen import GenSpec, write_events  # noqa: E402
from openlogreplicator_spark.session import build_session  # noqa: E402

SMALL_SPEC = GenSpec(seed=42, n_events=3000, n_urls=250, n_files=6)


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="olr-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def events_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("cdc") / "events"
    write_events(str(d), SMALL_SPEC)
    return str(d)


@pytest.fixture(scope="session")
def events_pdf(events_dir):
    import pyarrow.dataset as ds

    return ds.dataset(events_dir, format="parquet").to_table().to_pandas()
