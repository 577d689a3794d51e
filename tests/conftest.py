from __future__ import annotations

import pytest

from cars_bids_data_pipeline_v0__spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    s = get_session(app_name="engine-tests", master="local[4]", shuffle_partitions=4)
    yield s


def rows(df, *cols):
    """Collect to a sorted list of tuples for order-insensitive asserts."""
    data = df.select(*cols).collect() if cols else df.collect()
    return sorted([tuple(r) for r in data], key=lambda t: tuple(str(x) for x in t))
