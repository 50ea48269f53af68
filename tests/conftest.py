import pytest

from trial_submission_studio_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=4)
    yield s


def rows(df, *cols):
    """Sorted list-of-tuples helper for order-insensitive asserts."""
    sel = df.select(*cols) if cols else df
    return sorted(tuple(r) for r in sel.collect())
