import pytest

from dataset_grouper_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=8,
        # contention-proofing (VERDICT r10 task 5): on a fully loaded
        # shared VM the default 15s Python-worker connect-back window
        # (spark.python.authenticate.socketTimeout — the timeout behind
        # "Timed out while waiting for the Python worker to connect
        # back") can expire under CPU starvation and kill an
        # otherwise-green test; give it a generous window
        extra_conf={
            "spark.python.authenticate.socketTimeout": "120s",
        },
    )
    yield s
