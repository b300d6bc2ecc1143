import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data as rd


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from graphminingtools_ray.context import configure

    configure()
    yield
    ray.shutdown()


def edges_ds(pairs, weights=None) -> rd.Dataset:
    """Tiny edge Dataset from a list of (src, dst) pairs."""
    arr = np.asarray(pairs, dtype=np.int64).reshape(-1, 2)
    cols = {"src": arr[:, 0], "dst": arr[:, 1]}
    if weights is not None:
        cols["weight"] = np.asarray(weights, dtype=np.float64)
    return rd.from_arrow(pa.table(cols))


# micro-graph fixtures from FIXTURES.md §3
TRI3 = [(0, 1), (1, 2), (2, 0)]
TWO_COMP = [(0, 1), (2, 3)]
STAR_HUB = [(0, i) for i in range(1, 9)]
PATH4 = [(0, 1), (1, 2), (2, 3)]
SELFLOOP_DUP = [(0, 0), (1, 2), (1, 2)]
