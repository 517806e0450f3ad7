import os

import pytest

REFERENCE_LOGS = "/root/reference/test/logs"


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (local mode, 4 CPUs)."""
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def logs_dir():
    if not os.path.isdir(REFERENCE_LOGS):
        pytest.skip("reference conformance logs not available")
    return REFERENCE_LOGS


def read_log(name: str) -> bytes:
    with open(os.path.join(REFERENCE_LOGS, name), "rb") as f:
        return f.read()
