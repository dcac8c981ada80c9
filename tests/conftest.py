"""Session-scoped Ray fixture — Ray is initialised ONCE per pytest session."""

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    owned = not ray.is_initialized()
    if owned:
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
    yield ray
    if owned:  # never tear down a runtime someone else initialised
        ray.shutdown()


@pytest.fixture()
def sf_dir():
    return "/root/testdata/sf0.001"
