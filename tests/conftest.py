import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
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
def small_wal(tmp_path_factory):
    """Deterministic small pages+WAL dataset shared across tests."""
    from etl_ray.gen import WalSpec, generate_dataset

    root = str(tmp_path_factory.mktemp("waldata"))
    spec = WalSpec(n_urls=300, n_events=2000, n_segments=6, seed=42)
    paths = generate_dataset(root, spec)
    return {"spec": spec, **paths}


SF_DIR = "/root/testdata/sf0.001"
