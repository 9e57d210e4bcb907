import logging

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from reconcile_curation_in_cris_systems_ray.config import tune_data_context

    tune_data_context(quiet=True)
    yield ray
    ray.shutdown()
