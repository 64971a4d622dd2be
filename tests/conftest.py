import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_cfg():
    from marc_record_merge_melindautils_ray.config import DedupConfig

    return DedupConfig(fingerprint_concurrency=2, verify_concurrency=2)


@pytest.fixture(scope="session")
def corpus():
    from marc_record_merge_melindautils_ray.sources.synth import make_corpus

    return make_corpus(15, 40, 42)
