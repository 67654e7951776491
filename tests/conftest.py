import pytest


@pytest.fixture(scope="session")
def ray_session():
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
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(ray_session, tmp_path_factory):
    """120-doc deterministic corpus shared by the Ray-pipeline tests."""
    from tesseract_wasm_ray.fixtures import generate_corpus

    out = str(tmp_path_factory.mktemp("corpus"))
    return generate_corpus(out, 120)
