import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    yield ray
    ray.shutdown()


# soak profile: GRAFT_FUZZ_EXAMPLES=N scales every fuzz test's example
# count (default profile keeps the per-test settings)
import os as _os
if _os.environ.get("GRAFT_FUZZ_EXAMPLES"):
    from hypothesis import settings as _hs
    _hs.register_profile(
        "soak", max_examples=int(_os.environ["GRAFT_FUZZ_EXAMPLES"]),
        deadline=None)
    _hs.load_profile("soak")
