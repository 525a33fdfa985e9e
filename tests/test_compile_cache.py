"""utils/compile_cache.py: persistent-cache wiring for the entry points."""
import os

from vitron_tpu.utils.compile_cache import enable_compile_cache


def test_enable_creates_dir_and_sets_config(tmp_path):
    d = str(tmp_path / "xla")
    assert enable_compile_cache(d) == d
    assert os.path.isdir(d)
    import jax
    assert jax.config.jax_compilation_cache_dir == d


def test_empty_path_disables():
    assert enable_compile_cache("") is None


def test_cache_populates_on_compile(tmp_path):
    d = str(tmp_path / "xla")
    enable_compile_cache(d)
    import jax
    import jax.numpy as jnp

    # force a compile above the min-compile-time floor is not guaranteed on
    # CPU, so drop the floor for the test
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.jit(lambda x: (x @ x).sum())(jnp.ones((64, 64))).block_until_ready()
    assert os.listdir(d), "compiled executable was not persisted"
