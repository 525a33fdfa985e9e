"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8) since only a single
real TPU chip is attached in CI.
"""
import os

# The ambient environment pins JAX to a real TPU tunnel and pre-imports jax
# from sitecustomize, so env vars alone are too late. jax.config.update
# still works as long as no computation has run.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")

import importlib.util
import pathlib

import pytest

# Persistent XLA compile cache for the suite: this 1-core host spends most
# of its test wall time in XLA:CPU compilation of the same tiny programs
# run after run. Warm runs replay executables from disk (measured ~2x).
# Disable with VITRON_TEST_COMPILE_CACHE="" (e.g. for compile-path tests).
_cache_dir = os.environ.get(
    "VITRON_TEST_COMPILE_CACHE",
    str(pathlib.Path(__file__).resolve().parent.parent / ".cache" / "xla_test"))
if _cache_dir:
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass


def pytest_addoption(parser):
    parser.addoption(
        "--nightly", action="store_true", default=False,
        help="also run tests marked nightly (real-geometry parity and "
             "characterization tests; once per round)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--nightly") or os.environ.get("VITRON_NIGHTLY") == "1":
        return
    skip = pytest.mark.skip(
        reason="nightly: run with --nightly or VITRON_NIGHTLY=1")
    for item in items:
        if "nightly" in item.keywords:
            item.add_marker(skip)

REFERENCE_ROOT = pathlib.Path("/root/reference")


def load_reference_module(relpath: str, name: str):
    """Load a single reference source file without importing its package.

    Used only for behavioral parity assertions in tests.
    """
    path = REFERENCE_ROOT / relpath
    if not path.exists():
        pytest.skip(f"reference file {relpath} not available")
    # Make the reference's own absolute imports (vitron.constants, ...)
    # resolvable without installing the reference package.
    import sys

    if "vitron" not in sys.modules:
        pkg_init = REFERENCE_ROOT / "vitron" / "__init__.py"
        if pkg_init.exists():
            pkg_spec = importlib.util.spec_from_file_location(
                "vitron", pkg_init, submodule_search_locations=[str(REFERENCE_ROOT / "vitron")]
            )
            pkg = importlib.util.module_from_spec(pkg_spec)
            sys.modules["vitron"] = pkg
            try:
                pkg_spec.loader.exec_module(pkg)
            except Exception:
                pass  # package __init__ may pull heavy deps; submodule imports still work
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except ImportError as e:
        pytest.skip(f"reference module {relpath} needs unavailable dep: {e}")
    return mod


@pytest.fixture(scope="session")
def ref_conversation():
    return load_reference_module("vitron/conversation.py", "ref_conversation")


@pytest.fixture(scope="session")
def synth_weights(tmp_path_factory):
    """Tiny synthetic weights dir covering the full serving manifest
    (tests/synthetic_weights.py) — shared by the assembly and
    sharded-serving suites (one build per session)."""
    from tests import synthetic_weights

    w = tmp_path_factory.mktemp("synth_weights")
    synthetic_weights.build_all(w, "tiny")
    return w


def load_reference_package_module(dotted: str):
    """Import a module deep inside the reference tree by its real dotted path
    (e.g. 'modules.GLIGEN.demo.gligen.ldm.modules.attention'), fabricating
    ancestor packages WITHOUT executing their __init__.py (several vendored
    __init__ files are broken or pull unavailable deps)."""
    import importlib.util
    import sys
    import types

    parts = dotted.split(".")
    for i in range(1, len(parts)):
        name = ".".join(parts[:i])
        if name in sys.modules:
            continue
        pkg = types.ModuleType(name)
        pkg.__path__ = [str(REFERENCE_ROOT / "/".join(parts[:i]))]
        sys.modules[name] = pkg
    path = REFERENCE_ROOT / ("/".join(parts) + ".py")
    if not path.exists():
        path = REFERENCE_ROOT / "/".join(parts) / "__init__.py"
    if not path.exists():
        pytest.skip(f"reference module {dotted} not found")
    spec = importlib.util.spec_from_file_location(dotted, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[dotted] = mod
    try:
        spec.loader.exec_module(mod)
    except ImportError as e:
        pytest.skip(f"reference module {dotted} needs unavailable dep: {e}")
    return mod
