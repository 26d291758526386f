"""Test configuration: force a virtual 8-device CPU mesh before JAX usage.

Real-TPU execution is exercised by bench.py / the driver; unit and parity
tests run on CPU so the sharding paths (shard_map over a Mesh) are testable
without hardware. Note: the axon TPU plugin overrides the JAX_PLATFORMS
environment variable, so jax.config.update is required as well.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# never persist-cache test compilations: serializing/deserializing
# interpret-mode Pallas executables can segfault jax's compilation_cache
# (observed with test_pallas_deblock on CPU, in both put_executable and
# get_executable paths). Empty string disables the package default
# (h264bsd_tpu.__init__); the persistent cache is a TPU-bench concern
# only (bench.py enables it itself).
os.environ["JAX_COMPILATION_CACHE_DIR"] = ""
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")


def pytest_collection_modifyitems(config, items):
    """Run the interpret-mode Pallas kernel parity tests FIRST.

    Compiling the huge interpret-lowered wavefront-deblock program
    reproducibly segfaults XLA:CPU on this host when ~100 other programs
    have been compiled in the same process (observed three times at the
    same collection position, in different compiler stages; the same
    test file passes standalone in 61 s). Compiling the big programs
    while the process is young sidesteps the compiler bug without losing
    any coverage.
    """
    def is_big(it):
        # Files whose tests compile the big whole-frame programs
        # (interpret-mode Pallas decode steps, sharded/vmapped decode
        # bodies). The round-4/5 worker segfaults were always one of
        # these running LAST on a compile-saturated worker (observed in
        # turn on rowtile, rowshard, multistream); standalone-young runs
        # of the same files always pass, so they all go first.
        heavy = ("test_rowtile", "test_rowshard", "test_pallas",
                 "test_multistream", "test_framepipe")
        return any(h in str(it.fspath) for h in heavy)

    front = [it for it in items if is_big(it)]
    rest = [it for it in items if not is_big(it)]
    items[:] = front + rest
